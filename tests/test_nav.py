import numpy as np
import pytest

from holoagent_tpu.nav import Costmap, DWAController, astar_plan
from holoagent_tpu.nav.controller import prune_path
from holoagent_tpu.nav.costmap import INSCRIBED, LETHAL


@pytest.fixture()
def world():
    """10m x 6m room with a wall at x=5 and a door at y in [2.5, 3.5]."""
    res = 0.1
    h, w = 60, 100
    occ = np.zeros((h, w), bool)
    occ[0, :] = occ[-1, :] = True
    occ[:, 0] = occ[:, -1] = True
    occ[:, 50] = True
    occ[25:35, 50] = False  # door
    cm = Costmap.from_occupancy(occ, np.zeros(2), res, robot_radius=0.15,
                                inflation_radius=0.5)
    return cm


def test_costmap_inflation(world):
    cm = world
    assert cm.cost[30, 50] < INSCRIBED  # the door is traversable
    assert cm.cost[10, 50] == LETHAL  # the wall is lethal
    # cost decays with distance from the wall
    assert cm.cost[10, 53] > cm.cost[10, 58]


def test_astar_through_door(world):
    cm = world
    path = astar_plan(cm, np.array([2.0, 1.0]), np.array([8.0, 1.0]))
    assert len(path) > 10
    xs = np.array([p[0] for p in path])
    ys = np.array([p[1] for p in path])
    # start and end near the endpoints
    assert abs(xs[0] - 2.0) < 0.2 and abs(xs[-1] - 8.0) < 0.2
    # crossing x=5 happens inside the door band
    cross = np.where((xs[:-1] - 5.0) * (xs[1:] - 5.0) < 0)[0]
    assert len(cross) >= 1
    for c in cross:
        assert 2.3 < (ys[c] + ys[c + 1]) / 2 < 3.7


def test_astar_unreachable():
    occ = np.zeros((20, 20), bool)
    occ[:, 10] = True  # full wall, no door
    cm = Costmap.from_occupancy(occ, np.zeros(2), 0.1, robot_radius=0.05,
                                inflation_radius=0.1)
    path = astar_plan(cm, np.array([0.5, 1.0]), np.array([1.5, 1.0]))
    assert path == []


def test_dwa_drives_toward_goal(world):
    cm = world
    ctl = DWAController(cm)
    pose = (2.0, 1.0, 0.0)
    v, w = ctl.compute_velocity(pose, (0.0, 0.0), [np.array([3.0, 1.0])],
                                np.array([3.0, 1.0]))
    assert v > 0.05  # moves forward toward the goal
    # goal behind: should rotate
    v2, w2 = ctl.compute_velocity(pose, (0.0, 0.0), [np.array([1.0, 1.0])],
                                  np.array([1.0, 1.0]))
    assert abs(w2) > 0.1 or v2 < v


def test_dwa_avoids_wall(world):
    cm = world
    ctl = DWAController(cm, horizon=2.0)
    # heading straight at the wall from close range
    pose = (4.5, 1.0, 0.0)
    v, w = ctl.compute_velocity(pose, (0.4, 0.0), [np.array([8.0, 1.0])],
                                np.array([8.0, 1.0]))
    # either slows down or turns away; a full-speed straight rollout would hit
    straight = ctl._rollout(pose, ctl.v_max, 0.0)
    assert cm.cost_at_world(straight[:, :2]).max() >= INSCRIBED  # sanity
    chosen = ctl._rollout(pose, v, w)
    assert cm.cost_at_world(chosen[:, :2]).max() < INSCRIBED


def test_dwa_full_loop(world):
    """Closed-loop: DWA follows an A* plan through the door."""
    cm = world
    path = astar_plan(cm, np.array([2.0, 1.0]), np.array([8.0, 1.0]))
    ctl = DWAController(cm)
    pose = np.array([2.0, 1.0, 0.0])
    vel = (0.0, 0.0)
    goal = np.array([8.0, 1.0])
    for step in range(600):
        rest = prune_path(path, pose[:2])[1:] or [goal]
        v, w = ctl.compute_velocity(tuple(pose), vel, rest, goal)
        vel = (v, w)
        pose[0] += v * np.cos(pose[2]) * ctl.dt
        pose[1] += v * np.sin(pose[2]) * ctl.dt
        pose[2] += w * ctl.dt
        if np.linalg.norm(pose[:2] - goal) < 0.3:
            break
    assert np.linalg.norm(pose[:2] - goal) < 0.35


# -- critic-plugin DWB (g1.yaml critic list, reference g1.yaml:76-136) --------


def test_dwb_critic_registry_round_trip(world):
    """The g1.yaml critics list + dotted params round-trip through the config
    tree into a live controller (VERDICT r3 item 7)."""
    from holoagent_tpu import config as cfgmod

    cfg = cfgmod.Config()
    g1 = ["RotateToGoal", "Oscillation", "BaseObstacle", "GoalAlign",
          "PathAlign", "PathDist", "GoalDist"]
    cfg = cfgmod._merge_into_dataclass(cfg, {"nav": {
        "controller": "dwb",
        "critics": g1,
        "critic_params": {"PathAlign.scale": 32.0, "GoalDist.scale": 24.0,
                          "BaseObstacle.scale": 0.02,
                          "PathAlign.forward_point_distance": 0.1},
    }})
    ctl = cfg.nav.make(world)
    assert ctl.critic_names() == [n.removesuffix("Critic") for n in g1] == g1
    assert ctl._critics[4].scale == 32.0  # PathAlign
    assert ctl._critics[4].forward_point_distance == 0.1
    v, w = ctl.compute_velocity((2.0, 1.0, 0.0), (0.0, 0.0),
                                [np.array([3.0, 1.0])], np.array([3.0, 1.0]))
    assert v > 0.05


def test_dwb_unknown_critic_raises(world):
    from holoagent_tpu.nav.controller import build_critics

    with pytest.raises(ValueError, match="unknown critic"):
        build_critics(["NotACritic"])


def test_oscillation_critic_blocks_sign_flip(world):
    """After committing to a turn direction, the opposite sign is vetoed
    until the robot moves (dwb_critics/oscillation.cpp CommandTrend)."""
    from holoagent_tpu.nav.controller import OscillationCritic

    c = OscillationCritic()
    ctx = {"pose": (0.0, 0.0, 0.0)}
    c.prepare(ctx)
    traj = np.zeros((3, 3))
    assert c.score(traj, 0.1, 0.5) == 0.0
    c.on_command(0.1, 0.5)  # committed to +w
    c.prepare(ctx)  # same pose: not yet moved the reset distance
    assert np.isinf(c.score(traj, 0.1, -0.5))
    ctx2 = {"pose": (1.0, 0.0, 0.0)}  # moved 1 m: trend resets
    c.prepare(ctx2)
    assert c.score(traj, 0.1, -0.5) == 0.0


# -- MPPI sampling controller (reference nav2_mppi_controller) ----------------


def test_mppi_drives_toward_goal(world):
    from holoagent_tpu.nav import MPPIController

    ctl = MPPIController(world, seed=0)
    v, w = ctl.compute_velocity((2.0, 1.0, 0.0), (0.0, 0.0),
                                [np.array([3.0, 1.0])], np.array([3.0, 1.0]))
    # first cycle is acceleration-limited; run a few cycles
    for _ in range(4):
        v, w = ctl.compute_velocity((2.0, 1.0, 0.0), (v, w),
                                    [np.array([3.0, 1.0])],
                                    np.array([3.0, 1.0]))
    assert v > 0.05


def test_mppi_avoids_wall(world):
    from holoagent_tpu.nav import MPPIController

    cm = world
    ctl = MPPIController(cm, horizon=2.0, seed=0)
    pose = (4.5, 1.0, 0.0)
    v, w = (0.4, 0.0)
    for _ in range(3):
        v, w = ctl.compute_velocity(pose, (v, w), [np.array([8.0, 1.0])],
                                    np.array([8.0, 1.0]))
    # the chosen command's one-step rollout must stay collision-free
    traj = ctl._rollout(pose, np.full((1, ctl.steps, 2), [v, w]))
    assert cm.cost_at_world(traj[0, : ctl.steps // 2, :2]).max() < INSCRIBED


def test_mppi_full_loop(world):
    """Closed-loop MPPI through the door (the DWA course, VERDICT r3 item 7)."""
    from holoagent_tpu.nav import MPPIController

    cm = world
    path = astar_plan(cm, np.array([2.0, 1.0]), np.array([8.0, 1.0]))
    ctl = MPPIController(cm, seed=1)
    pose = np.array([2.0, 1.0, 0.0])
    vel = (0.0, 0.0)
    goal = np.array([8.0, 1.0])
    for step in range(900):
        rest = prune_path(path, pose[:2])[1:] or [goal]
        v, w = ctl.compute_velocity(tuple(pose), vel, rest, goal)
        vel = (v, w)
        pose[0] += v * np.cos(pose[2]) * ctl.dt
        pose[1] += v * np.sin(pose[2]) * ctl.dt
        pose[2] += w * ctl.dt
        if np.linalg.norm(pose[:2] - goal) < 0.3:
            break
    assert np.linalg.norm(pose[:2] - goal) < 0.35


def test_bt_selects_mppi_controller(world):
    """controller_id="MPPI" routes FollowPath through the sampling controller
    (the g1.yaml controller_plugins selector role)."""
    from holoagent_tpu.nav import XMLNavigator
    from holoagent_tpu.nav.behaviors import Status

    xml = """<root main_tree_to_execute="T"><BehaviorTree ID="T">
      <PipelineSequence>
        <RateController hz="1.0">
          <ComputePathToPose goal="{goal}" path="{path}"/>
        </RateController>
        <FollowPath path="{path}" controller_id="MPPI"/>
      </PipelineSequence>
    </BehaviorTree></root>"""
    state = np.array([2.0, 1.0, 0.0])
    cmd = [0.0, 0.0]

    def send_vel(v, _y, w):
        cmd[0], cmd[1] = v, w

    nav = XMLNavigator(world, send_vel, lambda: tuple(state), tree_xml=xml,
                       goal_radius=0.3)
    nav.set_goal(np.array([8.0, 1.0]))
    status = Status.RUNNING
    for _ in range(1200):
        status = nav.tick()
        v, w = cmd
        state[0] += v * np.cos(state[2]) * nav.dt
        state[1] += v * np.sin(state[2]) * nav.dt
        state[2] += w * nav.dt
        if status != Status.RUNNING:
            break
    assert status == Status.SUCCESS
    assert np.linalg.norm(state[:2] - [8.0, 1.0]) < 0.35


def test_theta_star_any_angle_through_door(world):
    """Theta* (nav2_theta_star_planner role) returns a SPARSE any-angle
    vertex chain through the door, with every segment collision-free."""
    from holoagent_tpu.nav import astar_plan as _astar, theta_star_plan

    cm = world
    start, goal = np.array([2.0, 1.0]), np.array([8.0, 1.0])
    path = theta_star_plan(cm, start, goal)
    assert len(path) >= 2
    assert abs(path[0][0] - 2.0) < 0.2 and abs(path[-1][0] - 8.0) < 0.2
    # crossing x=5 happens inside the door band
    xs = np.array([p[0] for p in path]); ys = np.array([p[1] for p in path])
    cross = np.where((xs[:-1] - 5.0) * (xs[1:] - 5.0) < 0)[0]
    assert len(cross) >= 1
    for c in cross:
        # the segment through the wall must pass the door: interpolate the
        # crossing point
        t = (5.0 - xs[c]) / (xs[c + 1] - xs[c])
        yc = ys[c] + t * (ys[c + 1] - ys[c])
        assert 2.3 < yc < 3.7
    # any-angle: far fewer vertices than the grid A* staircase
    ref = _astar(cm, start, goal)
    assert len(path) < len(ref) / 3
    # every vertex-to-vertex segment stays traversable (densely sampled)
    for a, b in zip(path[:-1], path[1:]):
        for t in np.linspace(0, 1, 50):
            p = (1 - t) * np.asarray(a) + t * np.asarray(b)
            r, cgrid = cm.to_grid(p)
            assert cm.cost[int(r), int(cgrid)] < LETHAL


def test_theta_star_unreachable():
    from holoagent_tpu.nav import theta_star_plan
    from holoagent_tpu.nav.costmap import Costmap

    occ = np.zeros((20, 20), bool)
    occ[:, 10] = True
    cm = Costmap.from_occupancy(occ, np.zeros(2), 0.1, robot_radius=0.05,
                                inflation_radius=0.1)
    assert theta_star_plan(cm, np.array([0.5, 1.0]), np.array([1.5, 1.0])) == []
