"""Full online-mission chain (SURVEY.md §3.3): voice transcript over a real
WebSocket -> GoalService HMSG query -> waypoint navigation -> velocities
through the real FIFO bridge -> simulated unicycle robot -> waypoint_reached
feedback back to the voice server.  Plus the live-sensor mission: a dynamic
obstacle appears mid-run, scans mark it into the rolling costmap
(nav.ObstacleLayer), and the controller must avoid it (reference
g1.yaml:137-260 obstacle_layer marking/clearing)."""

import threading

import numpy as np
import pytest

from holoagent_tpu.agent import GoalService, VoiceClient, WaypointNavigator
from holoagent_tpu.agent.voice_client import LoopbackVoiceServer
from holoagent_tpu.native import VelocityBridge

# reuse the hand-built graph + fake-text engine from the query tests
from tests.test_query import FakeTextEngine, synthetic_graph  # noqa: F401


@pytest.fixture()
def engine(synthetic_graph):  # noqa: F811
    from holoagent_tpu.models import clip as clip_mod

    return FakeTextEngine(
        synthetic_graph, None, None, clip_mod.VARIANTS["test-tiny"],
        image_provider=None,
    )


def test_voice_to_wheels_mission(engine, tmp_path, rng):
    server = LoopbackVoiceServer(
        transcript="towel in region bathroom on floor 1", min_samples=2000
    )
    svc = GoalService(engine, score_threshold=0.15)
    vb = VelocityBridge(str(tmp_path / "fifo"))

    # simulated robot state driven through the FIFO (pubvel side)
    pose = np.eye(4)

    def send_vel(x, y, r):
        vb.write(x, y, r)
        out = vb.read_shaped(vmax=0.6, vmin=0.01)
        if out is None:
            return
        vx, _, w = out
        dt = 0.1
        yaw = np.arctan2(pose[1, 0], pose[0, 0]) + w * dt
        pose[:2, 3] += vx * dt * np.array([np.cos(yaw), np.sin(yaw)])
        pose[0, 0], pose[0, 1] = np.cos(yaw), -np.sin(yaw)
        pose[1, 0], pose[1, 1] = np.sin(yaw), np.cos(yaw)

    goal_result = {}
    got_goal = threading.Event()

    def on_text(text):
        res = svc.query(text)
        goal_result["res"] = res
        got_goal.set()

    client = VoiceClient("127.0.0.1", server.port, on_text=on_text, heartbeat_s=5.0)
    try:
        # stream "audio" until the server replies with the transcript
        chunk = rng.uniform(-0.4, 0.4, 48000 // 10).astype(np.float32)
        for _ in range(3):
            client.send_audio(chunk)
        assert got_goal.wait(5.0), "no goal produced from the voice transcript"
        res = goal_result["res"]
        assert res.found and res.goal_pose is not None

        # drive to the goal (planar), report back like pubpose's status timer
        reached = []
        nav = WaypointNavigator(
            send_vel, lambda: pose.copy(), waypoint_radius=0.3,
            on_waypoint_reached=lambda i: (
                reached.append(i), client.notify_waypoint_reached(str(i))
            ),
        )
        target = res.goal_pose[:3, 3].copy()
        target[2] = 0.0  # planar robot
        nav.set_goal([target])
        for _ in range(800):
            if not nav.step():
                break
        assert nav.done
        assert reached == [0]
        np.testing.assert_allclose(pose[:2, 3], target[:2], atol=0.4)
        # the feedback reached the voice server
        import time

        for _ in range(50):
            if server.waypoint_msgs:
                break
            time.sleep(0.1)
        assert server.waypoint_msgs == ["0"]
    finally:
        client.close()
        vb.close()

def test_mission_avoids_dynamic_obstacle():
    """Live-sensor costmap mission (VERDICT r4 #7): a person-sized obstacle
    steps onto the planned corridor mid-run.  It exists ONLY in the true
    world — the static costmap never contains it — so the run succeeds only
    if the scan->ObstacleLayer->costmap chain marks it in time for the
    DWA controller + replanning tree to steer around it, and the robot must
    never enter a true-lethal cell."""
    from holoagent_tpu.nav import ObstacleLayer, simulate_scan_2d
    from holoagent_tpu.nav.bt_xml import XMLNavigator
    from holoagent_tpu.nav.behaviors import Status
    from holoagent_tpu.nav.costmap import Costmap

    res = 0.1
    hw = (60, 60)
    static_occ = np.zeros(hw, bool)
    static_occ[0, :] = static_occ[-1, :] = True
    static_occ[:, 0] = static_occ[:, -1] = True
    origin = np.array([0.0, 0.0])
    cm = Costmap.from_occupancy(
        static_occ, origin=origin, resolution=res,
        robot_radius=0.15, inflation_radius=0.4,
    )
    layer = ObstacleLayer(
        cm, static_occ, robot_radius=0.15, inflation_radius=0.4,
        obstacle_max_range=4.0, raytrace_max_range=5.0,
    )
    true_occ = static_occ.copy()  # the world the scans see

    class _Sim:
        def __init__(self):
            self.state = np.array([1.0, 3.0, 0.0], np.float64)
            self.cmd = (0.0, 0.0)

        def send_velocity(self, v, _y, w):
            self.cmd = (v, w)

        def step(self, dt=0.1):
            v, w = self.cmd
            x, y, yaw = self.state
            self.state = np.array(
                [x + v * np.cos(yaw) * dt, y + v * np.sin(yaw) * dt, yaw + w * dt]
            )

    sim = _Sim()
    nav = XMLNavigator(cm, sim.send_velocity, lambda: tuple(sim.state),
                       goal_radius=0.3)
    goal = np.array([5.0, 3.0])
    nav.set_goal(goal)
    marked_when = None
    status = Status.RUNNING
    for t in range(900):
        if t == 20:
            # obstacle steps onto the straight corridor (true world only)
            true_occ[27:33, 28:32] = True
        # sense + integrate BEFORE the control tick, like the 10 Hz loop
        scan = simulate_scan_2d(true_occ, origin, res, sim.state[:2],
                                n_beams=72, max_range=4.0)
        layer.update(sim.state[:2], scan)
        if marked_when is None and layer.live.any():
            marked_when = t
        status = nav.tick()
        sim.step()
        # never inside a TRUE lethal cell
        r = int(sim.state[1] / res)
        c = int(sim.state[0] / res)
        assert not true_occ[r, c], f"drove into the obstacle at t={t}"
        if status != Status.RUNNING:
            break
    assert status == Status.SUCCESS
    assert np.linalg.norm(sim.state[:2] - goal) < 0.35
    assert marked_when is not None and marked_when >= 20
    # the live marking covers the true obstacle's cells
    assert (layer.live & true_occ).sum() >= 4


def test_obstacle_layer_clears_departed_obstacle():
    """Raycast clearing: an obstacle that walks away stops costing — beams
    that now pass through its old cells clear the live markings (reference
    obstacle_layer clearing: True semantics)."""
    from holoagent_tpu.nav import ObstacleLayer, simulate_scan_2d
    from holoagent_tpu.nav.costmap import Costmap, LETHAL

    res = 0.1
    static_occ = np.zeros((40, 40), bool)
    static_occ[0, :] = static_occ[-1, :] = True
    static_occ[:, 0] = static_occ[:, -1] = True
    origin = np.array([0.0, 0.0])
    cm = Costmap.from_occupancy(static_occ, origin=origin, resolution=res,
                                robot_radius=0.15, inflation_radius=0.4)
    layer = ObstacleLayer(cm, static_occ, robot_radius=0.15,
                          inflation_radius=0.4)
    pose = np.array([1.0, 2.0])
    v0 = cm.version
    # obstacle present
    occ1 = static_occ.copy()
    occ1[18:22, 20:23] = True
    layer.update(pose, simulate_scan_2d(occ1, origin, res, pose, max_range=4.0))
    assert layer.live.any()
    # beams from (1.0, 2.0) see the obstacle's near face (col 20): those
    # cells must be marked lethal (interior cells are occluded — the beam
    # cannot see them, exactly like a real scan)
    assert (cm.cost[18:22, 20] == LETHAL).any()
    assert (layer.live[18:22, 20]).any()
    assert cm.version > v0
    # obstacle gone: the same beams now pass through and clear
    layer.update(pose, simulate_scan_2d(static_occ, origin, res, pose,
                                        max_range=4.0))
    assert not layer.live[15:25, 18:25].any()
    assert (cm.cost[18:22, 20] < LETHAL).all()
