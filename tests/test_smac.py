"""Smac-role hybrid-A* planner (reference nav2_smac_planner/
SmacPlannerHybrid: kinematically-feasible (x, y, theta) search over arc
primitives with obstacle heuristic and penalty knobs)."""

import numpy as np
import pytest

from holoagent_tpu.nav import Costmap, SmacHybridPlanner, smac_plan
from holoagent_tpu.nav.costmap import INSCRIBED


@pytest.fixture()
def world():
    """10m x 6m room, wall at x=5 with a door at y in [2.5, 3.5]."""
    res = 0.1
    occ = np.zeros((60, 100), bool)
    occ[0, :] = occ[-1, :] = occ[:, 0] = occ[:, -1] = True
    occ[:, 50] = True
    occ[25:35, 50] = False
    return Costmap.from_occupancy(occ, np.zeros(2), res, robot_radius=0.15,
                                  inflation_radius=0.5)


def _check_kinematics(path, min_radius, step):
    """Consecutive headings must respect the minimum turning radius."""
    max_dth = step / min_radius + 1e-6
    for a, b in zip(path[:-1], path[1:]):
        dth = abs((b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi)
        assert dth <= max_dth, (dth, max_dth)
        # step length bounded by the primitive arc length
        assert np.hypot(b[0] - a[0], b[1] - a[1]) <= step + 1e-6


def test_smac_plans_through_door(world):
    p = SmacHybridPlanner(world, min_radius=0.4, step=0.15)
    path = p.plan((2.0, 1.0, 0.0), (8.0, 1.0, 0.0))
    assert path is not None and len(path) > 10
    assert np.hypot(path[0][0] - 2.0, path[0][1] - 1.0) < 1e-9
    assert np.hypot(path[-1][0] - 8.0, path[-1][1] - 1.0) < p.goal_xy_tol
    _check_kinematics(path, p.min_radius, p.step)
    # crossing x=5 happens inside the door band
    xs = np.array([q[0] for q in path]); ys = np.array([q[1] for q in path])
    cross = np.where((xs[:-1] - 5.0) * (xs[1:] - 5.0) < 0)[0]
    assert len(cross) >= 1
    for c in cross:
        assert 2.3 < (ys[c] + ys[c + 1]) / 2 < 3.7
    # every waypoint is in traversable space
    costs = world.cost_at_world(np.stack([xs, ys], -1))
    assert costs.max() < INSCRIBED


def test_smac_respects_goal_heading(world):
    """Reaching the same point facing BACKWARD requires a maneuver; the
    final heading honors the tolerance."""
    p = SmacHybridPlanner(world, min_radius=0.4, step=0.15)
    path = p.plan((2.0, 3.0, 0.0), (4.0, 3.0, np.pi))
    assert path is not None
    dyaw = abs((path[-1][2] - np.pi + np.pi) % (2 * np.pi) - np.pi)
    assert dyaw < p.goal_yaw_tol
    _check_kinematics(path, p.min_radius, p.step)


def test_smac_unreachable_returns_none():
    occ = np.zeros((40, 40), bool)
    occ[:, 20] = True  # full wall
    cm = Costmap.from_occupancy(occ, np.zeros(2), 0.1, robot_radius=0.1,
                                inflation_radius=0.2)
    assert smac_plan(cm, np.array([1.0, 2.0]), np.array([3.0, 2.0])) is None


def test_smac_reverse_penalty_prefers_forward(world):
    """A goal straight ahead should be reached without reverse segments."""
    p = SmacHybridPlanner(world, min_radius=0.4, step=0.15)
    path = p.plan((2.0, 3.0, 0.0), (4.0, 3.0, 0.0))
    assert path is not None
    # monotone forward progress in x (no reversing needed on a clear run)
    xs = np.array([q[0] for q in path])
    assert (np.diff(xs) > -1e-6).all()


def test_xml_navigator_with_smac_planner(world):
    """planner_id='SmacHybrid' through the XML behavior tree (the reference
    selects Smac by plugin name in planner_server the same way)."""
    from holoagent_tpu.nav import Status, XMLNavigator

    xml = """<root main_tree_to_execute="T">
      <BehaviorTree ID="T">
        <PipelineSequence>
          <RateController hz="1.0">
            <ComputePathToPose goal="{goal}" path="{path}" planner_id="SmacHybrid"/>
          </RateController>
          <FollowPath path="{path}"/>
        </PipelineSequence>
      </BehaviorTree></root>"""
    state = np.array([2.0, 1.0, 0.0])
    cmd = [0.0, 0.0]

    def send(v, _y, w):
        cmd[0], cmd[1] = v, w

    def pose():
        return tuple(float(v) for v in state)

    nav = XMLNavigator(world, send, pose, tree_xml=xml, goal_radius=0.35)
    nav.set_goal(np.array([7.0, 3.0]))
    status = Status.RUNNING
    for _ in range(900):
        status = nav.tick()
        state[0] += cmd[0] * np.cos(state[2]) * 0.1
        state[1] += cmd[0] * np.sin(state[2]) * 0.1
        state[2] += cmd[1] * 0.1
        if status != Status.RUNNING:
            break
    assert status == Status.SUCCESS
    assert np.hypot(state[0] - 7.0, state[1] - 3.0) < 0.4
