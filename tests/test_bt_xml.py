"""Data-driven behavior-tree navigator (reference nav2_bt_navigator's XML
trees + nav2_behavior_tree control/decorator plugins, VERDICT round-2
Nav2-breadth item)."""

import numpy as np
import pytest

from holoagent_tpu.nav import Costmap, Status
from holoagent_tpu.nav.bt_xml import (
    DEFAULT_TREE_XML,
    Node,
    PipelineSequence,
    RateController,
    ReactiveFallback,
    RecoveryNode,
    RoundRobin,
    XMLNavigator,
    parse_bt_xml,
)
from holoagent_tpu.nav.costmap import LETHAL


def _open_room(blocked_box=None, hw=(60, 60), res=0.1):
    occ = np.zeros(hw, bool)
    occ[0, :] = occ[-1, :] = occ[:, 0] = occ[:, -1] = True
    if blocked_box is not None:
        r0, r1, c0, c1 = blocked_box
        occ[r0:r1, c0:c1] = True
    return Costmap.from_occupancy(
        occ, origin=np.array([0.0, 0.0]), resolution=res,
        robot_radius=0.15, inflation_radius=0.4,
    )


class _Sim:
    def __init__(self, x, y, yaw, dt=0.1):
        self.state = np.array([x, y, yaw], np.float64)
        self.dt = dt
        self.cmd = (0.0, 0.0)

    def send_velocity(self, v, _y, w):
        self.cmd = (v, w)

    def step(self):
        v, w = self.cmd
        x, y, yaw = self.state
        self.state = np.array(
            [x + v * np.cos(yaw) * self.dt,
             y + v * np.sin(yaw) * self.dt,
             yaw + w * self.dt]
        )

    def pose(self):
        return tuple(float(v) for v in self.state)


class _Scripted(Node):
    """Leaf returning a scripted status sequence (sticky on the last)."""

    def __init__(self, *statuses, rewind_on_reset=True):
        self.statuses = list(statuses)
        self.i = 0
        self.ticks = 0
        self.resets = 0
        self.rewind_on_reset = rewind_on_reset

    def tick(self):
        self.ticks += 1
        s = self.statuses[min(self.i, len(self.statuses) - 1)]
        self.i += 1
        return s

    def reset(self):
        if self.rewind_on_reset:
            self.i = 0
        self.resets += 1


S, F, R = Status.SUCCESS, Status.FAILURE, Status.RUNNING


# ------------------------------------------------------------ control semantics


def test_recovery_node_retries_via_recovery_child():
    main = _Scripted(F, F, S, rewind_on_reset=False)  # fails twice, then OK
    rec = _Scripted(S)
    node = RecoveryNode([main, rec], number_of_retries=2)
    # single tick: fail -> recover -> retry -> fail -> recover -> retry -> S
    assert node.tick() == S
    assert rec.ticks == 2 and main.resets >= 2


def test_recovery_node_exhausts_retries():
    node = RecoveryNode([_Scripted(F), _Scripted(S)], number_of_retries=1)
    assert node.tick() == F


def test_recovery_node_fails_when_recovery_fails():
    node = RecoveryNode([_Scripted(F), _Scripted(F)], number_of_retries=5)
    assert node.tick() == F


def test_pipeline_sequence_reticks_prefix():
    a, b = _Scripted(S), _Scripted(R, R, S)
    node = PipelineSequence([a, b])
    assert node.tick() == R  # a S -> advance -> b R
    assert node.tick() == R  # a re-ticked, b R
    assert node.tick() == S  # b S -> last child done
    assert a.ticks == 3  # a kept being re-ticked every tick


def test_pipeline_sequence_fails_on_prefix_failure():
    a, b = _Scripted(S, F), _Scripted(R, R)
    node = PipelineSequence([a, b])
    assert node.tick() == R
    assert node.tick() == F  # a fails on re-tick


def test_round_robin_advances_on_failure_and_wraps():
    a, b, c = _Scripted(F), _Scripted(S), _Scripted(S)
    node = RoundRobin([a, b, c])
    assert node.tick() == S  # a fails, b succeeds
    assert node.tick() == S  # resumes at c
    assert c.ticks == 1
    assert node.tick() == S  # wraps to a (fails) then b
    assert a.ticks == 2


def test_round_robin_fails_when_all_fail():
    node = RoundRobin([_Scripted(F), _Scripted(F)])
    assert node.tick() == F


def test_reactive_fallback_reticks_first_child():
    cond, act = _Scripted(F, F, S), _Scripted(R, R, R)
    node = ReactiveFallback([cond, act])
    assert node.tick() == R
    assert node.tick() == R
    assert node.tick() == S  # condition preempts the running action
    assert act.ticks == 2


def test_rate_controller_gates_to_period():
    child = _Scripted(S, S, S, S)
    node = RateController(child, hz=2.0, dt=0.1)  # period = 5 ticks
    assert node.tick() == S  # first activation always ticks
    for _ in range(4):
        assert node.tick() == R  # gated
    assert node.tick() == S  # period elapsed
    assert child.ticks == 2


def test_rate_controller_keeps_ticking_running_child():
    child = _Scripted(R, R, S)
    node = RateController(child, hz=1.0, dt=0.1)
    assert node.tick() == R
    assert node.tick() == R
    assert node.tick() == S  # RUNNING child is never gated
    assert child.ticks == 3


# ------------------------------------------------------------------ XML parser


def test_parse_rejects_unknown_node():
    xml = """<root main_tree_to_execute="T">
      <BehaviorTree ID="T"><NoSuchNode/></BehaviorTree></root>"""
    with pytest.raises(ValueError, match="NoSuchNode"):
        parse_bt_xml(xml, {})


def test_parse_subtree_expansion():
    ticked = []

    class Leaf(Node):
        def tick(self):
            ticked.append(1)
            return S

    xml = """<root main_tree_to_execute="Main">
      <BehaviorTree ID="Main">
        <Sequence><SubTree ID="Sub"/><SubTree ID="Sub"/></Sequence>
      </BehaviorTree>
      <BehaviorTree ID="Sub"><Leaf/></BehaviorTree>
    </root>"""
    from holoagent_tpu.nav.bt_xml import Sequence as Seq

    tree = parse_bt_xml(xml, {
        "Sequence": lambda e, ch: Seq(ch),
        "Leaf": lambda e, ch: Leaf(),
    })
    assert tree.tick() == S
    assert len(ticked) == 2  # each SubTree reference expanded to an instance


# ----------------------------------------------------------------- end to end


def test_xml_navigator_with_path_smoother_reaches_goal():
    """SmoothPath role wired between planner and controller (reference
    nav2_smoother server in the bringup pipeline): the navigator still
    reaches the goal with the smoothed plan."""
    from holoagent_tpu.nav import SimpleSmoother

    cm = _open_room()
    sim = _Sim(1.0, 1.0, 0.0)
    nav = XMLNavigator(cm, sim.send_velocity, sim.pose, goal_radius=0.3,
                       path_smoother=SimpleSmoother())
    nav.set_goal(np.array([5.0, 5.0]))
    status = Status.RUNNING
    for _ in range(800):
        status = nav.tick()
        sim.step()
        if status != Status.RUNNING:
            break
    assert status == Status.SUCCESS
    assert np.linalg.norm(sim.state[:2] - [5.0, 5.0]) < 0.35


def test_xml_navigator_reaches_goal_default_tree():
    cm = _open_room()
    sim = _Sim(1.0, 1.0, 0.0)
    nav = XMLNavigator(cm, sim.send_velocity, sim.pose, goal_radius=0.3)
    nav.set_goal(np.array([5.0, 5.0]))
    status = Status.RUNNING
    for _ in range(800):
        status = nav.tick()
        sim.step()
        if status != Status.RUNNING:
            break
    assert status == Status.SUCCESS
    assert np.linalg.norm(sim.state[:2] - [5.0, 5.0]) < 0.35


def test_xml_navigator_rpp_controller_via_tree():
    """controller_id in the XML selects the second controller family."""
    xml = """<root main_tree_to_execute="T">
      <BehaviorTree ID="T">
        <PipelineSequence>
          <RateController hz="1.0">
            <ComputePathToPose goal="{goal}" path="{path}"/>
          </RateController>
          <FollowPath path="{path}" controller_id="RPP"/>
        </PipelineSequence>
      </BehaviorTree></root>"""
    cm = _open_room()
    sim = _Sim(1.0, 1.0, 0.0)
    nav = XMLNavigator(cm, sim.send_velocity, sim.pose, tree_xml=xml,
                       goal_radius=0.3)
    nav.set_goal(np.array([4.5, 4.5]))
    status = Status.RUNNING
    for _ in range(800):
        status = nav.tick()
        sim.step()
        if status != Status.RUNNING:
            break
    assert status == Status.SUCCESS
    assert np.linalg.norm(sim.state[:2] - [4.5, 4.5]) < 0.35


def test_xml_navigator_clears_costmap_to_recover():
    """A stale dynamic obstacle blocks every plan; the tree's
    ClearEntireCostmap recovery restores the static map and navigation
    succeeds (the reference tree's ClearGlobalCostmap-Context role)."""
    cm = _open_room()
    sim = _Sim(1.0, 1.0, 0.0)
    nav = XMLNavigator(cm, sim.send_velocity, sim.pose, goal_radius=0.3)
    # dynamic obstacle painted AFTER init: a full wall across the room
    cm.cost[:, 28:32] = LETHAL
    cm.bump_version()  # the costmap mutation contract (Costmap.version)
    nav.set_goal(np.array([5.0, 5.0]))
    status = Status.RUNNING
    for _ in range(800):
        status = nav.tick()
        sim.step()
        if status != Status.RUNNING:
            break
    assert status == Status.SUCCESS
    assert nav.costmap_clears  # recovery actually ran
    assert np.linalg.norm(sim.state[:2] - [5.0, 5.0]) < 0.35


def test_goal_updated_preempts_recovery():
    """GoalUpdated in the ReactiveFallback aborts a recovery round when a
    new goal arrives mid-recovery (reference goal_updated_condition)."""
    cm = _open_room(blocked_box=(1, 59, 28, 32))  # unreachable east half
    sim = _Sim(1.0, 1.0, 0.0)
    nav = XMLNavigator(cm, sim.send_velocity, sim.pose, goal_radius=0.3)
    nav.set_goal(np.array([5.0, 5.0]))  # beyond the wall: plan fails
    for _ in range(3):
        nav.tick()  # enter recovery
        sim.step()
    nav.goal_version += 1  # simulate a new goal arriving (no tree reset)
    st = nav.tick()
    # GoalUpdated fires: ReactiveFallback SUCCESS -> recovery child of the
    # outer RecoveryNode succeeds -> main navigation is retried
    assert st in (Status.RUNNING, Status.FAILURE)
    # the recovery round-robin should NOT have continued past the condition:
    # next recovery begins at the same round-robin slot (observable via
    # costmap_clears growth stopping while goal keeps updating)
    n_clears = len(nav.costmap_clears)
    nav.goal_version += 1
    nav.tick()
    assert len(nav.costmap_clears) <= n_clears + 1


def test_default_tree_parses():
    cm = _open_room()
    nav = XMLNavigator(cm, lambda *a: None, lambda: (1.0, 1.0, 0.0),
                       tree_xml=DEFAULT_TREE_XML)
    assert nav.tick() in (Status.RUNNING, Status.FAILURE)


def test_replan_if_invalid_tree_replans_on_blocked_path():
    """The lazy-replan stock tree (reference
    navigate_w_replanning_only_if_path_becomes_invalid.xml role) keeps one
    plan while valid and replans when a new obstacle invalidates it."""
    from holoagent_tpu.nav.bt_xml import REPLAN_IF_INVALID_TREE_XML

    cm = _open_room()
    sim = _Sim(1.0, 1.0, 0.0)
    nav = XMLNavigator(cm, sim.send_velocity, sim.pose,
                       tree_xml=REPLAN_IF_INVALID_TREE_XML, goal_radius=0.3)
    nav.set_goal(np.array([5.0, 1.0]))
    plans = []
    for t in range(600):
        if t == 30:
            # block the straight corridor mid-run (north half stays open)
            cm.cost[:35, 28:32] = LETHAL
            cm.bump_version()  # the costmap mutation contract
        st = nav.tick()
        p = nav.blackboard.get("path")
        if p is not None and (not plans or plans[-1] is not p):
            plans.append(p)
        sim.step()
        if st != Status.RUNNING:
            break
    assert st == Status.SUCCESS
    assert np.linalg.norm(sim.state[:2] - [5.0, 1.0]) < 0.35
    # at least two distinct plans: the original and the post-block replan
    assert len(plans) >= 2
