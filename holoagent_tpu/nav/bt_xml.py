"""Data-driven behavior-tree navigator: BehaviorTree.CPP-style XML trees.

The role of the reference's nav2_bt_navigator: navigation logic is not
hard-coded but loaded from an XML behavior tree (reference
nav_agent/humble_localization_nav2/navigation2-humble/nav2_bt_navigator/
behavior_trees/navigate_to_pose_w_replanning_and_recovery.xml and nine
sibling trees), composed from a plugin registry of control nodes
(RecoveryNode, PipelineSequence, RoundRobin, ReactiveFallback,
RateController — reference nav2_behavior_tree/plugins/control+decorator)
and action/condition leaves (ComputePathToPose, FollowPath,
ClearEntireCostmap, Spin/BackUp/Wait, GoalUpdated).

Rebuilt host-side on this package's costmap/planner/controller stack:

  * ``parse_bt_xml``   — stdlib ElementTree parser with ``<root
    main_tree_to_execute>``, multiple ``<BehaviorTree ID>`` definitions,
    ``<SubTree>`` expansion, and ``{port}`` blackboard remapping.
  * nav2-semantic control nodes over ``behaviors.Node`` (RecoveryNode's
    retry-via-recovery-child, PipelineSequence's re-tick-the-prefix,
    RoundRobin's wrap-on-failure, RateController's tick-rate gate).
  * ``XMLNavigator``   — the bt_navigator role: binds leaves to the
    planner (``planner_id`` → registry), controllers (``controller_id`` →
    DWB-role DWA / RPP), costmap clearing, and timed recoveries; exposes
    the same ``set_goal``/``tick`` surface as ``behaviors.BTNavigator``.

Time-based nodes count control ticks (tick period = ``dt``) instead of
wall clock so trees are deterministic under test, matching the reference's
simulated-time test pattern (nav2 uses ROS time, which its tests fake).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from .behaviors import (
    CollisionMonitor,
    Node,
    Sequence,
    Fallback,
    Status,
    TimedCommand,
    VelocitySmoother,
)
from .controller import DWAController
from .costmap import Costmap, INSCRIBED
from .planner import astar_plan
from .mppi import MPPIController
from .rpp import RPPController


# ----------------------------------------------------------------- blackboard


class Blackboard:
    """Key-value store shared across the tree (BehaviorTree.CPP blackboard).

    Ports written as ``{name}`` in XML attributes resolve here; plain
    attribute values pass through as literals.
    """

    def __init__(self) -> None:
        self._d: Dict[str, object] = {}

    def set(self, key: str, value) -> None:
        self._d[key] = value

    def get(self, key: str, default=None):
        return self._d.get(key, default)


def _port(attr: Optional[str]) -> Tuple[bool, Optional[str]]:
    """Return (is_blackboard_port, key_or_literal)."""
    if attr is not None and len(attr) > 2 and attr[0] == "{" and attr[-1] == "}":
        return True, attr[1:-1]
    return False, attr


class _PortRef:
    """Resolves an XML attribute either from the blackboard or as a literal."""

    def __init__(self, bb: Blackboard, attr: Optional[str], default=None):
        self.bb = bb
        self.is_port, self.key = _port(attr)
        self.default = default

    def read(self):
        if self.key is None:
            return self.default
        return self.bb.get(self.key, self.default) if self.is_port else self.key

    def write(self, value) -> None:
        if self.is_port and self.key is not None:
            self.bb.set(self.key, value)


# -------------------------------------------------- nav2-semantic control nodes


class RecoveryNode(Node):
    """Two children: [main, recovery].  On main FAILURE, run the recovery
    child to completion; if it succeeds and retries remain, reset and
    re-tick main (reference nav2_behavior_tree/plugins/control/
    recovery_node.cpp `number_of_retries` semantics)."""

    def __init__(self, children: List[Node], number_of_retries: int = 1):
        if len(children) != 2:
            raise ValueError("RecoveryNode requires exactly 2 children")
        self.main, self.recovery = children
        self.retries = int(number_of_retries)
        self._used = 0
        self._recovering = False

    def tick(self) -> Status:
        while True:
            if not self._recovering:
                s = self.main.tick()
                if s == Status.RUNNING:
                    return s
                if s == Status.SUCCESS:
                    self.reset()
                    return Status.SUCCESS
                if self._used >= self.retries:
                    self.reset()
                    return Status.FAILURE
                self._recovering = True
            s = self.recovery.tick()
            if s == Status.RUNNING:
                return s
            self._recovering = False
            if s == Status.FAILURE:
                self.reset()
                return Status.FAILURE
            self._used += 1
            self.main.reset()
            # loop: re-tick main in this same tick (nav2 retries immediately)

    def reset(self) -> None:
        self._used = 0
        self._recovering = False
        self.main.reset()
        self.recovery.reset()


class PipelineSequence(Node):
    """Re-ticks every child up to the furthest one reached each tick;
    advances when the frontier child succeeds, succeeds when the LAST child
    does, fails if any re-ticked child fails (reference
    nav2_behavior_tree/plugins/control/pipeline_sequence.cpp — this is what
    keeps ComputePathToPose replanning while FollowPath runs)."""

    def __init__(self, children: List[Node]):
        self.children = list(children)
        self._last = 0

    def tick(self) -> Status:
        i = 0
        while i <= self._last:
            s = self.children[i].tick()
            if s == Status.FAILURE:
                self.reset()
                return Status.FAILURE
            if i == self._last:
                if s == Status.RUNNING:
                    return Status.RUNNING
                # frontier SUCCESS
                if self._last == len(self.children) - 1:
                    self.reset()
                    return Status.SUCCESS
                self._last += 1  # tick the newly-opened child this same tick
            i += 1
        return Status.RUNNING

    def reset(self) -> None:
        self._last = 0
        for c in self.children:
            c.reset()


class RoundRobin(Node):
    """Ticks one child at a time, remembering position across activations;
    SUCCESS on the first child that succeeds, advancing the wrap pointer;
    FAILURE only when every child failed in one pass (reference
    nav2_behavior_tree/plugins/control/round_robin_node.cpp — recovery
    actions take turns across recovery rounds)."""

    def __init__(self, children: List[Node]):
        self.children = list(children)
        self._idx = 0

    def tick(self) -> Status:
        failed = 0
        while failed < len(self.children):
            s = self.children[self._idx].tick()
            if s == Status.RUNNING:
                return s
            self.children[self._idx].reset()
            self._idx = (self._idx + 1) % len(self.children)
            if s == Status.SUCCESS:
                return Status.SUCCESS
            failed += 1
        return Status.FAILURE

    def reset(self) -> None:
        # wrap pointer deliberately persists (round-robin across rounds)
        for c in self.children:
            c.reset()


class ReactiveFallback(Node):
    """Fallback that restarts from its FIRST child every tick — a
    higher-priority condition (e.g. GoalUpdated) can preempt a running
    recovery (BehaviorTree.CPP ReactiveFallback, used by the reference's
    RecoveryFallback subtree)."""

    def __init__(self, children: List[Node]):
        self.children = list(children)

    def tick(self) -> Status:
        for c in self.children:
            s = c.tick()
            if s != Status.FAILURE:
                return s
        return Status.FAILURE

    def reset(self) -> None:
        for c in self.children:
            c.reset()


class RateController(Node):
    """Gates its child to at most ``hz``: ticks it on the first activation,
    whenever it is RUNNING, or when the period has elapsed; otherwise
    returns RUNNING without ticking (reference nav2_behavior_tree/plugins/
    decorator/rate_controller.cpp).  Periods count control ticks of
    duration ``dt``."""

    def __init__(self, child: Node, hz: float, dt: float):
        self.child = child
        self.period_ticks = max(1, int(round(1.0 / (float(hz) * dt))))
        self._since = None  # None -> first activation
        self._child_running = False

    def tick(self) -> Status:
        if self._since is not None:
            self._since += 1
        due = (
            self._since is None
            or self._child_running
            or self._since >= self.period_ticks
        )
        if not due:
            return Status.RUNNING
        s = self.child.tick()
        self._child_running = s == Status.RUNNING
        if not self._child_running:
            self._since = 0
        return s

    def reset(self) -> None:
        self._since = None
        self._child_running = False
        self.child.reset()


# ----------------------------------------------------------------- XML parser


def parse_bt_xml(
    xml_text: str,
    registry: Dict[str, Callable[[ET.Element, List[Node]], Node]],
) -> Node:
    """Build a tree from BehaviorTree.CPP-style XML.

    ``registry`` maps tag name -> factory(elem, children) -> Node.  Handles
    ``<root main_tree_to_execute>``, multiple ``<BehaviorTree ID=...>``
    definitions, and ``<SubTree ID=.../>`` expansion (each expansion builds
    a fresh node instance).  Reference format:
    nav2_bt_navigator/behavior_trees/*.xml.
    """
    root = ET.fromstring(xml_text)
    if root.tag != "root":
        raise ValueError(f"expected <root>, got <{root.tag}>")
    trees = {t.get("ID"): t for t in root if t.tag == "BehaviorTree"}
    if not trees:
        raise ValueError("no <BehaviorTree> definitions")
    main_id = root.get("main_tree_to_execute") or next(iter(trees))
    if main_id not in trees:
        raise ValueError(f"main tree {main_id!r} not defined")

    def build(elem: ET.Element, depth: int = 0) -> Node:
        if depth > 32:
            raise ValueError("behavior tree nesting/recursion too deep")
        if elem.tag == "SubTree":
            sid = elem.get("ID")
            if sid not in trees:
                raise ValueError(f"SubTree {sid!r} not defined")
            return build(_single_child(trees[sid]), depth + 1)
        children = [build(c, depth + 1) for c in elem]
        factory = registry.get(elem.tag)
        if factory is None:
            raise ValueError(f"unknown BT node <{elem.tag}>")
        return factory(elem, children)

    return build(_single_child(trees[main_id]))


def _single_child(tree_elem: ET.Element) -> ET.Element:
    kids = list(tree_elem)
    if len(kids) != 1:
        raise ValueError("<BehaviorTree> must have exactly one root child")
    return kids[0]


# ------------------------------------------------------------------ nav leaves


class ComputePathToPose(Node):
    """Plan with the selected planner and publish the path to a blackboard
    port (reference nav2_behavior_tree/plugins/action/
    compute_path_to_pose_action.cpp; planner selected by ``planner_id`` as
    in nav2_planner's plugin map)."""

    def __init__(self, nav: "XMLNavigator", goal: _PortRef, path: _PortRef,
                 planner_id: str):
        self.nav = nav
        self.goal = goal
        self.path = path
        self.planner_id = planner_id

    def tick(self) -> Status:
        goal = self.goal.read()
        if goal is None:
            return Status.FAILURE
        plan = self.nav.plan(np.asarray(self.nav.get_pose()[:2]),
                             np.asarray(goal, np.float64)[:2],
                             self.planner_id)
        if plan is None or not len(plan):
            return Status.FAILURE
        self.path.write(plan)
        return Status.SUCCESS


class FollowPath(Node):
    """One control step per tick along the blackboard path through the
    selected controller + collision monitor + smoother; RUNNING until the
    goal is reached, FAILURE on stall or missing path (reference
    nav2_behavior_tree/plugins/action/follow_path_action.cpp +
    nav2_controller's FollowPath action; ``controller_id`` selects the
    controller plugin as in g1.yaml's controller_server map)."""

    def __init__(self, nav: "XMLNavigator", path: _PortRef, controller_id: str):
        self.nav = nav
        self.path = path
        self.controller_id = controller_id
        self._last_pos: Optional[np.ndarray] = None
        self._stall = 0

    def tick(self) -> Status:
        nav = self.nav
        plan = self.path.read()
        if plan is None or not len(plan):
            return Status.FAILURE
        pose = nav.get_pose()
        pos = np.array(pose[:2])
        if np.linalg.norm(pos - nav.goal_xy) < nav.goal_radius:
            nav.send_velocity(0.0, 0.0, 0.0)
            self.reset()
            return Status.SUCCESS
        ctrl = nav.controller_for(self.controller_id)
        # controllers prune at score time; passing the full plan keeps the
        # DWA path-wavefront cache key stable across the goal
        v, w = ctrl.compute_velocity(pose, nav._vel, plan, nav.goal_xy)
        v, w = nav.monitor.filter(pose, v, w)
        v, w = nav.smoother.smooth(v, w)
        nav._vel = (v, w)
        nav.send_velocity(v, 0.0, w)
        if self._last_pos is not None and np.linalg.norm(pos - self._last_pos) < 1e-3:
            self._stall += 1
        else:
            self._stall = 0
        self._last_pos = pos
        if self._stall > nav.stall_ticks:
            nav.send_velocity(0.0, 0.0, 0.0)
            self.reset()
            return Status.FAILURE
        return Status.RUNNING

    def reset(self) -> None:
        self._last_pos = None
        self._stall = 0


class ClearEntireCostmap(Node):
    """Reset the costmap's dynamic content back to the pristine static map
    (reference nav2_behavior_tree/plugins/action/clear_costmap_service.cpp
    calling nav2_costmap_2d's clear_entirely service)."""

    def __init__(self, nav: "XMLNavigator", service_name: str = ""):
        self.nav = nav
        self.service_name = service_name

    def tick(self) -> Status:
        self.nav.clear_costmap(self.service_name)
        return Status.SUCCESS


class IsPathValid(Node):
    """Condition: SUCCESS while every waypoint of the blackboard path is
    still traversable on the (possibly updated) costmap (reference
    nav2_behavior_tree/plugins/condition/is_path_valid_condition.cpp — the
    trigger of the navigate_w_replanning_only_if_path_becomes_invalid
    tree)."""

    def __init__(self, nav: "XMLNavigator", path: _PortRef):
        self.nav = nav
        self.path = path

    def tick(self) -> Status:
        plan = self.path.read()
        if plan is None or not len(plan):
            return Status.FAILURE
        pts = np.array([p[:2] for p in plan])
        costs = self.nav.costmap.cost_at_world(pts)
        return Status.FAILURE if costs.max(initial=0) >= INSCRIBED else Status.SUCCESS


class GoalUpdated(Node):
    """Condition: SUCCESS iff set_goal was called since this node last
    observed it (reference nav2_behavior_tree/plugins/condition/
    goal_updated_condition.cpp — lets a new goal preempt recovery)."""

    def __init__(self, nav: "XMLNavigator"):
        self.nav = nav
        self._seen = nav.goal_version

    def tick(self) -> Status:
        if self.nav.goal_version != self._seen:
            self._seen = self.nav.goal_version
            return Status.SUCCESS
        return Status.FAILURE

    def reset(self) -> None:
        self._seen = self.nav.goal_version


# ------------------------------------------------------------------ navigator

#: Original default tree with the same shape the reference's bt_navigator
#: ships (navigate_to_pose_w_replanning_and_recovery.xml role): periodic
#: replanning piped into path following, per-stage costmap-clear retries,
#: and a goal-preemptable round-robin recovery fallback.
DEFAULT_TREE_XML = """
<root main_tree_to_execute="Navigate">
  <BehaviorTree ID="Navigate">
    <RecoveryNode number_of_retries="6" name="NavigateRecovery">
      <PipelineSequence name="NavigateWithReplanning">
        <RateController hz="1.0">
          <RecoveryNode number_of_retries="1" name="PlanRecovery">
            <ComputePathToPose goal="{goal}" path="{path}" planner_id="GridBased"/>
            <ClearEntireCostmap service_name="global"/>
          </RecoveryNode>
        </RateController>
        <RecoveryNode number_of_retries="1" name="FollowRecovery">
          <FollowPath path="{path}" controller_id="FollowPath"/>
          <ClearEntireCostmap service_name="local"/>
        </RecoveryNode>
      </PipelineSequence>
      <ReactiveFallback name="RecoveryFallback">
        <GoalUpdated/>
        <RoundRobin name="RecoveryActions">
          <ClearEntireCostmap service_name="both"/>
          <Spin spin_dist="1.57"/>
          <Wait wait_duration="1.0"/>
          <BackUp backup_dist="0.3" backup_speed="0.15"/>
        </RoundRobin>
      </ReactiveFallback>
    </RecoveryNode>
  </BehaviorTree>
</root>
"""


#: Second stock tree (the reference's
#: navigate_w_replanning_only_if_path_becomes_invalid.xml role): plan once,
#: follow, and replan ONLY when the current path crosses newly-lethal cells.
REPLAN_IF_INVALID_TREE_XML = """
<root main_tree_to_execute="Navigate">
  <BehaviorTree ID="Navigate">
    <RecoveryNode number_of_retries="6" name="NavigateRecovery">
      <PipelineSequence name="NavigateLazyReplan">
        <RateController hz="2.0">
          <ReactiveFallback name="PlanIfInvalid">
            <IsPathValid path="{path}"/>
            <ComputePathToPose goal="{goal}" path="{path}" planner_id="GridBased"/>
          </ReactiveFallback>
        </RateController>
        <FollowPath path="{path}" controller_id="FollowPath"/>
      </PipelineSequence>
      <ReactiveFallback name="RecoveryFallback">
        <GoalUpdated/>
        <RoundRobin name="RecoveryActions">
          <ClearEntireCostmap service_name="both"/>
          <Wait wait_duration="1.0"/>
        </RoundRobin>
      </ReactiveFallback>
    </RecoveryNode>
  </BehaviorTree>
</root>
"""


class XMLNavigator:
    """bt_navigator role: loads an XML behavior tree and drives navigation
    through it at the control rate.  Same external surface as
    ``behaviors.BTNavigator`` (set_goal / tick) so
    ``agent.waypoint_navigator`` can use either.

    Planner/controller plugin maps mirror the reference's server config
    (g1_navigation2/param/g1.yaml planner_server/controller_server):
    ``GridBased`` → A*, ``FollowPath`` → DWA (DWB role), ``RPP`` →
    regulated pure pursuit.
    """

    def __init__(
        self,
        costmap: Costmap,
        send_velocity: Callable[[float, float, float], None],
        get_pose: Callable[[], Tuple[float, float, float]],
        tree_xml: str = DEFAULT_TREE_XML,
        goal_radius: float = 0.3,
        stall_ticks: int = 15,
        dt: float = 0.1,
        controllers: Optional[Dict[str, object]] = None,
        extra_nodes: Optional[Dict[str, Callable]] = None,
        path_smoother=None,  # nav.smoother plugin (SimpleSmoother, ...) or None
    ):
        self.costmap = costmap
        self._pristine_cost = costmap.cost.copy()
        self.send_velocity = send_velocity
        self.get_pose = get_pose
        self.goal_radius = goal_radius
        self.stall_ticks = stall_ticks
        self.dt = dt
        self.controllers = controllers or {
            "FollowPath": DWAController(costmap),
            "RPP": RPPController(costmap),
            "MPPI": MPPIController(costmap),
        }
        self.path_smoother = path_smoother
        first = next(iter(self.controllers.values()))
        self.smoother = VelocitySmoother(
            v_max=getattr(first, "v_max", 0.5), w_max=getattr(first, "w_max", 1.0)
        )
        self.monitor = CollisionMonitor(costmap)
        self.blackboard = Blackboard()
        self.goal_xy = np.zeros(2)
        self.goal_version = 0
        self._vel = (0.0, 0.0)
        self.costmap_clears: List[str] = []  # observability: which clears ran

        reg = self._registry()
        if extra_nodes:
            reg.update(extra_nodes)
        self._tree = parse_bt_xml(tree_xml, reg)

    # -- plugin surface ------------------------------------------------------

    def plan(self, start_xy, goal_xy, planner_id: str):
        if planner_id == "GridBased":
            plan = astar_plan(self.costmap, start_xy, goal_xy)
        elif planner_id == "SmacHybrid":
            from .smac import smac_plan

            yaw = self.get_pose()[2]
            plan = smac_plan(self.costmap, start_xy, goal_xy, start_yaw=yaw)
        elif planner_id == "ThetaStar":
            from .theta_star import theta_star_plan

            plan = theta_star_plan(self.costmap, start_xy, goal_xy)
        else:
            raise ValueError(f"unknown planner_id {planner_id!r}")
        if plan is not None and len(plan) and self.path_smoother is not None:
            # the nav2 smoother server sits between planner and controller
            # (reference nav2_smoother/src/nav2_smoother.cpp; bringup wires
            # SmoothPath after ComputePathToPose); collision-guarded against
            # this costmap
            plan = list(self.path_smoother.smooth(plan, self.costmap))
        return plan

    def controller_for(self, controller_id: str):
        try:
            return self.controllers[controller_id]
        except KeyError:
            raise ValueError(f"unknown controller_id {controller_id!r}") from None

    def clear_costmap(self, service_name: str) -> None:
        self.costmap.cost[...] = self._pristine_cost
        self.costmap.bump_version()  # invalidate wavefront-field caches
        self.costmap_clears.append(service_name)

    # -- registry ------------------------------------------------------------

    def _registry(self) -> Dict[str, Callable]:
        nav = self

        def attr_f(e, name, default):
            v = e.get(name)
            return float(v) if v is not None else default

        return {
            "Sequence": lambda e, ch: Sequence(ch),
            "Fallback": lambda e, ch: Fallback(ch),
            "ReactiveFallback": lambda e, ch: ReactiveFallback(ch),
            "PipelineSequence": lambda e, ch: PipelineSequence(ch),
            "RoundRobin": lambda e, ch: RoundRobin(ch),
            "RecoveryNode": lambda e, ch: RecoveryNode(
                ch, int(e.get("number_of_retries", 1))
            ),
            "RateController": lambda e, ch: RateController(
                _only(ch), attr_f(e, "hz", 1.0), nav.dt
            ),
            "ComputePathToPose": lambda e, ch: ComputePathToPose(
                nav,
                _PortRef(nav.blackboard, e.get("goal", "{goal}")),
                _PortRef(nav.blackboard, e.get("path", "{path}")),
                e.get("planner_id", "GridBased"),
            ),
            "FollowPath": lambda e, ch: FollowPath(
                nav,
                _PortRef(nav.blackboard, e.get("path", "{path}")),
                e.get("controller_id", "FollowPath"),
            ),
            "ClearEntireCostmap": lambda e, ch: ClearEntireCostmap(
                nav, e.get("service_name", "")
            ),
            "GoalUpdated": lambda e, ch: GoalUpdated(nav),
            "IsPathValid": lambda e, ch: IsPathValid(
                nav, _PortRef(nav.blackboard, e.get("path", "{path}"))
            ),
            "Spin": lambda e, ch: TimedCommand(
                nav.send_velocity, 0.0, 0.8,
                abs(attr_f(e, "spin_dist", 1.57)) / 0.8, nav.dt
            ),
            "BackUp": lambda e, ch: TimedCommand(
                nav.send_velocity,
                -abs(attr_f(e, "backup_speed", 0.15)), 0.0,
                abs(attr_f(e, "backup_dist", 0.3))
                / abs(attr_f(e, "backup_speed", 0.15)),
                nav.dt,
            ),
            "Wait": lambda e, ch: TimedCommand(
                nav.send_velocity, 0.0, 0.0, attr_f(e, "wait_duration", 2.0), nav.dt
            ),
        }

    # -- BTNavigator-compatible surface ---------------------------------------

    def set_goal(self, goal_xy: np.ndarray) -> None:
        self.goal_xy = np.asarray(goal_xy, np.float64)[:2]
        self.blackboard.set("goal", self.goal_xy)
        self.goal_version += 1
        self._vel = (0.0, 0.0)
        self._tree.reset()

    def tick(self) -> Status:
        return self._tree.tick()


def _only(children: List[Node]) -> Node:
    if len(children) != 1:
        raise ValueError("decorator requires exactly one child")
    return children[0]
