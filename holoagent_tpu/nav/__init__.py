"""Host-side navigation planning/control.

The reference vendors ROS 2 Nav2 and configures NavFn global planning + DWB
local control for the robot (reference nav_agent/.../g1_navigation2/param/
g1.yaml:50-286).  This package provides the same planning/control capability
as self-contained components: an inflated costmap from the scene's occupancy
raster, A* global planning on it, two local controller families (the
dynamic-window trajectory-rollout DWB role and the regulated-pure-pursuit RPP
role, selectable via make_controller), and an AMCL-role particle-filter
localizer with kidnapped-robot recovery, plus data-driven XML behavior trees
(bt_xml.py, the nav2_bt_navigator role) — so the framework can close the loop
without a vendored navigation stack (deployments with ROS 2 keep using Nav2
through the agent glue instead).
"""

from .costmap import Costmap
from .planner import astar_plan
from .smac import SmacHybridPlanner, smac_plan
from .theta_star import ThetaStarPlanner, theta_star_plan
from .controller import DWAController
from .localizer import ParticleLocalizer, simulate_scan
from .obstacle_layer import ObstacleLayer, simulate_scan_2d
from .rpp import RPPController
from .mppi import MPPIController
from .graceful import GracefulController, RotationShimController, SmoothControlLaw
from .smoother import SavitzkyGolaySmoother, SimpleSmoother, SmootherServer


def make_controller(name: str, costmap, **kwargs):
    """Controller-family selector (the reference picks its controller plugin
    by name in g1.yaml:50-55: DWB there; RPP/MPPI/graceful/rotation-shim are
    sibling packages)."""
    if name in ("dwb", "dwa"):
        return DWAController(costmap, **kwargs)
    if name == "rpp":
        return RPPController(costmap, **kwargs)
    if name == "mppi":
        return MPPIController(costmap, **kwargs)
    if name == "graceful":
        return GracefulController(costmap, **kwargs)
    if name == "rotation_shim":
        # shim wraps a primary family (reference: the shim's `primary_controller`
        # parameter); default to the g1 DWB role
        primary = kwargs.pop("primary", None) or DWAController(costmap)
        return RotationShimController(primary, **kwargs)
    raise KeyError(
        f"unknown controller family {name!r} "
        "(dwb | rpp | mppi | graceful | rotation_shim)"
    )


from .bt_xml import XMLNavigator, parse_bt_xml, DEFAULT_TREE_XML
from .behaviors import (
    BTNavigator,
    BackupRecovery,
    CollisionMonitor,
    Fallback,
    Retry,
    Sequence,
    SpinRecovery,
    Status,
    VelocitySmoother,
    WaitRecovery,
)
