"""Agent glue: voice/text -> semantic goal -> waypoints -> velocity.

The TPU-side half of the reference's online mission stack (SURVEY.md §3.3):
goal_service is the goal_pose_publisher equivalent (text query -> HMSG
retrieval -> gated goal pose), waypoint_navigator the pubpose equivalent
(goal -> nav-graph waypoints -> velocity commands through the native FIFO
bridge).  The ROS 2 / DDS world stays host-side and talks to these over zmq.
"""

from .goal_service import GoalService, GoalResult
from .voice_client import VoiceClient
from .waypoint_navigator import WaypointNavigator
