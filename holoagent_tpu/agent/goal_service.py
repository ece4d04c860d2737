"""Semantic goal service: the goal_pose_publisher equivalent.

Rebuild of reference nav_agent/sem_nav_ctr/.../goal_pose_publisher.py:52-271:
subscribe text (there: /chat_loc_pub; here: a zmq REP socket or direct call),
run the hierarchical query, gate on the retrieval score (<0.15 reports
"not_found", :240-252), transform the object center into the robot map frame
(T_tomap, :76-78,263-271) and hand out the goal pose plus the nav-graph
waypoint chain.
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..memory import navgraph
from ..query.engine import FSRQueryEngine
from ..utils.eventlog import EventLog


@dataclass
class GoalResult:
    found: bool
    text: str
    object_id: Optional[str] = None
    object_name: Optional[str] = None
    score: float = 0.0
    goal_pose: Optional[np.ndarray] = None  # (4, 4) in the robot map frame
    waypoints: List[np.ndarray] = field(default_factory=list)

    def to_json(self) -> str:
        return json.dumps(
            {
                "found": self.found,
                "text": self.text,
                "object_id": self.object_id,
                "object_name": self.object_name,
                "score": self.score,
                "goal_pose": self.goal_pose.tolist() if self.goal_pose is not None else None,
                "waypoints": [w.tolist() for w in self.waypoints],
            }
        )


class GoalService:
    def __init__(
        self,
        engine: FSRQueryEngine,
        nav_graph=None,
        t_tomap: Optional[np.ndarray] = None,  # HMSG -> robot map frame
        score_threshold: float = 0.15,  # reference :240-252
        robot_position: Optional[np.ndarray] = None,
        log: Optional[EventLog] = None,
    ):
        self.engine = engine
        self.nav_graph = nav_graph
        self.t_tomap = np.eye(4) if t_tomap is None else np.asarray(t_tomap)
        self.score_threshold = score_threshold
        self.robot_position = (
            np.zeros(3) if robot_position is None else np.asarray(robot_position)
        )
        self.log = log

    def query(self, text: str, use_slow: bool = False) -> GoalResult:
        floor, rooms, objs, res = self.engine.query_hierarchy(
            text, top_k=1, use_slow=use_slow
        )
        scores = res.get("scores", [])
        score = float(scores[0]) if scores else 0.0
        if not objs or score < self.score_threshold:
            if self.log:
                self.log.emit("goal_not_found", text=text, score=score)
            return GoalResult(found=False, text=text, score=score)
        obj = objs[0]
        center_h = np.append(obj.center(), 1.0)
        center_map = (self.t_tomap @ center_h)[:3]
        pose = np.eye(4)
        pose[:3, 3] = center_map
        waypoints: List[np.ndarray] = []
        if self.nav_graph is not None:
            waypoints = navgraph.plan_path(
                self.nav_graph, self.robot_position, obj.center()
            )
            waypoints = [(self.t_tomap @ np.append(w, 1.0))[:3] for w in waypoints]
        if self.log:
            self.log.emit(
                "goal_found", text=text, object_id=obj.object_id, score=score,
                waypoints=len(waypoints),
            )
        return GoalResult(
            found=True,
            text=text,
            object_id=obj.object_id,
            object_name=obj.name,
            score=score,
            goal_pose=pose,
            waypoints=waypoints,
        )

    # ------------------------------------------------------------- zmq server

    def serve_zmq(self, endpoint: str = "tcp://127.0.0.1:5601") -> threading.Thread:
        """REP socket: recv text query -> send GoalResult JSON. The host-side
        ROS bridge connects here (the host<->TPU boundary of SURVEY.md §5.8)."""
        import zmq

        def loop():
            ctx = zmq.Context.instance()
            sock = ctx.socket(zmq.REP)
            sock.bind(endpoint)
            while True:
                msg = sock.recv_string()
                if msg == "__shutdown__":
                    sock.send_string("{}")
                    break
                try:
                    req = json.loads(msg) if msg.startswith("{") else {"text": msg}
                    result = self.query(req["text"], use_slow=req.get("slow", False))
                    sock.send_string(result.to_json())
                except Exception as e:  # keep the service alive
                    sock.send_string(json.dumps({"found": False, "error": str(e)}))
            sock.close()

        t = threading.Thread(target=loop, daemon=True)
        t.start()
        return t
