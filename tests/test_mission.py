"""Full online-mission chain (SURVEY.md §3.3): voice transcript over a real
WebSocket -> GoalService HMSG query -> waypoint navigation -> velocities
through the real FIFO bridge -> simulated unicycle robot -> waypoint_reached
feedback back to the voice server."""

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
