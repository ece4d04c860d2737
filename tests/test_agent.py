"""End-to-end agent glue: text -> goal -> waypoints -> shaped velocities."""

import json

import numpy as np
import pytest

from holoagent_tpu.agent import GoalService, WaypointNavigator
from holoagent_tpu.memory import navgraph
from holoagent_tpu.native import VelocityBridge

# reuse the hand-built graph + fake-text engine from the query tests
from tests.test_query import FakeTextEngine, synthetic_graph  # noqa: F401
import networkx as nx


@pytest.fixture()
def engine(synthetic_graph):  # noqa: F811
    from holoagent_tpu.models import clip as clip_mod

    return FakeTextEngine(
        synthetic_graph, None, None, clip_mod.VARIANTS["test-tiny"],
        image_provider=None,
    )


def _line_graph():
    g = nx.Graph()
    nodes = [(float(i), 0.0, 0) for i in range(6)]
    for i, n in enumerate(nodes):
        g.add_node(n, pos=(i * 1.0, 0.0, 0.0), floor_id=0)
    for a, b in zip(nodes[:-1], nodes[1:]):
        g.add_edge(a, b, dist=1.0)
    return g


def test_goal_service_found_and_gated(engine):
    svc = GoalService(engine, nav_graph=_line_graph(), score_threshold=0.15)
    res = svc.query("towel in region bathroom on floor 1")
    assert res.found and res.object_id == "0_1_1"
    assert res.goal_pose is not None
    assert len(res.waypoints) >= 1
    # nonsense query -> scores low -> not_found (reference gate semantics)
    res2 = svc.query("flibbertigibbet in region bathroom on floor 1")
    assert not res2.found


def test_goal_service_frame_transform(engine):
    t = np.eye(4)
    t[:3, 3] = [10.0, 0.0, 0.0]
    svc = GoalService(engine, t_tomap=t, score_threshold=0.0)
    res = svc.query("towel in region bathroom on floor 1")
    obj = next(o for o in engine.g.objects if o.object_id == res.object_id)
    np.testing.assert_allclose(res.goal_pose[:3, 3], obj.center() + [10, 0, 0], atol=1e-6)


def test_goal_service_zmq_roundtrip(engine):
    pytest.importorskip("zmq")
    import zmq

    svc = GoalService(engine, score_threshold=0.0)
    endpoint = "tcp://127.0.0.1:5799"
    svc.serve_zmq(endpoint)
    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.REQ)
    sock.connect(endpoint)
    sock.send_string("towel in region bathroom on floor 1")
    reply = json.loads(sock.recv_string())
    assert reply["found"] and reply["object_id"] == "0_1_1"
    sock.send_string("__shutdown__")
    sock.recv_string()
    sock.close()


def test_waypoint_navigator_reaches_goal(tmp_path):
    """Simulated unicycle robot driven through the REAL fifo bridge."""
    vb = VelocityBridge(str(tmp_path / "fifo"))
    pose = np.eye(4)
    reached = []

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

    nav = WaypointNavigator(
        send_vel, lambda: pose.copy(), waypoint_radius=0.25,
        on_waypoint_reached=lambda i: reached.append(i),
    )
    nav.set_goal([np.array([1.0, 0.0, 0.0]), np.array([1.0, 1.0, 0.0])])
    for _ in range(500):
        if not nav.step():
            break
    assert nav.done and not nav._stopped
    assert reached == [0, 1]
    np.testing.assert_allclose(pose[:2, 3], [1.0, 1.0], atol=0.3)
    vb.close()


def test_waypoint_navigator_stop(tmp_path):
    cmds = []
    nav = WaypointNavigator(
        lambda x, y, r: cmds.append((x, y, r)), lambda: np.eye(4)
    )
    nav.set_goal([np.array([5.0, 0.0, 0.0])])
    nav.step()
    nav.stop()
    assert nav.done
    assert cmds[-1] == (0.0, 0.0, 0.0)
