import numpy as np
import pytest

from holoagent_tpu.dataloader import SyntheticScene
from holoagent_tpu.eval import GTGraph, HMSGEvaluator, gt_from_synthetic
from holoagent_tpu.eval.metrics import confusion_matrix, segmentation_metrics
from holoagent_tpu.memory.hmsg import HMSGraph
from holoagent_tpu.memory.nodes import Floor, Object, Room


def _graph_from_gt(gt: GTGraph, jitter=0.0, rng=None) -> HMSGraph:
    """A predicted graph that mirrors the GT (optionally perturbed)."""
    rng = rng or np.random.default_rng(0)
    g = HMSGraph()
    for f in gt.floors:
        fl = Floor(str(f.id), name=f"floor_{f.id}")
        fl.floor_zero_level = f.lower + jitter
        fl.floor_height = f.upper - f.lower
        fl.pcd_points = np.zeros((1, 3))
        fl.pcd_colors = np.zeros((1, 3))
        fl.vertices = np.zeros((8, 3))
        g.floors.append(fl)
    for r in gt.rooms:
        room = Room(f"{r.floor_id}_{r.id}", str(r.floor_id), name=r.category)
        pts2 = r.bev_points + rng.normal(0, jitter, r.bev_points.shape)
        room.vertices = pts2
        room.pcd_points = np.c_[pts2, np.full(len(pts2), r.min_height)]
        room.pcd_colors = np.zeros_like(room.pcd_points)
        room.room_zero_level = r.min_height
        room.room_height = r.max_height - r.min_height
        g.floors[r.floor_id].add_room(room)
        g.rooms.append(room)
    for o in gt.objects:
        obj = Object(f"0_{o.region_id}_{o.id}", f"0_{o.region_id}", name=o.category)
        pts = o.points + rng.normal(0, jitter, o.points.shape)
        obj.pcd_points = pts
        obj.pcd_colors = np.zeros_like(pts)
        obj.vertices = pts[:, :2]
        emb = np.zeros(16, np.float32)
        emb[o.id % 16] = 1.0
        obj.embedding = emb
        g.rooms[o.region_id].add_object(obj)
        g.objects.append(obj)
    g._build_nx()
    return g


@pytest.fixture(scope="module")
def gt():
    return gt_from_synthetic(SyntheticScene.two_room())


def test_gt_json_roundtrip(gt, tmp_path):
    p = tmp_path / "scene_info.json"
    gt.to_json(p)
    gt2 = GTGraph.from_json(p)
    assert len(gt2.floors) == len(gt.floors)
    assert len(gt2.rooms) == len(gt.rooms)
    assert len(gt2.objects) == len(gt.objects)
    np.testing.assert_allclose(gt2.objects[0].center, gt.objects[0].center)
    assert gt2.objects[0].points.shape[0] > 0  # plys round-trip


def test_perfect_prediction_scores_high(gt):
    pred = _graph_from_gt(gt, jitter=0.0)
    ev = HMSGEvaluator(gt)
    m = ev.evaluate_all(pred)
    assert m["floors"]["mean_bound_error"] < 0.1
    assert m["rooms"]["precision"] == 1.0 and m["rooms"]["recall"] == 1.0
    assert m["objects"]["prec_at_50"] == 1.0
    assert m["objects"]["auc"] > 0.8


def test_degraded_prediction_scores_lower(gt):
    rng = np.random.default_rng(1)
    pred = _graph_from_gt(gt, jitter=0.4, rng=rng)
    # drop half the objects
    pred.objects = pred.objects[::2]
    ev = HMSGEvaluator(gt)
    m = ev.evaluate_all(pred)
    good = HMSGEvaluator(gt).evaluate_all(_graph_from_gt(gt))
    assert m["objects"]["rec_at_50"] < good["objects"]["rec_at_50"]


def test_semantic_topk(gt):
    pred = _graph_from_gt(gt)
    # text feats: one-hot matching object embeddings by id order
    classes = [o.category for o in gt.objects]
    tf = np.zeros((len(classes), 16), np.float32)
    for i in range(len(classes)):
        tf[i, i % 16] = 1.0
    ev = HMSGEvaluator(gt)
    m = ev.evaluate_objects(pred, gt_text_feats=tf, gt_classes=classes)
    assert m["semantic_top_k"][1] == 1.0
    # reference-style AUC integrates top-k accuracy over k/num_classes
    assert m["semantic_auc"] > 0.0


def test_segmentation_metrics():
    gt_img = np.array([[0, 0, 1, 1], [2, 2, -1, -1]])
    pred = np.array([[0, 1, 1, 1], [2, 2, 0, 0]])
    conf = confusion_matrix(pred, gt_img, 3)
    m = segmentation_metrics(conf)
    assert 0 < m["mIoU"] < 1
    assert m["pAcc"] == 5 / 6
