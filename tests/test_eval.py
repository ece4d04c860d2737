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


# ---------------------------------------------------------------------------
# Long-query dataset generation + scoring (reference long_query_eval_utils)
# ---------------------------------------------------------------------------


def _toy_gt():
    from holoagent_tpu.eval import GTFloor, GTGraph, GTObject, GTRoom

    g = GTGraph()
    g.floors.append(GTFloor(0, 0.0, 3.0))
    sq = lambda x0, y0, x1, y1: np.array(
        [[x, y] for x in np.linspace(x0, x1, 8) for y in np.linspace(y0, y1, 8)]
    )
    g.rooms.append(GTRoom(0, 0, "kitchen", sq(0, 0, 4, 4), 0.0, 3.0))
    g.rooms.append(GTRoom(1, 0, "bedroom", sq(4, 0, 8, 4), 0.0, 3.0))
    g.rooms.append(GTRoom(2, 0, "kitchen", sq(0, 4, 4, 8), 0.0, 3.0))  # 2nd kitchen
    mk = lambda oid, rid, cat, c: GTObject(
        oid, rid, 0, cat, np.array([c]), np.asarray(c, float), np.ones(3) * 0.5
    )
    g.objects.append(mk(0, 0, "chair", [1.0, 1.0, 0.5]))
    g.objects.append(mk(1, 1, "chair", [5.0, 1.0, 0.5]))
    g.objects.append(mk(2, 2, "chair", [1.0, 5.0, 0.5]))  # chair in other kitchen
    g.objects.append(mk(3, 1, "bed", [6.0, 2.0, 0.5]))
    return g


def test_long_query_generation_aggregates_answers():
    from holoagent_tpu.eval import generate_long_queries

    qs = generate_long_queries(_toy_gt())
    by_text = {q.text: q for q in qs}
    # unique (object cat, room cat, floor) triples: chair/kitchen, chair/bedroom, bed/bedroom
    assert len(qs) == 3
    ck = by_text["chair in region kitchen on floor 1"]
    assert sorted(a[2] for a in ck.answers) == [0, 2]  # both kitchens' chairs
    cb = by_text["chair in region bedroom on floor 1"]
    assert [a[2] for a in cb.answers] == [1]


def test_long_query_scoring():
    from holoagent_tpu.eval import generate_long_queries, score_long_queries

    gt = _toy_gt()
    qs = generate_long_queries(gt)
    qs.sort(key=lambda q: q.text)
    # predictions: answer the second kitchen's chair for the kitchen query
    # (valid — multi-answer), the right bed, and a wrong room for chair/bedroom
    preds = []
    for q in qs:
        if q.text.startswith("bed "):
            preds.append(
                {"floor_id": 0, "room_center": [6.0, 2.0], "object_center": [6.0, 2.0, 0.5]}
            )
        elif "kitchen" in q.text:
            preds.append(
                {"floor_id": 0, "room_center": [1.0, 5.0], "object_center": [1.1, 5.0, 0.5]}
            )
        else:  # chair in bedroom: wrong object, wrong room
            preds.append(
                {"floor_id": 0, "room_center": [1.0, 1.0], "object_center": [0.0, 0.0, 0.0]}
            )
    rep = score_long_queries(qs, preds, gt)
    assert rep.n_queries == 3
    assert rep.floor_acc == 1.0
    assert abs(rep.room_acc - 2 / 3) < 1e-9
    assert abs(rep.object_acc - 2 / 3) < 1e-9
