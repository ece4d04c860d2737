"""End-to-end accuracy protocol: production mapping pipeline with oracle
perception must reconstruct the synthetic scene's graph (the golden
multi-room fixture check — floors, rooms, objects, semantics)."""

from holoagent_tpu.apps import eval_protocol


def test_protocol_scores_on_two_room_fixture():
    m = eval_protocol.run_one(0)
    # floors: bounds recovered within the voxel/coverage tolerance
    assert m["floors"]["num_pred"] == 1
    assert m["floors"]["mean_bound_error"] < 0.3
    # rooms: both GT rooms found at 0.5 BEV overlap
    assert m["rooms"]["precision"] == 1.0
    assert m["rooms"]["recall"] == 1.0
    # objects: all six found, few spurious (radius-tolerant merge keeps
    # multi-view objects whole; see memory/instances.py merge_round)
    assert m["objects"]["rec_at_50"] == 1.0
    assert m["objects"]["prec_at_50"] >= 0.8
    assert m["objects"]["auc"] > 0.8
    # semantics: one-hot oracle embeddings survive fusion + merge + denoise
    assert m["objects"]["semantic_top_k"][1] == 1.0
