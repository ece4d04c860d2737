import jax.numpy as jnp
import numpy as np

from holoagent_tpu.memory import instances as inst_mod
from holoagent_tpu.ops.compact import I32_MAX


def _mk_inst(row_sets, feats=None, d=4, k_cap=16, i_cap=None):
    i_cap = i_cap or len(row_sets)
    inst = inst_mod.empty_instances(i_cap, k_cap, d)
    rows = np.full((i_cap, k_cap), int(I32_MAX), np.int32)
    count = np.zeros(i_cap, np.int32)
    valid = np.zeros(i_cap, bool)
    bmin = np.full((i_cap, 3), np.inf, np.float32)
    bmax = np.full((i_cap, 3), -np.inf, np.float32)
    feat = np.zeros((i_cap, d), np.float32)
    w = np.zeros(i_cap, np.float32)
    for i, rs in enumerate(row_sets):
        rs = sorted(rs)
        rows[i, : len(rs)] = rs
        count[i] = len(rs)
        valid[i] = True
        # synthetic bbox: rows interpreted as x coordinate
        bmin[i] = [min(rs), 0, 0]
        bmax[i] = [max(rs) + 1, 1, 1]
        feat[i] = feats[i] if feats is not None else np.eye(d)[i % d]
        w[i] = 1.0
    return inst._replace(
        rows=jnp.asarray(rows),
        count=jnp.asarray(count),
        valid=jnp.asarray(valid),
        bbox_min=jnp.asarray(bmin),
        bbox_max=jnp.asarray(bmax),
        feat_sum=jnp.asarray(feat),
        weight=jnp.asarray(w),
    )


def test_merge_combines_overlapping():
    # A and B share 3 of 4 rows (75% overlap of the smaller); C is disjoint
    inst = _mk_inst([[1, 2, 3, 4], [2, 3, 4], [100, 101, 102]])
    out = inst_mod.merge_round(inst, overlap_thresh=0.7, iou_thresh=0.05, out_cap=3)
    assert int(out.num()) == 2
    rows0 = np.asarray(out.rows)[0]
    got = set(rows0[rows0 != int(I32_MAX)].tolist())
    assert got == {1, 2, 3, 4}  # union, largest-first
    assert float(np.asarray(out.weight)[0]) == 2.0  # merged observation weights


def test_merge_respects_threshold():
    # 50% overlap < 0.7 threshold: stay separate
    inst = _mk_inst([[1, 2, 3, 4], [3, 4, 50, 51]])
    out = inst_mod.merge_round(inst, overlap_thresh=0.7, iou_thresh=0.0001, out_cap=2)
    assert int(out.num()) == 2


def test_merge_bbox_gate():
    # full row overlap but force-disjoint bboxes would merge without gate;
    # here bboxes overlap so they merge; then verify far-apart bbox blocks it
    inst = _mk_inst([[1, 2, 3], [1, 2, 3]])
    out = inst_mod.merge_round(inst, 0.7, 0.05, out_cap=2)
    assert int(out.num()) == 1

    inst2 = _mk_inst([[1, 2, 3], [1, 2, 3]])
    bmin = np.asarray(inst2.bbox_min).copy()
    bmax = np.asarray(inst2.bbox_max).copy()
    bmin[1] = [1000, 1000, 1000]
    bmax[1] = [1001, 1001, 1001]
    inst2 = inst2._replace(bbox_min=jnp.asarray(bmin), bbox_max=jnp.asarray(bmax))
    out2 = inst_mod.merge_round(inst2, 0.7, 0.05, out_cap=2)
    assert int(out2.num()) == 2  # bbox gate blocks the merge


def test_merge_sliver_containment_gate():
    """A sliver fragment (near-zero bbox volume: one face of an object seen
    edge-on) fully row-contained in its parent must merge even though its
    bbox IoU against the parent is ~0 — the gate accepts smaller-box
    containment (the box analog of the reference's max-of-directions overlap,
    graph_utils.py:620-664)."""
    inst = _mk_inst([[1, 2, 3, 4, 5, 6, 7, 8], [7, 8]])
    bmin = np.asarray(inst.bbox_min).copy()
    bmax = np.asarray(inst.bbox_max).copy()
    # parent: a 1x1x1 box; sliver: a 2 cm-thin slab on its far face,
    # bbox IoU ~ 0.02/1 = 0.02 < iou_thresh 0.05
    bmin[0], bmax[0] = [0, 0, 0], [1, 1, 1]
    bmin[1], bmax[1] = [0.98, 0, 0], [1.0, 1, 1]
    inst = inst._replace(bbox_min=jnp.asarray(bmin), bbox_max=jnp.asarray(bmax))
    out = inst_mod.merge_round(inst, 0.7, 0.05, out_cap=2)
    assert int(out.num()) == 1

    # but a DISJOINT small box next to the parent (lamp beside the table,
    # no shared rows) must NOT merge even though containment-gated pairs
    # are considered: the voxel overlap ratio still decides
    inst2 = _mk_inst([[1, 2, 3, 4, 5, 6, 7, 8], [100, 101]])
    bmin2 = np.asarray(inst2.bbox_min).copy()
    bmax2 = np.asarray(inst2.bbox_max).copy()
    bmin2[0], bmax2[0] = [0, 0, 0], [1, 1, 1]
    bmin2[1], bmax2[1] = [0.5, 0.5, 0.9], [0.6, 0.6, 1.0]  # inside parent box
    inst2 = inst2._replace(bbox_min=jnp.asarray(bmin2), bbox_max=jnp.asarray(bmax2))
    out2 = inst_mod.merge_round(inst2, 0.7, 0.05, out_cap=2)
    assert int(out2.num()) == 2


def test_transitive_merge_chain():
    # A-B overlap, B-C overlap, A-C don't: one component of 3
    inst = _mk_inst([[1, 2, 3, 4], [3, 4, 5, 6], [5, 6, 7, 8]])
    out = inst_mod.merge_round(inst, 0.45, 0.01, out_cap=3)
    assert int(out.num()) == 1
    rows0 = np.asarray(out.rows)[0]
    got = set(rows0[rows0 != int(I32_MAX)].tolist())
    assert got == set(range(1, 9))


def test_frame_instances():
    # 12 pixels, 2 masks
    masks = np.zeros((2, 12), bool)
    masks[0, :6] = True
    masks[1, 6:] = True
    pix_rows = np.array([0, 0, 1, 1, 2, 2, 7, 7, 8, 8, 9, -1], np.int32)
    pts = np.arange(36, dtype=np.float32).reshape(12, 3)
    f = np.array([[1, 0, 0, 0], [0, 1, 0, 0]], np.float32)
    inst = inst_mod.frame_instances(
        jnp.asarray(masks),
        jnp.ones(2, bool),
        jnp.asarray(f),
        jnp.asarray(pix_rows),
        jnp.asarray(pts),
        min_rows=2,
        k_cap=8,
    )
    assert int(inst.num()) == 2
    np.testing.assert_array_equal(np.asarray(inst.count), [3, 3])
    r0 = np.asarray(inst.rows)[0]
    assert set(r0[r0 != int(I32_MAX)].tolist()) == {0, 1, 2}
    r1 = np.asarray(inst.rows)[1]
    assert set(r1[r1 != int(I32_MAX)].tolist()) == {7, 8, 9}


def test_seq_merge_step_across_frames():
    d = 4
    g = _mk_inst([[1, 2, 3, 4]], d=d, i_cap=4)
    f = _mk_inst([[2, 3, 4], [50, 51, 52]], d=d, i_cap=2)
    out = inst_mod.seq_merge_step(g, f, overlap_thresh=0.7, iou_thresh=0.01)
    assert out.rows.shape[0] == 4  # capacity preserved
    assert int(out.num()) == 2


def test_merge_dilated_neighbor_semantics():
    """The reference's overlap counts points within 1.5x voxel as shared
    (graph_utils.py:620-664): a fragment whose cells sit in ADJACENT coarse
    cells of the main body (no same-cell intersection at all) must still
    merge via the dilated signature; a fragment several cells away must not."""
    from holoagent_tpu.memory.instances import COARSE_FACTOR, frame_instances
    from holoagent_tpu.ops.voxel import GridSpec

    grid = GridSpec.centered(0.08)
    cell = 0.08 * COARSE_FACTOR  # adjacency cell = 1 x voxel (instances.py)
    ox = float(np.asarray(grid.origin)[0])
    # first adjacency-cell boundary after x = 1.0: the fragment starts exactly
    # there, so main and fragment occupy adjacent but DIFFERENT cells
    b = ox + np.ceil((1.0 - ox) / cell) * cell
    # synth pixel world: 3 masks over a 1-D strip of points
    n = 160
    xs = np.linspace(0.0, 2.4, n)
    pts = np.stack([xs, np.zeros(n), np.zeros(n)], -1).astype(np.float32)
    rows = np.arange(n, dtype=np.int32)  # fake distinct scene rows
    masks = np.zeros((3, n), bool)
    masks[0] = xs < b - 0.01           # main, ends just before the boundary
    masks[1] = (xs >= b + 0.01) & (xs < b + cell - 0.02)  # next cell only
    masks[2] = xs >= b + 6 * cell      # far fragment, 6+ cells away
    f = np.eye(3, 4, dtype=np.float32)
    inst = frame_instances(
        jnp.asarray(masks), jnp.ones(3, bool), jnp.asarray(f),
        jnp.asarray(rows), jnp.asarray(pts), min_rows=2, k_cap=256, grid=grid,
    )
    # no same-cell coarse intersection between 0 and 1
    a = np.asarray(inst.ckeys[0]); b = np.asarray(inst.ckeys[1])
    a = set(a[a != int(I32_MAX)].tolist()); b = set(b[b != int(I32_MAX)].tolist())
    assert not (a & b)
    out = inst_mod.merge_round(inst, 0.75, 0.0, out_cap=3, coarse_only=True,
                               bbox_pad=0.08)
    assert int(out.num()) == 2  # main+near merged; far separate


def test_to_disjoint_smallest_wins():
    from holoagent_tpu.ops.masks import to_disjoint

    m = np.zeros((3, 8, 8), bool)
    m[0, :, :] = True          # background blob
    m[1, 2:5, 2:5] = True      # object
    m[2, 3:5, 3:5] = True      # finer detail inside the object
    out = np.asarray(to_disjoint(jnp.asarray(m), jnp.ones(3, bool)))
    # disjoint, union preserved
    assert (out.sum(0) <= 1).all()
    assert (out.any(0) == m.any(0)).all()
    # finest mask keeps its pixels; object keeps its complement of detail;
    # background keeps the rest
    assert out[2, 3:5, 3:5].all()
    assert out[1, 2, 2] and not out[1, 3, 3]
    assert out[0, 0, 0] and not out[0, 3, 3]


def test_frame_instances_world_extent_gate():
    """Room-scale shells (walls/floors) must not enter the instance table:
    their saturated signatures overlap everything and collapse the scene
    (instances.frame_instances max_extent; measured round 4 at 240x320)."""
    p = 64
    masks = np.zeros((2, p), bool)
    masks[0, :32] = True   # object: points span 0.5 m
    masks[1, 32:] = True   # shell: points span 8 m
    pts = np.zeros((p, 3), np.float32)
    pts[:32, 0] = np.linspace(0.0, 0.5, 32)
    pts[32:, 0] = np.linspace(0.0, 8.0, 32)
    rows = np.arange(p, dtype=np.int32)
    f = np.eye(2, 4, dtype=np.float32)
    out = inst_mod.frame_instances(
        jnp.asarray(masks), jnp.ones(2, bool), jnp.asarray(f),
        jnp.asarray(rows), jnp.asarray(pts), min_rows=1, k_cap=64,
        max_extent=4.0,
    )
    v = np.asarray(out.valid)
    assert v[0] and not v[1]


def test_merge_union_extent_veto():
    """Two sub-threshold fragments whose union would exceed max_extent must
    not merge (the invariant that stops wall fragments chaining into a
    room-scale blob, instances.merge_round max_extent)."""
    # rows interpreted as x: fragments overlap heavily (rows 4..11 shared)
    a = list(range(0, 12))
    b = list(range(4, 16))
    inst = _mk_inst([a, b], k_cap=32)
    merged = inst_mod.merge_round(inst, 0.5, 0.01, out_cap=2)
    assert int(merged.num()) == 1  # sanity: they merge without the veto
    vetoed = inst_mod.merge_round(inst, 0.5, 0.01, out_cap=2, max_extent=10.0)
    assert int(vetoed.num()) == 2  # union spans 16 > 10 -> vetoed


def test_union_lanes_matches_numpy():
    rng = np.random.default_rng(3)
    g, m, k = 9, 4, 24
    table = np.full((g, k), int(I32_MAX), np.int32)
    other = np.full((m, k), int(I32_MAX), np.int32)
    counts = np.zeros((g,), np.int32)
    sets_t, sets_o = [], []
    for i in range(g):
        s = np.unique(rng.integers(0, 60, rng.integers(0, k + 1)))
        table[i, : len(s)] = s
        counts[i] = len(s)
        sets_t.append(s)
    for j in range(m):
        s = np.unique(rng.integers(0, 60, rng.integers(0, k + 1)))
        other[j, : len(s)] = s
        sets_o.append(s)
    sel_idx = np.asarray([6, 0, 3, 5], np.int32)
    sel_valid = np.asarray([True, True, False, True])
    out, cnt = inst_mod._union_lanes(
        jnp.asarray(table), jnp.asarray(counts), jnp.asarray(sel_idx),
        jnp.asarray(sel_valid), jnp.asarray(other))
    out, cnt = np.asarray(out), np.asarray(cnt)
    want = {int(i): s.copy() for i, s in zip(range(g), sets_t)}
    for j, (i, v) in enumerate(zip(sel_idx, sel_valid)):
        if v:
            want[int(i)] = np.union1d(sets_t[int(i)], sets_o[j])[:k]
    for i in range(g):
        got = out[i][out[i] != int(I32_MAX)]
        assert np.array_equal(got, want[i]), (i, got, want[i])
        assert cnt[i] == len(want[i]), (i, cnt[i], len(want[i]))


def test_paired_merge_step_matches_seq_fold():
    """The paired fold + one trailing full round reaches the same instance
    sets as the all-pairs seq fold on a multi-frame stream."""
    rng = np.random.default_rng(0)
    # 3 ground-truth objects as disjoint row ranges; frames observe random
    # overlapping subsets (>=70% of the object each time)
    objects = [np.arange(0, 40), np.arange(100, 130), np.arange(200, 260)]
    g_seq = _mk_inst([], i_cap=16, k_cap=64)
    g_par = _mk_inst([], i_cap=16, k_cap=64)
    for _ in range(6):
        row_sets = []
        for o in objects:
            take = rng.random(len(o)) < 0.85
            row_sets.append(o[take].tolist())
        f = _mk_inst(row_sets, i_cap=8, k_cap=64)
        g_seq = inst_mod.seq_merge_step(g_seq, f, 0.7, 0.01)
        g_par = inst_mod.paired_merge_step(g_par, f, 0.7, 0.01)
    g_par = inst_mod.merge_round(g_par, 0.7, 0.01, out_cap=16)
    for g in (g_seq, g_par):
        valid = np.asarray(g.valid)
        assert valid.sum() == 3, valid.sum()
        got = []
        rows = np.asarray(g.rows)
        for i in np.nonzero(valid)[0]:
            r = rows[i][rows[i] != int(I32_MAX)]
            got.append((r.min(), r.max()))
        # every surviving set is a subset of exactly one object's range
        for lo, hi in got:
            assert any(lo >= o.min() and hi <= o.max() for o in objects)
    # weights (observation counts) agree between the folds
    ws = np.sort(np.asarray(g_seq.weight)[np.asarray(g_seq.valid)])
    wp = np.sort(np.asarray(g_par.weight)[np.asarray(g_par.valid)])
    assert np.allclose(ws, wp), (ws, wp)


def test_paired_merge_appends_when_full_table_has_free_lanes():
    g = _mk_inst([[1, 2, 3]], i_cap=4, k_cap=16)
    f = _mk_inst([[50, 51, 52], [80, 81]], i_cap=4, k_cap=16)
    out = inst_mod.paired_merge_step(g, f, 0.7, 0.01)
    assert int(np.asarray(out.valid).sum()) == 3
    rows = np.asarray(out.rows)
    allv = set()
    for i in np.nonzero(np.asarray(out.valid))[0]:
        allv |= set(rows[i][rows[i] != int(I32_MAX)].tolist())
    assert allv == {1, 2, 3, 50, 51, 52, 80, 81}
