"""Fixed-capacity 3-D instance sets + overlap merging.

The reference tracks instances as python lists of o3d point clouds merged by
FAISS-neighbor overlap inside connected components
(reference fsr_vln/memory/hmsg/utils/graph_utils.py:918-1038: `merge_3d_masks`
gated by 3-D bbox IoU > iou_thresh, overlap ratio = max over directions of the
fraction of points with a neighbor within 1.5 x voxel, components merged when
ratio > overlap_thresh; folded over frames by `seq_merge`/`hierarchical_merge`).

TPU-native redesign: an instance is (a) a sorted set of *stable scene rows*
(every mask pixel is snapped to its voxel row by construction, which is what
the reference's KD snap to the fused cloud achieves, dataloader/generic.py:179-187),
and (b) a hashed occupancy signature over SIG_BUCKETS buckets.  Pairwise
intersection counts for ALL instance pairs are then ONE MXU matmul
(sig @ sig.T), the overlap ratio inter/min(|A|,|B|) reproduces the reference's
max-of-directions formula exactly on shared rows, and connected components run
as label propagation with pointer jumping — the entire merge round is a single
jitted program over the padded instance table.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.compact import group_unique, I32_MAX

SIG_BUCKETS = 4096

# adjacency-cell edge = COARSE_FACTOR x voxel for the radius-tolerant overlap
# sets.  The reference's neighbor radius is 1.5 x voxel
# (graph_utils.py:620-664); with the 26-neighborhood dilation in
# _dilated_signature the effective radius is 1..2 cells, so cells must stay
# at ONE voxel — at 2 x voxel the radius reached 2-4 voxels (16-32 cm at the
# 0.08 m operating point) and every object sitting against a wall/floor
# merged into it, chaining whole scenes into one instance (measured round 4)
COARSE_FACTOR = 1.0

# neighbor offsets for the dilated coarse signature (26-connected + center):
# key arithmetic on the packed (x<<20 | y<<9 | z) layout — border wraps leak
# into the adjacent field for cells at coordinate 0/max, which lands in a
# pseudo-random bucket (noise comparable to the hash's own collisions)
from ..ops.voxel import BITS_Y, BITS_Z  # noqa: E402

_NEIGHBOR_OFFSETS = np.asarray(
    [
        (dx << (BITS_Y + BITS_Z)) + (dy << BITS_Z) + dz
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
    ],
    np.int32,
)  # numpy: module-level jnp constants would init the backend at import


def _dilated_signature(ckeys: jnp.ndarray) -> jnp.ndarray:
    """(I, Kc) coarse key sets -> (I, SIG_BUCKETS) occupancy of the sets
    DILATED by one coarse cell (26-neighborhood).

    Carried on the InstanceSet and unioned by elementwise max when instances
    merge, this gives the merge round the reference's actual overlap
    semantics — |cells(B) ∩ dilate(cells(A))| / |cells(B)|, i.e. the fraction
    of the one set lying within a cell-radius of the other
    (graph_utils.py:620-664 counts neighbors within 1.5 x voxel; one coarse
    cell = 2 x voxel) — without ever materializing the dilated key sets."""
    i, kc = ckeys.shape
    valid = ckeys != I32_MAX
    nk = ckeys[:, :, None] + _NEIGHBOR_OFFSETS[None, None, :]  # (I, Kc, 27)
    shift = 32 - int(SIG_BUCKETS).bit_length() + 1
    bucket = (nk.astype(jnp.uint32) * jnp.uint32(2654435761)) >> shift
    bucket = jnp.where(valid[:, :, None], bucket.astype(jnp.int32), SIG_BUCKETS)
    sig = jnp.zeros((i, SIG_BUCKETS + 1), jnp.float32)
    sig = sig.at[
        jnp.arange(i)[:, None, None], bucket
    ].max(valid[:, :, None].astype(jnp.float32))
    return sig[:, :SIG_BUCKETS]


class InstanceSet(NamedTuple):
    rows: jnp.ndarray  # (I, K) int32 sorted unique scene rows, I32_MAX pad
    count: jnp.ndarray  # (I,) int32 rows used
    feat_sum: jnp.ndarray  # (I, D) f32 accumulated mask features
    weight: jnp.ndarray  # (I,) f32 accumulated observation weight
    bbox_min: jnp.ndarray  # (I, 3) f32
    bbox_max: jnp.ndarray  # (I, 3) f32
    valid: jnp.ndarray  # (I,) bool
    # 2x-coarse voxel keys of the member points: radius-tolerant overlap
    # (the reference counts neighbors within 1.5 x voxel as shared,
    # graph_utils.py:620-664; exact same-voxel intersection fragments objects
    # whose views see different faces).  Computed once per frame from the
    # points — no per-merge gather through the scene key table.
    ckeys: jnp.ndarray  # (I, K) int32 sorted unique coarse keys, I32_MAX pad
    ccount: jnp.ndarray  # (I,) int32
    # signature of the 26-neighborhood-DILATED coarse cell set (see
    # _dilated_signature): unions exactly by elementwise max on merge
    # (dilation distributes over set union)
    dsig: jnp.ndarray  # (I, SIG_BUCKETS) f32 0/1

    @property
    def capacity(self) -> Tuple[int, int]:
        return self.rows.shape

    def feats(self, normalize: bool = True) -> jnp.ndarray:
        f = self.feat_sum / jnp.maximum(self.weight, 1e-9)[:, None]
        if normalize:
            f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-9)
        return f

    def num(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


def empty_instances(i_cap: int, k_cap: int, d: int) -> InstanceSet:
    return InstanceSet(
        rows=jnp.full((i_cap, k_cap), I32_MAX, jnp.int32),
        count=jnp.zeros((i_cap,), jnp.int32),
        feat_sum=jnp.zeros((i_cap, d), jnp.float32),
        weight=jnp.zeros((i_cap,), jnp.float32),
        bbox_min=jnp.full((i_cap, 3), jnp.inf, jnp.float32),
        bbox_max=jnp.full((i_cap, 3), -jnp.inf, jnp.float32),
        valid=jnp.zeros((i_cap,), bool),
        # adjacency cells are at voxel resolution (COARSE_FACTOR 1), so the
        # key sets are the same cardinality as the row sets
        ckeys=jnp.full((i_cap, k_cap), I32_MAX, jnp.int32),
        ccount=jnp.zeros((i_cap,), jnp.int32),
        dsig=jnp.zeros((i_cap, SIG_BUCKETS), jnp.float32),
    )


def concat(a: InstanceSet, b: InstanceSet) -> InstanceSet:
    """Stack two sets (row capacities must match)."""
    return InstanceSet(*(jnp.concatenate([x, y], axis=0) for x, y in zip(a, b)))


# ---------------------------------------------------------------------------
# Per-frame instance extraction
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("k_cap", "stride"))
def frame_instances(
    masks: jnp.ndarray,  # (M, P) bool: flattened per-pixel mask coverage
    mask_valid: jnp.ndarray,  # (M,)
    f_masks: jnp.ndarray,  # (M, D)
    pix_rows: jnp.ndarray,  # (P,) stable scene rows (-1 invalid)
    points: jnp.ndarray,  # (P, 3) world points per pixel
    min_rows: int = 3,
    k_cap: int = 2048,
    stride: int = 1,
    grid=None,  # GridSpec: enables the 2x-coarse key sets (radius-tolerant merge)
    max_area_frac: float = 1.0,
    max_extent: float = float("inf"),
) -> InstanceSet:
    """Lift the frame's 2-D masks to scene-row instance sets (the analog of
    reference create_3d_masks + per-frame mask list).  `stride` decimates
    pixels (adjacent pixels share voxels at mapping resolution).

    ``max_area_frac`` drops BACKGROUND-SCALE masks from the instance table
    (they still contribute per-pixel scene features upstream): after the
    disjointness carve (ops/masks.to_disjoint, the reference filter_masks
    role) a frame's leftover background becomes one "everything else" shell
    whose 3-D bbox spans the visible room — every real object sits inside it
    and the merge fold chains the whole scene into a single instance
    (measured: 48-frame fixture builds collapsing to 1 object, round 4).  The
    reference never lifts such shells: its per-mask clouds go through
    DBSCAN + the bbox-IoU merge gate that a room-sized box cannot pass
    (graph_utils.py:918-1038).

    ``max_extent`` (metres) drops masks by WORLD size — the gate that
    actually matches the reference semantics above.  Frame-area fraction
    alone is the wrong variable: a distant whole-room wall/floor view covers
    only ~30%% of the frame yet lifts a room-scale shell whose row set
    saturates ``k_cap``; a saturated (dilated) signature shows overlap ~1
    against everything, and the shell absorbs every object in the scene
    (measured collapse at 240x320 fixtures, round 4: 14 instances -> 1 over
    four frames, every merge showing ratio=1.00 against a 95 m^3 blob).  No
    indoor OBJECT has a 4 m bbox side; walls and floors do."""
    m, p = masks.shape
    masks_d = masks[:, ::stride]
    rows_d = pix_rows[::stride]
    pts_d = points[::stride]
    pd = rows_d.shape[0]
    # The incoming mask set is pixel-DISJOINT (every caller sits downstream
    # of ops/masks.to_disjoint — the containment carve is what keeps the
    # merge fold from chaining instances, extractor.py:108).  Each pixel
    # therefore has at most ONE owning mask, and the per-group unique sets
    # can be built from a pd-length (owner, row) stream instead of the dense
    # (m, pd) broadcast — a 64x smaller sort for the 64-mask budget
    # (measured round 5: the 28 ms 'instances' bench stage was two
    # m*pd-element group_unique sorts).
    mvalid_d = masks_d & mask_valid[:, None]
    owner = jnp.argmax(mvalid_d, axis=0).astype(jnp.int32)  # (pd,)
    covered = jnp.any(mvalid_d, axis=0)
    valid_px = covered & (rows_d >= 0)
    rows, counts = group_unique(owner, rows_d, valid_px, num_groups=m, capacity=k_cap)
    area_frac = masks.mean(axis=1)
    # bbox from masked world points (full resolution for fidelity); computed
    # up front so the world-extent gate can use it
    sel_px = masks & (pix_rows >= 0)[None, :]
    big = jnp.float32(jnp.inf)
    bmin = jnp.min(jnp.where(sel_px[:, :, None], points[None], big), axis=1)
    bmax = jnp.max(jnp.where(sel_px[:, :, None], points[None], -big), axis=1)
    extent = jnp.max(bmax - bmin, axis=-1)  # -inf for empty masks
    ok = (
        mask_valid
        & (counts >= min_rows)
        & (area_frac <= max_area_frac)
        & (extent <= max_extent)
    )
    if grid is not None:
        from ..ops import voxel as vox

        cgrid = vox.GridSpec(
            voxel_size=grid.voxel_size * COARSE_FACTOR, origin=grid.origin
        )
        ck_pix = vox.keys_of(pts_d, rows_d >= 0, cgrid)
        ckeys, ccounts = group_unique(
            owner, ck_pix, valid_px, num_groups=m, capacity=k_cap
        )
        ckeys = jnp.where(ok[:, None], ckeys, I32_MAX)
        ccounts = jnp.where(ok, ccounts, 0)
        dsig = _dilated_signature(ckeys)
    else:
        ckeys = jnp.full((m, k_cap), I32_MAX, jnp.int32)
        ccounts = jnp.zeros((m,), jnp.int32)
        dsig = jnp.zeros((m, SIG_BUCKETS), jnp.float32)
    return InstanceSet(
        rows=jnp.where(ok[:, None], rows, I32_MAX),
        count=jnp.where(ok, counts, 0),
        feat_sum=jnp.where(ok[:, None], f_masks, 0.0),
        weight=ok.astype(jnp.float32),
        bbox_min=jnp.where(ok[:, None], bmin, big),
        bbox_max=jnp.where(ok[:, None], bmax, -big),
        valid=ok,
        ckeys=ckeys,
        ccount=ccounts,
        dsig=dsig,
    )


@jax.jit
def recompute_coarse_keys(scene, inst: InstanceSet) -> InstanceSet:
    """Rebuild the 2x-coarse key sets from the scene's voxel positions.

    The production merge fold runs ``coarse_only=True`` (mapping.py,
    ShardedMapper), under which an instance without coarse keys has overlap 0
    against everything and can never merge.  Checkpoints written before the
    coarse-key upgrade carry none (memory/checkpoint.py backfill), so resumed
    runs would silently fragment objects; recomputing from the scene restores
    the exact sets a fresh run would hold (rows ARE scene voxel rows, and the
    coarse key of a row depends only on its mean position)."""
    i_cap, k_cap = inst.rows.shape
    vrows = inst.rows != I32_MAX
    safe = jnp.clip(inst.rows, 0, scene.key.shape[0] - 1)
    pts = scene.points()[safe]  # (I, K, 3)
    from ..ops import voxel as vox

    cgrid = vox.GridSpec(
        voxel_size=scene.grid.voxel_size * COARSE_FACTOR, origin=scene.grid.origin
    )
    ck = vox.keys_of(pts.reshape(-1, 3), vrows.reshape(-1), cgrid)
    groups = jnp.broadcast_to(
        jnp.arange(i_cap, dtype=jnp.int32)[:, None], (i_cap, k_cap)
    ).reshape(-1)
    valid = (vrows & inst.valid[:, None]).reshape(-1)
    ckeys, ccounts = group_unique(
        groups, ck, valid, num_groups=i_cap, capacity=k_cap
    )
    ckeys = jnp.where(inst.valid[:, None], ckeys, I32_MAX)
    return inst._replace(
        ckeys=ckeys,
        ccount=jnp.where(inst.valid, ccounts, 0),
        dsig=_dilated_signature(ckeys),
    )


# ---------------------------------------------------------------------------
# Merge round
# ---------------------------------------------------------------------------


def _signatures(rows: jnp.ndarray, valid_rows: jnp.ndarray) -> jnp.ndarray:
    """(I, K) row sets -> (I, B) binary occupancy signatures (f32).

    Bucket = the HIGH log2(B) bits of the Knuth multiplicative hash.  Taking
    the product modulo B instead would keep only its low bits, which depend
    only on the key's low bits — packed voxel keys put z and the low y coords
    there, so all cells sharing a height/depth pattern would collide
    regardless of x, inflating every intersection estimate and over-merging
    spatially disjoint instances (observed: whole scenes collapsing to one
    instance on generated-mask runs)."""
    i, k = rows.shape
    shift = 32 - int(SIG_BUCKETS).bit_length() + 1  # B a power of two
    bucket = (rows.astype(jnp.uint32) * jnp.uint32(2654435761)) >> shift
    bucket = jnp.where(valid_rows, bucket.astype(jnp.int32), SIG_BUCKETS)
    sig = jnp.zeros((i, SIG_BUCKETS + 1), jnp.float32)
    sig = sig.at[jnp.arange(i)[:, None], bucket].max(valid_rows.astype(jnp.float32))
    return sig[:, :SIG_BUCKETS]


def _bbox_iou(bmin, bmax, pad: float = 0.0) -> jnp.ndarray:
    """(I,3)x2 -> (I,I) 3-D bbox IoU (reference graph_utils.py:880-916).

    ``pad`` inflates every box by half a voxel per side: a one-voxel-thin
    mask (a table top seen face-on) has zero bbox volume and would otherwise
    never pass the IoU gate against its parent object."""
    bmin = bmin - pad
    bmax = bmax + pad
    lo = jnp.maximum(bmin[:, None], bmin[None, :])
    hi = jnp.minimum(bmax[:, None], bmax[None, :])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    vol = jnp.prod(jnp.maximum(bmax - bmin, 0.0), axis=-1)
    union = vol[:, None] + vol[None, :] - inter
    return inter / jnp.maximum(union, 1e-10)


def _bbox_containment(bmin, bmax, pad: float = 0.0) -> jnp.ndarray:
    """(I,3)x2 -> (I,I) intersection volume over the SMALLER padded box.

    A sliver fragment (one face of an object seen edge-on: ~zero own volume)
    sitting inside its parent has bbox IoU ~ vol(sliver)/vol(parent) -> 0 and
    would never pass an IoU-only gate, yet its voxel-overlap ratio is ~1.
    Containment of the smaller box is the box-level analog of the reference's
    max-of-directions overlap ratio (graph_utils.py:620-664: fraction of the
    SMALLER cloud with neighbors in the larger), so the merge gate accepts
    either."""
    bmin = bmin - pad
    bmax = bmax + pad
    lo = jnp.maximum(bmin[:, None], bmin[None, :])
    hi = jnp.minimum(bmax[:, None], bmax[None, :])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    vol = jnp.prod(jnp.maximum(bmax - bmin, 0.0), axis=-1)
    vmin = jnp.minimum(vol[:, None], vol[None, :])
    return inter / jnp.maximum(vmin, 1e-10)


def _connected_components(adj: jnp.ndarray, iters: int = 16) -> jnp.ndarray:
    """Min-label propagation with pointer jumping. adj must be symmetric with
    a true diagonal on valid entries. Returns root label per node."""
    n = adj.shape[0]
    labels = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(n)

    def body(_, lab):
        nbr = jnp.min(jnp.where(adj, lab[None, :], big), axis=1)
        lab = jnp.minimum(lab, nbr)
        return jnp.minimum(lab, lab[lab])  # pointer jumping

    return jax.lax.fori_loop(0, iters, body, labels)


@partial(jax.jit, static_argnames=("out_cap", "coarse_only"))
def merge_round(
    inst: InstanceSet,
    overlap_thresh: float,
    iou_thresh: float,
    out_cap: int,
    bbox_pad: float = 0.0,  # half-voxel box inflation (see _bbox_iou)
    coarse_only: bool = False,  # skip the exact-row signature (mapper path:
    # every set carries coarse keys, and coarse-cell overlap IS the
    # reference's radius-tolerant semantics; saves one signature + matmul)
    max_extent: float = float("inf"),  # no merge may produce an instance
    # larger than this on any bbox side: sub-threshold wall/floor fragments
    # otherwise chain across frames into a room-scale blob whose saturated
    # signature overlaps everything (the collapse frame_instances max_extent
    # guards at birth — this keeps the invariant under union)
) -> InstanceSet:
    """One full merge pass (reference merge_3d_masks over the whole set):
    gate by bbox IoU, estimate overlap via signature matmul, merge connected
    components, compact the survivors (largest first) into `out_cap` lanes.

    The overlap ratio follows the reference's max-of-directions neighbor
    formula (graph_utils.py:620-664): fraction of the one instance's coarse
    cells lying within a one-cell radius of the other — computed as
    sig(cells_i) . dsig_j (the stored dilated signature) per direction, with
    the plain same-cell ratio as a floor (covers hand-built sets whose dsig
    is empty).  coarse_only=False additionally uses the exact-row ratio."""
    i_cap, k_cap = inst.rows.shape
    vrows = inst.rows != I32_MAX
    vck = inst.ckeys != I32_MAX
    csig = _signatures(inst.ckeys, vck)
    cinter = jnp.einsum("ib,jb->ij", csig, csig, preferred_element_type=jnp.float32)
    ccnt = jnp.maximum(csig.sum(-1), 1.0)
    has_c = (vck.any(-1))[:, None] & (vck.any(-1))[None, :]

    # hash-collision correction: a signature with occupancy p (fraction of
    # the B buckets set) matches a random foreign cell with probability ~p,
    # so the RAW hit count h over n probes estimates t true hits via
    # h = t + (n - t) p  =>  t/n = (h/n - p) / (1 - p).  Without this, any
    # instance that grows past ~B cells (a merged wall/floor structure — its
    # DILATED signature is 27x denser still) saturates its signature and
    # shows ratio ~1 against EVERYTHING, absorbing every object in the scene
    # (measured collapse mechanism, round 4).
    def _corrected(hits, probes, occupancy):
        p = jnp.clip(occupancy, 0.0, 0.98)
        return jnp.clip((hits / probes - p) / (1.0 - p), 0.0, 1.0)

    # direction i->j ratio sits at [i, j]; the max over directions is then
    # max(A, A.T) (reference max-of-directions, graph_utils.py:620-664)
    occ_c = csig.sum(-1) / jnp.float32(SIG_BUCKETS)
    a_c = _corrected(cinter, ccnt[:, None], occ_c[None, :])
    cratio = jnp.where(has_c, jnp.maximum(a_c, a_c.T), 0.0)
    # reference semantics: dinter[i, j] = |cells_i ∩ dilate(cells_j)|
    dinter = jnp.einsum(
        "ib,jb->ij", csig, inst.dsig, preferred_element_type=jnp.float32
    )
    occ_d = inst.dsig.sum(-1) / jnp.float32(SIG_BUCKETS)
    a_d = _corrected(dinter, ccnt[:, None], occ_d[None, :])
    cratio = jnp.where(has_c, jnp.maximum(cratio, jnp.maximum(a_d, a_d.T)), 0.0)
    if coarse_only:
        ratio = cratio
    else:
        sig = _signatures(inst.rows, vrows)
        inter = jnp.einsum("ib,jb->ij", sig, sig, preferred_element_type=jnp.float32)
        cnt = jnp.maximum(sig.sum(-1), 1.0)
        ratio = jnp.maximum(inter / jnp.minimum(cnt[:, None], cnt[None, :]), cratio)
    iou = _bbox_iou(inst.bbox_min, inst.bbox_max, pad=bbox_pad)
    cont = _bbox_containment(inst.bbox_min, inst.bbox_max, pad=bbox_pad)
    vv = inst.valid[:, None] & inst.valid[None, :]
    # the containment arm exists to rescue SLIVER FRAGMENTS of the same
    # object (near-zero own volume, IoU ~ 0 vs their parent) — restrict it
    # to comparable-volume pairs: a small object inside a room-scale
    # background blob also has containment ~1, and accepting that pair lets
    # one blob chain every object in the scene into a single instance
    pv = jnp.prod(jnp.maximum(inst.bbox_max - inst.bbox_min + 2 * bbox_pad, 0.0), -1)
    vol_ratio = jnp.maximum(pv[:, None], pv[None, :]) / jnp.maximum(
        jnp.minimum(pv[:, None], pv[None, :]), 1e-10
    )
    # gate: boxes overlap appreciably OR the smaller box sits mostly inside
    # a comparably-sized box (sliver fragments — see _bbox_containment); the
    # voxel overlap ratio still decides the actual merge
    adj = vv & ((iou > iou_thresh) | ((cont > 0.5) & (vol_ratio < 64.0))) & (
        ratio > overlap_thresh
    )
    # union-extent invariant: a pairwise merge whose joint bbox exceeds
    # max_extent on any side is vetoed (see max_extent above).  Transitive
    # chains can still exceed it slightly; the veto breaks the geometric
    # growth that saturates signatures.
    umin = jnp.minimum(inst.bbox_min[:, None], inst.bbox_min[None, :])
    umax = jnp.maximum(inst.bbox_max[:, None], inst.bbox_max[None, :])
    uext = jnp.max(umax - umin, axis=-1)
    adj = adj & (uext <= max_extent)
    adj = adj | (jnp.eye(i_cap, dtype=bool) & inst.valid[:, None])
    root = _connected_components(adj)

    # union row + coarse-key sets per root
    groups = jnp.broadcast_to(root[:, None], (i_cap, k_cap)).reshape(-1)
    values = inst.rows.reshape(-1)
    valid = (vrows & inst.valid[:, None]).reshape(-1)
    rows_u, counts_u = group_unique(groups, values, valid, num_groups=i_cap, capacity=k_cap)
    ck_cap = inst.ckeys.shape[1]
    cgroups = jnp.broadcast_to(root[:, None], (i_cap, ck_cap)).reshape(-1)
    cvalid = (vck & inst.valid[:, None]).reshape(-1)
    ckeys_u, ccounts_u = group_unique(
        cgroups, inst.ckeys.reshape(-1), cvalid, num_groups=i_cap, capacity=ck_cap
    )

    # reduce scalars per root
    safe_root = jnp.where(inst.valid, root, i_cap)
    feat_sum = (
        jnp.zeros((i_cap + 1, inst.feat_sum.shape[1])).at[safe_root].add(inst.feat_sum)[:i_cap]
    )
    weight = jnp.zeros((i_cap + 1,)).at[safe_root].add(inst.weight)[:i_cap]
    bbox_min = (
        jnp.full((i_cap + 1, 3), jnp.inf).at[safe_root].min(inst.bbox_min)[:i_cap]
    )
    bbox_max = (
        jnp.full((i_cap + 1, 3), -jnp.inf).at[safe_root].max(inst.bbox_max)[:i_cap]
    )
    is_root = inst.valid & (root == jnp.arange(i_cap))
    # dilated signatures union exactly by max (dilation distributes over
    # set union)
    dsig_u = (
        jnp.zeros((i_cap + 1, SIG_BUCKETS)).at[safe_root].max(inst.dsig)[:i_cap]
    )

    # compact: biggest instances first into out_cap lanes
    order_key = jnp.where(is_root, counts_u, -1)
    _, order = jax.lax.top_k(order_key, out_cap)
    keep = order_key[order] > 0
    return InstanceSet(
        rows=jnp.where(keep[:, None], rows_u[order], I32_MAX),
        count=jnp.where(keep, counts_u[order], 0),
        feat_sum=jnp.where(keep[:, None], feat_sum[order], 0.0),
        weight=jnp.where(keep, weight[order], 0.0),
        bbox_min=jnp.where(keep[:, None], bbox_min[order], jnp.inf),
        bbox_max=jnp.where(keep[:, None], bbox_max[order], -jnp.inf),
        valid=keep,
        ckeys=jnp.where(keep[:, None], ckeys_u[order], I32_MAX),
        ccount=jnp.where(keep, ccounts_u[order], 0),
        dsig=jnp.where(keep[:, None], dsig_u[order], 0.0),
    )


def seq_merge_step(
    global_inst: InstanceSet,
    frame_inst: InstanceSet,
    overlap_thresh: float,
    iou_thresh: float,
    bbox_pad: float = 0.0,
    coarse_only: bool = False,
    max_extent: float = float("inf"),
) -> InstanceSet:
    """Fold one frame into the global set (reference graph_utils.py:1015-1038
    `seq_merge` inner step)."""
    out_cap = global_inst.rows.shape[0]
    return merge_round(
        concat(global_inst, frame_inst), overlap_thresh, iou_thresh, out_cap,
        bbox_pad=bbox_pad, coarse_only=coarse_only, max_extent=max_extent,
    )


# ---------------------------------------------------------------------------
# Paired per-frame fold (windowed per-lane sort unions)
# ---------------------------------------------------------------------------


def _union_lanes(
    table: jnp.ndarray,
    counts: jnp.ndarray,
    sel_idx: jnp.ndarray,
    sel_valid: jnp.ndarray,
    other: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Set-union `other[j]` into lane `sel_idx[j]` of a padded sorted-set
    table, touching ONLY the selected lanes.

    table (G, K) and other (M, K): ascending unique values padded with
    I32_MAX; sel_idx (M,) distinct target lanes (ignored where ~sel_valid).
    Returns (table', counts') with lane sel_idx[j] := the K smallest unique
    values of table[sel_idx[j]] ∪ other[j] — group_unique's capacity
    semantics.

    Why this shape: per-frame, at most M = frame-capacity lanes change, so
    the union work is two batched PER-ROW sorts of an (M, 2K) window instead
    of a flat (group, value) sort over the whole (G+M, K) concat table.  On
    the v5e the row-sort primitive is the fast one: a (576, 4096) row sort
    costs 4.5 ms where the equivalent flat 1.2M-element group sort inside
    merge_round costs ~15 ms, and merge-path constructions built on
    vmap(searchsorted) are two orders worse (292 ms measured, round 5) —
    batched binary search lowers to serial dynamic gathers on TPU."""
    g, k = table.shape
    m = other.shape[0]
    safe = jnp.where(sel_valid, sel_idx, g).astype(jnp.int32)
    wide = jnp.concatenate(
        [table, jnp.full((1, k), I32_MAX, table.dtype)], axis=0
    )
    a = wide[safe]  # (M, K) row gather
    u = jnp.sort(jnp.concatenate([a, other], axis=1), axis=1)  # (M, 2K)
    prev = jnp.concatenate([jnp.full((m, 1), -1, u.dtype), u[:, :-1]], axis=1)
    keep = (u != I32_MAX) & (u != prev)
    uniq = jnp.sort(jnp.where(keep, u, I32_MAX), axis=1)[:, :k]
    out = wide.at[safe].set(uniq)[:g]
    cnt = jnp.minimum(keep.sum(axis=1), k).astype(counts.dtype)
    wcnt = jnp.concatenate([counts, jnp.zeros((1,), counts.dtype)])
    counts_out = wcnt.at[safe].set(cnt)[:g]
    return out, counts_out


@partial(jax.jit, static_argnames=("coarse_only",))
def paired_merge_step(
    global_inst: InstanceSet,
    frame_inst: InstanceSet,
    overlap_thresh: float,
    iou_thresh: float,
    bbox_pad: float = 0.0,
    coarse_only: bool = False,
    max_extent: float = float("inf"),
) -> InstanceSet:
    """Windowed per-frame fold: each frame instance merges into at most ONE
    existing global instance; the rest append into free lanes.

    Same gates as merge_round (coarse-cell overlap ratio with the dilated
    reference semantics, bbox IoU / comparable-volume containment, union
    extent veto — graph_utils.py:620-664, 918-1038) restricted to the
    (frame x global) rectangle, and the row/coarse-key set unions run only
    over the <= fcap lanes that actually change (_union_lanes: batched
    per-row sort over an (fcap, 2K) window) instead of the flat
    (group, value) sort over the whole concat table that seq_merge_step
    pays every frame.  What this fold deliberately DEFERS to the
    periodic / final full merge_round (Mapper.finalize): (a) global-global
    consolidation, (b) the extra fragments when several frame instances pick
    the same target in one frame (losers append as new lanes), (c)
    biggest-first recompaction when the table fills.  The fixed-point of
    fold + full round is the same instance set as the all-pairs fold."""
    gcap = global_inst.rows.shape[0]
    fcap = frame_inst.rows.shape[0]

    # ---- cross overlap ratio (coarse cells, both directions, corrected) ----
    vck_g = global_inst.ckeys != I32_MAX
    vck_f = frame_inst.ckeys != I32_MAX
    csig_g = _signatures(global_inst.ckeys, vck_g)
    csig_f = _signatures(frame_inst.ckeys, vck_f)
    cnt_g = jnp.maximum(csig_g.sum(-1), 1.0)
    cnt_f = jnp.maximum(csig_f.sum(-1), 1.0)
    occ_g = csig_g.sum(-1) / jnp.float32(SIG_BUCKETS)
    occ_f = csig_f.sum(-1) / jnp.float32(SIG_BUCKETS)
    occ_dg = global_inst.dsig.sum(-1) / jnp.float32(SIG_BUCKETS)
    occ_df = frame_inst.dsig.sum(-1) / jnp.float32(SIG_BUCKETS)

    def _corrected(hits, probes, occupancy):
        p = jnp.clip(occupancy, 0.0, 0.98)
        return jnp.clip((hits / probes - p) / (1.0 - p), 0.0, 1.0)

    inter = jnp.einsum(
        "fb,gb->fg", csig_f, csig_g, preferred_element_type=jnp.float32
    )
    a_fg = _corrected(inter, cnt_f[:, None], occ_g[None, :])
    a_gf = _corrected(inter, cnt_g[None, :], occ_f[:, None])
    d_fg = _corrected(  # |cells_f ∩ dilate(cells_g)| / |cells_f|
        jnp.einsum("fb,gb->fg", csig_f, global_inst.dsig,
                   preferred_element_type=jnp.float32),
        cnt_f[:, None], occ_dg[None, :],
    )
    d_gf = _corrected(  # |cells_g ∩ dilate(cells_f)| / |cells_g|
        jnp.einsum("fb,gb->fg", frame_inst.dsig, csig_g,
                   preferred_element_type=jnp.float32),
        cnt_g[None, :], occ_df[:, None],
    )
    has_c = vck_f.any(-1)[:, None] & vck_g.any(-1)[None, :]
    ratio = jnp.where(
        has_c,
        jnp.maximum(jnp.maximum(a_fg, a_gf), jnp.maximum(d_fg, d_gf)),
        0.0,
    )
    if not coarse_only:
        # exact-row ratio floor (merge_round's non-coarse arm): covers sets
        # without coarse keys and shared-row overlap at full resolution
        sig_f = _signatures(frame_inst.rows, frame_inst.rows != I32_MAX)
        sig_g = _signatures(global_inst.rows, global_inst.rows != I32_MAX)
        rint = jnp.einsum(
            "fb,gb->fg", sig_f, sig_g, preferred_element_type=jnp.float32
        )
        rcnt_f = jnp.maximum(sig_f.sum(-1), 1.0)
        rcnt_g = jnp.maximum(sig_g.sum(-1), 1.0)
        ratio = jnp.maximum(
            ratio, rint / jnp.minimum(rcnt_f[:, None], rcnt_g[None, :])
        )

    # ---- bbox gates (cross rectangle) --------------------------------------
    bmin_f = frame_inst.bbox_min - bbox_pad
    bmax_f = frame_inst.bbox_max + bbox_pad
    bmin_g = global_inst.bbox_min - bbox_pad
    bmax_g = global_inst.bbox_max + bbox_pad
    lo = jnp.maximum(bmin_f[:, None], bmin_g[None, :])
    hi = jnp.minimum(bmax_f[:, None], bmax_g[None, :])
    inter_v = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    vol_f = jnp.prod(jnp.maximum(bmax_f - bmin_f, 0.0), axis=-1)
    vol_g = jnp.prod(jnp.maximum(bmax_g - bmin_g, 0.0), axis=-1)
    union_v = vol_f[:, None] + vol_g[None, :] - inter_v
    iou = inter_v / jnp.maximum(union_v, 1e-10)
    vmin = jnp.minimum(vol_f[:, None], vol_g[None, :])
    cont = inter_v / jnp.maximum(vmin, 1e-10)
    vol_ratio = jnp.maximum(vol_f[:, None], vol_g[None, :]) / jnp.maximum(
        vmin, 1e-10
    )
    vv = frame_inst.valid[:, None] & global_inst.valid[None, :]
    adj = vv & ((iou > iou_thresh) | ((cont > 0.5) & (vol_ratio < 64.0))) & (
        ratio > overlap_thresh
    )
    umin = jnp.minimum(frame_inst.bbox_min[:, None], global_inst.bbox_min[None, :])
    umax = jnp.maximum(frame_inst.bbox_max[:, None], global_inst.bbox_max[None, :])
    adj = adj & (jnp.max(umax - umin, axis=-1) <= max_extent)

    # ---- one target per frame instance; one winner per lane ----------------
    score = jnp.where(adj, ratio, -1.0)
    best_g = jnp.argmax(score, axis=1)  # (F,)
    best_r = jnp.max(score, axis=1)
    merged_f = best_r > 0.0
    m = jnp.where(
        merged_f[:, None] & (best_g[:, None] == jnp.arange(gcap)[None, :]),
        best_r[:, None],
        -1.0,
    )  # (F, G)
    win_f = jnp.argmax(m, axis=0)  # (G,)
    has_w = jnp.max(m, axis=0) > 0.0
    winner_used = merged_f & (win_f[best_g] == jnp.arange(fcap)) & has_w[best_g]

    # ---- union winner rows/keys into their lanes (selected lanes only) -----
    rows_u, count_u = _union_lanes(
        global_inst.rows, global_inst.count, best_g, winner_used,
        frame_inst.rows,
    )
    ckeys_u, ccount_u = _union_lanes(
        global_inst.ckeys, global_inst.ccount, best_g, winner_used,
        frame_inst.ckeys,
    )
    wsel = has_w.astype(jnp.float32)
    feat_sum = global_inst.feat_sum + wsel[:, None] * frame_inst.feat_sum[win_f]
    weight = global_inst.weight + wsel * frame_inst.weight[win_f]
    bbox_min = jnp.where(
        has_w[:, None],
        jnp.minimum(global_inst.bbox_min, frame_inst.bbox_min[win_f]),
        global_inst.bbox_min,
    )
    bbox_max = jnp.where(
        has_w[:, None],
        jnp.maximum(global_inst.bbox_max, frame_inst.bbox_max[win_f]),
        global_inst.bbox_max,
    )
    dsig = jnp.where(
        has_w[:, None],
        jnp.maximum(global_inst.dsig, frame_inst.dsig[win_f]),
        global_inst.dsig,
    )
    valid = global_inst.valid

    # ---- append unmerged frame instances into free lanes -------------------
    unmerged = frame_inst.valid & ~winner_used  # (F,)
    free = ~valid  # (G,)
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank among free lanes
    n_free = free.sum()
    lane_of_rank = jnp.full((gcap + 1,), gcap, jnp.int32)
    lane_of_rank = lane_of_rank.at[
        jnp.where(free, free_rank, gcap)
    ].set(jnp.arange(gcap, dtype=jnp.int32))
    unm_rank = jnp.cumsum(unmerged.astype(jnp.int32)) - 1
    # j-th unmerged frame instance -> j-th free lane (overflow drops, matching
    # merge_round's capacity drop; the periodic full round recompacts)
    dest = jnp.where(
        unmerged & (unm_rank < n_free),
        lane_of_rank[jnp.clip(unm_rank, 0, gcap)],
        gcap,
    )  # (F,) in [0, gcap]
    def put(tab, vals, fill_ok=None):
        wide = jnp.concatenate([tab, tab[-1:]], axis=0)
        wide = wide.at[dest].set(vals)
        return wide[:gcap]

    rows_u = put(rows_u, frame_inst.rows)
    count_u = put(count_u, frame_inst.count)
    ckeys_u = put(ckeys_u, frame_inst.ckeys)
    ccount_u = put(ccount_u, frame_inst.ccount)
    feat_sum = put(feat_sum, frame_inst.feat_sum)
    weight = put(weight, frame_inst.weight)
    bbox_min = put(bbox_min, frame_inst.bbox_min)
    bbox_max = put(bbox_max, frame_inst.bbox_max)
    dsig = put(dsig, frame_inst.dsig)
    placed = jnp.zeros((gcap + 1,), bool).at[dest].set(unmerged)[:gcap]
    valid = valid | placed

    return InstanceSet(
        rows=rows_u, count=count_u, feat_sum=feat_sum, weight=weight,
        bbox_min=bbox_min, bbox_max=bbox_max, valid=valid,
        ckeys=ckeys_u, ccount=ccount_u, dsig=dsig,
    )
