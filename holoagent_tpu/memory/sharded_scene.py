"""Sharded voxel scene: insert/fuse distributed over the mesh's data axis.

SURVEY.md §5.8's core new-design obligation: the reference has no distributed
scene state at all (single-GPU torch + cKDTree fusion, reference
fsr_vln/memory/hmsg/graph/graph.py:339-415); here the HBM-resident voxel
scene (memory/scene.py) is row-sharded over the ICI mesh so insert + feature
fusion scale with the slice, the way DP-over-frames already scales extraction.

Design
------
* **Ownership**: every voxel key is owned by exactly one shard, chosen by a
  multiplicative hash of the packed key (``_owner_of``) — spatially
  interleaved, so a single room spreads across all chips instead of hotspotting
  one (a key-RANGE split would put a whole floor on one chip).
* **Exchange unit = frame-voxel aggregates, not pixels.** Each device first
  voxel-downsamples its pixel shard locally (sort + segment-sum, ops/voxel.py)
  and only then exchanges the per-voxel sums ``(key, Σp·w, Σc·w, w)`` with an
  ``all_to_all`` over the data axis.  A 640×480 frame touches a few thousand
  5 cm voxels, so the wire volume is ~2 orders below the pixel count.
* **Stable global rows**: shard ``s`` appends into rows
  ``[s·C_local, (s+1)·C_local)``; global row = ``owner·C_local + local_row``.
  The reverse ``all_to_all`` returns each sender its assigned rows, so
  ``insert_points_sharded`` hands back per-pixel global rows exactly like the
  single-device ``insert_points`` — downstream (instances, eval) is unchanged.
* **Feature fusion** computes per-pixel ConceptFusion features locally
  (masks × f_masks einsum on the pixel shard), compacts them per global row
  (one sort + segment-sum), and exchanges the per-row feature sums the same
  way.  D-wide traffic is proportional to *rows touched*, not pixels.

All shapes static; overflow lanes drop to trash rows as in the single-device
path.  ``to_scene`` gathers the shards back into a plain SceneState with the
used rows COMPACTED to the front (downstream slices ``[:num]``), returning a
row map so callers translate the global row ids insert handed out.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import voxel
from ..ops.voxel import GridSpec, SENTINEL
from .scene import SceneState

_HASH_MUL = np.uint32(2654435761)  # Knuth hash (numpy: no backend init at import)


def _owner_of(keys: jnp.ndarray, n: int) -> jnp.ndarray:
    """Shard owning each voxel key (int32 in [0, n); undefined on SENTINEL)."""
    h = keys.astype(jnp.uint32) * _HASH_MUL
    return ((h >> jnp.uint32(17)).astype(jnp.int32)) % n


class ShardedScene(NamedTuple):
    """SceneState arrays with global shape (n_shards * c_local, ...), sharded
    P("data") on axis 0.  ``num`` is (n_shards,), one used-rows counter per
    shard.  ``sorted_key/sorted_row`` index *within* each shard block."""

    grid: GridSpec
    key: jnp.ndarray
    sorted_key: jnp.ndarray
    sorted_row: jnp.ndarray  # local row ids within the shard
    sum_pts: jnp.ndarray
    sum_col: jnp.ndarray
    count: jnp.ndarray
    sum_feat: jnp.ndarray
    feat_count: jnp.ndarray
    num: jnp.ndarray  # (n_shards,) int32

    @property
    def capacity_per_shard(self) -> int:
        return self.key.shape[0] // self.num.shape[0]

    @property
    def n_shards(self) -> int:
        return self.num.shape[0]


def init_sharded_scene(
    grid: GridSpec, capacity_per_shard: int, feat_dim: int, mesh: Mesh
) -> ShardedScene:
    n = mesh.shape["data"]
    c = n * capacity_per_shard
    row = NamedSharding(mesh, P("data"))
    row2 = NamedSharding(mesh, P("data", None))
    put = jax.device_put
    return ShardedScene(
        grid=grid,
        key=put(jnp.full((c,), SENTINEL, jnp.int32), row),
        sorted_key=put(jnp.full((c,), SENTINEL, jnp.int32), row),
        sorted_row=put(jnp.zeros((c,), jnp.int32), row),
        sum_pts=put(jnp.zeros((c, 3), jnp.float32), row2),
        sum_col=put(jnp.zeros((c, 3), jnp.float32), row2),
        count=put(jnp.zeros((c,), jnp.float32), row),
        sum_feat=put(jnp.zeros((c, feat_dim), jnp.float32), row2),
        feat_count=put(jnp.zeros((c,), jnp.float32), row),
        num=put(jnp.zeros((n,), jnp.int32), row),
    )


def _bucket_slots(owner: jnp.ndarray, valid: jnp.ndarray, n: int, bcap: int):
    """Slot of each element in a fixed (n, bcap) send buffer laid out by
    owner: slot = owner*bcap + rank-within-owner.  Overflow/invalid -> n*bcap
    (trash).  One sort, no per-owner loops."""
    m = owner.shape[0]
    g = jnp.where(valid, owner, n)
    idx = jnp.arange(m, dtype=jnp.int32)
    g_s, idx_s = jax.lax.sort((g, idx), num_keys=1)
    ar = jnp.arange(m, dtype=jnp.int32)
    new_g = jnp.concatenate([jnp.ones((1,), bool), g_s[1:] != g_s[:-1]])
    base = jax.lax.associative_scan(jnp.maximum, jnp.where(new_g, ar, 0))
    rank = ar - base
    slot_sorted = jnp.where(
        (g_s < n) & (rank < bcap), g_s * bcap + rank, n * bcap
    )
    return jnp.zeros((m,), jnp.int32).at[idx_s].set(slot_sorted)


def _scatter_to_buckets(slot, n, bcap, fill, *arrays):
    """Scatter each (m, ...) array into its (n, bcap, ...) send buffer."""
    out = []
    for a, f in zip(arrays, fill):
        extra = (1,) * (a.ndim - 1)
        buf = jnp.full((n * bcap + 1,) + a.shape[1:], f, a.dtype)
        buf = buf.at[slot].set(a)[: n * bcap]
        out.append(buf.reshape((n, bcap) + a.shape[1:]))
    return out


def _merge_aggregates(
    grid, key, sorted_key, sorted_row, sum_pts, sum_col, count, num,
    in_key, in_spts, in_scol, in_cnt,
):
    """Merge already-summed voxel aggregates (possibly with duplicate keys)
    into one shard's scene block.  Mirrors scene.insert_points but takes sums
    instead of raw points.  Returns updated arrays + the local row assigned to
    every input slot (-1 where invalid/overflow)."""
    c = key.shape[0]
    m = in_key.shape[0]
    valid_in = in_key != SENTINEL
    # dedupe incoming keys: sort + segment-sum
    idx = jnp.arange(m, dtype=jnp.int32)
    k_s, i_s = jax.lax.sort((jnp.where(valid_in, in_key, SENTINEL), idx), num_keys=1)
    v_s = k_s != SENTINEL
    first = jnp.concatenate([jnp.ones((1,), bool), k_s[1:] != k_s[:-1]]) & v_s
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg_c = jnp.where(v_s & (seg >= 0), seg, m)  # <= m segments
    uspts = jnp.zeros((m + 1, 3), jnp.float32).at[seg_c].add(in_spts[i_s])
    uscol = jnp.zeros((m + 1, 3), jnp.float32).at[seg_c].add(in_scol[i_s])
    ucnt = jnp.zeros((m + 1,), jnp.float32).at[seg_c].add(
        jnp.where(v_s, in_cnt[i_s], 0.0)
    )
    ukey = jnp.full((m + 1,), SENTINEL, jnp.int32).at[seg_c].min(k_s)
    ukey, uspts, uscol, ucnt = ukey[:m], uspts[:m], uscol[:m], ucnt[:m]
    uvalid = ukey != SENTINEL

    row_existing = voxel.lookup(sorted_key, ukey)
    row_existing = jnp.where(row_existing >= 0, sorted_row[jnp.clip(row_existing, 0)], -1)
    is_new = uvalid & (row_existing < 0)
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    new_row = num + new_rank
    overflow = new_row >= c
    row_of_u = jnp.where(
        is_new & ~overflow, new_row, jnp.where(uvalid, row_existing, -1)
    )
    safe_rows = jnp.where(is_new & ~overflow, new_row, c)
    key2 = jnp.concatenate([key, jnp.zeros((1,), jnp.int32)])
    key2 = key2.at[safe_rows].set(jnp.where(is_new, ukey, 0))[:c]
    num2 = jnp.minimum(num + jnp.sum((is_new & ~overflow).astype(jnp.int32)), c)
    skey, srow = jax.lax.sort((key2, jnp.arange(c, dtype=jnp.int32)), num_keys=1)
    tgt = jnp.where(row_of_u >= 0, row_of_u, c)
    sum_pts2 = jnp.concatenate([sum_pts, jnp.zeros((1, 3))]).at[tgt].add(uspts)[:c]
    sum_col2 = jnp.concatenate([sum_col, jnp.zeros((1, 3))]).at[tgt].add(uscol)[:c]
    count2 = jnp.concatenate([count, jnp.zeros((1,))]).at[tgt].add(ucnt)[:c]
    # map every input slot back to its segment's local row
    row_per_sorted = jnp.where(seg_c < m, row_of_u[jnp.clip(seg_c, 0, m - 1)], -1)
    row_per_input = jnp.zeros((m,), jnp.int32).at[i_s].set(row_per_sorted)
    row_per_input = jnp.where(valid_in, row_per_input, -1)
    return key2, skey, srow, sum_pts2, sum_col2, count2, num2, row_per_input


@partial(jax.jit, static_argnames=("mesh", "fcap", "bcap"))
def insert_points_sharded(
    scene: ShardedScene,
    points: jnp.ndarray,  # (P, 3) world, P divisible by the data axis
    colors: jnp.ndarray,  # (P, 3)
    valid: jnp.ndarray,  # (P,)
    mesh: Mesh,
    fcap: int = 1 << 14,  # per-device frame-voxel capacity
    bcap: int = 1 << 12,  # per-owner bucket capacity
) -> Tuple[ShardedScene, jnp.ndarray]:
    """Sharded insert_points: returns (scene, per-pixel GLOBAL row ids (P,),
    -1 for invalid/overflow).  Pixels shard over the data axis; the voxel
    aggregates ride one all_to_all there and one back."""
    n = mesh.shape["data"]
    c_local = scene.capacity_per_shard
    grid = scene.grid

    def shard_fn(key, skey, srow, spts, scol, cnt, sfeat, fcnt, num,
                 pts, cols, val):
        num = num[0]
        down = voxel.voxel_downsample(
            pts, cols, val, grid, capacity=fcap, return_segments=True
        )
        fkeys, fvalid = down["key"], down["valid"]
        owner = _owner_of(fkeys, n)
        slot = _bucket_slots(owner, fvalid, n, bcap)
        send_key, = _scatter_to_buckets(slot, n, bcap, [SENTINEL], fkeys)
        w = down["count"][:, None]
        send_spts, send_scol, send_cnt = _scatter_to_buckets(
            slot, n, bcap, [0.0, 0.0, 0.0],
            down["points"] * w, down["attrs"] * w, down["count"],
        )
        recv_key = jax.lax.all_to_all(send_key, "data", 0, 0, tiled=True)
        recv_spts = jax.lax.all_to_all(send_spts, "data", 0, 0, tiled=True)
        recv_scol = jax.lax.all_to_all(send_scol, "data", 0, 0, tiled=True)
        recv_cnt = jax.lax.all_to_all(send_cnt, "data", 0, 0, tiled=True)
        (key2, skey2, srow2, spts2, scol2, cnt2, num2, rows_in) = _merge_aggregates(
            grid, key, skey, srow, spts, scol, cnt, num,
            recv_key.reshape(-1), recv_spts.reshape(-1, 3),
            recv_scol.reshape(-1, 3), recv_cnt.reshape(-1),
        )
        # send the assigned local rows back to the producers
        rows_back = jax.lax.all_to_all(
            rows_in.reshape(n, bcap), "data", 0, 0, tiled=True
        )  # [o, p] = local row at owner o for my bucket slot p
        fslot_owner = jnp.clip(slot // bcap, 0, n - 1)
        fslot_pos = slot % bcap
        local_row = rows_back[fslot_owner, fslot_pos]
        grow = jnp.where(
            (slot < n * bcap) & (local_row >= 0),
            fslot_owner * c_local + local_row,
            -1,
        )
        seg = down["segments"]
        pix_row = jnp.where(seg >= 0, grow[jnp.clip(seg, 0)], -1)
        return (key2, skey2, srow2, spts2, scol2, cnt2, sfeat, fcnt,
                num2[None], pix_row)

    row = P("data")
    row2 = P("data", None)
    out = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(row, row, row, row2, row2, row, row2, row, row,
                  row2, row2, row),
        out_specs=(row, row, row, row2, row2, row, row2, row, row, row),
        check_vma=False,
    )(
        scene.key, scene.sorted_key, scene.sorted_row, scene.sum_pts,
        scene.sum_col, scene.count, scene.sum_feat, scene.feat_count,
        scene.num, points, colors, valid,
    )
    (key2, skey2, srow2, spts2, scol2, cnt2, sfeat, fcnt, num2, pix_row) = out
    scene2 = scene._replace(
        key=key2, sorted_key=skey2, sorted_row=srow2, sum_pts=spts2,
        sum_col=scol2, count=cnt2, num=num2,
    )
    return scene2, pix_row


@partial(jax.jit, static_argnames=("mesh", "rcap", "bcap"))
def fuse_pixel_features_sharded(
    scene: ShardedScene,
    pix_rows: jnp.ndarray,  # (P,) global rows from insert_points_sharded
    masks: jnp.ndarray,  # (M, P) bool
    mask_valid: jnp.ndarray,  # (M,)
    f_masks: jnp.ndarray,  # (M, D)
    mesh: Mesh,
    rcap: int = 1 << 14,  # per-device touched-row capacity
    bcap: int = 1 << 12,
) -> ShardedScene:
    """Sharded ConceptFusion feature fusion (scene.fuse_pixel_features
    semantics): per-pixel features computed on the pixel shard, compacted per
    global row, exchanged to row owners, scatter-added there."""
    n = mesh.shape["data"]
    c_local = scene.capacity_per_shard
    d = f_masks.shape[1]

    def shard_fn(sfeat, fcnt, rows, mk, mv, fm):
        fm0 = jnp.where(mv[:, None], fm, 0.0)
        f = jnp.einsum(
            "mp,md->pd", mk.astype(jnp.float32), fm0,
            preferred_element_type=jnp.float32,
        )
        norm = jnp.linalg.norm(f, axis=-1, keepdims=True)
        covered = (norm[:, 0] > 1e-9) & (rows >= 0)
        f = jnp.where(covered[:, None], f / jnp.maximum(norm, 1e-9), 0.0)
        # compact by global row: sort + segment-sum
        p = rows.shape[0]
        r = jnp.where(covered, rows, jnp.int32(2**31 - 1))
        idx = jnp.arange(p, dtype=jnp.int32)
        r_s, i_s = jax.lax.sort((r, idx), num_keys=1)
        v_s = r_s != jnp.int32(2**31 - 1)
        first = jnp.concatenate([jnp.ones((1,), bool), r_s[1:] != r_s[:-1]]) & v_s
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1
        seg_c = jnp.where(v_s & (seg >= 0) & (seg < rcap), seg, rcap)
        usum = jnp.zeros((rcap + 1, d), jnp.float32).at[seg_c].add(f[i_s])
        ucnt = jnp.zeros((rcap + 1,), jnp.float32).at[seg_c].add(
            v_s.astype(jnp.float32)
        )
        urow = jnp.full((rcap + 1,), -1, jnp.int32).at[seg_c].max(r_s)
        usum, ucnt, urow = usum[:rcap], ucnt[:rcap], urow[:rcap]
        uvalid = urow >= 0
        owner = jnp.clip(urow // c_local, 0, n - 1)
        slot = _bucket_slots(jnp.where(uvalid, owner, n), uvalid, n, bcap)
        send_row, = _scatter_to_buckets(
            slot, n, bcap, [-1], jnp.where(uvalid, urow % c_local, -1)
        )
        send_sum, send_cnt = _scatter_to_buckets(slot, n, bcap, [0.0, 0.0], usum, ucnt)
        recv_row = jax.lax.all_to_all(send_row, "data", 0, 0, tiled=True).reshape(-1)
        recv_sum = jax.lax.all_to_all(send_sum, "data", 0, 0, tiled=True).reshape(-1, d)
        recv_cnt = jax.lax.all_to_all(send_cnt, "data", 0, 0, tiled=True).reshape(-1)
        tgt = jnp.where(recv_row >= 0, recv_row, c_local)
        sfeat2 = jnp.concatenate([sfeat, jnp.zeros((1, d))]).at[tgt].add(recv_sum)[:c_local]
        fcnt2 = jnp.concatenate([fcnt, jnp.zeros((1,))]).at[tgt].add(recv_cnt)[:c_local]
        return sfeat2, fcnt2

    row = P("data")
    row2 = P("data", None)
    sfeat2, fcnt2 = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(row2, row, row, P(None, "data"), P(), P()),
        out_specs=(row2, row),
        check_vma=False,
    )(scene.sum_feat, scene.feat_count, pix_rows, masks, mask_valid, f_masks)
    return scene._replace(sum_feat=sfeat2, feat_count=fcnt2)


def wire_bytes_per_frame(mesh, d: int, fcap: int = 1 << 14, bcap: int = 1 << 12) -> dict:
    """Per-device all_to_all bytes ONE frame's insert+fuse puts on the ICI.

    Accounts the actual padded exchange buffers (all_to_all moves the whole
    fixed-shape buffer regardless of fill):

      insert: key i32 + Σp 3×f32 + Σc 3×f32 + w f32 forward, assigned rows
              i32 back  → n·bcap·36 B
      fuse:   row i32 + feature-sum d×f32 + weight f32 forward → n·bcap·(8+4d) B

    This quantifies the module-docstring claim that the exchange unit is
    frame-voxel aggregates rather than pixels (sharded_scene.py header): the
    comparable pixel volume is H·W·(rgb+depth+D-feature) floats per frame."""
    n = mesh.shape["data"]
    return {
        "data_axis": n,
        "insert_bytes": n * bcap * 36,
        "fuse_bytes": n * bcap * (8 + 4 * d),
        "total_bytes": n * bcap * (44 + 4 * d),
    }


def to_scene(sharded: ShardedScene) -> Tuple[SceneState, jnp.ndarray]:
    """Gather the shards into a plain SceneState, COMPACTING the used rows to
    the front: the sharded layout leaves each shard's unused tail inside the
    concatenated buffer, and downstream consumers slice `[:scene.num]`
    (memory/hmsg.py floor/room materialization, apps/build_map ply export) —
    a non-compacted gather would drop used rows past `num` and admit empty
    rows before it.

    Returns (scene, row_map (n_total,) int32): row_map[global_row] = compact
    row (or -1 for unused lanes) so callers remap any per-pixel/instance row
    ids handed out by insert_points_sharded."""
    c = sharded.key.shape[0]
    count = np.asarray(jax.device_get(sharded.count))
    used = np.nonzero(count > 0)[0].astype(np.int32)
    n = len(used)
    row_map = np.full((c,), -1, np.int32)
    row_map[used] = np.arange(n, dtype=np.int32)

    def compact(arr, fill=0.0, dtype=None):
        a = np.asarray(jax.device_get(arr))
        out = np.full((c,) + a.shape[1:], fill, dtype or a.dtype)
        out[:n] = a[used]
        return jnp.asarray(out)

    key = compact(sharded.key, fill=int(SENTINEL), dtype=np.int32)
    skey, srow = jax.lax.sort(
        (key, jnp.arange(c, dtype=jnp.int32)), num_keys=1
    )
    scene = SceneState(
        grid=sharded.grid,
        key=key,
        sorted_key=skey,
        sorted_row=srow,
        sum_pts=compact(sharded.sum_pts),
        sum_col=compact(sharded.sum_col),
        count=compact(sharded.count),
        sum_feat=compact(sharded.sum_feat),
        feat_count=compact(sharded.feat_count),
        num=jnp.int32(n),
    )
    return scene, jnp.asarray(row_map)


# ---------------------------------------------------------------------------
# End-to-end multi-chip mapping driver
# ---------------------------------------------------------------------------


class ShardedMapper:
    """Multi-chip streaming mapper: DP-over-frames extraction + sharded scene.

    The full-slice composition of the mapping pipeline (SURVEY.md §2.4 +
    §5.8): frame batches extract data-parallel over the mesh
    (perception.extract_frames_dp), every frame's points/features then fuse
    into the row-sharded voxel scene via the all_to_all aggregate exchange
    above.  Instance lifting/merging runs on the gathered scene at finalize
    (its 2048-row sets are small; the per-frame heavy stages are what shard).

    finalize() returns a mapping.MappedScene, so HMSG construction and
    everything downstream is unchanged.
    """

    def __init__(self, cfg, clip_params, sam_params, mesh,
                 clip_variant=None, sam_variant=None):
        from ..models import clip as clip_mod
        from ..models import sam as sam_mod

        self.cfg = cfg
        self.mesh = mesh
        self.clip_params = clip_params
        self.sam_params = sam_params
        self.cv = clip_variant or clip_mod.VARIANTS[cfg.models.clip.type]
        self.sv = sam_variant or sam_mod.VARIANTS[cfg.models.sam.type]
        p = cfg.pipeline
        self.grid = GridSpec.centered(p.voxel_size)
        n = mesh.shape["data"]
        cap_local = -(-p.point_capacity // n)  # ceil split per shard
        self.scene = init_sharded_scene(self.grid, cap_local, self.cv.embed_dim, mesh)
        from . import instances as inst_mod

        # instance fold runs streaming per frame over GLOBAL row ids; rows
        # are remapped once at finalize when the scene compacts
        self.instances = inst_mod.empty_instances(
            p.instance_capacity, p.mask_point_capacity, self.cv.embed_dim
        )
        self.keyframes = []
        self._kf_feats = []

    def process_batch(self, frames) -> None:
        """Integrate a batch of frames.  Extraction pads the batch up to the
        mesh's data-axis multiple (repeating the last frame); only the real
        frames insert into the scene."""
        from ..ops.backproject import backproject
        from ..perception.extractor import extract_frames_dp
        from ..utils.camera import Pinhole

        cfg = self.cfg
        nd = self.mesh.shape["data"]
        n_real = len(frames)
        padded = list(frames) + [frames[-1]] * ((-n_real) % nd)
        images = jnp.asarray(np.stack([f.rgb for f in padded]))
        ff = extract_frames_dp(
            self.clip_params, self.sam_params, images, self.cv, self.sv,
            self.mesh,
            points_per_side=cfg.models.sam.points_per_side,
            pred_iou_thresh=cfg.models.sam.pred_iou_thresh,
            stability_thresh=cfg.models.sam.stability_score_thresh,
            min_area=float(cfg.models.sam.min_mask_region_area),
            max_masks=cfg.models.sam.max_masks,
            masked_weight=cfg.pipeline.clip_masked_weight,
            bbox_margin=float(cfg.pipeline.clip_bbox_margin),
        )
        for j, frame in enumerate(frames[:n_real]):
            cam = Pinhole.from_matrix(frame.k)
            pts, cols, valid = backproject(
                jnp.asarray(frame.depth), jnp.asarray(frame.rgb), cam,
                jnp.asarray(frame.pose), 1e-3, cfg.main.depth_cut,
            )
            # pixels shard over the data axis, so the documented
            # pipeline.frame_voxel_capacity knob splits per shard (ceil) —
            # without this, deep/long-range frames silently overflow to the
            # trash row at the hard-coded default on the multi-chip path
            fcap_local = -(-cfg.pipeline.frame_voxel_capacity // nd)
            self.scene, rows = insert_points_sharded(
                self.scene, pts, cols, valid, self.mesh, fcap=fcap_local
            )
            m = ff.masks.shape[1]
            masks_flat = ff.masks[j].reshape(m, -1)
            self.scene = fuse_pixel_features_sharded(
                self.scene, rows, masks_flat, ff.valid[j], ff.f_masks[j],
                self.mesh, rcap=fcap_local,
            )
            from . import instances as inst_mod

            p = self.cfg.pipeline
            n_pix = masks_flat.shape[1]
            stride = p.instance_pixel_stride or max(1, n_pix // 32768)
            finst = inst_mod.frame_instances(
                masks_flat, ff.valid[j], ff.f_masks[j], rows, pts, min_rows=3,
                k_cap=p.mask_point_capacity, stride=stride, grid=self.grid,
                max_area_frac=p.instance_max_area_frac,
                max_extent=p.instance_max_extent_m,
            )
            self.instances = inst_mod.seq_merge_step(
                self.instances, finst, p.init_overlap_thresh, p.iou_thresh,
                bbox_pad=0.5 * p.voxel_size, coarse_only=True,
                max_extent=p.instance_max_extent_m,
            )
            self.keyframes.append(frame)
            self._kf_feats.append(jax.device_get(ff.f_global[j]))

    def finalize(self):
        """Gather + compact the shards, remap the instance row ids into the
        compact numbering, and finish the merge fold."""
        from ..ops.compact import I32_MAX
        from ..ops.density import radius_density_keep
        from .mapping import MappedScene, refine_instance_features
        from . import instances as inst_mod

        scene, row_map = to_scene(self.scene)
        p = self.cfg.pipeline
        inst = self.instances
        # remap global (sharded-layout) rows to the compacted numbering;
        # signatures/merges treat rows as sets, so sortedness is not required
        rows = inst.rows
        remapped = jnp.where(
            rows != I32_MAX, row_map[jnp.clip(rows, 0, row_map.shape[0] - 1)], -1
        )
        rows2 = jnp.where(remapped >= 0, remapped, I32_MAX)
        inst = inst._replace(rows=rows2)
        inst = inst_mod.merge_round(
            inst, p.init_overlap_thresh, p.iou_thresh,
            out_cap=inst.rows.shape[0], bbox_pad=0.5 * p.voxel_size,
            coarse_only=True, max_extent=p.instance_max_extent_m,
        )
        keep = inst.count >= 10
        inst = inst._replace(valid=inst.valid & keep)
        feats = refine_instance_features(scene, inst, eps=p.feature_dbscan_eps)
        density = radius_density_keep(
            scene.points(), scene.valid(), scene.count,
            radius=1.0, min_neighbors=1000.0,
        )
        return MappedScene(
            scene=scene, instances=inst, instance_feats=feats,
            keyframes=list(self.keyframes),
            keyframe_feats=jnp.asarray(np.stack(self._kf_feats))
            if self._kf_feats else None,
            density_keep=density,
        )
