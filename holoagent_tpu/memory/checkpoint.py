"""Array-store checkpointing for on-device mapping state.

The reference checkpoints only host artifacts (ply/json/npy, SURVEY.md §5.4);
the streaming mapper additionally has live HBM state (SceneState +
InstanceSet) that must survive restarts for long multi-session runs.  Orbax
saves/restores those pytrees as a single array store; graph artifacts keep the
ply+json schema (memory.nodes).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..ops.voxel import GridSpec
from .instances import InstanceSet
from .scene import SceneState


def save_mapper_state(path: str | Path, scene: SceneState, instances: InstanceSet) -> None:
    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    state = {
        "scene": scene._asdict(),
        "instances": instances._asdict(),
    }
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def load_mapper_state(path: str | Path) -> Tuple[SceneState, InstanceSet]:
    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path)
    scene_d = restored["scene"]
    grid = scene_d["grid"]
    scene = SceneState(
        grid=GridSpec(
            voxel_size=jax.numpy.asarray(grid["voxel_size"]),
            origin=jax.numpy.asarray(grid["origin"]),
        ),
        **{k: jax.numpy.asarray(v) for k, v in scene_d.items() if k != "grid"},
    )
    inst_d = {k: jax.numpy.asarray(v) for k, v in restored["instances"].items()}
    from .instances import SIG_BUCKETS

    i_cap, k_cap = inst_d["rows"].shape
    backfill = (
        "ckeys" not in inst_d
        or "dsig" not in inst_d
        # STALE-FORMAT ckeys: revisions before COARSE_FACTOR 2.0 -> 1.0 saved
        # (i_cap, k_cap // 2) key sets on the 2x-coarse grid.  Restoring them
        # verbatim would make the next seq_merge_step concat fail on the
        # width mismatch — or, worse, merge against wrong-scale adjacency
        # cells via dsig.  The width mismatch is the format tag: recompute
        # from the scene (rows ARE scene voxel rows, so the sets a fresh run
        # would hold are fully recoverable).
        or inst_d["ckeys"].shape[1] != k_cap
        or inst_d.get("dsig") is not None
        and inst_d["dsig"].shape[1] != SIG_BUCKETS
    )
    if backfill:
        # checkpoints written before the coarse-key / dilated-signature merge
        # upgrades lack those fields (or carry the stale widths above); place
        # empty ones so the NamedTuple constructs, then recompute the real
        # sets from the scene below (the production merge fold is
        # coarse_only=True, under which empty sets would never merge)
        # adjacency-cell sets share the row capacity (COARSE_FACTOR 1)
        inst_d["ckeys"] = jax.numpy.full(
            (i_cap, k_cap), 2**31 - 1, jax.numpy.int32
        )
        inst_d["ccount"] = jax.numpy.zeros((i_cap,), jax.numpy.int32)
        inst_d["dsig"] = jax.numpy.zeros((i_cap, SIG_BUCKETS), jax.numpy.float32)
    inst = InstanceSet(**inst_d)
    if backfill:
        from .instances import recompute_coarse_keys

        inst = recompute_coarse_keys(scene, inst)
    return scene, inst


def save_params(path, params) -> None:
    """Persist a model parameter pytree (CLIP/SAM/VLM — e.g. a distilled or
    converted checkpoint) as an orbax array store."""
    p = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(p, params, force=True)
    ckptr.wait_until_finished()


def load_params(path):
    """Restore a parameter pytree saved by save_params (arrays as jnp)."""
    p = Path(path).resolve()
    restored = ocp.StandardCheckpointer().restore(p)
    return jax.tree.map(jax.numpy.asarray, restored)
