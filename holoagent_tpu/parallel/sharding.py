"""Sharding rules for model parameters and activations.

Tensor parallelism follows the Megatron split expressed purely as shardings:
QKV and MLP-up weights shard their OUTPUT columns over the "model" axis,
attention-out and MLP-down shard their INPUT rows, so each block needs exactly
one psum (inserted by XLA at the row-sharded matmuls).  Stacked per-layer
parameters (leading `layers` axis) keep the layer axis unsharded.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, rank: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over "data"."""
    return NamedSharding(mesh, P(*(("data",) + (None,) * (rank - 1))))


_BLOCK_SPECS: Dict[str, P] = {
    # stacked block params: axis 0 = layers (unsharded)
    "ln1_g": P(None, None),
    "ln1_b": P(None, None),
    "wqkv": P(None, None, "model"),  # column split -> heads sharded
    "bqkv": P(None, "model"),
    "wo": P(None, "model", None),  # row split -> psum after
    "bo": P(None, None),
    "ln2_g": P(None, None),
    "ln2_b": P(None, None),
    "w1": P(None, None, "model"),
    "b1": P(None, "model"),
    "w2": P(None, "model", None),
    "b2": P(None, None),
}


def clip_param_sharding(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree for a CLIP params pytree (see models.clip).

    Tower embeddings/projections replicate (they are small); the stacked
    transformer blocks shard per _BLOCK_SPECS.
    """

    def tower(tree: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        for k, v in tree.items():
            if k == "blocks":
                out[k] = {
                    bk: NamedSharding(mesh, _BLOCK_SPECS[bk]) for bk in v
                }
            else:
                out[k] = replicated(mesh)
        return out

    return {
        "visual": tower(params["visual"]),
        "text": tower(params["text"]),
        "logit_scale": replicated(mesh),
    }


def shard_params(params: Any, mesh: Mesh, spec_fn=clip_param_sharding) -> Any:
    """Device-put a params pytree with the given sharding rule."""
    shardings = spec_fn(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
