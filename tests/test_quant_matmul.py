"""Fused W8A8 Pallas matmul (ops/quant_matmul.py) vs the XLA reference path
(models/transformer.matmul_int8) — numerics in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from holoagent_tpu.models.transformer import matmul_int8, quantize_weight_int8
from holoagent_tpu.ops.quant_matmul import batched_quant_matmul, quant_matmul


def _setup(m, k, n, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.05, (k, n)).astype(np.float32))
    wq, ws = quantize_weight_int8(w)
    b = jnp.asarray(rng.normal(0, 0.1, (n,)).astype(np.float32))
    return x, w, wq, ws, b


def test_quant_matmul_matches_xla_path():
    x, w, wq, ws, b = _setup(96, 128, 256)
    ref = matmul_int8(x, wq, ws) + b
    got = quant_matmul(x, wq, ws, b, out_dtype=jnp.float32, interpret=True,
                       block_m=64, block_n=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-3)


def test_quant_matmul_gelu_epilogue_and_padding():
    # M not a multiple of block_m exercises the pad/slice path
    x, w, wq, ws, b = _setup(77, 128, 128, seed=1)
    ref = jax.nn.gelu(matmul_int8(x, wq, ws) + b)
    got = quant_matmul(x, wq, ws, b, act="gelu", out_dtype=jnp.float32,
                       interpret=True, block_m=64, block_n=128)
    assert got.shape == (77, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-3)


def test_batched_quant_matmul_leading_axes():
    x, w, wq, ws, b = _setup(4 * 32, 128, 128, seed=2)
    xb = x.reshape(4, 32, 128)
    ref = matmul_int8(xb, wq, ws) + b
    got = batched_quant_matmul(xb, wq, ws, b, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-3)
