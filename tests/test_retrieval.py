import jax
import jax.numpy as jnp
import numpy as np

from holoagent_tpu.ops import retrieval
from holoagent_tpu.parallel import make_mesh
from holoagent_tpu.config import MeshConfig


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_topk_cosine_matches_numpy(rng):
    g = _norm(rng.normal(size=(100, 16))).astype(np.float32)
    q = _norm(rng.normal(size=(5, 16))).astype(np.float32)
    valid = np.ones(100, bool)
    valid[50:] = False
    s, i = retrieval.topk_cosine(jnp.asarray(g), jnp.asarray(valid), jnp.asarray(q), 7)
    ref_scores = q @ g.T
    ref_scores[:, ~valid] = -np.inf
    ref_top = np.argsort(-ref_scores, axis=1)[:, :7]
    np.testing.assert_array_equal(np.sort(np.asarray(i), 1), np.sort(ref_top, 1))


def test_topk_sharded_matches_dense(rng):
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    n = 64 * mesh.shape["data"]
    g = _norm(rng.normal(size=(n, 32))).astype(np.float32)
    q = _norm(rng.normal(size=(3, 32))).astype(np.float32)
    valid = np.ones(n, bool)
    s_ref, i_ref = retrieval.topk_cosine(jnp.asarray(g), jnp.asarray(valid), jnp.asarray(q), 5)
    s, i = retrieval.topk_cosine_sharded(
        jnp.asarray(g), jnp.asarray(valid), jnp.asarray(q), 5, mesh
    )
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_class_filtered_topk(rng):
    d = 8
    # three well-separated class directions
    class_feats = _norm(np.eye(3, d)).astype(np.float32)
    # gallery: 4 instances of class 0, 4 of class 1
    g = np.concatenate(
        [
            _norm(class_feats[0] + 0.1 * rng.normal(size=(4, d))),
            _norm(class_feats[1] + 0.1 * rng.normal(size=(4, d))),
        ]
    ).astype(np.float32)
    valid = np.ones(8, bool)
    s, i = retrieval.class_filtered_topk(
        jnp.asarray(g),
        jnp.asarray(valid),
        jnp.asarray(class_feats[1]),
        jnp.asarray(class_feats),
        jnp.int32(1),
        4,
    )
    i = np.asarray(i)
    s = np.asarray(s)
    assert set(i[s > -np.inf]) <= {4, 5, 6, 7}  # only class-1 instances retrieved
    assert (s > -np.inf).sum() == 4
