import jax.numpy as jnp
import numpy as np

from holoagent_tpu.ops.compact import group_unique, unique_compact, I32_MAX


def test_group_unique_basic():
    groups = jnp.asarray(np.array([0, 0, 1, 1, 1, 2, 0], np.int32))
    values = jnp.asarray(np.array([5, 3, 7, 7, 2, 9, 5], np.int32))
    valid = jnp.asarray(np.array([1, 1, 1, 1, 1, 1, 1], bool))
    out, cnt = group_unique(groups, values, valid, num_groups=3, capacity=4)
    out = np.asarray(out)
    np.testing.assert_array_equal(np.asarray(cnt), [2, 2, 1])
    np.testing.assert_array_equal(out[0, :2], [3, 5])
    np.testing.assert_array_equal(out[1, :2], [2, 7])
    assert out[2, 0] == 9
    assert (out[0, 2:] == int(I32_MAX)).all()


def test_group_unique_invalid_and_overflow():
    rng = np.random.default_rng(0)
    groups = rng.integers(0, 4, 500).astype(np.int32)
    values = rng.integers(0, 50, 500).astype(np.int32)
    valid = rng.uniform(size=500) > 0.3
    out, cnt = group_unique(
        jnp.asarray(groups), jnp.asarray(values), jnp.asarray(valid), 4, 8
    )
    out, cnt = np.asarray(out), np.asarray(cnt)
    for gidx in range(4):
        ref = np.unique(values[(groups == gidx) & valid])
        k = min(len(ref), 8)
        assert cnt[gidx] == k
        np.testing.assert_array_equal(out[gidx, :k], ref[:k])  # smallest kept


def test_unique_compact():
    v = jnp.asarray(np.array([9, 1, 1, 4, 9, 2], np.int32))
    out, cnt = unique_compact(v, jnp.ones(6, bool), 10)
    np.testing.assert_array_equal(np.asarray(out)[:4], [1, 2, 4, 9])
    assert int(cnt) == 4


def test_group_unique_empty_group():
    groups = jnp.asarray(np.array([2, 2], np.int32))
    values = jnp.asarray(np.array([1, 2], np.int32))
    out, cnt = group_unique(groups, values, jnp.ones(2, bool), 3, 4)
    np.testing.assert_array_equal(np.asarray(cnt), [0, 0, 2])
