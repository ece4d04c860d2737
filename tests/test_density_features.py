"""Direct unit tests for ops.density (radius outlier removal) and
ops.features (feature-space denoising) — previously exercised only through
the mapping pipeline."""

import jax.numpy as jnp
import numpy as np

from holoagent_tpu.ops.density import radius_density_keep
from holoagent_tpu.ops.features import dominant_feature


def test_radius_density_keeps_cluster_drops_outliers(rng):
    """A dense blob survives; isolated far points are removed (the o3d
    remove_radius_outlier contract at the reference's operating point)."""
    blob = rng.normal(0, 0.2, (500, 3)).astype(np.float32)
    outliers = np.array([[30.0, 30.0, 0.0], [-25.0, 10.0, 5.0]], np.float32)
    pts = np.concatenate([blob, outliers])
    valid = np.ones(len(pts), bool)
    weights = np.ones(len(pts), np.float32)
    keep = np.asarray(
        radius_density_keep(
            jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(weights),
            radius=1.0, min_neighbors=50.0,
        )
    )
    assert keep[:500].all()
    assert not keep[500:].any()


def test_radius_density_respects_weights(rng):
    """Voxel hit counts act as multiplicity: one point with weight 100
    clears a min_neighbors=50 bar on its own."""
    pts = np.array([[0.0, 0.0, 0.0], [50.0, 0.0, 0.0]], np.float32)
    w = np.array([100.0, 1.0], np.float32)
    keep = np.asarray(
        radius_density_keep(
            jnp.asarray(pts), jnp.ones(2, bool), jnp.asarray(w),
            radius=1.0, min_neighbors=50.0,
        )
    )
    assert keep[0] and not keep[1]


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def test_dominant_feature_picks_main_cluster(rng):
    """20 near-identical members + 3 scattered ones -> the cluster mean, not
    the global mean (reference feats_denoise_dbscan largest-cluster mean)."""
    d = 16
    anchor = _unit(rng.normal(size=d))
    cluster = np.stack([_unit(anchor + rng.normal(0, 0.003, d)) for _ in range(20)])
    noise = np.stack([_unit(rng.normal(size=d)) for _ in range(3)])
    feats = np.concatenate([cluster, noise]).astype(np.float32)
    valid = np.ones(len(feats), bool)
    out = np.asarray(
        dominant_feature(jnp.asarray(feats), jnp.asarray(valid), eps=0.01, min_points=5.0)
    )
    assert float(out @ anchor) > 0.999
    # below min_points: falls back to the mean of everything
    out2 = np.asarray(
        dominant_feature(jnp.asarray(feats), jnp.asarray(valid), eps=0.01, min_points=100.0)
    )
    ref = _unit(feats.mean(0))
    assert float(out2 @ ref) > 0.999


def test_dominant_feature_empty():
    d = 8
    feats = np.zeros((4, d), np.float32)
    out = np.asarray(
        dominant_feature(jnp.asarray(feats), jnp.zeros(4, bool), eps=0.01, min_points=2.0)
    )
    np.testing.assert_allclose(out, 0.0)
