import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoagent_tpu.models import clip as clip_mod
from holoagent_tpu.models import sam as sam_mod
from holoagent_tpu.perception import extract_frame_features, FrameFeatures
from holoagent_tpu.perception.extractor import per_pixel_features

CT = clip_mod.VARIANTS["test-tiny"]
ST = sam_mod.VARIANTS["test-tiny"]


@pytest.fixture(scope="module")
def models():
    return (
        clip_mod.init_clip(jax.random.key(0), CT),
        sam_mod.init_sam(jax.random.key(1), ST),
    )


def test_extract_frame_features(models):
    clip_p, sam_p = models
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(48, 64, 3)), jnp.float32)
    ff = extract_frame_features(
        clip_p,
        sam_p,
        img,
        CT,
        ST,
        points_per_side=4,
        pred_iou_thresh=-10.0,
        stability_thresh=0.0,
        min_area=0.0,
        max_masks=8,
        dtype=jnp.float32,
    )
    assert isinstance(ff, FrameFeatures)
    assert ff.masks.shape == (8, 48, 64)
    assert ff.f_masks.shape == (8, CT.embed_dim)
    v = np.asarray(ff.valid)
    fm = np.asarray(ff.f_masks)
    # valid rows are unit-norm, invalid rows are zero
    if v.any():
        np.testing.assert_allclose(np.linalg.norm(fm[v], axis=-1), 1.0, rtol=1e-4)
    assert (np.linalg.norm(fm[~v], axis=-1) < 1e-6).all()
    np.testing.assert_allclose(np.linalg.norm(np.asarray(ff.f_global)), 1.0, rtol=1e-4)


def test_per_pixel_features(models):
    clip_p, sam_p = models
    img = jnp.asarray(np.random.default_rng(1).uniform(size=(48, 64, 3)), jnp.float32)
    ff = extract_frame_features(
        clip_p, sam_p, img, CT, ST,
        points_per_side=4, pred_iou_thresh=-10.0, stability_thresh=0.0,
        min_area=0.0, max_masks=8, dtype=jnp.float32,
    )
    pp = per_pixel_features(ff)
    assert pp.shape == (48, 64, CT.embed_dim)
    cov = np.asarray(ff.masks).any(0)  # pixels covered by some mask
    norms = np.linalg.norm(np.asarray(pp, np.float32), axis=-1)
    if cov.any():
        np.testing.assert_allclose(norms[cov], 1.0, atol=1e-2)
    assert (norms[~cov] < 1e-6).all()


def test_extract_frames_dp_over_mesh(rng):
    """DP over frames on the 8-device mesh == per-frame extraction."""
    import jax
    import jax.numpy as jnp

    from holoagent_tpu.config import MeshConfig
    from holoagent_tpu.models import clip as clip_mod, sam as sam_mod
    from holoagent_tpu.parallel import make_mesh
    from holoagent_tpu.perception.extractor import (
        extract_frame_features,
        extract_frames_dp,
    )

    mesh = make_mesh(MeshConfig(data=-1, model=1))
    cv = clip_mod.VARIANTS["test-tiny"]
    sv = sam_mod.VARIANTS["test-tiny"]
    cp = clip_mod.init_clip(jax.random.key(0), cv)
    sp = sam_mod.init_sam(jax.random.key(1), sv)
    f = mesh.shape["data"]
    imgs = jnp.asarray(rng.uniform(0, 1, (f, 32, 48, 3)), jnp.float32)
    kw = dict(
        points_per_side=3, pred_iou_thresh=-10.0, stability_thresh=0.0,
        min_area=5.0, max_masks=4, dtype=jnp.float32,
    )
    batched = extract_frames_dp(cp, sp, imgs, cv, sv, mesh, **kw)
    single = extract_frame_features(cp, sp, imgs[0], cv, sv, **kw)
    assert batched.f_masks.shape == (f, 4, cv.embed_dim)
    np.testing.assert_allclose(
        np.asarray(batched.f_masks[0]), np.asarray(single.f_masks),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(batched.masks[0]), np.asarray(single.masks)
    )


def test_tiered_extract_matches_single_program(models):
    """extract_frame_features_tiered (mask stage -> host tier pick -> CLIP
    stage at the tier capacity) must produce the same FrameFeatures as the
    single-program path whenever the valid count fits a tier."""
    from holoagent_tpu.perception.extractor import extract_frame_features_tiered

    clip_p, sam_p = models
    img = jnp.asarray(np.random.default_rng(1).uniform(size=(48, 64, 3)), jnp.float32)
    kw = dict(
        points_per_side=4, pred_iou_thresh=-10.0, stability_thresh=0.0,
        min_area=0.0, max_masks=8, dtype=jnp.float32,
    )
    ff1 = extract_frame_features(clip_p, sam_p, img, CT, ST, **kw)
    nv = int(np.asarray(ff1.valid).sum())
    ff2 = extract_frame_features_tiered(
        clip_p, sam_p, img, CT, ST, tiers=(max(nv, 2), 8), **kw
    )
    np.testing.assert_array_equal(np.asarray(ff1.masks), np.asarray(ff2.masks))
    np.testing.assert_array_equal(np.asarray(ff1.valid), np.asarray(ff2.valid))
    np.testing.assert_allclose(
        np.asarray(ff1.f_masks), np.asarray(ff2.f_masks), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ff1.f_global), np.asarray(ff2.f_global), atol=2e-5
    )
    # degenerate tier (smaller than the valid count) falls back to max_masks
    ff3 = extract_frame_features_tiered(
        clip_p, sam_p, img, CT, ST, tiers=(1,), **kw
    )
    np.testing.assert_allclose(
        np.asarray(ff1.f_masks), np.asarray(ff3.f_masks), atol=2e-5
    )
