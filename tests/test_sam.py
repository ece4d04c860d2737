import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoagent_tpu.models import sam as sam_mod
from holoagent_tpu.ops import masks as mask_ops

TINY = sam_mod.VARIANTS["test-tiny"]


@pytest.fixture(scope="module")
def params():
    return sam_mod.init_sam(jax.random.key(0), TINY)


def test_encoder_shapes(params):
    x = jnp.zeros((2, TINY.img_size, TINY.img_size, 3), jnp.float32)
    emb = sam_mod.encode_image(params["encoder"], x, TINY, dtype=jnp.float32)
    g = TINY.img_size // TINY.patch
    assert emb.shape == (2, g, g, TINY.out_chans)
    assert bool(jnp.isfinite(emb).all())


def test_decoder_shapes(params):
    g = TINY.img_size // TINY.patch
    emb = jnp.zeros((g, g, TINY.out_chans), jnp.float32)
    pe = sam_mod.image_pe(params["prompt"], g)
    pts = jnp.zeros((5, 2, 2), jnp.float32) + 0.5
    labels = jnp.tile(jnp.array([[1, -1]], jnp.int32), (5, 1))
    sparse = sam_mod.encode_points(params["prompt"], pts, labels)
    logits, iou = sam_mod.decode_masks(
        params["decoder"], emb, pe, sparse, params["prompt"]["no_mask"], TINY
    )
    assert logits.shape == (5, TINY.num_mask_tokens, 4 * g, 4 * g)
    assert iou.shape == (5, TINY.num_mask_tokens)


def test_generate_masks_fixed_budget(params):
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(48, 64, 3)), jnp.float32)
    out = sam_mod.generate_masks(
        params,
        img,
        TINY,
        points_per_side=4,
        pred_iou_thresh=-10.0,  # random init: accept everything that survives NMS
        stability_thresh=0.0,
        min_area=0.0,
        max_masks=8,
        dtype=jnp.float32,
    )
    assert out["masks"].shape == (8, 48, 64)
    assert out["valid"].dtype == bool
    assert int(out["num"]) <= 8
    # invalid lanes must be all-false masks
    inv = ~np.asarray(out["valid"])
    assert not np.asarray(out["masks"])[inv].any()


def test_nms_suppresses_duplicates():
    boxes = jnp.asarray(
        np.array(
            [[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30], [0, 1, 10, 11]],
            np.float32,
        )
    )
    scores = jnp.asarray(np.array([0.9, 0.8, 0.7, 0.95], np.float32))
    keep = mask_ops.nms(boxes, scores, jnp.ones(4, bool), 0.5)
    keep = np.asarray(keep)
    assert keep[3] and keep[2]  # best duplicate + isolated box survive
    assert not keep[0] and not keep[1]  # overlapping lower scores suppressed


def test_containment_filter():
    big = np.zeros((1, 20, 20), bool)
    big[0, 2:18, 2:18] = True
    small = np.zeros((1, 20, 20), bool)
    small[0, 5:10, 5:10] = True  # fully inside big
    other = np.zeros((1, 20, 20), bool)
    other[0, 0:2, 0:2] = True
    masks = jnp.asarray(np.concatenate([big, small, other]))
    keep = mask_ops.containment_filter(masks, jnp.ones(3, bool), 0.9)
    np.testing.assert_array_equal(np.asarray(keep), [True, False, True])


def test_boxes_from_masks():
    m = np.zeros((2, 10, 12), bool)
    m[0, 2:5, 3:7] = True
    boxes = mask_ops.boxes_from_masks(jnp.asarray(m))
    np.testing.assert_array_equal(np.asarray(boxes)[0], [2, 3, 5, 7])
    np.testing.assert_array_equal(np.asarray(boxes)[1], [0, 0, 0, 0])


def test_stability_scores():
    logits = np.full((1, 8, 8), -5.0, np.float32)
    logits[0, 2:6, 2:6] = 5.0  # crisp mask -> stability 1
    s = mask_ops.stability_scores(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(s), [1.0])


def test_crop_and_resize_identity():
    from holoagent_tpu.ops.crop_resize import crop_and_resize

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    boxes = jnp.asarray(np.array([[0, 0, 16, 16]], np.float32))
    out = crop_and_resize(jnp.asarray(img), boxes, 16)
    np.testing.assert_allclose(np.asarray(out)[0], img, atol=1e-5)


def test_crop_and_resize_masked():
    from holoagent_tpu.ops.crop_resize import crop_and_resize

    img = np.ones((8, 8, 3), np.float32)
    mask = np.zeros((1, 8, 8), bool)
    mask[0, :4, :] = True
    out = crop_and_resize(
        jnp.asarray(img), jnp.asarray(np.array([[0, 0, 8, 8]], np.float32)), 8,
        masks=jnp.asarray(mask),
    )
    o = np.asarray(out)[0]
    assert o[:3].min() == 1.0 and o[5:].max() == 0.0  # background blanked


def test_crop_and_resize_matches_numpy_bilinear(rng):
    """Matmul-form separable resampling == direct 4-point bilinear gather."""
    import jax.numpy as jnp
    from holoagent_tpu.ops.crop_resize import crop_and_resize

    h, w, s = 37, 53, 16
    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    boxes = np.array(
        [[0, 0, h, w], [3.5, 7.25, 20.0, 40.5], [10, 10, 11, 11]], np.float32
    )
    out = np.asarray(crop_and_resize(jnp.asarray(img), jnp.asarray(boxes), s))
    t = (np.arange(s) + 0.5) / s
    for m, (y0, x0, y1, x1) in enumerate(boxes):
        ys = np.clip(y0 + t * (y1 - y0) - 0.5, 0, h - 1)
        xs = np.clip(x0 + t * (x1 - x0) - 0.5, 0, w - 1)
        yi = np.floor(ys).astype(int); yf = ys - yi; yi1 = np.minimum(yi + 1, h - 1)
        xi = np.floor(xs).astype(int); xf = xs - xi; xi1 = np.minimum(xi + 1, w - 1)
        ref = (
            img[yi][:, xi] * ((1 - yf)[:, None] * (1 - xf)[None, :])[..., None]
            + img[yi][:, xi1] * ((1 - yf)[:, None] * xf[None, :])[..., None]
            + img[yi1][:, xi] * (yf[:, None] * (1 - xf)[None, :])[..., None]
            + img[yi1][:, xi1] * (yf[:, None] * xf[None, :])[..., None]
        )
        np.testing.assert_allclose(out[m], ref, atol=2e-5, rtol=1e-4)


def test_quantize_sam_encoder_close(params):
    """W8A8 encoder (quantize_sam) tracks the float encoder closely and the
    auto-mask generator produces near-identical masks."""
    q8 = sam_mod.quantize_sam(params)
    x = jnp.asarray(np.random.default_rng(3).uniform(size=(1, TINY.img_size, TINY.img_size, 3)), jnp.float32)
    e_f = np.asarray(sam_mod.encode_image(params["encoder"], x, TINY, dtype=jnp.float32))
    e_q = np.asarray(sam_mod.encode_image(q8["encoder"], x, TINY, dtype=jnp.float32))
    # int8 weight + dynamic activation quant: ~1-2% relative error budget
    rel = np.linalg.norm(e_f - e_q) / max(np.linalg.norm(e_f), 1e-9)
    assert rel < 0.08, rel

    img = jnp.asarray(np.random.default_rng(0).uniform(size=(48, 64, 3)), jnp.float32)
    kw = dict(points_per_side=4, pred_iou_thresh=-10.0, stability_thresh=0.0,
              min_area=0.0, max_masks=8, dtype=jnp.float32)
    m_f = sam_mod.generate_masks(params, img, TINY, **kw)
    m_q = sam_mod.generate_masks(q8, img, TINY, **kw)
    a = np.asarray(m_f["masks"])[np.asarray(m_f["valid"])]
    b = np.asarray(m_q["masks"])[np.asarray(m_q["valid"])]
    # mask sets agree: best-pair IoU per float mask is high
    for mk in a:
        ious = [(mk & other).sum() / max((mk | other).sum(), 1) for other in b]
        assert max(ious, default=0.0) > 0.8
