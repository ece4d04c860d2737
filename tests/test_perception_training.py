"""Fixture training of the tiny perception towers (training/perception.py) —
the machinery behind EVAL.md's neural row."""

import numpy as np
import pytest

from holoagent_tpu.dataloader.synthetic import SyntheticDataset, SyntheticScene


@pytest.fixture(scope="module")
def train_ds():
    return [SyntheticDataset(scene=SyntheticScene.two_room(), num_frames=6,
                             hw=(120, 160), seed=100, gaze_heights=(0.8, 2.2))]


def test_tiny_clip_contrastive_learns(train_ds):
    from holoagent_tpu.training.perception import train_tiny_clip

    labels = train_ds[0].scene.labels()
    # 150 steps: the r4e recipe adds structure/background windows to the
    # batches (harder negatives), which slows early convergence
    params, losses = train_tiny_clip(train_ds, labels, steps=150)
    assert np.mean(losses[-5:]) < 0.5 * losses[0]
    # crop/label alignment: a bed crop must be closer to "bed" than to a
    # random other label after training.  Evaluate the DEPLOYED feature —
    # the plain/masked blend at clip_masked_weight over margin-16 crops,
    # exactly what the extractor encodes and the retrieval path scores
    # (perception/extractor.py, training/contrastive.clip_blend_loss) —
    # not margin-4 plain crops, which are out-of-distribution for this
    # recipe and get WORSE as training converges (measured: plain-crop
    # top-1 0.50@100 steps -> 0.38@200 while blend top-1 rises to 0.88).
    import jax.numpy as jnp

    from holoagent_tpu.models import clip as clip_mod
    from holoagent_tpu.models.tokenizer import SimpleTokenizer
    from holoagent_tpu.training.perception import collect_crops

    cv = clip_mod.VARIANTS["test-tiny"]
    crops, crops_m, ids = collect_crops(
        train_ds, labels, cv.image_size, margin=16, masked=True
    )
    tok = SimpleTokenizer()
    tf = np.asarray(clip_mod.text_features_multi_template(
        params, tok, labels, cv, dtype=jnp.float32))
    mean = np.asarray(clip_mod.IMAGE_MEAN, np.float32)
    std = np.asarray(clip_mod.IMAGE_STD, np.float32)
    fp = np.asarray(clip_mod.encode_image(
        params, jnp.asarray((crops - mean) / std), cv, dtype=jnp.float32))
    fm = np.asarray(clip_mod.encode_image(
        params, jnp.asarray((crops_m - mean) / std), cv, dtype=jnp.float32))
    w = 0.4418  # pipeline.clip_masked_weight (reference operating point)
    f = w * fm + (1.0 - w) * fp
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    top1 = (np.argmax(f @ tf.T, -1) == ids).mean()
    assert top1 > 0.5, top1


def test_tiny_sam_promptable_learns(train_ds):
    import jax.numpy as jnp

    from holoagent_tpu.models import sam as sam_mod
    from holoagent_tpu.training.perception import train_tiny_sam

    params, losses = train_tiny_sam(
        train_ds, steps=120, variant_name="fixture-tiny", lr=2e-3
    )
    assert np.mean(losses[-10:]) < 0.6 * np.mean(losses[:5])
    # generation produces at least one gated mask on a training-adjacent view
    sv = sam_mod.VARIANTS["fixture-tiny"]
    f = train_ds[0][0]
    g = sam_mod.generate_masks(
        params, jnp.asarray(f.rgb), sv, points_per_side=8,
        pred_iou_thresh=0.3, stability_thresh=0.4, min_area=40.0,
        max_masks=16, dtype=jnp.float32,
    )
    assert int(g["num"]) >= 1
