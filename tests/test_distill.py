"""VLM distillation against the oracle: the tiny llama-arch VLM must learn
the oracle's yes/no answers from distill_pairs (the training half of the
slow-path harness, query/oracle.py + training/distill.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from holoagent_tpu.models import clip as clip_mod
from holoagent_tpu.models import vlm as vlm_mod
from holoagent_tpu.query import OracleVLM, tag_image
from holoagent_tpu.training import distill_vlm

YES, NO = 3, 4


def _tokenize(prompt):
    return [1] + [2 + (hash(wd) % 200) for wd in prompt.split()][:12]


def test_distill_vlm_learns_oracle_answers(rng):
    v = vlm_mod.VARIANTS["test-tiny-llama"]
    vlm_p = vlm_mod.init_vlm(jax.random.key(0), v)
    clip_p = clip_mod.init_clip(jax.random.key(1), clip_mod.VARIANTS["test-tiny"])

    # two visually distinct frames; the oracle knows what each contains
    frames = {
        0: np.full((32, 32, 3), 0.2, np.float32),
        2: np.full((32, 32, 3), 0.8, np.float32),
    }
    provider = lambda i: tag_image(frames[i], i)
    oracle = OracleVLM({0: {"mug"}, 2: {"towel"}})
    pairs = oracle.distill_pairs([0, 2], ["mug", "towel"])
    assert len(pairs) == 4

    params, losses = distill_vlm(
        vlm_p, clip_p, v, pairs, provider, _tokenize,
        answer_id=lambda a: YES if a == "yes" else NO,
        steps=120, lr=5e-2,
    )
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # the fine-tuned model must now answer all four pairs correctly
    correct = 0
    for prompt, img_ids, answer in pairs:
        imgs = jnp.asarray(np.stack([provider(i) for i in img_ids]))
        pre = clip_mod.preprocess(imgs, size=32)
        e, n = vlm_mod.build_prompt_embeddings(
            params, clip_p, np.asarray(_tokenize(prompt), np.int32), pre, v,
            max_len=64, dtype=jnp.float32,
        )
        cache = vlm_mod.init_cache(v, 1, jnp.float32)
        logits, _ = vlm_mod.prefill(
            params, e[None], jnp.asarray([n]), cache, v, dtype=jnp.float32
        )
        pick = int(np.argmax(np.asarray(logits[0])[[YES, NO]]))
        want = 0 if answer == "yes" else 1
        correct += pick == want
    assert correct == len(pairs), correct
