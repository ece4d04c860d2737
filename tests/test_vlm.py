import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoagent_tpu.models import clip as clip_mod
from holoagent_tpu.models import vlm as vlm_mod
from holoagent_tpu.models.tokenizer import SimpleTokenizer
from holoagent_tpu.serving import ContinuousBatcher, GenRequest

TV = vlm_mod.VARIANTS["test-tiny"]


@pytest.fixture(scope="module")
def models():
    vlm_p = vlm_mod.init_vlm(jax.random.key(0), TV)
    clip_p = clip_mod.init_clip(jax.random.key(1), clip_mod.VARIANTS["test-tiny"])
    return vlm_p, clip_p


def test_prefill_decode_consistency(models):
    """Greedy decode via (prefill + steps) must equal full-sequence argmax:
    running prefill on [prompt + t1] should predict the same t2 as decode_step
    after prefill(prompt) -> t1."""
    vlm_p, clip_p = models
    tok = SimpleTokenizer()
    ids = np.asarray([tok.sot] + tok.encode("a red chair"), np.int32)
    emb, n = vlm_mod.build_prompt_embeddings(
        vlm_p, clip_p, ids, None, TV, max_len=32, dtype=jnp.float32
    )
    cache = vlm_mod.init_cache(TV, 1, jnp.float32)
    logits, cache = vlm_mod.prefill(
        vlm_p, emb[None], jnp.asarray([n]), cache, TV, dtype=jnp.float32
    )
    t1 = int(jnp.argmax(logits[0]))
    logits2, cache = vlm_mod.decode_step(
        vlm_p, jnp.asarray([t1]), cache, jnp.asarray([True]), TV, dtype=jnp.float32
    )
    t2 = int(jnp.argmax(logits2[0]))
    # reference: prefill over the extended sequence
    ids_ext = np.concatenate([ids, [t1]]).astype(np.int32)
    emb2, n2 = vlm_mod.build_prompt_embeddings(
        vlm_p, clip_p, ids_ext, None, TV, max_len=32, dtype=jnp.float32
    )
    cache2 = vlm_mod.init_cache(TV, 1, jnp.float32)
    logits3, _ = vlm_mod.prefill(
        vlm_p, emb2[None], jnp.asarray([n2]), cache2, TV, dtype=jnp.float32
    )
    t2_ref = int(jnp.argmax(logits3[0]))
    assert t2 == t2_ref


def test_multi_image_prompt(models):
    vlm_p, clip_p = models
    tok = SimpleTokenizer()
    imgs = jnp.asarray(np.random.default_rng(0).uniform(size=(3, 32, 32, 3)), jnp.float32)
    ids = np.asarray([tok.sot] + tok.encode("which image shows a chair?"), np.int32)
    emb, n = vlm_mod.build_prompt_embeddings(
        vlm_p, clip_p, ids, imgs, TV, max_len=64, dtype=jnp.float32
    )
    assert n == 3 * TV.image_tokens + len(ids)
    assert bool(jnp.isfinite(emb[:n]).all())


def test_continuous_batcher_single(models):
    vlm_p, clip_p = models
    b = ContinuousBatcher(vlm_p, clip_p, TV, max_batch=2, dtype=jnp.float32)
    out = b.generate("hello", max_new_tokens=5)
    assert isinstance(out, str)


def test_continuous_batcher_interleaved(models):
    """Two requests admitted at different times share decode steps."""
    vlm_p, clip_p = models
    b = ContinuousBatcher(vlm_p, clip_p, TV, max_batch=2, dtype=jnp.float32)
    r1 = b.submit(GenRequest("first request", max_new_tokens=6))
    b.step()  # admit + 1 token
    r2 = b.submit(GenRequest("second one", max_new_tokens=4))
    for _ in range(12):
        b.step()
        if r1._done.is_set() and r2._done.is_set():
            break
    assert r1._done.is_set() and r2._done.is_set()
    assert isinstance(r1.result(0), str) and isinstance(r2.result(0), str)
    # determinism: same prompt alone gives the same tokens
    b2 = ContinuousBatcher(vlm_p, clip_p, TV, max_batch=2, dtype=jnp.float32)
    again = b2.generate("first request", max_new_tokens=6)
    assert again == r1.result(0)


def test_batcher_queue_overflow(models):
    vlm_p, clip_p = models
    b = ContinuousBatcher(vlm_p, clip_p, TV, max_batch=1, dtype=jnp.float32)
    reqs = [b.submit(GenRequest(f"q{i}", max_new_tokens=3)) for i in range(3)]
    for _ in range(40):
        b.step()
        if all(r._done.is_set() for r in reqs):
            break
    assert all(r._done.is_set() for r in reqs)  # all served despite 1 slot


def test_generative_vlm_backend(models):
    from holoagent_tpu.query.vlm_backend import GenerativeVLM

    vlm_p, clip_p = models
    b = ContinuousBatcher(vlm_p, clip_p, TV, max_batch=2, dtype=jnp.float32)
    backend = GenerativeVLM(b, max_new_tokens=4)
    img = np.zeros((16, 16, 3), np.float32)
    assert backend.detect_object(img, "chair") in (True, False)
    assert backend.choose_frame([img, img], "a chair") in (0, 1)
    checks, best = backend.detect_and_select_best([img], "chair")
    assert len(checks) == 1 and best == 0


def test_prefill_flash_matches_xla(models):
    """prefill(impl='flash') logits and KV cache == the XLA path."""
    vlm_p, clip_p = models
    tok = SimpleTokenizer()
    ids = np.asarray([tok.sot] + tok.encode("where is the red chair"), np.int32)
    emb, n = vlm_mod.build_prompt_embeddings(
        vlm_p, clip_p, ids, None, TV, max_len=32, dtype=jnp.float32
    )
    cache0 = vlm_mod.init_cache(TV, 1, jnp.float32)
    lx, cx = vlm_mod.prefill(
        vlm_p, emb[None], jnp.asarray([n]), cache0, TV, dtype=jnp.float32
    )
    lf, cf = vlm_mod.prefill(
        vlm_p, emb[None], jnp.asarray([n]), cache0, TV, dtype=jnp.float32,
        impl="flash", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lx), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(cf.k), np.asarray(cx.k), atol=2e-3, rtol=2e-3)
