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


def test_decode_chunk_matches_stepwise(models):
    """decode_chunk (K steps in one lax.scan dispatch, the serving fast path)
    must produce exactly the per-token decode_step greedy sequence."""
    vlm_p, clip_p = models
    tok = SimpleTokenizer()
    ids = np.asarray([tok.sot] + tok.encode("a red chair"), np.int32)
    emb, n = vlm_mod.build_prompt_embeddings(
        vlm_p, clip_p, ids, None, TV, max_len=32, dtype=jnp.float32
    )
    k = 6
    # per-token reference
    cache = vlm_mod.init_cache(TV, 2, jnp.float32)
    active = jnp.asarray([True, False])
    logits, cache = vlm_mod.prefill(
        vlm_p, jnp.stack([emb, emb]), jnp.asarray([n, n]), cache, TV,
        dtype=jnp.float32,
    )
    cur = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    cache = vlm_mod.KVCache(k=cache.k, v=cache.v,
                            length=jnp.where(active, cache.length, 0))
    ref = []
    c2, cur2 = cache, cur
    for _ in range(k):
        lg, c2 = vlm_mod.decode_step(vlm_p, cur2, c2, active, TV, dtype=jnp.float32)
        cur2 = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        ref.append(int(cur2[0]))
    toks, last, c3 = vlm_mod.decode_chunk(
        vlm_p, cur, cache, active, TV, steps=k, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(toks)[:, 0], np.asarray(ref))
    assert int(last[0]) == ref[-1]
    # inactive slot untouched
    assert int(c3.length[1]) == 0
    np.testing.assert_array_equal(np.asarray(c3.length), np.asarray(c2.length))


def test_batcher_chunked_continuous():
    """The chunked batcher serves multiple requests to completion with
    admission between chunks (continuous batching at K-token granularity)."""
    from holoagent_tpu.serving.batcher import ContinuousBatcher, GenRequest

    vlm_p = vlm_mod.init_vlm(jax.random.key(0), TV)
    clip_p = clip_mod.init_clip(jax.random.key(1), clip_mod.VARIANTS["test-tiny"])
    b = ContinuousBatcher(vlm_p, clip_p, TV, max_batch=2, chunk=4,
                          dtype=jnp.float32)
    r1 = b.submit(GenRequest("where is the chair", max_new_tokens=10))
    r2 = b.submit(GenRequest("go to the kitchen", max_new_tokens=7))
    r3 = b.submit(GenRequest("find the plant", max_new_tokens=5))  # waits for a slot
    while not all(r._done.is_set() for r in (r1, r2, r3)):
        b.step()
    for r in (r1, r2, r3):
        assert r.generated > 0 and r.generated <= r.max_new_tokens
        assert r._result is not None
    # chunked sequence equals the per-token sequence for the same prompt
    b1 = ContinuousBatcher(vlm_p, clip_p, TV, max_batch=1, chunk=1,
                           dtype=jnp.float32)
    ref = b1.generate("where is the chair", max_new_tokens=10)
    assert ref == r1.result()


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


# ---------------------------------------------------------------------------
# Llama-family arch + HF checkpoint converter (weight-loading contract)
# ---------------------------------------------------------------------------

TVL = vlm_mod.VARIANTS["test-tiny-llama"]


def test_convert_hf_llama_matches_transformers(rng):
    """convert_hf_llava on a transformers-built Llama must reproduce HF logits
    exactly (prefill AND cached decode) — proves any real LLaVA-family
    checkpoint file loads correctly."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=TVL.vocab, hidden_size=TVL.width,
        intermediate_size=TVL.mlp_hidden, num_hidden_layers=TVL.layers,
        num_attention_heads=TVL.heads, num_key_value_heads=TVL.kv_heads,
        max_position_embeddings=TVL.max_seq, rope_theta=TVL.rope_theta,
        rms_norm_eps=TVL.norm_eps, attention_bias=False, mlp_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    params = vlm_mod.convert_hf_llava(model.state_dict(), TVL)

    tokens = rng.integers(0, TVL.vocab, (2, 12))
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.numpy()

    emb = np.asarray(params["tok_emb"])[tokens]
    cache = vlm_mod.init_cache(TVL, 2, jnp.float32)
    logits, cache = vlm_mod.prefill(
        params, jnp.asarray(emb), jnp.full((2,), 12, jnp.int32), cache, TVL,
        dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(logits), ref[:, -1], atol=3e-4, rtol=3e-4)

    toks = tokens
    cur = np.argmax(ref[:, -1], -1)
    for _ in range(3):
        logits2, cache = vlm_mod.decode_step(
            params, jnp.asarray(cur, jnp.int32), cache, jnp.ones((2,), bool),
            TVL, dtype=jnp.float32,
        )
        toks = np.concatenate([toks, cur[:, None]], 1)
        with torch.no_grad():
            ref2 = model(torch.tensor(toks)).logits.numpy()[:, -1]
        np.testing.assert_allclose(np.asarray(logits2), ref2, atol=5e-4, rtol=5e-4)
        cur = np.argmax(ref2, -1)


def test_convert_hf_llava_projector_and_tied_embeddings():
    """LLaVA projector keys load into proj/proj2; tied embeddings fall back to
    tok_emb as lm_head; the converted model runs through encode_images."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=TVL.vocab, hidden_size=TVL.width,
        intermediate_size=TVL.mlp_hidden, num_hidden_layers=TVL.layers,
        num_attention_heads=TVL.heads, num_key_value_heads=TVL.kv_heads,
        max_position_embeddings=TVL.max_seq, tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    model = LlamaForCausalLM(cfg).eval()
    sd = {f"language_model.{k}": v for k, v in model.state_dict().items()}
    dvis = clip_mod.VARIANTS[TVL.clip_variant].embed_dim
    g = torch.Generator().manual_seed(2)
    sd["multi_modal_projector.linear_1.weight"] = torch.randn(TVL.width, dvis, generator=g)
    sd["multi_modal_projector.linear_1.bias"] = torch.zeros(TVL.width)
    sd["multi_modal_projector.linear_2.weight"] = torch.randn(TVL.width, TVL.width, generator=g)
    sd["multi_modal_projector.linear_2.bias"] = torch.zeros(TVL.width)
    params = vlm_mod.convert_hf_llava(sd, TVL)
    assert params["proj_w"].shape == (dvis, TVL.width)
    assert params["proj2_w"].shape == (TVL.width, TVL.width)
    np.testing.assert_allclose(
        np.asarray(params["lm_head"]), np.asarray(params["tok_emb"])
    )
    clip_p = clip_mod.init_clip(jax.random.key(1), clip_mod.VARIANTS["test-tiny"])
    imgs = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 32, 32, 3)), jnp.float32)
    blocks = vlm_mod.encode_images(params, clip_p, imgs, TVL, dtype=jnp.float32)
    assert blocks.shape == (2, TVL.image_tokens, TVL.width)
    assert bool(jnp.isfinite(blocks).all())


def test_llama_batcher_end_to_end():
    """The continuous batcher serves the llama-arch model unchanged."""
    vlm_p = vlm_mod.init_vlm(jax.random.key(3), TVL)
    clip_p = clip_mod.init_clip(jax.random.key(1), clip_mod.VARIANTS["test-tiny"])
    b = ContinuousBatcher(vlm_p, clip_p, TVL, max_batch=2, dtype=jnp.float32)
    out = b.generate("hello", max_new_tokens=4)
    assert isinstance(out, str)


def test_prefill_sp_matches_single_device(models):
    """Sequence-parallel prefill over the 8-device mesh must reproduce the
    single-device prefill logits and KV cache (SURVEY.md §5.7 long multi-image
    prompts through the served VLM)."""
    from holoagent_tpu.config import MeshConfig
    from holoagent_tpu.parallel import make_mesh

    vlm_p, clip_p = models
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    nd = mesh.shape["data"]
    b, t = 2, 8 * nd
    rngk = jax.random.key(5)
    emb = jax.random.normal(rngk, (b, t, TV.width), jnp.float32) * 0.1
    vlen = jnp.asarray([t, t - 3], jnp.int32)

    cache0 = vlm_mod.init_cache(TV, b, jnp.float32)
    ref_logits, ref_cache = vlm_mod.prefill(
        vlm_p, emb, vlen, cache0, TV, dtype=jnp.float32
    )
    sp_logits, sp_cache = vlm_mod.prefill_sp(
        vlm_p, emb, vlen, TV, mesh, dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(sp_logits), np.asarray(ref_logits), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(sp_cache.k[:, :, :t]), np.asarray(ref_cache.k[:, :, :t]),
        atol=2e-4, rtol=2e-4,
    )
    # decode continues identically from the SP-filled cache
    tok = jnp.asarray(np.argmax(np.asarray(ref_logits), -1), jnp.int32)
    l1, _ = vlm_mod.decode_step(vlm_p, tok, ref_cache, jnp.ones((b,), bool), TV, dtype=jnp.float32)
    l2, _ = vlm_mod.decode_step(vlm_p, tok, sp_cache, jnp.ones((b,), bool), TV, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=2e-4, rtol=2e-4)


def test_batcher_sp_prefill_matches(models):
    """With a mesh attached and the prompt over sp_threshold, the batcher's
    sequence-parallel prefill must generate the same tokens as the
    single-device engine."""
    from holoagent_tpu.config import MeshConfig
    from holoagent_tpu.parallel import make_mesh

    vlm_p, clip_p = models
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    prompt = "find the chair near the window in the living room please"
    b0 = ContinuousBatcher(vlm_p, clip_p, TV, max_batch=2, dtype=jnp.float32)
    ref = b0.generate(prompt, max_new_tokens=5)
    b1 = ContinuousBatcher(
        vlm_p, clip_p, TV, max_batch=2, dtype=jnp.float32, mesh=mesh,
        sp_threshold=4,  # force the SP path
    )
    out = b1.generate(prompt, max_new_tokens=5)
    assert out == ref


def test_prefill_sp_llama_matches_single_device():
    """llama-arch sequence-parallel prefill parity (VERDICT r3 item 6): ring
    prefill over the 8-device mesh reproduces the dense llama prefill logits
    and n_kv-head cache, and decode continues identically from it."""
    from holoagent_tpu.config import MeshConfig
    from holoagent_tpu.parallel import make_mesh

    vlm_p = vlm_mod.init_vlm(jax.random.key(11), TVL, dtype=jnp.float32)
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    nd = mesh.shape["data"]
    b, t = 2, 8 * nd
    emb = jax.random.normal(jax.random.key(6), (b, t, TVL.width), jnp.float32) * 0.1
    vlen = jnp.asarray([t, t - 5], jnp.int32)

    cache0 = vlm_mod.init_cache(TVL, b, jnp.float32)
    ref_logits, ref_cache = vlm_mod.prefill(
        vlm_p, emb, vlen, cache0, TVL, dtype=jnp.float32
    )
    sp_logits, sp_cache = vlm_mod.prefill_sp(
        vlm_p, emb, vlen, TVL, mesh, dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(sp_logits), np.asarray(ref_logits), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(sp_cache.k[:, :, :t]), np.asarray(ref_cache.k[:, :, :t]),
        atol=2e-4, rtol=2e-4,
    )
    tok = jnp.asarray(np.argmax(np.asarray(ref_logits), -1), jnp.int32)
    l1, _ = vlm_mod.decode_step(
        vlm_p, tok, ref_cache, jnp.ones((b,), bool), TVL, dtype=jnp.float32
    )
    l2, _ = vlm_mod.decode_step(
        vlm_p, tok, sp_cache, jnp.ones((b,), bool), TVL, dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=2e-4, rtol=2e-4)


def test_serving_bench_device_resident_rows():
    """Device-resident serving rows (VERDICT r4 #9): the scanned decode loop
    and the 5-call slow-chain program run as single dispatches and report
    measured latencies; the scan loop's tokens must match step-by-step
    greedy decode (same cache math, one program)."""
    from holoagent_tpu.apps import serving_bench

    res = serving_bench.run(variant="test-tiny", batch=2, requests=2,
                            new_tokens=4, chunk=4, chain_calls=2)
    assert res["scan_decode_chunk_ms"] > 0
    assert res["slow_chain_calls"] == 2
    assert res["slow_chain_device_ms"] > 0
    assert res["device_resident_tok_s"] > 0
