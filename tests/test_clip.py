import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoagent_tpu.models import clip as clip_mod
from holoagent_tpu.models.tokenizer import SimpleTokenizer

TINY = clip_mod.VARIANTS["test-tiny"]


@pytest.fixture(scope="module")
def params():
    return clip_mod.init_clip(jax.random.key(0), TINY)


@pytest.fixture(scope="module")
def tok():
    return SimpleTokenizer()


def test_tokenizer_roundtrip(tok):
    ids = tok.encode("a photo of a red chair.")
    assert tok.decode(ids).strip() == "a photo of a red chair ."


def test_tokenizer_fixed_shape(tok):
    arr = tok(["hello world", "a very " + "long " * 100 + "sentence"])
    assert arr.shape == (2, 77)
    assert arr[0, 0] == tok.sot
    assert arr[1, -1] == tok.eot  # truncation preserves eot
    assert (arr[0] == tok.eot).sum() == 1


def test_encode_image_shapes_and_norm(params):
    imgs = jnp.asarray(np.random.default_rng(0).uniform(size=(3, 32, 32, 3)), jnp.float32)
    feats = clip_mod.encode_image(params, imgs, TINY, dtype=jnp.float32)
    assert feats.shape == (3, TINY.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1), 1.0, rtol=1e-5)


def test_encode_text_eot_position(params, tok):
    tokens = jnp.asarray(tok(["chair", "a photo of a large wooden table"]))
    feats = clip_mod.encode_text(params, tokens, TINY, dtype=jnp.float32)
    assert feats.shape == (2, TINY.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1), 1.0, rtol=1e-5)
    # padding beyond eot must not affect the embedding
    t2 = np.asarray(tok(["chair"]))
    t2b = t2.copy()
    # same tokens, same result
    f1 = clip_mod.encode_text(params, jnp.asarray(t2), TINY, dtype=jnp.float32)
    f2 = clip_mod.encode_text(params, jnp.asarray(t2b), TINY, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2))


def test_causal_mask_prefix_invariance(params, tok):
    """Features at <eot> must only depend on tokens before it: changing the
    zero padding after <eot> can't change anything because pad ids are 0 and
    position of eot is argmax — check suffix independence by comparing a short
    prompt against itself embedded in a longer buffer."""
    t = tok(["red chair"])
    f_short = clip_mod.encode_text(params, jnp.asarray(t), TINY, dtype=jnp.float32)
    t_garbage = t.copy()
    eot_pos = int(np.argmax(t[0]))
    t_garbage[0, eot_pos + 1 :] = 123  # garbage AFTER eot
    f_g = clip_mod.encode_text(params, jnp.asarray(t_garbage), TINY, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(f_short), np.asarray(f_g), atol=1e-5)


def test_preprocess_shape():
    imgs = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 48, 64, 3)), jnp.float32)
    out = clip_mod.preprocess(imgs, size=32)
    assert out.shape == (2, 32, 32, 3)


def test_multi_template_text_feats(params, tok):
    feats = clip_mod.text_features_multi_template(
        params, tok, ["chair", "table", "sofa"], TINY, dtype=jnp.float32, batch_size=4
    )
    assert feats.shape == (3, TINY.embed_dim)
    assert np.isfinite(np.asarray(feats)).all()


def test_convert_open_clip_roundtrip(params):
    """Export our params into open_clip naming, convert back, check equality —
    guards the converter's transposes."""
    v, t = params["visual"], params["text"]

    def unstack(prefix, blocks, L):
        out = {}
        for i in range(L):
            out[f"{prefix}.{i}.ln_1.weight"] = blocks["ln1_g"][i]
            out[f"{prefix}.{i}.ln_1.bias"] = blocks["ln1_b"][i]
            out[f"{prefix}.{i}.attn.in_proj_weight"] = blocks["wqkv"][i].T
            out[f"{prefix}.{i}.attn.in_proj_bias"] = blocks["bqkv"][i]
            out[f"{prefix}.{i}.attn.out_proj.weight"] = blocks["wo"][i].T
            out[f"{prefix}.{i}.attn.out_proj.bias"] = blocks["bo"][i]
            out[f"{prefix}.{i}.ln_2.weight"] = blocks["ln2_g"][i]
            out[f"{prefix}.{i}.ln_2.bias"] = blocks["ln2_b"][i]
            out[f"{prefix}.{i}.mlp.c_fc.weight"] = blocks["w1"][i].T
            out[f"{prefix}.{i}.mlp.c_fc.bias"] = blocks["b1"][i]
            out[f"{prefix}.{i}.mlp.c_proj.weight"] = blocks["w2"][i].T
            out[f"{prefix}.{i}.mlp.c_proj.bias"] = blocks["b2"][i]
        return out

    p = TINY.patch
    w = TINY.v_width
    state = {
        "visual.conv1.weight": np.asarray(v["patch_w"]).reshape(p, p, 3, w).transpose(3, 2, 0, 1),
        "visual.class_embedding": v["cls"],
        "visual.positional_embedding": v["pos"],
        "visual.ln_pre.weight": v["ln_pre_g"],
        "visual.ln_pre.bias": v["ln_pre_b"],
        "visual.ln_post.weight": v["ln_post_g"],
        "visual.ln_post.bias": v["ln_post_b"],
        "visual.proj": v["proj"],
        "token_embedding.weight": t["tok_emb"],
        "positional_embedding": t["pos"],
        "ln_final.weight": t["ln_final_g"],
        "ln_final.bias": t["ln_final_b"],
        "text_projection": t["proj"],
        "logit_scale": params["logit_scale"],
    }
    state.update(unstack("visual.transformer.resblocks", v["blocks"], TINY.v_layers))
    state.update(unstack("transformer.resblocks", t["blocks"], TINY.t_layers))
    state = {k: np.asarray(val) for k, val in state.items()}
    back = clip_mod.convert_open_clip(state, TINY)
    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(back)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_quantize_clip_int8_matches_full_precision(rng):
    """W8A8 tower: cosine similarity with the full-precision encode > 0.99
    (the int8 MXU path used by the mapping pipeline when models.clip.quant)."""
    import jax
    import jax.numpy as jnp

    from holoagent_tpu.models import clip as clip_mod

    v = clip_mod.VARIANTS["test-tiny"]
    p = clip_mod.init_clip(jax.random.key(0), v, dtype=jnp.float32)
    q = clip_mod.quantize_clip(p, towers=("visual", "text"))
    imgs = jnp.asarray(rng.uniform(size=(3, v.image_size, v.image_size, 3)), jnp.float32)
    f_full = np.asarray(clip_mod.encode_image(p, imgs, v, dtype=jnp.float32))
    f_q8 = np.asarray(clip_mod.encode_image(q, imgs, v, dtype=jnp.float32))
    cos = (f_full * f_q8).sum(-1)
    assert (cos > 0.99).all(), cos
    toks = jnp.asarray(rng.integers(1, 100, (2, v.ctx)), jnp.int32)
    t_full = np.asarray(clip_mod.encode_text(p, toks, v, dtype=jnp.float32))
    t_q8 = np.asarray(clip_mod.encode_text(q, toks, v, dtype=jnp.float32))
    assert ((t_full * t_q8).sum(-1) > 0.99).all()
