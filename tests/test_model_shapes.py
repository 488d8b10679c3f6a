"""Model shape self-tests (the reference's __main__ blocks as real pytest).

Mirrors PianoBart.py:95-130 and model.py:275-322: tiny-config random-input
shape checks for enc+dec, encoder-only, swapped-decoder-embedding,
PianoBartLM, generation, and both classifiers.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pianobart_tpu.decode import generate
from pianobart_tpu.models import (PianoBart, PianoBartLM,
                                  SequenceClassification, TokenClassification,
                                  attention_mask_from_bars, tiny_config)
from pianobart_tpu import vocab as V


@pytest.fixture(scope="module")
def env():
    cfg = tiny_config()
    rng = jax.random.PRNGKey(0)
    B, S = 2, cfg.max_len
    enc = jax.random.randint(rng, (B, S, 8), 1, 10)
    dec = jax.random.randint(jax.random.PRNGKey(1), (B, S, 8), 1, 10)
    mask = jnp.ones((B, S))
    return cfg, rng, enc, dec, mask


def test_trunk_encdec_and_encoder_only(env):
    cfg, rng, enc, dec, mask = env
    model = PianoBart(cfg)
    params = model.init(rng, enc, dec, mask, mask)
    out = model.apply(params, enc, dec, mask, mask)
    assert out.shape == (2, cfg.max_len, cfg.d_model)
    enc_only = model.apply(params, enc, None, mask)
    assert enc_only.shape == (2, cfg.max_len, cfg.d_model)


def test_trunk_swapped_decoder_embedding(env):
    cfg, rng, enc, dec, mask = env
    cfg2 = cfg.replace(decoder_label_vocab=10)
    model = PianoBart(cfg2)
    labels = jax.random.randint(rng, (2, cfg.max_len), 0, 10)
    params = model.init(rng, enc, labels, mask, mask)
    out = model.apply(params, enc, labels, mask, mask)
    assert out.shape == (2, cfg.max_len, cfg.d_model)


def test_lm_output_shapes(env):
    cfg, rng, enc, dec, mask = env
    model = PianoBartLM(cfg)
    params = model.init(rng, enc, dec, mask, mask)
    fused = model.apply(params, enc, dec, mask, mask)
    assert fused.shape == (2, cfg.max_len, cfg.total_vocab)
    fields = model.apply(params, fused, method=PianoBartLM.logits_per_field)
    assert [f.shape[-1] for f in fields] == list(cfg.field_sizes)


def test_generation_shape(env):
    cfg, rng, enc, dec, mask = env
    model = PianoBartLM(cfg)
    params = model.init(rng, enc, dec, mask, mask)
    out = generate(params, enc[:1], rng=rng, cfg=cfg)
    assert out.shape == (1, cfg.max_len, 8)


def test_classifier_shapes(env):
    cfg, rng, enc, dec, mask = env
    sc = SequenceClassification(cfg, class_num=10)
    p = sc.init(rng, enc, mask)
    assert sc.apply(p, enc, mask).shape == (2, 10)

    tc = TokenClassification(cfg, class_num=10)
    p = tc.init(rng, enc, dec, mask, mask)
    assert tc.apply(p, enc, dec, mask, mask).shape == (2, cfg.max_len, 10)


def test_attention_mask_from_bars():
    ids = jnp.asarray(np.tile(np.asarray(V.PAD), (1, 4, 1)))
    ids = ids.at[0, 0, 0].set(3)
    m = attention_mask_from_bars(ids)
    np.testing.assert_array_equal(np.asarray(m), [[1, 0, 0, 0]])


def test_excitation_block(env):
    from pianobart_tpu.models.heads import Excitation
    cfg, rng, *_ = env
    x = jax.random.normal(rng, (2, 32))
    mod = Excitation()
    p = mod.init(rng, x)
    y = mod.apply(p, x)
    assert y.shape == x.shape


def test_remat_fwd_bwd(env):
    import flax.linen as fnn
    from pianobart_tpu.train.objective import masked_field_ce
    cfg, rng, enc, dec, mask = env
    cfg_r = cfg.replace(remat=True)
    model = PianoBartLM(cfg_r)
    params = fnn.meta.unbox(model.init(rng, enc, dec, mask, mask))["params"]

    def loss(p):
        out = model.apply({"params": p}, enc, dec, mask, mask, True)
        return masked_field_ce(out, enc, jnp.ones(enc.shape), cfg_r)[0]

    l, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l))
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))


def test_remat_ffn_matches_dense_grads(env):
    """cfg.remat_ffn recomputes only the FFN hidden: loss and gradients must
    be identical to the non-remat model (same params, same math)."""
    import flax.linen as fnn
    from pianobart_tpu.train.objective import masked_field_ce
    cfg, rng, enc, dec, mask = env
    model = PianoBartLM(cfg)
    params = fnn.meta.unbox(model.init(rng, enc, dec, mask, mask))["params"]
    cfg_r = cfg.replace(remat_ffn=True)
    model_r = PianoBartLM(cfg_r)

    def loss(m, c):
        def fn(p):
            out = m.apply({"params": p}, enc, dec, mask, mask, True)
            return masked_field_ce(out, enc, jnp.ones(enc.shape), c)[0]
        return jax.value_and_grad(fn)(params)

    l0, g0 = loss(model, cfg)
    l1, g1 = loss(model_r, cfg_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
