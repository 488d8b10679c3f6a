"""Decode loop + sampling tests (CPU, tiny config)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pianobart_tpu import vocab as V
from pianobart_tpu.decode import generate
from pianobart_tpu.models import PianoBartLM, tiny_config
from pianobart_tpu.ops.sampling import (greedy_octuple, nucleus_sample,
                                        sample_octuple)


@pytest.fixture(scope="module")
def lm():
    cfg = tiny_config()
    model = PianoBartLM(cfg)
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (1, cfg.max_len, 8), 0, 30)
    mask = jnp.ones((1, cfg.max_len))
    params = model.init(rng, ids, ids, mask, mask)
    return cfg, model, params


def test_nucleus_p1_is_greedy():
    rng = jax.random.PRNGKey(1)
    logits = jax.random.normal(rng, (4, 50))
    tok = nucleus_sample(rng, logits, top_p=1.0, temperature=5.0)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(logits.argmax(-1)))


def test_nucleus_p_small_prefers_head():
    rng = jax.random.PRNGKey(2)
    logits = jnp.asarray([[10.0, 9.9] + [0.0] * 30])
    seen = set()
    for i in range(50):
        t = nucleus_sample(jax.random.fold_in(rng, i), logits, 0.9, 1.0)
        seen.add(int(t[0]))
    assert seen <= {0, 1} and len(seen) == 2  # only the nucleus; both sampled


def test_sample_octuple_fields_in_range(lm):
    cfg, model, params = lm
    rng = jax.random.PRNGKey(0)
    fused = jax.random.normal(rng, (3, cfg.total_vocab))
    toks = sample_octuple(rng, fused, cfg)
    assert toks.shape == (3, 8)
    for f in range(8):
        assert int(toks[:, f].max()) < cfg.field_sizes[f]


def test_greedy_octuple_shapes(lm):
    cfg, _, _ = lm
    fused = jax.random.normal(jax.random.PRNGKey(0), (2, 5, cfg.total_vocab))
    out = greedy_octuple(fused, cfg)
    assert out.shape == (2, 5, 8)


def test_generate_shapes_and_validity(lm):
    cfg, model, params = lm
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (1, cfg.max_len, 8), 0, 30).astype(jnp.int32)
    out = np.asarray(generate(params, ids, rng=rng, cfg=cfg))
    assert out.shape == (1, cfg.max_len, 8)
    # every row is either a PAD row or a full in-vocab octuple
    pad = np.asarray(V.PAD)
    for f in range(8):
        assert out[..., f].max() < V.FIELD_SIZES[f]
    is_pad = (out == pad).all(-1)
    content = ~is_pad
    if content.any():
        # content rows contain no special ids (early-stop semantics)
        assert (out[content] < pad).all()


def test_generate_matches_full_forward(lm):
    """KV-cached incremental decode == full teacher-forced forward."""
    cfg, model, params = lm
    rng = jax.random.PRNGKey(3)
    B, S = 2, cfg.max_len
    enc = jax.random.randint(rng, (B, S, 8), 0, 30).astype(jnp.int32)
    dec = jax.random.randint(jax.random.PRNGKey(4), (B, S, 8), 0, 30).astype(jnp.int32)
    mask = jnp.ones((B, S))

    full = model.apply(params, enc, dec, mask, mask)  # (B, S, 1280)

    enc_out = model.apply(params, enc, mask, method=PianoBartLM.encode)
    cache = model.apply(params, enc_out, B, S, method=PianoBartLM.build_cache)
    steps = []
    for i in range(S):
        logits, cache = model.apply(params, dec[:, i:i + 1, :], enc_out, mask,
                                    cache, i, method=PianoBartLM.decode_step)
        steps.append(np.asarray(logits[:, 0]))
    inc = np.stack(steps, axis=1)
    np.testing.assert_allclose(np.asarray(full), inc, rtol=2e-4, atol=2e-4)


def test_generate_force_full(lm):
    cfg, model, params = lm
    rng = jax.random.PRNGKey(5)
    ids = jax.random.randint(rng, (1, cfg.max_len, 8), 0, 30).astype(jnp.int32)
    out = np.asarray(generate(params, ids, rng=rng, cfg=cfg, force_full=True))
    # every row is a content octuple: no specials anywhere
    pad = np.asarray(V.PAD)
    assert (out < pad).all()


def test_vectorized_octuple_sampling_matches_per_field(lm):
    """sample_octuple (one padded (B,8,Vmax) pass) must produce the same
    per-field marginal distribution as the scalar nucleus_sample path."""
    import jax
    import jax.numpy as jnp
    from pianobart_tpu.models.heads import split_fields
    from pianobart_tpu.ops.sampling import (DEFAULT_TEMPERATURE,
                                            DEFAULT_TOP_P)
    cfg = lm[0]
    V = cfg.total_vocab
    rng = jax.random.PRNGKey(7)
    logits = jax.random.normal(rng, (1, V)) * 2.0

    N = 4000
    keys = jax.random.split(jax.random.PRNGKey(1), N)
    batched = jax.vmap(lambda k: sample_octuple(
        k, logits, cfg, DEFAULT_TEMPERATURE, DEFAULT_TOP_P))(keys)
    batched = np.asarray(batched)[:, 0, :]                  # (N, 8)

    fields = split_fields(logits[:, None, :], cfg)
    for f in (3, 4, 7):                                     # the p=0.9 fields
        fl = fields[f][:, 0, :]
        ref_toks = np.asarray(jax.vmap(
            lambda k: nucleus_sample(k, fl, DEFAULT_TOP_P[f],
                                     DEFAULT_TEMPERATURE[f]))(
            jax.random.split(jax.random.PRNGKey(2), N)))[:, 0]
        got = np.bincount(batched[:, f], minlength=cfg.field_sizes[f]) / N
        want = np.bincount(ref_toks, minlength=cfg.field_sizes[f]) / N
        # total-variation distance between the two empirical marginals
        tv = 0.5 * np.abs(got - want).sum()
        assert tv < 0.08, (f, tv)
    for f in (0, 1, 2, 5, 6):                               # p=1 -> greedy
        want = int(np.asarray(fields[f][:, 0, :].argmax(-1))[0])
        assert (batched[:, f] == want).all()
