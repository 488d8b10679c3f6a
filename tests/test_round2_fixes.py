"""Round-2 regression tests for the round-1 advisor/verdict findings.

* flash kernels with a block that does not divide the sequence length
  (advisor: tail blocks were silently dropped / rows uninitialized);
* supervised eval covers EVERY sample via padded+weighted tail batches
  (verdict: up to batch_size-1 samples were dropped from valid/test);
* zero-weight padding rows leave loss/accuracy bit-unchanged;
* the sequence-parallel train step applies dropout (advisor: it silently
  trained deterministic while dense trained with dropout);
* decode refuses max_steps beyond the output window (advisor: the last
  row was silently overwritten).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from pianobart_tpu import vocab as V
from pianobart_tpu.models import (PianoBartLM, SequenceClassification,
                                  tiny_config)
from pianobart_tpu.ops.attention import _xla_attention
from pianobart_tpu.ops.flash import flash_attention
from pianobart_tpu.train.finetune import finetune_seq_step
from pianobart_tpu.train.runner import SupervisedRunner
from pianobart_tpu.train.state import (TrainState, create_train_state,
                                       make_optimizer)


def make_ids(rng, n, S):
    x = np.zeros((n, S, 8), dtype=np.int64)
    for f in range(8):
        x[..., f] = rng.integers(0, V.TOKEN_BOUNDARY[f], (n, S))
    return x


# ---------------------------------------------------------------------------
# flash block divisibility
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("causal", [False, True])
def test_flash_non_divisible_block_resolves(causal):
    """S=192 with a requested 128 block: the resolver must pick a divisor
    (96 on CPU) instead of dropping rows 128..191."""
    B, S, H, D = 2, 192, 2, 128
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, S, H, D), jnp.float32) * 0.3
    k = jax.random.normal(k2, (B, S, H, D), jnp.float32) * 0.3
    v = jax.random.normal(k3, (B, S, H, D), jnp.float32)
    mask = jnp.ones((B, S)).at[1, S - 17:].set(0.0)

    out = flash_attention(q, k, v, mask, causal, 128, 128)
    expect = _xla_attention(q, k, v, mask, causal, None, 0.0, True, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=2e-5, atol=2e-5)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, mask, causal, 128, 128)
        return (o * jnp.cos(o)).sum()

    def loss_ref(q, k, v):
        o = _xla_attention(q, k, v, mask, causal, None, 0.0, True, None)
        return (o * jnp.cos(o)).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"d{name} mismatch")


# ---------------------------------------------------------------------------
# eval fidelity: tail batches
# ---------------------------------------------------------------------------

def test_supervised_eval_covers_every_sample(rng, tmp_path):
    cfg = tiny_config()
    S = cfg.max_len
    model = SequenceClassification(cfg, class_num=4)
    n = 10  # batch_size 4 -> tail of 2 that round 1 silently dropped
    X = make_ids(rng, n, S)
    y = rng.integers(0, 4, n)
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        (jnp.zeros((2, S, 8), jnp.int32), jnp.ones((2, S))),
        learning_rate=1e-3)

    dens = []

    def step_fn(state, bx, by, rng_, train=True, weight=None):
        state, m = finetune_seq_step(state, bx, by, rng_, cfg=cfg,
                                     train=train, weight=weight)
        if not train:
            dens.append(float(np.asarray(m["acc_den"])))
        return state, m

    data = (X, X, X, y, y, y)
    runner = SupervisedRunner(state, cfg, step_fn, data, str(tmp_path / "r"),
                              batch_size=4, patience=5)
    out = runner._epoch(X, y, train=False)
    assert sum(dens) == pytest.approx(n)       # all 10 samples counted
    assert 0.0 <= out["acc"] <= 1.0


def test_zero_weight_padding_is_exact(rng):
    """A tail batch padded with zero-weight duplicates must give bitwise the
    same loss/accuracy as the unpadded short batch."""
    cfg = tiny_config()
    S = cfg.max_len
    model = SequenceClassification(cfg, class_num=4)
    X = jnp.asarray(make_ids(rng, 3, S), jnp.int32)
    y = jnp.asarray(rng.integers(0, 4, 3))
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        (jnp.zeros((2, S, 8), jnp.int32), jnp.ones((2, S))),
        learning_rate=1e-3)
    key = jax.random.PRNGKey(7)

    state, m_short = finetune_seq_step(state, X, y, key, cfg=cfg,
                                       train=False, weight=jnp.ones(3))
    Xp = jnp.concatenate([X, X[:1], X[:1]], axis=0)
    yp = jnp.concatenate([y, y[:1], y[:1]], axis=0)
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])
    _, m_pad = finetune_seq_step(state, Xp, yp, key, cfg=cfg, train=False,
                                 weight=w)
    assert float(m_pad["loss"]) == pytest.approx(float(m_short["loss"]),
                                                 rel=1e-6)
    assert float(m_pad["acc_num"]) == float(m_short["acc_num"])
    assert float(m_pad["acc_den"]) == float(m_short["acc_den"])


# ---------------------------------------------------------------------------
# sp train step applies dropout
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_sp_train_step_applies_dropout(rng):
    from pianobart_tpu.parallel.mesh import make_mesh
    from pianobart_tpu.train.pretrain_sp import make_sp_pretrain_step

    S, B = 128, 4
    base = tiny_config(max_len=S, d_model=128, num_heads=1, emb_size=16,
                       dropout=0.5)
    cfg_sp = base.replace(ring_axis="sp", use_flash_attention=False)
    batch = jnp.asarray(make_ids(rng, B, S), jnp.int32)
    key = jax.random.PRNGKey(3)

    dense_model = PianoBartLM(base)
    ids = jnp.zeros((2, S, 8), jnp.int32)
    m = jnp.ones((2, S))
    params = nn.meta.unbox(dense_model.init(key, ids, ids, m, m))["params"]
    mesh = make_mesh(dp=2, tp=1, sp=2, devices=jax.devices()[:4])
    step = make_sp_pretrain_step(cfg_sp, mesh, 0.15)

    def run(seed):
        state = TrainState.create(apply_fn=None,
                                  params=jax.tree.map(jnp.copy, params),
                                  tx=make_optimizer(1e-3))
        _, metrics = step(state, batch, jax.random.PRNGKey(seed))
        return float(metrics["loss"])

    # With dropout=0.5 two different rng streams must give different losses
    # on identical data+params (round 1 hardwired deterministic=True, which
    # made these equal whenever corruption happened to match).
    l1, l2 = run(3), run(4)
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l1 != pytest.approx(l2, rel=1e-6)


def test_sp_train_step_applies_attention_only_dropout(rng):
    """cfg.dropout == 0 but attention_dropout > 0: the sp step used to
    derive deterministic from cfg.dropout alone and silently trained
    without the attention dropout the dense step applies (round-3
    review)."""
    from pianobart_tpu.parallel.mesh import make_mesh
    from pianobart_tpu.train.pretrain_sp import make_sp_pretrain_step

    S, B = 128, 4
    base = tiny_config(max_len=S, d_model=128, num_heads=1, emb_size=16,
                       dropout=0.0, attention_dropout=0.5)
    cfg_sp = base.replace(ring_axis="sp", use_flash_attention=False)
    batch = jnp.asarray(make_ids(rng, B, S), jnp.int32)
    key = jax.random.PRNGKey(3)

    dense_model = PianoBartLM(base)
    ids = jnp.zeros((2, S, 8), jnp.int32)
    m = jnp.ones((2, S))
    params = nn.meta.unbox(dense_model.init(key, ids, ids, m, m))["params"]
    mesh = make_mesh(dp=2, tp=1, sp=2, devices=jax.devices()[:4])
    step = make_sp_pretrain_step(cfg_sp, mesh, 0.15)

    def run(seed):
        state = TrainState.create(apply_fn=None,
                                  params=jax.tree.map(jnp.copy, params),
                                  tx=make_optimizer(1e-3))
        _, metrics = step(state, batch, jax.random.PRNGKey(seed))
        return float(metrics["loss"])

    l1, l2 = run(3), run(4)
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l1 != pytest.approx(l2, rel=1e-6)


# ---------------------------------------------------------------------------
# decode guard
# ---------------------------------------------------------------------------

def test_generate_rejects_oversized_max_steps():
    from pianobart_tpu.decode import generate
    cfg = tiny_config()
    ids = jnp.zeros((1, cfg.max_len, 8), jnp.int32)
    with pytest.raises(ValueError, match="max_steps"):
        generate(None, ids, cfg=cfg, max_steps=cfg.max_len + 1)


def test_restore_params_accepts_payload_dir(rng, tmp_path):
    """--ckpt may point at the manager root OR directly at best/step_N
    (the real-data E2E run hit step_None with the direct path)."""
    from pianobart_tpu.train.state import (CheckpointManager, TrainState,
                                           make_optimizer)
    import jax.numpy as jnp

    params = {"w": jnp.arange(4.0), "b": jnp.ones((2,))}
    state = TrainState.create(apply_fn=None, params=params,
                              tx=make_optimizer(1e-3))
    mgr = CheckpointManager(str(tmp_path / "run"))
    mgr.save(3, state, {"weighted_acc": 0.5}, is_best=True)

    template = {"w": jnp.zeros(4), "b": jnp.zeros(2)}
    via_root = CheckpointManager(str(tmp_path / "run")).restore_params(template)
    via_best = CheckpointManager(str(tmp_path / "run" / "best")).restore_params(template)
    via_step = CheckpointManager(str(tmp_path / "run" / "step_3")).restore_params(template)
    for got in (via_root, via_best, via_step):
        np.testing.assert_array_equal(got["w"], np.arange(4.0))
        np.testing.assert_array_equal(got["b"], np.ones(2))


def test_checkpoint_gc_survives_orphaned_tmp_dirs(tmp_path):
    """A killed process leaves step_N.orbax-checkpoint-tmp dirs; the
    manager must sweep them instead of crashing on int parse."""
    import jax.numpy as jnp
    from pianobart_tpu.train.state import (CheckpointManager, TrainState,
                                           make_optimizer)

    state = TrainState.create(apply_fn=None, params={"w": jnp.ones(2)},
                              tx=make_optimizer(1e-3))
    mgr = CheckpointManager(str(tmp_path / "run"))
    mgr.save(1, state, {"weighted_acc": 0.1}, is_best=True)
    orphan = tmp_path / "run" / "step_4.orbax-checkpoint-tmp"
    orphan.mkdir()
    (orphan / "junk").write_text("x")
    mgr.save(2, state, {"weighted_acc": 0.2}, is_best=False)  # triggers _gc
    assert not orphan.exists()
