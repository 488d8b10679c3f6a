"""Regression tests for round-3 review findings (see also the safety/resume
tests in test_runners.py, parser parity in test_midi_robustness.py, and the
lazy loader in test_datasets.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pianobart_tpu.models import PianoBartLM, tiny_config


def _lm_params(cfg):
    from flax import linen as nn
    model = PianoBartLM(cfg)
    S = cfg.max_len
    ids = jnp.zeros((1, S, 8), jnp.int32)
    m = jnp.ones((1, S))
    return nn.meta.unbox(
        model.init(jax.random.PRNGKey(0), ids, ids, m, m))["params"]


def test_full_lm_torch_checkpoint_autodetects(tmp_path):
    """import_checkpoint(kind=None) on a FULL PianoBartLM torch checkpoint
    must route to the LM importer; the CLI used to force kind='trunk' and
    KeyError on the mask_lm-prefixed state dict (round-3 review)."""
    from pianobart_tpu.compat.torch_export import (export_lm,
                                                   save_torch_checkpoint)
    from pianobart_tpu.compat.torch_import import import_checkpoint

    cfg = tiny_config()
    params = _lm_params(cfg)
    ckpt = tmp_path / "full_lm.ckpt"
    save_torch_checkpoint(export_lm(params, cfg), str(ckpt))

    tree = import_checkpoint(str(ckpt), cfg, kind=None)
    assert "pianobart" in tree            # trunk grafts into any task model
    np.testing.assert_array_equal(
        np.asarray(params["pianobart"]["embed"]["table"]),
        tree["pianobart"]["embed"]["table"])
    # the graft loop in cli._load_init_ckpt copies matching top-level keys
    merged = dict(params)
    for k, v in tree.items():
        if k in merged:
            merged[k] = v
    assert set(merged) == set(params)


def test_restore_params_clear_error_on_non_checkpoint_dir(tmp_path):
    """A typo'd --ckpt dir must raise a clear FileNotFoundError, not die
    inside orbax on 'step_None' (round-3 review)."""
    from pianobart_tpu.train.state import CheckpointManager
    empty = tmp_path / "not_a_ckpt"
    empty.mkdir()
    mgr = CheckpointManager(str(empty))
    with pytest.raises(FileNotFoundError, match="no checkpoint found"):
        mgr.restore_params({"w": np.zeros(2)})


def test_flash_gate_allows_dropout_config_at_eval(monkeypatch):
    """attention_dropout > 0 must not knock DETERMINISTIC (eval) passes off
    the flash path onto the O(S^2)-in-HBM XLA fallback (round-3 review)."""
    from pianobart_tpu.ops import attention as attn_mod

    hit = []
    monkeypatch.setattr(attn_mod, "_flash_eligible", lambda *a: True)
    monkeypatch.setattr(attn_mod, "_flash",
                        lambda q, k, v, m, c: hit.append(1) or v)
    q = jnp.zeros((1, 8, 4, 16))
    attn_mod.dot_product_attention(q, q, q, dropout_rate=0.1,
                                   deterministic=True)
    assert hit, "eval pass with attention_dropout fell off the flash path"
    # train passes with active dropout still take the XLA path
    hit.clear()
    attn_mod.dot_product_attention(
        q, q, q, dropout_rate=0.1, deterministic=False,
        dropout_rng=jax.random.PRNGKey(0))
    assert not hit


def test_dropout_extreme_rate_no_overflow():
    """Rates in [0.998, 1.0) used to round the uint8 threshold to 256 and
    zero-divide (round-3 review)."""
    from pianobart_tpu.ops.dropout import Dropout
    x = jnp.ones((4, 64))
    out = Dropout(0.999).apply({}, x, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(0)})
    assert np.isfinite(np.asarray(out)).all()
