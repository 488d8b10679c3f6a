"""Driver contract: __graft_entry__.dryrun_multichip + entry() signature.

The driver compile-checks entry() single-chip and runs dryrun_multichip with
N virtual CPU devices; keep both green here so regressions surface in CI,
not in the driver.
"""
import sys

import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8(capsys):
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove("/root/repo")
    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "OK" in out


def test_entry_returns_jittable(monkeypatch):
    # entry() builds the full-size model: too heavy for CI — validate the
    # contract shape on a shrunk config instead.
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove("/root/repo")
    import jax.numpy as jnp
    from pianobart_tpu.models import PianoBartConfig

    monkeypatch.setattr(
        g, "_flagship_cfg",
        lambda dtype=None: PianoBartConfig(
            d_model=64, emb_size=16, encoder_layers=1, decoder_layers=1,
            ffn_dim=64, num_heads=4, max_len=32, dropout=0.0,
            dtype=jnp.float32, use_flash_attention=False))
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 1280
