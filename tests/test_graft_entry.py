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


def test_round_close_grep_contract_matches_bench_strings():
    """scripts/round_close.sh gates the end-of-round driver capture by
    grepping bench.py's warmup classification line; if either side's
    literal wording drifts, the gate dies as exit 3 ("classification line
    missing") on EVERY run — pin the contract so a wording edit fails here
    first, on CPU, instead of on the TPU at round close."""
    bench_src = open("/root/repo/bench.py").read()
    script = open("/root/repo/scripts/round_close.sh").read()
    for phrase in ("cached executable", "fresh compile"):
        assert phrase in bench_src, phrase
        assert f'"{phrase}"' in script or f"'{phrase}'" in script or \
            f" {phrase} " in script or phrase in script, phrase
    # the primary-JSON gate greps for '"metric"' which bench's JSON line
    # always carries
    assert '"metric"' in bench_src
    assert '"metric"' in script
    # threshold sanity: the classification boundary must sit between the
    # measured warm cache-load (65-104 s through the remote tunnel) and
    # the cheapest observed fresh compile (542 s)
    import re
    m = re.search(r"t_warm < (\d+)", bench_src)
    assert m, "warmup classification threshold not found in bench.py"
    assert 110 <= int(m.group(1)) <= 500, m.group(1)
