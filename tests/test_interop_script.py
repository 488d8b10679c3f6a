"""Smoke test for scripts/ref_interop_check.py (flagship-scale behavioral
interop, round-3 verdict item 4) at tiny dims.

Builds a fake real_data_e2e work dir (tiny composer splits + a saved
finetune checkpoint), runs the script as a subprocess with
``PBX_INTEROP_CFG`` shrinking the model, and demands the reference-computed
metrics match ours (the script exits non-zero on mismatch)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "model.py")),
    reason="reference absent")

TINY = {"emb_size": 256, "d_model": 64, "encoder_layers": 2,
        "decoder_layers": 2, "ffn_dim": 128, "num_heads": 4}


def _octuple_batch(rng, n, S):
    from pianobart_tpu import vocab as V
    X = np.stack([rng.integers(0, s - 3, size=(n, S)) for s in V.FIELD_SIZES],
                 axis=-1).astype(np.int64)
    for i in range(0, n, 3):  # varied attention masks
        X[i, S - 4:, :] = np.asarray(V.PAD)
    return X


def test_interop_script_tiny(tmp_path):
    from pianobart_tpu.models import (PianoBartConfig, SequenceClassification,
                                      TokenClassification)
    from pianobart_tpu.train.state import CheckpointManager, create_train_state

    S, n_cls = 32, 4
    rng = np.random.default_rng(7)
    work = tmp_path / "work"
    root = work / "Data/output_composer/corpus"
    root.mkdir(parents=True)
    for split, n in (("valid", 11), ("test", 13)):  # non-multiples of B=8
        np.save(root / f"corpus_{split}.npy", _octuple_batch(rng, n, S))
        np.save(root / f"corpus_{split}_ans.npy",
                rng.integers(0, n_cls, size=n).astype(np.int64))
    with open(root / "corpus_composer.json", "w") as f:
        json.dump({f"c{i}": i for i in range(n_cls)}, f)

    cfg = PianoBartConfig(dropout=0.0, use_flash_attention=False, max_len=S,
                          **TINY)
    model = SequenceClassification(cfg, class_num=n_cls)
    # seed 1: the script asserts restore != its own PRNGKey(0) template
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(1),
        (jnp.zeros((2, S, 8), jnp.int32), jnp.ones((2, S))))
    mgr = CheckpointManager(str(work / "result/finetune/composer_realdata"))
    mgr.save(1, state, {"weighted_acc": 0.5}, is_best=True)

    # velocity: token labels, swapped decoder label embedding (8 = 7+1)
    vroot = work / "Data/output_velocity/corpus"
    vroot.mkdir(parents=True)
    for split, n in (("valid", 11), ("test", 13)):
        np.save(vroot / f"corpus_{split}.npy", _octuple_batch(rng, n, S))
        # (N, S, 1) exercises the script's trailing-dim squeeze
        np.save(vroot / f"corpus_{split}_ans.npy",
                rng.integers(0, 8, size=(n, S, 1)).astype(np.int64))
    vcfg = cfg.replace(decoder_label_vocab=8)
    vmodel = TokenClassification(vcfg, class_num=8)
    vstate = create_train_state(
        vmodel, vcfg, jax.random.PRNGKey(2),
        (jnp.zeros((2, S, 8), jnp.int32), jnp.zeros((2, S), jnp.int32),
         jnp.ones((2, S)), jnp.ones((2, S))))
    vmgr = CheckpointManager(str(work / "result/finetune/velocity_realdata"))
    vmgr.save(1, vstate, {"weighted_acc": 0.5}, is_best=True)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PBX_INTEROP_CFG"] = json.dumps(TINY)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/ref_interop_check.py"),
         str(work)], env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    report = (work / "interop_report.md").read_text()
    assert report.count("| yes |") == 4, report
    assert "velocity valid" in report and "velocity test" in report


def test_reference_stack_does_not_shadow_sys_modules():
    """round-4 advisor finding: load_reference_stack must not leave the
    generic names 'model'/'finetune'/'PianoBart' in sys.modules."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_interop_check", os.path.join(REPO, "scripts",
                                          "ref_interop_check.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    before = {n: sys.modules.get(n) for n in ("model", "finetune",
                                              "PianoBart")}
    ref_pb, ref_model, ref_finetune, e2w, w2e = mod.load_reference_stack()
    for n, prev in before.items():
        assert sys.modules.get(n) is prev, f"{n} shadowed in sys.modules"
    # the cross-references the reference code needs stay alive
    assert ref_finetune.TokenClassification is ref_model.TokenClassification
    assert ref_model.PianoBart is ref_pb.PianoBart


def test_interop_report_written_only_on_success(tmp_path):
    """A MISMATCH must NOT produce interop_report.md (real_data_e2e's
    done-marker) — a resumed e2e would silently skip the failed check and
    fold the mismatch table into RESULTS.md (round-4 review)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_interop_check", os.path.join(REPO, "scripts",
                                          "ref_interop_check.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.write_report(str(tmp_path), ["| valid | ... | NO |"], ok=False)
    assert os.path.basename(out) == "interop_FAILED.md"
    assert not (tmp_path / "interop_report.md").exists()
    assert "NO" in (tmp_path / "interop_FAILED.md").read_text()

    out = mod.write_report(str(tmp_path), ["| valid | ... | yes |"], ok=True)
    assert os.path.basename(out) == "interop_report.md"
    assert (tmp_path / "interop_report.md").exists()
