"""Flagship-scale behavioral interop check (round-3 verdict item 4;
velocity extension round-4 do-this #4).

Exports the REAL-DATA classifiers trained by ``scripts/real_data_e2e.py``
(flagship dims: d1024, 8+8 layers, S=1024) to the reference torch format
with ``--strict_ref`` semantics, loads each with a STRICT
``load_state_dict`` into the unmodified reference model
(``/root/reference/model.py``), runs the reference's OWN
``FinetuneTrainer.valid()/test()`` loops
(``/root/reference/finetune.py:140-150``) on the same ``.npy`` splits on
CPU, and demands the reference-computed accuracy/loss equal ours.

Two tasks are checked:

* composer — ``SequenceClassification`` (``model.py:165-218``), the
  ``main.py:268`` loading path;
* velocity — ``TokenClassification`` with the swapped decoder label
  embedding (``model.py:242-245``, ``PianoBart.py:88-91``) and the
  reference's velocity label shift (``finetune.py:193-198``) — the
  hairiest export mapping.

This upgrades the d64/S32 proof in ``tests/test_ref_behavioral_interop.py``
to real trained checkpoints at published-model scale.  Writes
``<work>/interop_report.md`` (folded into RESULTS.md by real_data_e2e.py).

Runs entirely on CPU — safe to run alongside TPU jobs.

Usage: python scripts/ref_interop_check.py [workdir]
"""
from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF = "/root/reference"
B = 8  # eval batch size on both sides (reference DataLoader + our step)


def load_reference_stack():
    """Import the unmodified reference modules (finetune.py needs the
    transformers AdamW shim: the lazy module must materialize first).

    The reference files cross-import by bare name ('from PianoBart import
    ...'), so they are registered in sys.modules during exec — and REMOVED
    after (round-4 advisor finding: leaving generic names like 'model' in
    sys.modules permanently can shadow later same-named imports when this
    module's helpers are imported in-process instead of as a subprocess).
    The returned module objects keep their cross-references alive.
    """
    import torch
    import transformers  # noqa: F401
    from transformers import BartModel  # noqa: F401  (forces real import)
    import transformers as _t
    if not hasattr(_t, "AdamW"):
        _t.AdamW = torch.optim.AdamW
    sys.path.insert(0, REF)
    # snapshot any pre-existing module under these generic names so the
    # cleanup RESTORES it instead of evicting it (round-5 review: popping
    # unconditionally broke module identity for a host-process 'model'
    # import — the exact shadowing hazard this cleanup exists to avoid)
    prior = {}
    try:
        def load(name, fname):
            if name not in prior:
                prior[name] = sys.modules.get(name)
            spec = importlib.util.spec_from_file_location(
                name, os.path.join(REF, fname))
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
            return mod

        ref_pb = load("PianoBart", "PianoBart.py")
        ref_model = load("model", "model.py")
        ref_finetune = load("finetune", "finetune.py")
        import pickle
        with open(os.path.join(REF, "Data/Octuple.pkl"), "rb") as f:
            e2w, w2e = pickle.load(f)
        return ref_pb, ref_model, ref_finetune, e2w, w2e
    finally:
        sys.path.remove(REF)
        for n, old in prior.items():
            if old is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = old


def our_eval(state, cfg, X, y, step_fn):
    """Our deterministic eval over a split, mirroring the reference's
    accumulation exactly: global acc = correct/total, loss = mean of
    per-batch means (finetune.py:227-259).  The last partial batch is
    padded with zero-weight rows (exactness proven by
    test_zero_weight_padding_is_exact)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    losses, num, den = [], 0.0, 0.0
    for i in range(0, len(X), B):
        bx, by = X[i:i + B], y[i:i + B]
        n = len(bx)
        w = np.ones(B, np.float32)
        if n < B:
            pad_x = np.repeat(bx[-1:], B - n, axis=0)
            pad_y = np.repeat(by[-1:], B - n, axis=0)
            bx = np.concatenate([bx, pad_x])
            by = np.concatenate([by, pad_y])
            w[n:] = 0.0
        _, m = step_fn(state, jnp.asarray(bx, jnp.int32), jnp.asarray(by),
                       jax.random.PRNGKey(0), train=False,
                       weight=jnp.asarray(w))
        losses.append(float(m["loss"]))
        num += float(m["acc_num"])
        den += float(m["acc_den"])
    return float(np.mean(losses)), num / den


def _load_splits(work, task, token=False):
    import numpy as np
    root = os.path.join(work, f"Data/output_{task}/corpus")
    splits = {}
    for s in ("valid", "test"):
        X = np.asarray(np.load(os.path.join(root, f"corpus_{s}.npy"),
                               allow_pickle=True), np.int64)
        ya = np.asarray(np.load(os.path.join(root, f"corpus_{s}_ans.npy"),
                                allow_pickle=True), np.int64)
        if token and ya.ndim == 3 and ya.shape[-1] == 1:
            ya = ya.squeeze(-1)
        splits[s] = (X, ya)
    return splits


def _restore_ours(work, model, cfg, ckpt_rel, sample_args):
    """Restore the trained best checkpoint; a silent total graft-miss would
    have BOTH sides evaluating the same random init and the check would
    pass vacuously, so demand the restore actually changed something."""
    import jax
    import jax.numpy as jnp  # noqa: F401
    import numpy as np
    from flax import linen as nn

    from pianobart_tpu.train.state import (CheckpointManager, TrainState,
                                           make_optimizer)
    template = nn.meta.unbox(model.init(jax.random.PRNGKey(0),
                                        *sample_args))["params"]
    ckpt_dir = os.path.join(work, ckpt_rel)
    params = CheckpointManager(ckpt_dir).restore_params(template, best=True)
    changed = any(
        np.any(np.asarray(a) != np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(template)))
    assert changed, f"checkpoint restore from {ckpt_dir} grafted nothing"
    return TrainState.create(apply_fn=model.apply, params=params,
                             tx=make_optimizer())


def _ref_trainer(ref_finetune, pianobart, ref_clf, splits, class_num, hs,
                 seq):
    import torch
    from torch.utils.data import DataLoader, TensorDataset
    loaders = {
        s: DataLoader(TensorDataset(torch.from_numpy(X), torch.from_numpy(y)),
                      batch_size=B, shuffle=False)
        for s, (X, y) in splits.items()}
    test_shape = ((len(splits["test"][0]),) if seq
                  else splits["test"][1].shape)
    return ref_finetune.FinetuneTrainer(
        pianobart, loaders["valid"], loaders["valid"], loaders["test"],
        lr=1e-3, class_num=class_num, hs=hs, testset_shape=test_shape,
        cpu=True, cuda_devices=[], model=ref_clf, SeqClass=seq)


def check_task(work, ref_stack, task, overrides):
    """Run the ours-vs-reference comparison for one task; returns
    (markdown rows, ok, description line)."""
    import functools

    import jax
    import numpy as np
    import torch

    from pianobart_tpu.compat.torch_export import (
        export_sequence_classifier, export_token_classifier,
        save_torch_checkpoint)
    from pianobart_tpu.models import (PianoBartConfig, SequenceClassification,
                                      TokenClassification)
    from pianobart_tpu.train.finetune import (finetune_seq_step,
                                              finetune_token_step)

    ref_pb, ref_model, ref_finetune, e2w, w2e = ref_stack
    seq = task == "composer"
    splits = _load_splits(work, task, token=not seq)
    S = splits["test"][0].shape[1]

    # ---- our side: restore the trained best checkpoint ---------------
    import jax.numpy as jnp
    if seq:
        root = os.path.join(work, "Data/output_composer/corpus")
        n_cls = len(json.load(open(os.path.join(root,
                                                "corpus_composer.json"))))
        cfg = PianoBartConfig(dropout=0.0, use_flash_attention=False,
                              max_len=S, **overrides)
        model = SequenceClassification(cfg, class_num=n_cls)
        sample = (jnp.zeros((2, S, 8), jnp.int32), jnp.ones((2, S)))
        step_fn = functools.partial(finetune_seq_step, cfg=cfg)
        ckpt_rel = "result/finetune/composer_realdata"
        ref_class_num = n_cls
    else:
        n_cls = 7  # reference velocity class_num (finetune.py:64-65)
        cfg = PianoBartConfig(dropout=0.0, use_flash_attention=False,
                              max_len=S, decoder_label_vocab=n_cls + 1,
                              **overrides)
        model = TokenClassification(cfg, class_num=n_cls + 1)
        sample = (jnp.zeros((2, S, 8), jnp.int32),
                  jnp.zeros((2, S), jnp.int32),
                  jnp.ones((2, S)), jnp.ones((2, S)))
        step_fn = functools.partial(finetune_token_step, cfg=cfg,
                                    velocity=True)
        ckpt_rel = "result/finetune/velocity_realdata"
        ref_class_num = n_cls

    state = _restore_ours(work, model, cfg, ckpt_rel, sample)
    ours = {}
    for s in ("valid", "test"):
        t0 = time.time()
        ours[s] = our_eval(state, cfg, *splits[s], step_fn)
        print(f"ours {task} {s}: loss={ours[s][0]:.4f} acc={ours[s][1]:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # ---- export -> STRICT load into the unmodified reference ---------
    if seq:
        sd = export_sequence_classifier(state.params, cfg, strict_ref=True)
        ckpt_path = os.path.join(work, "composer_exported.ckpt")
    else:
        sd = export_token_classifier(state.params, cfg, strict_ref=True)
        ckpt_path = os.path.join(work, "velocity_exported.ckpt")
    save_torch_checkpoint(sd, ckpt_path)
    print(f"exported {len(sd)} tensors -> {ckpt_path}", flush=True)

    from transformers import BartConfig
    theirs_cfg = BartConfig(
        max_position_embeddings=S, d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers, decoder_layers=cfg.decoder_layers,
        encoder_ffn_dim=cfg.ffn_dim, decoder_ffn_dim=cfg.ffn_dim,
        encoder_attention_heads=cfg.num_heads,
        decoder_attention_heads=cfg.num_heads)
    torch.manual_seed(0)
    pianobart = ref_pb.PianoBart(theirs_cfg, e2w, w2e)
    if seq:
        ref_clf = ref_model.SequenceClassification(pianobart, n_cls,
                                                   cfg.d_model)
    else:
        # class_num+1 (finetune.py:97) >= 5 triggers the reference's
        # decoder label-embedding swap (model.py:242-245)
        ref_clf = ref_model.TokenClassification(pianobart, n_cls + 1,
                                                cfg.d_model)
    ck = torch.load(ckpt_path, map_location="cpu")
    ref_clf.load_state_dict(ck["state_dict"])  # STRICT: main.py:268 path
    ref_clf.eval()

    trainer = _ref_trainer(ref_finetune, pianobart, ref_clf, splits,
                           ref_class_num, cfg.d_model, seq)
    t0 = time.time()
    ref_vloss, ref_vacc = trainer.valid()
    print(f"reference {task} valid: loss={ref_vloss} acc={ref_vacc} "
          f"({time.time() - t0:.0f}s)", flush=True)
    t0 = time.time()
    ref_tloss, ref_tacc, all_output = trainer.test()
    print(f"reference {task} test: loss={ref_tloss} acc={ref_tacc} "
          f"({time.time() - t0:.0f}s)", flush=True)
    expect_shape = ((len(splits["test"][0]),) if seq
                    else splits["test"][1].shape)
    assert tuple(all_output.shape) == tuple(expect_shape)

    # ---- compare (reference rounds both numbers to 4 decimals) -------
    rows, ok = [], True
    for name, (oloss, oacc), rloss, racc in (
            ("valid", ours["valid"], ref_vloss, ref_vacc),
            ("test", ours["test"], ref_tloss, ref_tacc)):
        acc_ok = abs(racc - oacc) < 5e-5 + 1e-12
        loss_ok = abs(rloss - oloss) < 2e-3
        ok = ok and acc_ok and loss_ok
        rows.append(f"| {task} {name} | {oloss:.4f} | {oacc:.4f} | {rloss:.4f} "
                    f"| {racc:.4f} | {'yes' if acc_ok and loss_ok else 'NO'} |")
    desc = (f"composer: `SequenceClassification`, d_model {cfg.d_model}, "
            f"{cfg.encoder_layers}+{cfg.decoder_layers} layers, S={S}, "
            f"{n_cls} classes" if seq else
            f"velocity: `TokenClassification` with the swapped decoder "
            f"label embedding ({n_cls + 1}-token, d{cfg.decoder_label_dim}) "
            f"and the reference's velocity label shift, S={S}")
    return rows, ok, desc


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pbx_real_e2e"
    import jax
    jax.config.update("jax_platforms", "cpu")
    # parity with torch f32: CPU matmuls must not downcast
    jax.config.update("jax_default_matmul_precision", "highest")

    # PBX_INTEROP_CFG ('{"d_model": 64, ...}') shrinks the model for the
    # script's own smoke test (tests/test_interop_script.py); production
    # runs use the CLI finetune defaults = flagship dims.
    overrides = json.loads(os.environ.get("PBX_INTEROP_CFG", "{}"))
    ref_stack = load_reference_stack()

    rows, descs, ok = [], [], True
    for task in ("composer", "velocity"):
        t_rows, t_ok, t_desc = check_task(work, ref_stack, task, overrides)
        rows += t_rows
        descs.append(t_desc)
        ok = ok and t_ok

    report = [
        "## Reference behavioral interop at flagship scale",
        "",
        "The trained composer and velocity checkpoints above, exported with",
        "`export-ckpt --strict_ref` and STRICT-`load_state_dict`ed into the",
        "*unmodified* reference models (`model.py:165-218`, `236-272` —",
        "velocity exercises the swapped decoder label embedding,",
        "`PianoBart.py:88-91`), evaluated by the reference's own",
        "`FinetuneTrainer.valid()/test()` loops (`finetune.py:140-150`) on",
        "the same `.npy` splits (CPU, f32):",
        "",
        "| task/split | our loss | our acc | reference loss | reference acc "
        "| match |",
        "|---|---|---|---|---|---|",
        *rows,
        "",
        *[f"({d})" for d in descs],
        "(reference rounds to 4 decimals; acc tolerance 5e-5, loss 2e-3.)",
    ]
    out = write_report(work, report, ok)
    print("\n".join(report), flush=True)
    print(f"wrote {out}", flush=True)
    if not ok:
        raise SystemExit("interop MISMATCH — see table above")


def write_report(work: str, report_lines, ok: bool) -> str:
    """interop_report.md is real_data_e2e.py's "this stage is done" marker —
    it must exist ONLY on success, or a resumed e2e would silently skip the
    failed check and fold the MISMATCH table into RESULTS.md.  Mismatches go
    to interop_FAILED.md (kept for debugging, never treated as done)."""
    out = os.path.join(work,
                       "interop_report.md" if ok else "interop_FAILED.md")
    with open(out, "w") as f:
        f.write("\n".join(report_lines) + "\n")
    return out


if __name__ == "__main__":
    main()
