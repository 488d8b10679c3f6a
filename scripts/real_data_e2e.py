"""Real-data end-to-end run: corpus -> tokenize -> pretrain -> finetune ->
generate, all through the public CLI, on the attached TPU; writes RESULTS.md.

The environment has no network egress (the reference's POP909/EMOPIA/... zips
are unreachable), so the corpus is scripts/make_corpus.py's realistic fallback
(public-domain repertoire + styled procedural composers + real-world
messiness).  Everything else is exactly the user workflow from README.md.

Usage: python scripts/real_data_e2e.py [workdir] [--steps N]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def dur(sec, suffix=""):
    return ("cached from a previous stage run" if sec == 0
            else f"{sec:.0f}s{suffix}")


def sh(args, cwd, env=None, timeout=None):
    """Run a CLI subcommand.  ``timeout`` (seconds) turns a HANG into a
    recorded failure: a TPU-tunnel outage mid-round left a warm-cache
    demo blocked forever on a dead RPC (round 5), stalling every later
    stage — bounded stages fail loudly instead."""
    print(f"+ {' '.join(args)}", flush=True)
    e = dict(os.environ)
    e["PYTHONPATH"] = REPO + ":" + e.get("PYTHONPATH", "")
    if env:
        e.update(env)
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-m", "pianobart_tpu.cli"]
                           + args, cwd=cwd, env=e, capture_output=True,
                           text=True, timeout=timeout)
    except subprocess.TimeoutExpired as exc:
        print((exc.stdout or b"")[-4000:] if isinstance(exc.stdout, bytes)
              else (exc.stdout or "")[-4000:])
        raise SystemExit(f"command timed out after {timeout}s: {args}")
    dt = time.time() - t0
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        raise SystemExit(f"command failed: {args}")
    return r.stdout, dt


def label_stats(work, outdir, dataset, token_level=False):
    """Split sizes, test-label distribution and majority-class baseline for
    a finetune task (round-2 verdict: headline accuracies without split
    sizes/label distributions hid a constant-label melody task)."""
    import numpy as np
    from pianobart_tpu import vocab as V
    root = os.path.join(work, outdir)
    sizes, dists = {}, {}
    for split in ("train", "valid", "test"):
        X = np.load(os.path.join(root, f"{dataset}_{split}.npy"),
                    allow_pickle=True)
        y = np.load(os.path.join(root, f"{dataset}_{split}_ans.npy"),
                    allow_pickle=True)
        sizes[split] = len(X)
        if token_level:
            mask = X[..., 0] != V.PAD[0]
            vals, counts = np.unique(np.asarray(y)[mask], return_counts=True)
        else:
            vals, counts = np.unique(np.asarray(y), return_counts=True)
        dists[split] = dict(zip(vals.tolist(), counts.tolist()))
    test = dists["test"]
    total = sum(test.values())
    maj = max(test.values()) / max(total, 1)
    dist_s = ", ".join(f"{k}: {v}" for k, v in sorted(test.items()))
    unit = "labeled tokens" if token_level else "samples"
    return [
        f"splits: train/valid/test = {sizes['train']}/{sizes['valid']}/"
        f"{sizes['test']} sequences; test label distribution "
        f"({total} {unit}): {{{dist_s}}}; majority-class baseline "
        f"{maj:.4f}", ""]


def emotion_signal_stats(work, outdir, dataset):
    """Trivial-rule baselines the 4-way emotion accuracy must be read against.

    The corpus labels are Russell quadrants = (initial tempo >= 90bpm) x
    (minor mode) (scripts/make_corpus.py:emotion_quadrant).  Arousal is
    directly readable from the octuple tempo field.  Since round 5 the
    valence bit is LEARNABLE (round-4 verdict do-this #1): minor songs use
    harmonic minor (a pitch-class set distinct from every major
    transposition), phrase endings carry mode-keyed cadential figures, and
    dynamics are valence-keyed (make_corpus.py).  Alongside the tempo-only
    rules we therefore also report the strongest trivial two-feature rule —
    first-tempo-token x mean-velocity threshold — so the model's accuracy is
    compared against what the valence-keyed dynamics alone give away."""
    import numpy as np
    from pianobart_tpu import vocab as V
    root = os.path.join(work, outdir)
    thr = V.tempo_to_bin(90.0)
    data = {}
    for split in ("train", "valid", "test"):
        X = np.asarray(np.load(os.path.join(root, f"{dataset}_{split}.npy"),
                               allow_pickle=True), np.int64)
        y = np.asarray(np.load(
            os.path.join(root, f"{dataset}_{split}_ans.npy"),
            allow_pickle=True), np.int64)
        real = X[..., 0] != V.PAD[0]
        # octuple field 5 = Velocity (vocab.FIELDS; field 4 is Duration —
        # a round-5 review caught the rule reading the wrong feature)
        mv = np.array([X[j, real[j], 5].mean() if real[j].any() else 0.0
                       for j in range(len(X))])
        data[split] = (X[:, 0, 7] >= thr, mv, y)
    hi_tr, mv_tr, y_tr = data["train"]
    # labels 0..3 = Q1..Q4: Q1/Q2 (0/1) are the high-arousal quadrants
    maj_hi = np.bincount(y_tr[hi_tr], minlength=4).argmax()
    maj_lo = np.bincount(y_tr[~hi_tr], minlength=4).argmax()
    # tempo x velocity rule: split each arousal half at its best velocity
    # threshold (train-fit), predicting the majority label of each cell
    vthr = np.median(mv_tr)
    cells = {}
    for h in (False, True):
        for b in (False, True):
            sel = (hi_tr == h) & ((mv_tr >= vthr) == b)
            cells[(h, b)] = (np.bincount(y_tr[sel], minlength=4).argmax()
                             if sel.any() else maj_hi if h else maj_lo)
    lines = []
    for split in ("valid", "test"):
        hi, mv, y = data[split]
        ar = float((hi == ((y == 0) | (y == 1))).mean())
        four = float((np.where(hi, maj_hi, maj_lo) == y).mean())
        tv = float(np.mean([cells[(bool(h), bool(m >= vthr))] == t
                            for h, m, t in zip(hi, mv, y)]))
        lines.append(f"{split} arousal-rule {ar:.3f} / 4-way tempo-rule "
                     f"{four:.3f} / 4-way tempo+velocity rule {tv:.3f}")
    return [
        "trivial-rule baselines (train-fit, applied to valid/test): the "
        "label is (initial tempo >= 90bpm) x (minor mode).  Arousal is one "
        "tempo token; since round 5 valence is encoded REDUNDANTLY in "
        "pitch content (harmonic minor, mode-keyed cadences) AND in "
        "valence-keyed dynamics (make_corpus.py), so the tempo+mean-"
        "velocity rule is a deliberately HIGH two-feature bar: the "
        "dynamics channel alone carries most of the valence signal, and "
        "exceeding this rule means the model extracts more than that one "
        "channel.  The round-4 verdict bar (clear the 4-way tempo-only "
        "rule) is the headline criterion.  "
        + "; ".join(lines) + ".", ""]


def _read_run(path):
    """(epoch records, early_stopped) of the LATEST run (logs append
    across reruns)."""
    out, early = [], False
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            ev = rec.get("event")
            if ev == "epoch":
                if out and rec["epoch"] <= out[-1]["epoch"]:
                    out, early = [], False  # a rerun started over
                out.append(rec)
            elif ev == "early_stop":
                early = True
    return out, early


def read_epochs(path):
    return _read_run(path)[0]


def run_complete(path, requested):
    """Stage cache: a training run counts as done when it recorded the
    requested epochs OR the runner early-stopped (patience) — an
    early-stopped 8-of-12-epoch run must not re-train on every rerun."""
    if not os.path.exists(path):
        return False
    epochs, early = _read_run(path)
    return bool(epochs) and (len(epochs) >= requested or early)


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pbx_real_e2e"
    epochs_pre = int(os.environ.get("PBX_E2E_PRETRAIN_EPOCHS", "12"))
    epochs_ft = int(os.environ.get("PBX_E2E_FINETUNE_EPOCHS", "6"))
    os.makedirs(work, exist_ok=True)

    from scripts.make_corpus import CORPUS_VERSION, make_corpus
    corpus = os.path.join(work, "corpus")
    done_marker = os.path.join(corpus, ".complete")
    if os.path.exists(done_marker):
        # the marker carries the generator's semantic version: a workdir
        # whose corpus predates a label-semantics change must NOT be
        # re-measured under the new claims (round-5 review).  Downstream
        # stages were trained on the stale corpus, so silently rebuilding
        # would be worse — demand a fresh workdir.
        stamp = open(done_marker).read().strip()
        if stamp != f"v{CORPUS_VERSION}":
            raise SystemExit(
                f"{done_marker}: corpus generator version changed "
                f"({stamp or 'unversioned'} on disk, v{CORPUS_VERSION} in "
                f"scripts/make_corpus.py) and every trained stage in this "
                f"workdir derives from the old corpus — rerun against a "
                f"FRESH workdir (e.g. python scripts/real_data_e2e.py "
                f"/tmp/pbx_real_e2e_v{CORPUS_VERSION})")
    else:
        # bare isdir() let an interrupted generation poison every later
        # run with a partial corpus (round-3 review); rebuild from scratch
        # unless the completion marker exists
        import shutil as _sh
        _sh.rmtree(corpus, ignore_errors=True)
        make_corpus(corpus, n_files=400, seed=2024)
        with open(done_marker, "w") as f:
            f.write(f"v{CORPUS_VERSION}")
    n_corpus_files = sum(
        len([f for f in fs if f.endswith(".mid")])
        for _, _, fs in os.walk(corpus))

    # 1. tokenize: pretrain stream + composer + emotion labels
    tok_s = 0.0   # exactly 0.0 = the 'cached' sentinel dur() understands
    if not os.path.exists(os.path.join(
            work, "Data/output_emotion/corpus/corpus_train.npy")):
        t_tok0 = time.time()
        sh(["tokenize", "--dataset", corpus, "--task", "pretrain",
            "--no_pad"], cwd=work)
        sh(["tokenize", "--dataset", corpus, "--task", "composer"], cwd=work)
        sh(["tokenize", "--dataset", corpus, "--task", "emotion"], cwd=work)
        tok_s = time.time() - t_tok0

    import numpy as np
    tr = np.load(os.path.join(work, "Data/output_pretrain/corpus/"
                              "corpus_train_split.npy"))
    n_windows = tr.shape[0]

    # 2. flagship pretrain on the TPU (skipped if already complete)
    pre_jsonl = os.path.join(work, "result/pretrain/realdata/metrics.jsonl")
    pre_s = 0.0
    if not run_complete(pre_jsonl, epochs_pre):
        _, pre_s = sh(["pretrain", "--dataroot", "Data/output_pretrain",
                       "--datasets", "corpus", "--batch_size", "16",
                       "--epochs", str(epochs_pre), "--name", "realdata",
                       "--mesh", "1x1x1"], cwd=work)
    pre = read_epochs(pre_jsonl)

    # 3. composer finetune from the pretrain checkpoint (the corpus has 10
    # composer directories -> 10 classes, not the Pianist8 default of 8)
    n_cls = len(json.load(open(os.path.join(
        work, "Data/output_composer/corpus/corpus_composer.json"))))
    ft_jsonl = os.path.join(
        work, "result/finetune/composer_realdata/metrics.jsonl")
    ft_s = 0.0
    if not run_complete(ft_jsonl, epochs_ft):
        _, ft_s = sh(["finetune", "--task", "composer", "--dataset", "corpus",
                      "--dataroot", "Data/output_composer/corpus",
                      "--epochs", str(epochs_ft), "--batch_size", "8",
                      "--class_num", str(n_cls),
                      "--name", "realdata", "--mesh", "1x1x1",
                      "--ckpt", "result/pretrain/realdata/best"], cwd=work)
    ft = read_epochs(ft_jsonl)

    # 3b. generation finetune (+FAD) from the pretrain checkpoint
    if not os.path.exists(os.path.join(
            work, "Data/output_generate/corpus/corpus_train.npy")):
        sh(["tokenize", "--dataset", corpus, "--task", "generate"], cwd=work)
    epochs_gen = int(os.environ.get("PBX_E2E_GEN_EPOCHS", "4"))
    gen_jsonl = os.path.join(
        work, "result/finetune/generation_realdata/metrics.jsonl")
    gen_s = 0.0
    if not run_complete(gen_jsonl, epochs_gen):
        _, gen_s = sh(["finetune-generation", "--datasets", "corpus",
                       "--dataroot", "Data/output_generate/corpus",
                       "--epochs", str(epochs_gen), "--batch_size", "8",
                       "--fad", "--fad_jit", "--name", "realdata",
                       "--mesh", "1x1x1",
                       "--ckpt", "result/pretrain/realdata/best"], cwd=work)
    gen = read_epochs(gen_jsonl)

    # 3c. velocity finetune (token classification, label-embedding decoder)
    if not os.path.exists(os.path.join(
            work, "Data/output_velocity/corpus/corpus_train.npy")):
        sh(["tokenize", "--dataset", corpus, "--task", "velocity"], cwd=work)
    epochs_vel = int(os.environ.get("PBX_E2E_VEL_EPOCHS", "3"))
    vel_jsonl = os.path.join(
        work, "result/finetune/velocity_realdata/metrics.jsonl")
    vel_s = 0.0
    if not run_complete(vel_jsonl, epochs_vel):
        _, vel_s = sh(["finetune", "--task", "velocity", "--dataset",
                       "corpus", "--dataroot", "Data/output_velocity/corpus",
                       "--epochs", str(epochs_vel), "--batch_size", "8",
                       "--name", "realdata", "--mesh", "1x1x1",
                       "--ckpt", "result/pretrain/realdata/best"], cwd=work)
    vel = read_epochs(vel_jsonl)

    # 3c1. flagship-scale behavioral interop: the UNMODIFIED reference
    # trainer must reproduce the trained composer AND velocity checkpoints'
    # metrics (round-3 verdict item 4 + round-4 do-this #4 — velocity
    # exercises the swapped decoder label embedding, the hairiest export
    # mapping).  CPU-only subprocess — the TPU stays free.
    interop_md = os.path.join(work, "interop_report.md")
    interop_s = 0.0
    if not os.path.exists(interop_md):
        print("+ scripts/ref_interop_check.py (CPU)", flush=True)
        e = dict(os.environ)
        e["PYTHONPATH"] = REPO + ":" + e.get("PYTHONPATH", "")
        e["PALLAS_AXON_POOL_IPS"] = ""  # never register the TPU
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "ref_interop_check.py"), work],
            env=e, capture_output=True, text=True)
        interop_s = time.time() - t0
        if r.returncode != 0:
            print(r.stdout[-4000:])
            print(r.stderr[-4000:])
            raise SystemExit("ref_interop_check failed")
    with open(interop_md) as f:
        interop_lines = f.read().rstrip("\n").split("\n")

    # 3c2. emotion finetune (4-way, labels from the QX_ file-name prefixes)
    # 8 epochs: the learnable-valence corpus (round-4 verdict #1) needs the
    # model to pick up pitch/cadence signal beyond the 1-epoch tempo rule
    epochs_emo = int(os.environ.get("PBX_E2E_EMO_EPOCHS", "8"))
    emo_jsonl = os.path.join(
        work, "result/finetune/emotion_realdata/metrics.jsonl")
    emo_s = 0.0
    if not run_complete(emo_jsonl, epochs_emo):
        _, emo_s = sh(["finetune", "--task", "emotion", "--dataset", "corpus",
                       "--dataroot", "Data/output_emotion/corpus",
                       "--epochs", str(epochs_emo), "--batch_size", "8",
                       "--name", "realdata", "--mesh", "1x1x1",
                       "--ckpt", "result/pretrain/realdata/best"], cwd=work)
    emo = read_epochs(emo_jsonl)

    # 3c3. melody finetune (token classification, 9-tuple labels)
    if not os.path.exists(os.path.join(
            work, "Data/output_melody/corpus/corpus_train.npy")):
        sh(["tokenize", "--dataset", corpus, "--task", "melody"], cwd=work)
    epochs_mel = int(os.environ.get("PBX_E2E_MEL_EPOCHS", "3"))
    mel_jsonl = os.path.join(
        work, "result/finetune/melody_realdata/metrics.jsonl")
    mel_s = 0.0
    if not run_complete(mel_jsonl, epochs_mel):
        _, mel_s = sh(["finetune", "--task", "melody", "--dataset", "corpus",
                       "--dataroot", "Data/output_melody/corpus",
                       "--epochs", str(epochs_mel), "--batch_size", "8",
                       "--name", "realdata", "--mesh", "1x1x1",
                       "--ckpt", "result/pretrain/realdata/best"], cwd=work)
    mel = read_epochs(mel_jsonl)

    # 3c4. ablation trainer (no-pretrain second-half reconstruction)
    epochs_abl = int(os.environ.get("PBX_E2E_ABL_EPOCHS", "2"))
    abl_jsonl = os.path.join(
        work, "result/finetune/ablation_realdata/metrics.jsonl")
    abl_s = 0.0
    if not run_complete(abl_jsonl, epochs_abl):
        _, abl_s = sh(["ablation", "--datasets", "corpus",
                       "--dataroot", "Data/output_generate/corpus",
                       "--epochs", str(epochs_abl), "--batch_size", "8",
                       "--name", "realdata", "--mesh", "1x1x1"], cwd=work)
    abl = read_epochs(abl_jsonl)

    # 3d. batched eval-gen over the generation test split
    eg_s = 0.0
    if not os.path.exists(os.path.join(work, "gen_eval.npy")):
        _, eg_s = sh(["eval-gen", "--datasets", "corpus",
                  "--dataroot", "Data/output_generate/corpus",
                      "--output", "gen_eval.npy", "--batch_size", "8",
                      "--mesh", "1x1x1",
                      "--ckpt", "result/finetune/generation_realdata/best"],
                     cwd=work)
    import numpy as _np
    eg_shape = _np.load(os.path.join(work, "gen_eval.npy")).shape

    # 3e. merge MATRIX (round-4 verdict do-this #5): field-test the L8
    # toolkit on the real flagship trunks, not just average.  Every merged
    # msgpack carries the generation model's LM head (--head_from; without
    # it consumers re-init a RANDOM head), is field-tested by decoding the
    # full generation test split (eval-gen) and scored with the generation
    # FAD metric against the ground-truth continuations, and drives a demo.
    # Reference: clear code/model_merge.py:23-79 (its default is DARE
    # rate-0.8 mask_merging wrapping average), merging_methods.py:529-602.
    pre_best = "result/pretrain/realdata/best"
    gen_best = "result/finetune/generation_realdata/best"
    vel_best = "result/finetune/velocity_realdata/best"
    merge_matrix = [
        ("average", "average (pretrain+generation trunks)",
         ["--models", pre_best, gen_best, "--method", "average_merging"]),
        ("taskarith", "task-arithmetic (gen+vel deltas on pretrain, coeff 1.0)",
         ["--models", gen_best, vel_best, "--pretrained", pre_best,
          "--method", "task_arithmetic"]),
        ("ties", "TIES (gen+vel, param mask 0.8, sign election)",
         ["--models", gen_best, vel_best, "--pretrained", pre_best,
          "--method", "ties_merging"]),
        ("dare", "DARE mask 0.8 -> average (reference model_merge.py default)",
         ["--models", gen_best, vel_best, "--pretrained", pre_best,
          "--method", "mask_merging"]),
        ("regmean", "RegMean (gen+vel, grams from 32 pretrain valid windows)",
         ["--models", gen_best, vel_best, "--method", "regmean_merging",
          "--data", "Data/output_pretrain/corpus/corpus_valid_split.npy",
          "--num_examples", "32"]),
    ]
    mg_s = 0.0
    merge_rows = []
    for slug, label, argv in merge_matrix:
        pack = f"merged_{slug}.msgpack"
        if not os.path.exists(os.path.join(work, pack)):
            _, dt = sh(["merge", *argv, "--head_from", gen_best,
                        "--output", pack], cwd=work)
            mg_s += dt
        ev = f"gen_eval_{slug}.npy"
        if not os.path.exists(os.path.join(work, ev)):
            _, dt = sh(["eval-gen", "--datasets", "corpus",
                        "--dataroot", "Data/output_generate/corpus",
                        "--output", ev, "--batch_size", "8",
                        "--mesh", "1x1x1", "--ckpt", pack], cwd=work)
            mg_s += dt
        merge_rows.append((slug, label, pack, ev))
    # keep the round-4 artifact name: the plain-average merge IS the file
    # later demo stages and docs refer to
    if not os.path.exists(os.path.join(work, "merged_params.msgpack")):
        import shutil as _sh2
        _sh2.copyfile(os.path.join(work, "merged_average.msgpack"),
                      os.path.join(work, "merged_params.msgpack"))

    # 4. demo continuation from a real corpus file with the trained ckpt
    some_midi = None
    for root, _, files in os.walk(corpus):
        for f in sorted(files):
            if f.endswith(".mid") and "Broken" not in root:
                some_midi = os.path.join(root, f)
                break
        if some_midi:
            break
    # The written .mid is each demo's done marker (run_demo only writes it
    # on success) — without the guard a doc-only regeneration re-ran both
    # demos on the TPU (or failed outright in a CPU-only invocation).
    demo_out = os.path.join(work, "continuation.mid")
    demo_s = 0.0
    if not os.path.exists(demo_out):
        _, demo_s = sh(["demo", "--input", some_midi, "--output", demo_out,
                        "--ckpt", "result/pretrain/realdata/best"],
                       cwd=work, timeout=1800)
    demo_merged = os.path.join(work, "continuation_merged.mid")
    demo_m_s = 0.0
    if not os.path.exists(demo_merged):
        _, demo_m_s = sh(["demo", "--input", some_midi, "--output",
                          demo_merged, "--ckpt", "merged_params.msgpack"],
                         cwd=work, timeout=1800)

    # 4b. demo + FAD score for every merge-matrix method (the average row
    # reuses the demo above); FAD is computed exactly as the generation
    # trainer scores teacher-forced eval, but on the DECODED continuations
    # vs the ground-truth targets — same metric for every row, so relative
    # degradation across methods is meaningful
    import numpy as _np2
    from pianobart_tpu import vocab as _V2
    from pianobart_tpu.utils.fad import generation_fad as _gen_fad
    # ground truth + mask are identical for every row: load once
    _gt = _np2.asarray(_np2.load(
        os.path.join(work, "Data/output_generate/corpus",
                     "corpus_test_genans.npy"), allow_pickle=True),
        _np2.int64)
    _gt_attn = (_gt[..., 0] != _V2.PAD[0]).astype(_np2.int64)

    def gen_fad_of(npy_name):
        out = _np2.asarray(_np2.load(os.path.join(work, npy_name)),
                           _np2.int64)
        return _gen_fad(_gt, out, _gt_attn)

    # demo failure is a RESULT (recorded), not a crash — but an
    # infrastructure timeout (hung TPU tunnel) is NOT a model failure:
    # report it as such instead of a misleading "NO"
    def try_demo(out_mid, ckpt):
        if os.path.exists(out_mid):
            return "yes"
        try:
            sh(["demo", "--input", some_midi, "--output", out_mid,
                "--ckpt", ckpt], cwd=work, timeout=1800)
        except SystemExit as exc:
            if not os.path.exists(out_mid):
                return ("n/a (timed out)" if "timed out" in str(exc)
                        else "NO")
        return "yes" if os.path.exists(out_mid) else "NO"

    # the baseline row's demo runs from the UNMERGED generation checkpoint
    # (round-5 review: its 'yes' was hardcoded without a demo ever running)
    demo_genft = os.path.join(work, "continuation_genft.mid")
    genft_cell = try_demo(demo_genft, gen_best)
    merge_table = []
    fad0, fad_bar0 = gen_fad_of("gen_eval.npy")
    merge_table.append(("unmerged generation-finetuned (baseline)",
                        fad0, fad_bar0, genft_cell))
    for slug, label, pack, ev in merge_rows:
        out_mid = (demo_merged if slug == "average"
                   else os.path.join(work, f"continuation_{slug}.mid"))
        cell = try_demo(out_mid, pack)
        f, fb = gen_fad_of(ev)
        merge_table.append((label, f, fb, cell))

    # 5. serving benchmark on the chip (round-4 verdict do-this #2): the
    # micro-batching WSGI backend under concurrent HTTP clients, at
    # concurrency 8 and 16, plus the single-user latency — the number the
    # reference's per-request-reload batch-1 Flask backend
    # (gui/backend/app.py:71-93) cannot approach.  PBX_E2E_SERVE=0 skips.
    serve_json = os.path.join(work, "serve_bench.json")
    serve_s = 0.0
    serve_stats = None
    if os.environ.get("PBX_E2E_SERVE", "1") != "0":
        if not os.path.exists(serve_json):
            results = {}
            for conc in (8, 16):
                cmd = [sys.executable,
                       os.path.join(REPO, "scripts", "serve_bench.py"),
                       "--ckpt", os.path.join(work, pre_best),
                       "--input", some_midi,
                       "--concurrency", str(conc), "--volleys", "4",
                       "--port", str(5060 + conc)]
                print(f"+ serve_bench --concurrency {conc}", flush=True)
                e = dict(os.environ)
                e["PYTHONPATH"] = REPO + ":" + e.get("PYTHONPATH", "")
                t0 = time.time()
                r = subprocess.run(cmd, env=e, capture_output=True, text=True)
                serve_s += time.time() - t0
                if r.returncode != 0:
                    print(r.stdout[-4000:])
                    print(r.stderr[-4000:])
                    raise SystemExit(f"serve_bench c={conc} failed")
                line = [ln for ln in r.stdout.splitlines()
                        if ln.startswith("{")][-1]
                results[str(conc)] = json.loads(line)
            with open(serve_json, "w") as f:
                json.dump(results, f, indent=1)
        serve_stats = json.load(open(serve_json))

    # 6. long-context training on REAL data (round-4 verdict do-this #3):
    # re-tokenize the corpus into 2048-token windows and pretrain at
    # S=2048/B=16 dense on the single chip — the envelope
    # scripts/longctx_tpu_check.py measured (592.7 ms/step, 55.3k tok/s)
    # says it fits without remat.  The ring/sp path trains the same data
    # shape in the CPU-mesh suite (test_cli.py sequence-parallel e2e).
    # PBX_E2E_LONGCTX=0 skips.  Reference cap: pretrain.py:33 (hard 1024).
    epochs_lc = int(os.environ.get("PBX_E2E_LC_EPOCHS", "4"))
    lc, lc_windows = [], 0
    lc_s = 0.0
    if os.environ.get("PBX_E2E_LONGCTX", "1") != "0":
        lc_train = os.path.join(
            work, "Data/output_pretrain2048/corpus/corpus_train_split.npy")
        if not os.path.exists(lc_train):
            sh(["tokenize", "--dataset", corpus, "--task", "pretrain",
                "--no_pad", "--max_seq_len", "2048",
                "--out_root", "Data/output_pretrain2048"], cwd=work)
        lc_windows = _np.load(lc_train, mmap_mode="r").shape[0]
        lc_jsonl = os.path.join(
            work, "result/pretrain/longctx2048/metrics.jsonl")
        if not run_complete(lc_jsonl, epochs_lc):
            _, lc_s = sh(["pretrain", "--dataroot", "Data/output_pretrain2048",
                          "--datasets", "corpus", "--batch_size", "16",
                          "--max_seq_len", "2048",
                          "--epochs", str(epochs_lc),
                          "--name", "longctx2048", "--mesh", "1x1x1"],
                         cwd=work)
        lc = read_epochs(lc_jsonl)

    # ---- RESULTS.md ----
    lines = [
        "# Real-data end-to-end results (round 5: learnable-valence corpus,"
        " merge matrix, serving bench, long-context training)",
        "",
        "No network egress: POP909/Pianist8/EMOPIA are unreachable, so the",
        "corpus is `scripts/make_corpus.py` — programmatic public-domain",
        "repertoire (BWV 846, Canon in D, Ode to Joy, Fuer Elise) plus six",
        "styled procedural composers with real-world messiness (tempo/",
        "time-signature changes, >255-bar pieces, overlapping and",
        "zero-length notes, duplicates, truncated files).  Since round 5",
        "the emotion label's valence bit is learnable (harmonic-minor pitch",
        "content, mode-keyed cadences, valence-keyed dynamics).  Every step",
        "below ran through the public CLI on the attached TPU v5e.",
        "",
        f"- corpus: {n_corpus_files} files -> tokenize "
        f"(pretrain+composer+emotion) "
        f"({dur(tok_s)}); {n_windows} x1024 pretrain windows",
        f"- pretrain: flagship model, batch 16, {len(pre)} epochs "
        f"({dur(pre_s, ' wall incl. compile')})",
        f"- finetune composer: {len(ft)} epochs from the pretrain best "
        f"checkpoint ({dur(ft_s, ' wall')})",
        f"- finetune generation (+FAD): {len(gen)} epochs ({dur(gen_s)})",
        f"- finetune velocity: {len(vel)} epochs ({dur(vel_s)})",
        f"- finetune emotion: {len(emo)} epochs"
        + (f" (early-stopped from {epochs_emo} requested)"
           if len(emo) < epochs_emo else "")
        + f" ({dur(emo_s)})",
        f"- finetune melody: {len(mel)} epochs ({dur(mel_s)})",
        f"- ablation (no-pretrain reconstruction): {len(abl)} epochs "
        f"({dur(abl_s)})",
        f"- eval-gen: batched KV-cached decode of the full generation test "
        f"split -> {eg_shape} ({dur(eg_s)})",
        f"- merge matrix: {len(merge_rows)} methods on the flagship trunks, "
        f"each field-tested by decoding the generation test split + a demo "
        f"({dur(mg_s)}) -> "
        f"{'continuation_merged.mid written' if os.path.exists(demo_merged) else 'NO OUTPUT (all retry seeds truncated empty)'}",
        f"- demo continuation from `{os.path.relpath(some_midi, work)}` "
        f"({dur(demo_s, ' incl. compile')}): "
        f"{'continuation.mid written' if os.path.exists(demo_out) else 'NO OUTPUT (all retry seeds truncated empty)'}",
        "",
        "## Pretrain curve (vocab-weighted)",
        "",
        "(throughput lives in bench.py/BENCH_r*.json; the runner's epoch",
        "timer doesn't device-sync and would overstate it)",
        "",
        "| epoch | train loss | valid loss | weighted acc |",
        "|---|---|---|---|",
    ]
    for rec in pre:
        lines.append(
            f"| {rec['epoch']} | {rec['train']['loss']:.4f} "
            f"| {rec['valid']['loss']:.4f} | {rec['weighted_acc']:.4f} |")
    def acc_table(title, recs, stats=()):
        rows = ["", f"## {title}", "", *stats,
                "| epoch | train loss | valid acc | test acc |",
                "|---|---|---|---|"]
        for rec in recs:
            rows.append(
                f"| {rec['epoch']} | {rec['train']['loss']:.4f} "
                f"| {rec['valid'].get('acc', float('nan')):.4f} "
                f"| {rec['test'].get('acc', float('nan')):.4f} |")
        return rows

    lines += acc_table(
        f"Composer finetune ({n_cls}-way classification)", ft,
        label_stats(work, "Data/output_composer/corpus", "corpus"))
    lines += ["", *interop_lines,
              f"(interop check ran in {dur(interop_s)})"
              if interop_s else ""]
    lines += [
        "",
        f"## Generation finetune ({len(gen)} epochs, field-weighted CE + FAD)",
        "",
        "| epoch | train loss | valid loss | mean field acc | FAD | FAD-bar |",
        "|---|---|---|---|---|---|",
    ]
    for rec in gen:
        v = rec["valid"]
        mean_acc = sum(v["field_acc"]) / len(v["field_acc"])
        lines.append(
            f"| {rec['epoch']} | {rec['train']['loss']:.4f} "
            f"| {v['loss']:.4f} | {mean_acc:.4f} "
            f"| {v.get('fad', float('nan')):.4f} "
            f"| {v.get('fad_bar', float('nan')):.4f} |")
    lines += acc_table(
        "Velocity finetune (token classification)", vel,
        label_stats(work, "Data/output_velocity/corpus", "corpus",
                    token_level=True))
    lines += acc_table(
        "Emotion finetune (4-way classification)", emo,
        label_stats(work, "Data/output_emotion/corpus", "corpus")
        + emotion_signal_stats(work, "Data/output_emotion/corpus", "corpus"))
    lines += acc_table(
        "Melody finetune (token classification: MELODY/BRIDGE/PIANO/OTHER "
        "from POP909-style track names)", mel,
        label_stats(work, "Data/output_melody/corpus", "corpus",
                    token_level=True))
    lines += ["", "## Ablation (second-half reconstruction, no pretrain)",
              "", "| epoch | train loss | valid loss |", "|---|---|---|"]
    for rec in abl:
        lines.append(f"| {rec['epoch']} | {rec['train']['loss']:.4f} "
                     f"| {rec['valid']['loss']:.4f} |")

    lines += [
        "",
        "## Merge matrix on the flagship trunks (L8 field test)",
        "",
        "Each merged model = merged trunk + the generation model's LM head",
        "(`merge --head_from`), field-tested by AR-decoding the full",
        "generation test split (`eval-gen`, KV-cached batch 8) and scoring",
        "FAD/FAD-bar against the ground-truth continuations — the same",
        "metric for every row, so relative degradation across methods is",
        "meaningful (lower is better).  `demo` = a real continuation demo",
        "succeeded from the merged weights.  Reference default is the DARE",
        "row (`clear code/model_merge.py:23-79`: rate-0.8 mask_merging",
        "wrapping average).",
        "",
        "| method | FAD | FAD-bar | demo |",
        "|---|---|---|---|",
    ]
    for label, f, fb, demo_ok in merge_table:
        lines.append(f"| {label} | {f:.4f} | {fb:.4f} | {demo_ok} |")

    if serve_stats:
        lines += [
            "",
            "## Serving benchmark (micro-batching WSGI backend, real TPU)",
            "",
            "`scripts/serve_bench.py`: concurrent HTTP clients POST real",
            "MIDI uploads; the server coalesces a volley into ONE batched",
            "KV-cached decode (serve/app.py).  The reference backend",
            "(`gui/backend/app.py:71-93`) reloads the checkpoint and",
            "decodes batch-1 per request, so its throughput ceiling is",
            "1/solo-latency with zero coalescing.  Every decode bucket is",
            "pre-warmed before the first volley (one-time cost, persisted",
            "in the XLA cache; without it a live request draining into a",
            "cold bucket pays that compile — measured 128 s mid-volley in",
            "the unwarmed round-5 run); the headline is the MEDIAN",
            "per-volley rate over the post-first volleys.",
            "",
            "| concurrency | steady throughput (cont/s) | p50 latency (s) "
            "| p95 latency (s) | solo request (s) | bucket pre-warm (s) |",
            "|---|---|---|---|---|---|",
        ]
        for conc in sorted(serve_stats, key=int):
            st = serve_stats[conc]
            last_v = st["volleys"][-1]
            warm = st.get("warmup_s",
                          st["volleys"][0]["wall_s"])  # pre-warmup runs
            lines.append(
                f"| {conc} | {st['value']:.3f} | {last_v['p50_s']} "
                f"| {last_v['p95_s']} | {st['solo_latency_s']} "
                f"| {warm} |")
        solo = min(serve_stats[c]["solo_latency_s"] for c in serve_stats)
        best = max(serve_stats[c]["value"] for c in serve_stats)
        lines += [
            "",
            f"Sequential batch-1 serving (the reference's mode) tops out at "
            f"{1.0 / solo:.3f} cont/s ({solo} s/request); micro-batching "
            f"reaches {best:.3f} cont/s on the same chip — "
            f"{best * solo:.1f}x.",
        ]

    if lc:
        lines += [
            "",
            "## Long-context pretrain on real data (S=2048, dense, one v5e)",
            "",
            f"`tokenize --max_seq_len 2048 --no_pad` -> {lc_windows} "
            f"2048-token train windows; `pretrain --max_seq_len 2048 "
            f"--batch_size 16` ({dur(lc_s, ' wall incl. compile')}).  The "
            "reference hard-caps sequences at 1024 (`pretrain.py:33`); the "
            "measured single-chip envelope for this shape is 592.7 ms/step "
            "= 55.3k tok/s, 45.8% model MFU (scripts/longctx_tpu_check.py, "
            "same 32k tokens/step as the S=1024 headline).  Past S=2048 the "
            "CLI shards sequence over the mesh (`--mesh DPx1xSP`, ring "
            "attention; global S=4096 sp=4 proven in the dryrun).",
            "",
            "| epoch | train loss | valid loss | weighted acc |",
            "|---|---|---|---|",
        ]
        for rec in lc:
            lines.append(
                f"| {rec['epoch']} | {rec['train']['loss']:.4f} "
                f"| {rec['valid']['loss']:.4f} | {rec['weighted_acc']:.4f} |")

    first, last = pre[0], pre[-1]
    lines += [
        "",
        f"Pretrain loss {first['train']['loss']:.3f} -> "
        f"{last['train']['loss']:.3f}; weighted masked acc "
        f"{first['weighted_acc']:.3f} -> {last['weighted_acc']:.3f}.",
        "",
    ]
    out = os.path.join(REPO, "RESULTS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
