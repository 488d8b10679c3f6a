"""Merge CLI glue.

Replicates the reference ``model_merge.py`` defaults (mask_merging wrapping
average_merging, mask rate 0.8, delta_weight format, random strategy,
model_merge.py:23-78) over checkpoints in either reference torch format or
our orbax directories.  Output: a flax msgpack params file.
"""
from __future__ import annotations

import os
import numpy as np

from ..models import PianoBartConfig
from . import methods


def _lm_template(cfg: PianoBartConfig):
    """Deterministic (PRNGKey 0) random-init PianoBartLM param tree — the
    restore target for orbax checkpoints and the reference for detecting
    subtrees a checkpoint did NOT supply (restore keeps template leaves)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from ..models import PianoBartLM
    model = PianoBartLM(cfg)
    ids = jnp.zeros((1, cfg.max_len, 8), jnp.int32)
    m = jnp.ones((1, cfg.max_len))
    return nn.meta.unbox(
        model.init(jax.random.PRNGKey(0), ids, ids, m, m))["params"]


def _load_params(path: str, cfg: PianoBartConfig):
    if os.path.isdir(path):
        from ..train.state import CheckpointManager
        return CheckpointManager(path).restore_params(_lm_template(cfg))
    from ..compat.torch_import import import_checkpoint
    return import_checkpoint(path, cfg)


def _fisher_batches(args):
    """Load (n, B, S, 8) batches for data-aware merging from --data."""
    if not getattr(args, "data", None):
        raise SystemExit("fisher/regmean merging needs --data <pretrain .npy>")
    arr = np.load(args.data, allow_pickle=True).astype(np.int64)
    n = min(getattr(args, "num_examples", 32), len(arr))
    bs = 4
    return [arr[i:i + bs] for i in range(0, n, bs)]


def _lm_grad_fn(cfg, trunk_params):
    """Gradient of the teacher-forced LM loss w.r.t. trunk params.

    The reference computes fisher weights from each finetune's own task loss
    via its trainer (merging_methods.py:82-264); for trunk checkpoints we
    use the shared LM objective, which is defined for every trunk.
    """
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from .. import vocab as V
    from ..models import PianoBartLM
    from ..train.objective import masked_field_ce, shift_right

    model = PianoBartLM(cfg.replace(dtype=jnp.float32))
    rng = jax.random.PRNGKey(0)

    def build_full(trunk):
        ids = jnp.zeros((1, cfg.max_len, 8), jnp.int32)
        m = jnp.ones((1, cfg.max_len))
        full = dict(nn.meta.unbox(model.init(rng, ids, ids, m, m))["params"])
        full["pianobart"] = trunk
        return full

    @jax.jit
    def grad_fn_inner(full, batch):
        def loss(pp):
            dec = shift_right(batch, jnp.asarray(V.SOS, jnp.int32))
            mask = (batch[..., 0] != V.PAD[0]).astype(jnp.float32)
            fused = model.apply({"params": pp}, batch, dec, mask, mask, True)
            # loss over REAL rows only: counting PAD targets inflated the
            # Fisher weights toward pad-prediction directions (round-3
            # review; the real objectives all mask PAD)
            lm = jnp.broadcast_to(mask[..., None], batch.shape
                                  ).astype(jnp.float32)
            return masked_field_ce(fused, batch, lm, cfg)[0]
        return jax.grad(loss)(full)["pianobart"]

    def grad_fn(trunk, batch):
        import jax.numpy as jnp2
        full = build_full(trunk)
        return grad_fn_inner(full, jnp2.asarray(batch, jnp2.int32))

    return grad_fn


def _trunk_grams(cfg, trunk_params, batches):
    """Dense-input Gram matrices for RegMean over trunk Dense layers."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from .. import vocab as V
    from ..models import PianoBart
    from ..train.objective import shift_right
    from .methods import collect_dense_grams

    model = PianoBart(cfg.replace(dtype=jnp.float32))
    args_list = []
    for b in batches:
        b = jnp.asarray(b, jnp.int32)
        dec = shift_right(b, jnp.asarray(V.SOS, jnp.int32))
        mask = (b[..., 0] != V.PAD[0]).astype(jnp.float32)
        args_list.append((b, dec, mask, mask))
    return collect_dense_grams(model, {"params": trunk_params}, args_list)


def run_merge(args) -> str:
    cfg = PianoBartConfig()
    models = [_load_params(p, cfg) for p in args.models]
    pretrained = (_load_params(args.pretrained, cfg)
                  if args.pretrained else None)

    # merge only the shared trunk across heterogeneous head checkpoints
    trunks = [m["pianobart"] if "pianobart" in m else m for m in models]
    pre_trunk = None
    if pretrained is not None:
        pre_trunk = (pretrained["pianobart"] if "pianobart" in pretrained
                     else pretrained)
    needs_pre = args.method in ("task_arithmetic", "ties_merging") or (
        args.method == "mask_merging"
        and args.mask_apply_method in ("task_arithmetic", "ties_merging"))
    if needs_pre and pre_trunk is None:
        # merging against a None tree used to tree-map to None and write a
        # junk output while printing success (round-3 review)
        raise SystemExit(
            f"--method {args.method} subtracts a base model: pass "
            f"--pretrained <checkpoint> (the reference's "
            f"pretrained_model_name, model_merge.py)")

    if args.method == "mask_merging":
        masked = [methods.mask_model_weights(
            t, pre_trunk, weight_format="delta_weight" if pre_trunk else
            "finetuned_weight", weight_mask_rate=args.weight_mask_rate,
            use_weight_rescale=args.use_weight_rescale,
            mask_strategy=args.mask_strategy, seed=i)
            for i, t in enumerate(trunks)]
        if args.mask_apply_method == "average_merging":
            merged = methods.average_merging(masked)
        elif args.mask_apply_method == "task_arithmetic":
            merged = methods.task_arithmetic(pre_trunk, masked,
                                             args.scaling_coefficient)
        else:
            merged = methods.ties_merging(pre_trunk, masked,
                                          args.param_value_mask_rate,
                                          args.scaling_coefficient)
    elif args.method == "average_merging":
        merged = methods.average_merging(trunks)
    elif args.method == "task_arithmetic":
        merged = methods.task_arithmetic(pre_trunk, trunks,
                                         args.scaling_coefficient)
    elif args.method == "ties_merging":
        merged = methods.ties_merging(pre_trunk, trunks,
                                      args.param_value_mask_rate,
                                      args.scaling_coefficient)
    elif args.method == "fisher_merging":
        batches = _fisher_batches(args)
        fishers = [methods.compute_fisher_weights(
            _lm_grad_fn(cfg, m), m, batches) for m in trunks]
        merged = methods.fisher_merging(trunks, fishers)
    elif args.method == "regmean_merging":
        batches = _fisher_batches(args)
        grams = [_trunk_grams(cfg, m, batches) for m in trunks]
        merged = methods.regmean_merging(trunks, grams)
    else:
        raise ValueError(args.method)

    out_tree = {"pianobart": merged}
    if getattr(args, "head_from", None):
        # carry the task head(s) of one checkpoint alongside the merged
        # trunk — the reference loads merged backbones INTO a finetuned
        # model that keeps its own head (model_merge.py:60-78); without
        # this, downstream consumers of the msgpack (demo/eval-gen) fall
        # back to a RANDOM head for every non-trunk subtree
        import jax
        if args.head_from in args.models:  # already restored above
            head_src = models[args.models.index(args.head_from)]
        else:
            head_src = _load_params(args.head_from, cfg)
        # restore-onto-template keeps RANDOM template leaves for subtrees
        # the checkpoint doesn't carry (e.g. a classification checkpoint
        # has no LM head) — bundling those would silently ship junk heads
        # behind a success message (round-5 review)
        template = _lm_template(cfg)
        for k, v in head_src.items():
            if k == "pianobart":
                continue
            tl = jax.tree_util.tree_leaves(template.get(k, None))
            vl = jax.tree_util.tree_leaves(v)
            unchanged = (len(tl) == len(vl) and all(
                np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(vl, tl)))
            if unchanged:
                raise SystemExit(
                    f"--head_from {args.head_from}: subtree '{k}' is "
                    f"identical to the random-init template — that "
                    f"checkpoint does not carry this head; pass a "
                    f"checkpoint that owns the head you want bundled")
            out_tree[k] = v

    from flax import serialization
    blob = serialization.to_bytes(out_tree)
    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"merged {len(models)} models with {args.method} -> {args.output}"
          + (f" (heads from {args.head_from})"
             if getattr(args, "head_from", None) else ""))
    return args.output
