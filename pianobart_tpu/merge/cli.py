"""Merge CLI glue.

Replicates the reference ``model_merge.py`` defaults (mask_merging wrapping
average_merging, mask rate 0.8, delta_weight format, random strategy,
model_merge.py:23-78) over checkpoints in either reference torch format or
our orbax directories.  Output: a flax msgpack params file.
"""
from __future__ import annotations

import os
from typing import List

import numpy as np

from ..models import PianoBartConfig
from . import methods


def _load_params(path: str, cfg: PianoBartConfig):
    if os.path.isdir(path):
        import jax
        import jax.numpy as jnp
        from flax import linen as nn
        from ..models import PianoBartLM
        from ..train.state import CheckpointManager
        model = PianoBartLM(cfg)
        rng = jax.random.PRNGKey(0)
        ids = jnp.zeros((1, cfg.max_len, 8), jnp.int32)
        m = jnp.ones((1, cfg.max_len))
        template = nn.meta.unbox(model.init(rng, ids, ids, m, m))["params"]
        return CheckpointManager(path).restore_params(template)
    from ..compat.torch_import import import_checkpoint
    return import_checkpoint(path, cfg)


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
    else:
        raise ValueError(args.method)

    from flax import serialization
    blob = serialization.to_bytes({"pianobart": merged})
    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"merged {len(models)} models with {args.method} -> {args.output}")
    return args.output
