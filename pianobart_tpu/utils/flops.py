"""Analytic FLOP accounting for the pretrain step (shared by ``bench.py``
and ``scripts/longctx_tpu_check.py`` so the MFU convention can never
drift between them).

XLA ``cost_analysis`` cannot see inside the pallas attention kernels, so
MFU here is computed from an analytic count:

* dense matmuls: ``6 * tokens * sum(kernel param sizes)`` for fwd+bwd;
* attention, two conventions reported separately:

  - **model FLOPs** (comparable to published MFU figures): 2 fwd + 4 bwd
    block matmuls of ``2*B*S^2*d_model`` each;
  - **hardware FLOPs**: 2 fwd + 5 bwd — FlashAttention recomputes the
    score matmul in the backward (:mod:`pianobart_tpu.ops.flash`), so the
    chip really executes 7.

The reference has no FLOP accounting at all (its trainer prints only
loss/acc, ``pretrain.py:120-209``); MFU is this framework's own
yardstick against the TPU roofline.
"""
from __future__ import annotations

import numpy as np

__all__ = ["PEAK_BF16", "matmul_param_count", "pretrain_step_flops",
           "device_peak_flops"]

# bf16 MXU peak per chip, by jax device_kind.
PEAK_BF16 = {"TPU v4": 275e12, "TPU v5 lite": 197e12,
             "TPU v5": 459e12, "TPU v5e": 197e12, "TPU v5p": 459e12,
             "TPU v6 lite": 918e12, "TPU v6e": 918e12}


def device_peak_flops(device) -> float | None:
    """Peak bf16 FLOP/s for a jax device, or None if unknown."""
    return PEAK_BF16.get(device.device_kind)


def matmul_param_count(params) -> int:
    """Parameters that participate in matmuls (excludes gather tables).

    The positional embeddings (named ``embedding``) AND the fused octuple
    table (named ``table``, models/embedding.py) are gathers, not matmuls
    — counting them inflated MFU ~0.2% (round-3 review).
    """
    import jax
    return sum(
        int(np.prod(p.shape)) for path, p in
        jax.tree_util.tree_flatten_with_path(params)[0]
        if p.ndim >= 2
        and "embedding" not in str(path[-1]).lower()
        and "table" not in str(path[-1]).lower())


def pretrain_step_flops(params, cfg, batch_size: int,
                        seq_len: int) -> tuple[float, float]:
    """(model_flops, hardware_flops) for one full fwd+bwd pretrain step."""
    tokens = batch_size * seq_len
    dense = 6 * tokens * matmul_param_count(params)
    n_attn = cfg.encoder_layers + 2 * cfg.decoder_layers
    attn_unit = 2 * batch_size * seq_len * seq_len * cfg.d_model
    model_flops = float(dense + n_attn * (2 + 4) * attn_unit)
    hw_flops = float(dense + n_attn * (2 + 5) * attn_unit)
    return model_flops, hw_flops
