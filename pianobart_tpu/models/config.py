"""Model configuration.

One dataclass replaces the reference's six duplicated argparse blocks +
``BartConfig`` rebuilds (``main.py:39-47``, ``pretrain.py:30-37``, etc.).
Defaults reproduce the published PianoBART shape: d_model 1024, 8+8 layers,
ffn 2048, 8 heads, seq 1024, Octuple vocab 1280.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from .. import vocab as V


@dataclasses.dataclass(frozen=True)
class PianoBartConfig:
    field_sizes: Tuple[int, ...] = V.FIELD_SIZES
    emb_size: int = 256                    # per-field embedding width
    d_model: int = 1024
    encoder_layers: int = 8
    decoder_layers: int = 8
    ffn_dim: int = 2048
    num_heads: int = 8
    max_len: int = V.MAX_WINDOW
    dropout: float = 0.1
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    pos_offset: int = 2                    # HF Bart learned-pos-embedding offset
    # Optional label-embedding decoder (velocity finetune,
    # PianoBart.change_decoder_embedding, PianoBart.py:88-91).
    decoder_label_vocab: Optional[int] = None
    decoder_label_dim: int = 64
    dtype: jnp.dtype = jnp.float32         # activation/compute dtype
    param_dtype: jnp.dtype = jnp.float32
    use_flash_attention: bool = True       # pallas kernel on TPU when applicable
    remat: bool = False                    # rematerialize layers (memory saver)
    # Recompute ONLY the FFN hidden (B, S, ffn_dim) in the backward: frees
    # the largest per-layer activation for ~1 extra fc1 matmul per layer,
    # WITHOUT re-running the flash attention kernels (full cfg.remat
    # measured 2.5x slower because it recomputes those).  Enables larger
    # batches on a 16 GB chip.
    remat_ffn: bool = False
    # Sequence-parallel ring attention: set to the mesh axis name ("sp") and
    # run the model inside shard_map with the sequence axis sharded on it
    # (see parallel.sp.encode_sp).  None = dense attention.
    ring_axis: "Optional[str]" = None
    # Head-sharded tensor parallelism COMPOSED with the ring (TP∘SP): set to
    # the tp mesh axis name + its size.  Each tp shard projects and ring-
    # attends H/ring_tp_size heads (column-parallel q/k/v, row-parallel
    # out_proj with an explicit psum); gradients stay exact under unchecked
    # shard_map via the custom-VJP collectives in ops/ring.py.
    ring_tp_axis: "Optional[str]" = None
    ring_tp_size: int = 1

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    @property
    def n_fields(self) -> int:
        return len(self.field_sizes)

    @property
    def total_vocab(self) -> int:
        return int(sum(self.field_sizes))

    @property
    def field_offsets(self) -> Tuple[int, ...]:
        off, acc = [], 0
        for s in self.field_sizes:
            off.append(acc)
            acc += s
        return tuple(off)

    def replace(self, **kw) -> "PianoBartConfig":
        return dataclasses.replace(self, **kw)


def tiny_config(**kw) -> PianoBartConfig:
    """Small config for tests (mirrors the reference self-tests'
    ``BartConfig(max_position_embeddings=32, d_model=48)``, PianoBart.py:97)."""
    base = dict(d_model=64, emb_size=16, encoder_layers=2, decoder_layers=2,
                ffn_dim=128, num_heads=4, max_len=32, dropout=0.0,
                use_flash_attention=False)
    base.update(kw)
    return PianoBartConfig(**base)
