"""PianoBart task models.

TPU-native equivalents of the reference model zoo:

* :class:`PianoBart` — trunk: fused octuple embeddings + BART enc-dec
  (``PianoBart.py:19-80``), with the encoder-only path and the swappable
  label-embedding decoder.
* :class:`PianoBartLM` — trunk + fused LM head (``model.py:14-27``).
* :class:`SequenceClassification` — decoder fed the *same* ids as the
  encoder, attention pooling + MLP (``model.py:165-218``).
* :class:`TokenClassification` — per-position classifier; velocity variant
  consumes label ids through :class:`LabelEmbedding` (``model.py:236-272``).

All modules take/return plain arrays + explicit cache pytrees; the decode
loop lives in :mod:`pianobart_tpu.decode`.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import vocab as V
from .bart import Decoder, Encoder
from .config import PianoBartConfig
from .embedding import LabelEmbedding, OctupleEmbedding
from .heads import (OctupleLMHead, SequenceClassifierHead, TokenClassifierHead,
                    split_fields)


def attention_mask_from_bars(ids: jax.Array) -> jax.Array:
    """1.0 where the octuple is not padding (Bar field != Bar <PAD>).

    Mirrors the mask construction used everywhere in the reference
    (``pretrain.py:151-153``, ``finetune.py:184``).
    """
    return (ids[..., 0] != V.PAD[0]).astype(jnp.float32)


class PianoBart(nn.Module):
    """Encoder-decoder trunk over octuple ids."""

    cfg: PianoBartConfig

    def setup(self):
        cfg = self.cfg
        self.embed = OctupleEmbedding(cfg, name="embed")
        if cfg.decoder_label_vocab is not None:
            self.decoder_embed = LabelEmbedding(cfg, name="decoder_embed")
        self.encoder = Encoder(cfg, name="encoder")
        self.decoder = Decoder(cfg, name="decoder")

    def _decoder_inputs(self, decoder_ids: jax.Array) -> jax.Array:
        if self.cfg.decoder_label_vocab is not None:
            return self.decoder_embed(decoder_ids)
        return self.embed(decoder_ids)

    def __call__(
        self,
        encoder_ids: jax.Array,                  # (B, S, 8)
        decoder_ids: Optional[jax.Array] = None,  # (B, S, 8) or (B, S) labels
        encoder_mask: Optional[jax.Array] = None,  # (B, S) 1=attend
        decoder_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        enc_out = self.encode(encoder_ids, encoder_mask, deterministic)
        if decoder_ids is None:
            return enc_out  # encoder-only path (PianoBart.py:78)
        dec_out, _ = self.decoder(
            self._decoder_inputs(decoder_ids), enc_out,
            self_mask=decoder_mask, enc_mask=encoder_mask,
            deterministic=deterministic)
        return dec_out

    def encode(self, encoder_ids, encoder_mask=None, deterministic=True):
        return self.encoder(self.embed(encoder_ids), encoder_mask, deterministic)

    def decode_step(self, decoder_ids_step, enc_out, encoder_mask, cache,
                    cache_index, deterministic=True):
        """One incremental decode step: ids (B, 1, 8) + cache -> hidden, cache."""
        return self.decoder(
            self._decoder_inputs(decoder_ids_step), enc_out,
            self_mask=None, enc_mask=encoder_mask,
            cache=cache, cache_index=cache_index, deterministic=deterministic)

    def build_cache(self, enc_out, batch: int, length: int):
        """Initial cache pytree: zeroed self-attention K/V + empty cross slots
        (cross K/V are filled on the first decode step and reused)."""
        cfg = self.cfg
        shape = (batch, length, cfg.num_heads, cfg.head_dim)
        zeros = lambda: {"k": jnp.zeros(shape, cfg.dtype),
                         "v": jnp.zeros(shape, cfg.dtype)}
        return {f"layers_{i}": {"self": zeros(), "cross": {}}
                for i in range(cfg.decoder_layers)}


class PianoBartLM(nn.Module):
    """Trunk + fused octuple LM head (pretrain / generation model)."""

    cfg: PianoBartConfig

    def setup(self):
        self.pianobart = PianoBart(self.cfg, name="pianobart")
        self.lm_head = OctupleLMHead(self.cfg, name="lm_head")

    def __call__(self, encoder_ids, decoder_ids=None, encoder_mask=None,
                 decoder_mask=None, deterministic=True):
        hidden = self.pianobart(encoder_ids, decoder_ids, encoder_mask,
                                decoder_mask, deterministic)
        return self.lm_head(hidden)  # fused logits (B, S, 1280)

    def logits_per_field(self, fused_logits):
        return split_fields(fused_logits, self.cfg)

    # --- decode-loop entry points (used via nn.apply(method=...)) ---
    def encode(self, encoder_ids, encoder_mask=None):
        return self.pianobart.encode(encoder_ids, encoder_mask, True)

    def decode_step(self, decoder_ids_step, enc_out, encoder_mask, cache,
                    cache_index):
        hidden, new_cache = self.pianobart.decode_step(
            decoder_ids_step, enc_out, encoder_mask, cache, cache_index)
        return self.lm_head(hidden), new_cache

    def build_cache(self, enc_out, batch, length):
        return self.pianobart.build_cache(enc_out, batch, length)


class SequenceClassification(nn.Module):
    """Composer / emotion classifier (model.py:165-218).

    The reference feeds the decoder the same ids (and mask) as the encoder
    (model.py:204) and pools the decoder output.
    """

    cfg: PianoBartConfig
    class_num: int

    def setup(self):
        self.pianobart = PianoBart(self.cfg, name="pianobart")
        self.head = SequenceClassifierHead(self.cfg, self.class_num, name="head")

    def __call__(self, encoder_ids, encoder_mask=None, deterministic=True):
        hidden = self.pianobart(encoder_ids, encoder_ids, encoder_mask,
                                encoder_mask, deterministic)
        return self.head(hidden, deterministic)


class TokenClassification(nn.Module):
    """Melody / velocity per-token classifier (model.py:236-272).

    ``class_num`` includes the extra PAD class (finetune.py:98 passes
    ``class_num + 1``).  For the velocity task construct the config with
    ``decoder_label_vocab=<n_labels>`` so the decoder consumes label ids.
    """

    cfg: PianoBartConfig
    class_num: int

    def setup(self):
        self.pianobart = PianoBart(self.cfg, name="pianobart")
        self.head = TokenClassifierHead(self.cfg, self.class_num, name="head")

    def __call__(self, encoder_ids, decoder_ids, encoder_mask=None,
                 decoder_mask=None, deterministic=True):
        hidden = self.pianobart(encoder_ids, decoder_ids, encoder_mask,
                                decoder_mask, deterministic)
        return self.head(hidden, deterministic)
