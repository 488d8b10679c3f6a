"""Export pianobart_tpu parameters to reference PyTorch checkpoint format.

Inverse of :mod:`pianobart_tpu.compat.torch_import`: produces the exact
``state_dict`` key layout the reference models load (``PianoBart`` trunk /
``PianoBartLM``), so models pretrained on TPU can be evaluated or finetuned
with the original repo (and round-trip through the import shim losslessly).

The fused tensors are split back: the (1280, 256) embedding table into 8
per-field ``word_emb.{i}.lut.weight`` rows, the (1024, 1280) LM head into 8
``mask_lm.proj.{i}`` linears.  Bart-internal weights the reference carries
but never uses with octuple inputs (``bart.shared``, ``embed_tokens``) are
not emitted; the reference loads trunks with the published checkpoints'
strict=False path (demo.py:129) or accepts them via ``strict=False``.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..models.config import PianoBartConfig

Array = np.ndarray
StateDict = Dict[str, Array]


def _linear(sd: StateDict, name: str, tree: Dict) -> None:
    sd[f"{name}.weight"] = np.ascontiguousarray(np.asarray(tree["kernel"]).T)
    if "bias" in tree:
        sd[f"{name}.bias"] = np.asarray(tree["bias"])


def _layernorm(sd: StateDict, name: str, tree: Dict) -> None:
    sd[f"{name}.weight"] = np.asarray(tree["scale"])
    sd[f"{name}.bias"] = np.asarray(tree["bias"])


def _enc_layer(sd: StateDict, p: str, tree: Dict) -> None:
    for ours, theirs in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                         ("v_proj", "v_proj"), ("out_proj", "out_proj")):
        _linear(sd, f"{p}.self_attn.{theirs}", tree["self_attn"][ours])
    _layernorm(sd, f"{p}.self_attn_layer_norm", tree["self_attn_layer_norm"])
    _linear(sd, f"{p}.fc1", tree["ffn"]["fc1"])
    _linear(sd, f"{p}.fc2", tree["ffn"]["fc2"])
    _layernorm(sd, f"{p}.final_layer_norm", tree["final_layer_norm"])


def _dec_layer(sd: StateDict, p: str, tree: Dict) -> None:
    _enc_layer(sd, p, tree)
    for ours in ("q_proj", "k_proj", "v_proj", "out_proj"):
        _linear(sd, f"{p}.encoder_attn.{ours}", tree["cross_attn"][ours])
    _layernorm(sd, f"{p}.encoder_attn_layer_norm",
               tree["cross_attn_layer_norm"])


HF_BART_DEFAULT_VOCAB = 50265  # transformers BartConfig default


def _ref_unused_embeddings(cfg: PianoBartConfig) -> StateDict:
    """The reference's ``BartModel`` carries token-embedding tables it never
    uses with octuple ``inputs_embeds`` (``bart.shared`` + tied
    ``embed_tokens``).  ``main.py:168`` loads trunks with STRICT
    ``load_state_dict``, so a checkpoint meant for the unmodified reference
    trainer must include them; zeros are behaviorally identical."""
    z = np.zeros((HF_BART_DEFAULT_VOCAB, cfg.d_model), np.float32)
    return {"bart.shared.weight": z,
            "bart.encoder.embed_tokens.weight": z,
            "bart.decoder.embed_tokens.weight": z}


def export_trunk(trunk: Dict, cfg: PianoBartConfig,
                 prefix: str = "", strict_ref: bool = False) -> StateDict:
    """Our ``pianobart`` subtree -> reference ``PianoBart`` state dict.

    ``strict_ref``: also emit the unused HF token-embedding tables so the
    reference's strict ``load_state_dict`` path (``main.py:161-168``)
    accepts the checkpoint without ``strict=False``.
    """
    sd: StateDict = {}
    if strict_ref:
        sd.update(_ref_unused_embeddings(cfg))
    table = np.asarray(trunk["embed"]["table"])
    off = 0
    for i, size in enumerate(cfg.field_sizes):
        sd[f"word_emb.{i}.lut.weight"] = table[off:off + size]
        off += size
    _linear(sd, "encoder_linear", trunk["embed"]["fusion"])
    if cfg.decoder_label_vocab is None:
        # decoder_linear aliases encoder_linear (PianoBart.py:52)
        _linear(sd, "decoder_linear", trunk["embed"]["fusion"])
    elif "decoder_embed" in trunk:
        sd["decoder_emb.lut.weight"] = np.asarray(
            trunk["decoder_embed"]["table"])
        _linear(sd, "decoder_linear", trunk["decoder_embed"]["proj"])

    for side, layers in (("encoder", cfg.encoder_layers),
                         ("decoder", cfg.decoder_layers)):
        sub = trunk[side]
        sd[f"bart.{side}.embed_positions.weight"] = np.asarray(
            sub["embed_positions"]["embedding"])
        _layernorm(sd, f"bart.{side}.layernorm_embedding",
                   sub["layernorm_embedding"])
        for i in range(layers):
            layer = sub[f"layers_{i}"]
            if side == "encoder":
                _enc_layer(sd, f"bart.{side}.layers.{i}", layer)
            else:
                _dec_layer(sd, f"bart.{side}.layers.{i}", layer)
    if prefix:
        sd = {prefix + k: v for k, v in sd.items()}
    return sd


def export_lm(params: Dict, cfg: PianoBartConfig,
              strict_ref: bool = False) -> StateDict:
    """Our PianoBartLM params tree -> reference ``PianoBartLM`` state dict."""
    sd = export_trunk(params["pianobart"], cfg, prefix="pianobart.",
                      strict_ref=strict_ref)
    kernel = np.asarray(params["lm_head"]["proj"]["kernel"])  # (d, 1280)
    bias = np.asarray(params["lm_head"]["proj"]["bias"])
    off = 0
    for i, size in enumerate(cfg.field_sizes):
        sd[f"mask_lm.proj.{i}.weight"] = np.ascontiguousarray(
            kernel[:, off:off + size].T)
        sd[f"mask_lm.proj.{i}.bias"] = bias[off:off + size]
        off += size
    return sd


def export_sequence_classifier(params: Dict, cfg: PianoBartConfig,
                               strict_ref: bool = False) -> StateDict:
    """Our ``SequenceClassification`` params -> reference
    ``model.SequenceClassification`` state dict (attention pooling +
    2-layer classifier, model.py:165-218)."""
    sd = export_trunk(params["pianobart"], cfg, prefix="pianobart.",
                      strict_ref=strict_ref)
    head = params["head"]
    sd["attention.ws1.weight"] = np.ascontiguousarray(
        np.asarray(head["attention"]["ws1"]["kernel"]).T)
    sd["attention.ws2.weight"] = np.ascontiguousarray(
        np.asarray(head["attention"]["ws2"]["kernel"]).T)
    _linear(sd, "classifier.1", head["dense1"])
    _linear(sd, "classifier.3", head["dense2"])
    return sd


def export_token_classifier(params: Dict, cfg: PianoBartConfig,
                            strict_ref: bool = False) -> StateDict:
    """Our ``TokenClassification`` params -> reference state dict
    (model.py:236-272)."""
    sd = export_trunk(params["pianobart"], cfg, prefix="pianobart.",
                      strict_ref=strict_ref)
    head = params["head"]
    _linear(sd, "classifier.1", head["dense1"])
    _linear(sd, "classifier.3", head["dense2"])
    return sd


def save_torch_checkpoint(sd: StateDict, path: str, epoch: int = 0) -> None:
    """Write a reference-format ``{'state_dict': ...}`` torch checkpoint."""
    import torch
    tensors = {k: torch.from_numpy(np.ascontiguousarray(
        np.asarray(v, dtype=np.float32))) for k, v in sd.items()}
    torch.save({"epoch": epoch, "state_dict": tensors}, path)
