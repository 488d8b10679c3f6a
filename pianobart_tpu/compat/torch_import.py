"""Import reference PyTorch checkpoints into pianobart_tpu parameter trees.

Supports the reference checkpoint flavors (SURVEY §5 checkpoint duality):

* trunk-only ``PianoBart.state_dict()`` (pretrain saves, ``pretrain.py:100``)
* full ``PianoBartLM`` / ``SequenceClassification`` / ``TokenClassification``
  state dicts (finetune saves, ``finetune.py:262``), optionally wrapped in
  ``{'state_dict': ...}`` and/or ``nn.DataParallel``'s ``module.`` prefix.

The importer is pure numpy: pass a ``{name: ndarray}`` mapping (use
:func:`load_torch_checkpoint` when torch is available).  Fusions performed:

* 8 per-field embedding tables -> one row-concatenated ``embed/table``
* 8 LM head linears -> one column-concatenated ``lm_head/proj``
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..models.config import PianoBartConfig

Array = np.ndarray
StateDict = Dict[str, Array]


def load_torch_checkpoint(path: str) -> StateDict:
    """Load a .ckpt/.pth file into numpy (torch CPU required)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def _strip_prefixes(sd: StateDict) -> StateDict:
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v
    return out


def _linear(sd: StateDict, name: str) -> Dict[str, Array]:
    p = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _layernorm(sd: StateDict, name: str) -> Dict[str, Array]:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _enc_layer(sd: StateDict, p: str) -> Dict:
    return {
        "self_attn": {
            "q_proj": _linear(sd, f"{p}.self_attn.q_proj"),
            "k_proj": _linear(sd, f"{p}.self_attn.k_proj"),
            "v_proj": _linear(sd, f"{p}.self_attn.v_proj"),
            "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
        },
        "self_attn_layer_norm": _layernorm(sd, f"{p}.self_attn_layer_norm"),
        "ffn": {"fc1": _linear(sd, f"{p}.fc1"), "fc2": _linear(sd, f"{p}.fc2")},
        "final_layer_norm": _layernorm(sd, f"{p}.final_layer_norm"),
    }


def _dec_layer(sd: StateDict, p: str) -> Dict:
    out = _enc_layer(sd, p)
    out["cross_attn"] = {
        "q_proj": _linear(sd, f"{p}.encoder_attn.q_proj"),
        "k_proj": _linear(sd, f"{p}.encoder_attn.k_proj"),
        "v_proj": _linear(sd, f"{p}.encoder_attn.v_proj"),
        "out_proj": _linear(sd, f"{p}.encoder_attn.out_proj"),
    }
    out["cross_attn_layer_norm"] = _layernorm(sd, f"{p}.encoder_attn_layer_norm")
    return out


def import_trunk(sd: StateDict, cfg: PianoBartConfig,
                 prefix: str = "") -> Dict:
    """Reference ``PianoBart`` state dict -> our ``pianobart`` subtree."""
    sd = {k[len(prefix):]: v for k, v in _strip_prefixes(sd).items()
          if k.startswith(prefix)}

    table = np.concatenate(
        [sd[f"word_emb.{i}.lut.weight"] for i in range(cfg.n_fields)], axis=0)
    assert table.shape == (cfg.total_vocab, cfg.emb_size), table.shape

    tree: Dict = {
        "embed": {"table": table, "fusion": _linear(sd, "encoder_linear")},
        "encoder": {
            "embed_positions": {"embedding": sd["bart.encoder.embed_positions.weight"]},
            "layernorm_embedding": _layernorm(sd, "bart.encoder.layernorm_embedding"),
        },
        "decoder": {
            "embed_positions": {"embedding": sd["bart.decoder.embed_positions.weight"]},
            "layernorm_embedding": _layernorm(sd, "bart.decoder.layernorm_embedding"),
        },
    }
    for i in range(cfg.encoder_layers):
        tree["encoder"][f"layers_{i}"] = _enc_layer(sd, f"bart.encoder.layers.{i}")
    for i in range(cfg.decoder_layers):
        tree["decoder"][f"layers_{i}"] = _dec_layer(sd, f"bart.decoder.layers.{i}")

    if cfg.decoder_label_vocab is not None and "decoder_emb.lut.weight" in sd:
        # Velocity finetune: swapped decoder embedding + its projection
        # (change_decoder_embedding, PianoBart.py:88-91).
        tree["decoder_embed"] = {
            "table": sd["decoder_emb.lut.weight"],
            "proj": _linear(sd, "decoder_linear"),
        }
    return tree


def import_lm(sd: StateDict, cfg: PianoBartConfig) -> Dict:
    """Reference ``PianoBartLM`` state dict -> our params tree."""
    sd = _strip_prefixes(sd)
    kernel = np.concatenate(
        [np.ascontiguousarray(sd[f"mask_lm.proj.{i}.weight"].T)
         for i in range(cfg.n_fields)], axis=1)
    bias = np.concatenate(
        [sd[f"mask_lm.proj.{i}.bias"] for i in range(cfg.n_fields)])
    return {
        "pianobart": import_trunk(sd, cfg, prefix="pianobart."),
        "lm_head": {"proj": {"kernel": kernel, "bias": bias}},
    }


def import_sequence_classifier(sd: StateDict, cfg: PianoBartConfig) -> Dict:
    sd = _strip_prefixes(sd)
    return {
        "pianobart": import_trunk(sd, cfg, prefix="pianobart."),
        "head": {
            "attention": {
                "ws1": {"kernel": np.ascontiguousarray(sd["attention.ws1.weight"].T)},
                "ws2": {"kernel": np.ascontiguousarray(sd["attention.ws2.weight"].T)},
            },
            "dense1": _linear(sd, "classifier.1"),
            "dense2": _linear(sd, "classifier.3"),
        },
    }


def import_token_classifier(sd: StateDict, cfg: PianoBartConfig) -> Dict:
    sd = _strip_prefixes(sd)
    return {
        "pianobart": import_trunk(sd, cfg, prefix="pianobart."),
        "head": {
            "dense1": _linear(sd, "classifier.1"),
            "dense2": _linear(sd, "classifier.3"),
        },
    }


def import_checkpoint(path_or_sd, cfg: PianoBartConfig,
                      kind: Optional[str] = None) -> Dict:
    """Auto-detecting import: returns a flax ``params`` tree (no 'params' key).

    ``kind`` in {None, 'trunk', 'lm', 'seq', 'token'}; None auto-detects from
    key names.
    """
    sd = (load_torch_checkpoint(path_or_sd) if isinstance(path_or_sd, str)
          else dict(path_or_sd))
    sd = _strip_prefixes(sd)
    if kind is None:
        if any(k.startswith("mask_lm.") for k in sd):
            kind = "lm"
        elif any(k.startswith("attention.ws1") for k in sd):
            kind = "seq"
        elif any(k.startswith("classifier.") for k in sd):
            kind = "token"
        else:
            kind = "trunk"
    if kind == "trunk":
        return {"pianobart": import_trunk(sd, cfg)}
    if kind == "lm":
        return import_lm(sd, cfg)
    if kind == "seq":
        return import_sequence_classifier(sd, cfg)
    if kind == "token":
        return import_token_classifier(sd, cfg)
    raise ValueError(f"unknown checkpoint kind: {kind}")
