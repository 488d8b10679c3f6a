"""Dataset loading.

`.npy`-compatible with the reference layout (``pretrain.py:548-579``,
``finetune.py:277-338``): pretrain shards live at
``<root>/<dataset>/<dataset>_{train,test,valid}_split.npy`` and finetune
data at ``<root>/<dataset>_{split}.npy`` + ``..._ans.npy`` (generation:
``..._genans.npy``).  Arrays are memory-mapped; batches are materialized on
demand by the trainers (host RAM stays bounded for the large pretrain
concatenation).
"""
from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np

DEFAULT_PRETRAIN_DATASETS = ("asap", "EMOPIA", "Pianist8", "POP1K7", "POP909")


def load_pretrain(root: str,
                  datasets: Sequence[str] = DEFAULT_PRETRAIN_DATASETS,
                  valid_fraction: float = 0.15,
                  seed: int = 2023) -> Tuple[np.ndarray, np.ndarray]:
    """Concatenate pretrain shards, shuffle, 85/15 split (pretrain.py:548-576)."""
    parts: List[np.ndarray] = []
    for ds in datasets:
        for split in ("train", "test", "valid"):
            path = os.path.join(root, ds, f"{ds}_{split}_split.npy")
            if not os.path.exists(path):
                # also accept unsplit single-file layout
                alt = os.path.join(root, f"{ds}.npy")
                if split == "train" and os.path.exists(alt):
                    parts.append(np.load(alt, mmap_mode="r"))
                continue
            parts.append(np.load(path, mmap_mode="r"))
    if not parts:
        raise FileNotFoundError(f"no pretrain shards under {root}")
    data = np.concatenate([np.asarray(p) for p in parts], axis=0)
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(data))
    data = data[idx]
    split = int(len(data) * (1.0 - valid_fraction))
    return data[:split], data[split:]


def load_finetune(root: str, dataset: str, task: str):
    """Returns (X_train, X_val, X_test, y_train, y_val, y_test)."""
    if dataset == "emotion":
        dataset = "emopia"
    suffix = "genans" if task == "gen" else "ans"
    out = []
    for split in ("train", "valid", "test"):
        out.append(np.load(os.path.join(root, f"{dataset}_{split}.npy"),
                           allow_pickle=True))
    for split in ("train", "valid", "test"):
        out.append(np.load(os.path.join(root, f"{dataset}_{split}_{suffix}.npy"),
                           allow_pickle=True))
    X_train, X_val, X_test, y_train, y_val, y_test = out
    return X_train, X_val, X_test, y_train, y_val, y_test


def concatenate_pretrain(root: str, datasets: Sequence[str],
                         out_path: str) -> np.ndarray:
    """Merge per-dataset shards into one array (concatenate.py:16-38)."""
    parts = []
    for ds in datasets:
        for split in ("train", "test", "valid"):
            p = os.path.join(root, ds, f"{ds}_{split}_split.npy")
            if os.path.exists(p):
                parts.append(np.load(p))
    merged = np.vstack(parts)
    np.save(out_path, merged)
    return merged
