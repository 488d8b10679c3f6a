"""Model merging toolkit on parameter pytrees.

Functional reimplementation of the reference merging suite
(``clear code/model_merging_methods/``): task-vector arithmetic
(task_vector.py:7-64), DARE-style weight-drop masks with 1/(1-p) rescale
(mask_weights_utils.py:9-73), average / task-arithmetic / TIES
(merging_methods.py:33-527) and Fisher / RegMean data-aware merging
(merging_methods.py:82-416), operating on flax param pytrees instead of
``nn.Module`` state dicts.  Everything is numpy/jnp and works on any pytree
of arrays; ``exclude_regex`` filters leaves by their ``/``-joined path.
"""
from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Sequence

import jax
import numpy as np

Tree = dict


def _paths(tree) -> List[str]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return ["/".join(str(getattr(k, "key", k)) for k in path)
            for path, _ in flat]


def _map_with_path(fn, tree):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: fn(
            "/".join(str(getattr(k, "key", k)) for k in path), leaf), tree)


def _excluded(path: str, exclude_regex: Optional[Sequence[str]]) -> bool:
    return bool(exclude_regex) and any(re.search(r, path) for r in exclude_regex)


def task_vector(pretrained: Tree, finetuned: Tree,
                exclude_regex: Optional[Sequence[str]] = None) -> Tree:
    """delta = finetuned - pretrained (excluded leaves -> zeros)."""
    def sub(path, a):
        b = _get_by_path(finetuned, path)
        if _excluded(path, exclude_regex):
            return np.zeros_like(np.asarray(a))
        return np.asarray(b) - np.asarray(a)
    return _map_with_path(sub, pretrained)


def _get_by_path(tree, path: str):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


def combine(pretrained: Tree, delta: Tree, scaling: float = 1.0) -> Tree:
    return jax.tree.map(lambda p, d: np.asarray(p) + scaling * np.asarray(d),
                        pretrained, delta)


def average_merging(models: Sequence[Tree],
                    exclude_regex: Optional[Sequence[str]] = None) -> Tree:
    def avg(path, *leaves):
        if _excluded(path, exclude_regex):
            return np.asarray(leaves[0])
        return np.mean(np.stack([np.asarray(l) for l in leaves]), axis=0)
    return jax.tree_util.tree_map_with_path(
        lambda path, *ls: avg("/".join(str(getattr(k, "key", k))
                                       for k in path), *ls),
        models[0], *models[1:])


def task_arithmetic(pretrained: Tree, models: Sequence[Tree],
                    scaling: float = 1.0,
                    exclude_regex: Optional[Sequence[str]] = None) -> Tree:
    deltas = [task_vector(pretrained, m, exclude_regex) for m in models]
    total = jax.tree.map(lambda *ds: sum(np.asarray(d) for d in ds), *deltas)
    return combine(pretrained, total, scaling)


# ---------------------------------------------------------------------------
# DARE weight-drop masks (mask_weights_utils.py)
# ---------------------------------------------------------------------------

def mask_tensor(x: np.ndarray, mask_rate: float, use_rescale: bool,
                strategy: str, rng: np.random.Generator) -> np.ndarray:
    """Drop ``mask_rate`` of entries (random Bernoulli or smallest-|x|),
    optionally rescale survivors by 1/(1-p)."""
    x = np.asarray(x)
    if strategy == "random":
        drop = rng.random(x.shape) < mask_rate
        out = np.where(drop, 0.0, x)
    elif strategy == "magnitude":
        flat = np.abs(x).ravel()
        k = int(flat.size * mask_rate)
        if k > 0:
            kth = np.partition(flat, k - 1)[k - 1]
            out = np.where(np.abs(x) <= kth, 0.0, x)
        else:
            out = x.copy()
    else:
        raise ValueError(f"unknown mask strategy {strategy}")
    if use_rescale and mask_rate != 1.0:
        out = out / (1.0 - mask_rate)
    return out.astype(np.asarray(x).dtype)


def mask_model_weights(finetuned: Tree, pretrained: Optional[Tree],
                       weight_format: str = "delta_weight",
                       weight_mask_rate: float = 0.8,
                       use_weight_rescale: bool = True,
                       mask_strategy: str = "random",
                       exclude_regex: Optional[Sequence[str]] = None,
                       seed: int = 0) -> Tree:
    rng = np.random.default_rng(seed)
    if weight_format == "finetuned_weight":
        def m(path, leaf):
            if _excluded(path, exclude_regex):
                return np.asarray(leaf)
            return mask_tensor(leaf, weight_mask_rate, use_weight_rescale,
                               mask_strategy, rng)
        return _map_with_path(m, finetuned)
    assert weight_format == "delta_weight", weight_format
    assert pretrained is not None
    delta = task_vector(pretrained, finetuned, exclude_regex)
    masked = _map_with_path(
        lambda path, leaf: leaf if _excluded(path, exclude_regex) else
        mask_tensor(leaf, weight_mask_rate, use_weight_rescale,
                    mask_strategy, rng),
        delta)
    return combine(pretrained, masked, 1.0)


# ---------------------------------------------------------------------------
# TIES (merging_methods.py:418-527)
# ---------------------------------------------------------------------------

def ties_merging(pretrained: Tree, models: Sequence[Tree],
                 param_value_mask_rate: float = 0.8,
                 scaling: float = 1.0,
                 exclude_regex: Optional[Sequence[str]] = None) -> Tree:
    deltas = [task_vector(pretrained, m, exclude_regex) for m in models]
    leaves0, treedef = jax.tree_util.tree_flatten(deltas[0])
    shapes = [np.asarray(l).shape for l in leaves0]
    sizes = [int(np.prod(s)) for s in shapes]
    flat = np.stack([
        np.concatenate([np.asarray(l).ravel()
                        for l in jax.tree_util.tree_leaves(d)])
        for d in deltas])                       # (M, total)

    # trim: keep the largest-magnitude (1 - rate) per model
    k = int(flat.shape[1] * param_value_mask_rate)
    if k > 0:
        kth = np.partition(np.abs(flat), k - 1, axis=1)[:, k - 1:k]
        flat = np.where(np.abs(flat) >= kth, flat, 0.0)

    # elect signs
    signs = np.sign(flat.sum(axis=0))
    majority = np.sign(signs.sum())
    signs = np.where(signs == 0, majority, signs)

    # disjoint merge
    keep = ((signs[None, :] > 0) & (flat > 0)) | ((signs[None, :] < 0) & (flat < 0))
    kept = flat * keep
    count = np.maximum((kept != 0).sum(axis=0), 1.0)
    merged_flat = kept.sum(axis=0) / count

    # unflatten
    out_leaves = []
    off = 0
    for shape, size in zip(shapes, sizes):
        out_leaves.append(merged_flat[off:off + size].reshape(shape))
        off += size
    merged_delta = jax.tree_util.tree_unflatten(treedef, out_leaves)
    return combine(pretrained, merged_delta, scaling)


# ---------------------------------------------------------------------------
# Fisher merging (merging_methods.py:82-264)
# ---------------------------------------------------------------------------

def compute_fisher_weights(grad_fn: Callable[[Tree, object], Tree],
                           params: Tree, batches: Sequence,
                           min_weight: float = 1e-6) -> Tree:
    """Empirical diagonal Fisher: mean of squared gradients over batches."""
    acc = jax.tree.map(lambda p: np.zeros_like(np.asarray(p), np.float64),
                       params)
    for b in batches:
        g = grad_fn(params, b)
        acc = jax.tree.map(lambda a, gi: a + np.asarray(gi, np.float64) ** 2,
                           acc, g)
    n = max(len(batches), 1)
    return jax.tree.map(lambda a: np.maximum(a / n, min_weight), acc)


def fisher_merging(models: Sequence[Tree], fishers: Sequence[Tree],
                   coefficients: Optional[Sequence[float]] = None,
                   normalize: bool = True,
                   min_weight: float = 1e-6) -> Tree:
    """theta* = Σ c_i F_i θ_i / Σ c_i F_i (per parameter)."""
    M = len(models)
    if coefficients is None:
        coefficients = [1.0 / M] * M
    if normalize:
        norms = [np.sqrt(sum(float((np.asarray(l) ** 2).sum())
                             for l in jax.tree_util.tree_leaves(f)))
                 for f in fishers]
        fishers = [jax.tree.map(lambda l, n=n: np.asarray(l) / max(n, 1e-12), f)
                   for f, n in zip(fishers, norms)]

    def merge_leaf(*leaves):
        thetas = leaves[:M]
        fs = leaves[M:]
        num = sum(c * np.asarray(f) * np.asarray(t)
                  for c, f, t in zip(coefficients, fs, thetas))
        den = sum(c * np.asarray(f) for c, f in zip(coefficients, fs))
        return num / np.maximum(den, min_weight)

    return jax.tree.map(merge_leaf, *models, *fishers)


# ---------------------------------------------------------------------------
# RegMean merging (merging_methods.py:266-416)
# ---------------------------------------------------------------------------

def regmean_merging(models: Sequence[Tree], grams: Sequence[Dict[str, np.ndarray]],
                    reduce_non_diagonal: float = 1.0) -> Tree:
    """W* = (Σ G_i)^-1 Σ G_i W_i for kernels with recorded input Gram
    matrices; all other leaves are averaged.

    ``grams[i]`` maps a leaf path (``.../kernel``) to the (in, in) Gram of
    that Dense layer's inputs under model i's data.
    """
    def merge(path, *leaves):
        gs = [g.get(path) for g in grams]
        if all(g is not None for g in gs) and np.asarray(leaves[0]).ndim == 2:
            def reduce_g(g):
                g = np.asarray(g, np.float64)
                if reduce_non_diagonal != 1.0:
                    diag = np.diag(np.diag(g))
                    g = reduce_non_diagonal * g + (1 - reduce_non_diagonal) * diag
                return g
            gsum = sum(reduce_g(g) for g in gs)
            gw = sum(reduce_g(g) @ np.asarray(w, np.float64)
                     for g, w in zip(gs, leaves))
            try:
                return np.linalg.solve(gsum, gw).astype(np.asarray(leaves[0]).dtype)
            except np.linalg.LinAlgError:
                pass
        return np.mean(np.stack([np.asarray(l) for l in leaves]), axis=0)

    return jax.tree_util.tree_map_with_path(
        lambda path, *ls: merge("/".join(str(getattr(k, "key", k))
                                         for k in path), *ls),
        models[0], *models[1:])


def collect_dense_grams(model, variables, batches,
                        apply_kwargs: Optional[dict] = None) -> Dict[str, np.ndarray]:
    """Record input Gram matrices for every Dense layer over ``batches``.

    Uses a flax method interceptor to tap each ``nn.Dense.__call__`` input;
    returns {param_path -> (in, in) gram} keyed like the params tree
    (``<module path>/kernel``), ready for :func:`regmean_merging`.
    """
    import flax.linen as nn

    grams: Dict[str, np.ndarray] = {}
    apply_kwargs = apply_kwargs or {}

    def interceptor(next_fun, args, kwargs, context):
        module = context.module
        if isinstance(module, nn.Dense) and context.method_name == "__call__":
            x = np.asarray(args[0], np.float64)
            x2d = x.reshape(-1, x.shape[-1])
            key = "/".join(p for p in module.path) + "/kernel"
            g = x2d.T @ x2d / x2d.shape[0]
            grams[key] = grams.get(key, 0.0) + g
        return next_fun(*args, **kwargs)

    for batch in batches:
        with nn.intercept_methods(interceptor):
            model.apply(variables, *batch, **apply_kwargs)
    n = max(len(batches), 1)
    return {k: np.asarray(v) / n for k, v in grams.items()}
