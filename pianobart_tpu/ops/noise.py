"""On-device BART denoising corruptions.

The pretraining objective: each sample receives one of five corruptions
chosen uniformly (reference ``Pretrainer.gen_mask``, ``pretrain.py:211-546``).
The reference implements these as per-sample Python/numpy list surgery on the
host — the CPU hot spot flagged in SURVEY §3.1.  Here every corruption is a
fixed-shape jnp index program: `vmap`-able over the batch, fused into the
jitted train step, zero host work.

Distribution equivalence with the reference (bit-equality is impossible —
different RNGs) is established by statistical tests in
``tests/test_noise.py``.  All functions take/return ``(S, 8)`` int32 grids
and a per-row loss mask.

Shipped pretrain configuration (pretrain.py:519-546):
  choice ~ U{deletion, mask(octuple), permutation, infilling(octuple), rotation}
  with TokenMask pinned to n=0/element_level=False and TokenInfilling to n=0.
The bar-level and element-level variants are provided as well (the reference
defines them behind flags; its bar-level deletion loss mask is shaped
incorrectly and is sanitized here — see ``bar_deletion``).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .. import vocab as V

MASK_ROW = jnp.asarray(V.MASK, dtype=jnp.int32)
PAD_ROW = jnp.asarray(V.PAD, dtype=jnp.int32)
FIELD_SIZES = jnp.asarray(V.FIELD_SIZES, dtype=jnp.int32)

Corruption = Tuple[jax.Array, jax.Array]  # (corrupted (S,8), loss_mask (S,))


def _rand_rows(key: jax.Array, n: int) -> jax.Array:
    """n independent random octuples, each field uniform over its vocab
    (PianoBart.get_rand_tok, PianoBart.py:82-86)."""
    u = jax.random.uniform(key, (n, 8))
    return (u * FIELD_SIZES[None, :]).astype(jnp.int32)


# ---------------------------------------------------------------------- 1
def token_deletion(key: jax.Array, x: jax.Array, p: float) -> Corruption:
    """Delete ``int(S*p)`` random octuples, compact, re-pad (pretrain.py:218-236).

    Loss covers every position from the first deletion onward.
    """
    S = x.shape[0]
    length = int(S * p)
    perm = jax.random.permutation(key, S)
    delete = perm < length                         # uniform subset of size `length`
    order = jnp.argsort(delete, stable=True)       # survivors first, order kept
    out = x[order]
    rows = jnp.arange(S)
    out = jnp.where((rows >= S - length)[:, None], PAD_ROW[None, :], out)
    first_del = jnp.min(jnp.where(delete, rows, S))
    loss = (rows >= first_del) & (first_del < S)
    return out, loss


def bar_deletion(key: jax.Array, x: jax.Array, p: float) -> Corruption:
    """Bar-level deletion (pretrain.py:241-258 with n != -1).

    The reference variant is dead code with a loss mask over *bars* that
    cannot broadcast to positions; we keep its deletion semantics (drop all
    octuples of ``int(bar_max*p)`` random bars, re-pad) and define the loss
    over the affected positions onward, consistent with octuple deletion.
    """
    S = x.shape[0]
    bars = x[:, 0]
    # last row's bar id == the reference's `barMax = masked[-1, 0]`
    # (pretrain.py:246) — valid because pretrain windows are PACKED (no
    # pad tail); corruption only ever runs on the packed pretrain layout
    bar_max = bars[-1]
    u = jax.random.uniform(key, (V.FIELD_SIZES[0],))
    # select int(bar_max * p) bars uniformly among 0..bar_max-1
    in_range = jnp.arange(V.FIELD_SIZES[0]) < bar_max
    k = (bar_max.astype(jnp.float32) * p).astype(jnp.int32)
    ranks = jnp.argsort(jnp.argsort(jnp.where(in_range, u, 2.0)))
    bar_masked = (ranks < k) & in_range
    delete = bar_masked[bars]
    order = jnp.argsort(delete, stable=True)
    out = x[order]
    rows = jnp.arange(S)
    n_del = delete.sum()
    out = jnp.where((rows >= S - n_del)[:, None], PAD_ROW[None, :], out)
    first_del = jnp.min(jnp.where(delete, rows, S))
    loss = (rows >= first_del) & (first_del < S)
    return out, loss


# ---------------------------------------------------------------------- 2
def token_mask(key: jax.Array, x: jax.Array, p: float) -> Corruption:
    """BERT-style 80/10/10 masking at octuple level (pretrain.py:276-295)."""
    S = x.shape[0]
    k = round(S * p)
    n80 = round(k * 0.8)
    n10 = round(k * 0.1)
    k_mask, k_rand = jax.random.split(key)
    perm = jax.random.permutation(k_mask, S)
    rank = jnp.argsort(perm)                       # rank[i]: position of i in perm
    role = jnp.where(rank < n80, 1, jnp.where(rank < n80 + n10, 2,
                                              jnp.where(rank < k, 3, 0)))
    rand_rows = _rand_rows(k_rand, S)
    out = jnp.where((role == 1)[:, None], MASK_ROW[None, :], x)
    out = jnp.where((role == 2)[:, None], rand_rows, out)
    return out, role > 0


def token_mask_element(key: jax.Array, x: jax.Array, p: float) -> Tuple[jax.Array, jax.Array]:
    """Element-level 80/10/10 masking (pretrain.py:296-317).

    Returns an (S, 8) loss mask (per element) instead of per row.
    """
    S = x.shape[0]
    n = S * 8
    k = round(S * p * 8)
    n80 = round(k * 0.8)
    n10 = round(k * 0.1)
    k_mask, k_rand = jax.random.split(key)
    flat = x.reshape(-1)
    perm = jax.random.permutation(k_mask, n)
    rank = jnp.argsort(perm)
    role = jnp.where(rank < n80, 1, jnp.where(rank < n80 + n10, 2,
                                              jnp.where(rank < k, 3, 0)))
    field = jnp.arange(n) % 8
    mask_vals = MASK_ROW[field]
    rand_vals = _rand_rows(k_rand, S).reshape(-1)
    out = jnp.where(role == 1, mask_vals, flat)
    out = jnp.where(role == 2, rand_vals, out)
    return out.reshape(S, 8), (role > 0).reshape(S, 8)


def _bar_class_mask(key: jax.Array, n: int, p: float) -> jax.Array:
    """Reference ``generate_mask`` (pretrain.py:268-274): class 3 w.p. 0.1*p
    ("random"), class 1 w.p. 0.9*p ("[mask]"), else 0.  (The reference's
    "original" class 2 is unreachable — duplicated condition — and is
    reproduced as such.)"""
    u = jax.random.uniform(key, (n,))
    return jnp.where(u < p * 0.1, 3, jnp.where(u < p, 1, 0))


def bar_mask(key: jax.Array, x: jax.Array, p: float) -> Corruption:
    """Bar-level masking (pretrain.py:349-366): all octuples of a masked bar
    get the mask/random treatment; rows 0 and S-1 are exempt."""
    S = x.shape[0]
    k_cls, k_rand = jax.random.split(key)
    classes = _bar_class_mask(k_cls, V.FIELD_SIZES[0], p)
    role = classes[x[:, 0]]
    rows = jnp.arange(S)
    role = jnp.where((rows == 0) | (rows == S - 1), 0, role)
    rand_rows = _rand_rows(k_rand, S)
    out = jnp.where((role == 1)[:, None], MASK_ROW[None, :], x)
    out = jnp.where((role == 3)[:, None], rand_rows, out)
    return out, role > 0


def bar_mask_element(key: jax.Array, x: jax.Array, p: float) -> Tuple[jax.Array, jax.Array]:
    """Bar×instrument element-level masking (pretrain.py:327-348); loss mask
    is per element; first and last octuples exempt."""
    S = x.shape[0]
    k_cls, k_rand = jax.random.split(key)
    n_groups = V.FIELD_SIZES[0] * V.FIELD_SIZES[2]
    classes = _bar_class_mask(k_cls, n_groups * 8, p).reshape(n_groups, 8)
    group = x[:, 0] * V.FIELD_SIZES[2] + x[:, 2]
    role = classes[group]                          # (S, 8)
    rows = jnp.arange(S)
    role = jnp.where(((rows == 0) | (rows == S - 1))[:, None], 0, role)
    rand_rows = _rand_rows(k_rand, S)
    out = jnp.where(role == 1, MASK_ROW[None, :], x)
    out = jnp.where(role == 3, rand_rows, out)
    return out, role > 0


# ---------------------------------------------------------------------- 3
def sentence_permutation(key: jax.Array, x: jax.Array) -> Corruption:
    """Shuffle bars (groups of rows sharing a Bar id), keep intra-bar order
    (pretrain.py:368-397).  iid uniform priorities per bar id == uniform
    random order of the present bars."""
    priorities = jax.random.uniform(key, (V.FIELD_SIZES[0],))
    order = jnp.argsort(priorities[x[:, 0]], stable=True)
    out = x[order]
    return out, (out != x).any(axis=-1)


# ---------------------------------------------------------------------- 4
def token_infilling(key: jax.Array, x: jax.Array, p: float,
                    lam: float = 3.0, max_attempts: int = 10) -> Corruption:
    """Poisson span infilling at octuple level (pretrain.py:402-436).

    Walk the sequence; with prob ``p/lam`` draw span ~ Poisson(lam): span=0
    inserts a ``<MASK>`` after the current octuple, span>0 replaces the next
    ``span`` octuples with a single ``<MASK>``.  Retry up to 10 times if the
    result got longer than the input; give up -> uncorrupted (loss 0).
    """
    S = x.shape[0]

    def attempt(k):
        kd, kp = jax.random.split(k)
        fire = jax.random.uniform(kd, (S,)) < (p / max(1.0, lam))
        spans = jax.random.poisson(kp, lam, (S,)).astype(jnp.int32)

        buf0 = jnp.zeros((2 * S + 2, 8), dtype=x.dtype)

        def step(carry, i):
            write, skip = carry
            skipping = skip > 0
            ins_after = fire[i] & (spans[i] == 0)      # token + MASK
            span_del = fire[i] & (spans[i] > 0)        # MASK, skip span tokens
            row1 = jnp.where(span_del, MASK_ROW, x[i])
            row2 = MASK_ROW
            w = jnp.where(skipping, 0, jnp.where(ins_after, 2, 1))
            new_skip = jnp.where(skipping, skip - 1,
                                 jnp.where(span_del, spans[i] - 1, 0))
            return (write + w, new_skip), (row1, row2, write, w)

        (total, _), (r1, r2, offs, ws) = jax.lax.scan(
            step, (jnp.int32(0), jnp.int32(0)), jnp.arange(S))

        # Scatter the emitted rows (junk rows are overwritten or trimmed).
        buf = buf0
        idx1 = jnp.where(ws >= 1, offs, 2 * S)
        idx2 = jnp.where(ws == 2, offs + 1, 2 * S + 1)
        buf = buf.at[idx1].set(r1, mode="drop")
        buf = buf.at[idx2].set(r2, mode="drop")
        ok = total <= S
        rows = jnp.arange(S)
        out = jnp.where((rows < total)[:, None], buf[:S], PAD_ROW[None, :])
        return ok, out

    def cond(c):
        n, ok, _, _ = c
        return (~ok) & (n < max_attempts)

    def body(c):
        n, _, _, k = c
        k, sub = jax.random.split(k)
        ok, out = attempt(sub)
        return n + 1, ok, out, k

    k0, k1 = jax.random.split(key)
    ok0, out0 = attempt(k0)
    _, ok, out, _ = jax.lax.while_loop(cond, body, (jnp.int32(1), ok0, out0, k1))
    out = jnp.where(ok, out, x)
    loss = (out != x).any(axis=-1)
    return out, loss


def bar_infilling(key: jax.Array, x: jax.Array, p: float,
                  lam: float = 3.0, max_attempts: int = 10) -> Corruption:
    """Poisson span infilling at bar level (pretrain.py:437-506).

    Walk bars; with prob p/lam draw span ~ Poisson(lam): span=0 appends a
    ``<MASK>`` after the bar's last octuple; span>0 deletes the octuples of
    the next ``span`` bars (budget-limited to ``round(S*p)`` octuples) and
    masks the first octuple of the first non-empty bar.  Same retry rule.
    """
    S = x.shape[0]
    NB = V.FIELD_SIZES[0]
    bars = x[:, 0]
    num_mask = round(S * p)
    counts = jnp.zeros(NB, dtype=jnp.int32).at[bars].add(1)
    rows = jnp.arange(S)
    # .at[].min/.at[].max are order-independent under duplicate indices;
    # the previous .at[].set scatters relied on last-write-wins, which JAX
    # documents as UNDEFINED for repeated indices (round-3 review)
    first_of_bar = jnp.where(
        counts > 0,
        jnp.full(NB, S, dtype=jnp.int32).at[bars].min(rows), 0)
    last_of_bar = jnp.zeros(NB, dtype=jnp.int32).at[bars].max(rows)
    cum = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)])

    def attempt(k):
        kd, kp = jax.random.split(k)
        fire = jax.random.uniform(kd, (NB,)) < (p / max(1.0, lam))
        spans = jax.random.poisson(kp, lam, (NB,)).astype(jnp.int32)

        def bar_step(carry, i):
            skip, budget = carry
            skipping = skip > 0
            span = spans[i]
            hi = jnp.minimum(i + span, NB)
            cur = cum[hi] - cum[i]
            affordable = (budget + cur) <= num_mask
            do_span = (~skipping) & fire[i] & (span > 0) & affordable
            do_append = (~skipping) & fire[i] & (span == 0) & (counts[i] != 0)
            new_skip = jnp.where(skipping, skip - 1,
                                 jnp.where(do_span, span - 1, 0))
            new_budget = budget + jnp.where(do_span, cur, 0)
            return (new_skip, new_budget), (do_span, do_append, hi)

        (_, _), (do_span, do_append, his) = jax.lax.scan(
            bar_step, (jnp.int32(0), jnp.int32(0)), jnp.arange(NB))

        # op codes per position: 0 keep, 1 append-mask-after, 2 delete, 3 mask
        op = jnp.zeros(S, dtype=jnp.int32)
        # deletions: every octuple whose bar lies in a fired span
        del_bar = jnp.zeros(NB, dtype=bool)

        def mark(i, db):
            lo = i
            hi = his[i]
            in_span = (jnp.arange(NB) >= lo) & (jnp.arange(NB) < hi)
            return jnp.where(do_span[i], db | in_span, db)

        del_bar = jax.lax.fori_loop(0, NB, mark, del_bar)
        op = jnp.where(del_bar[bars], 2, op)
        # first octuple of the first non-empty bar of each span -> self-mask
        def first_nonempty(i, o):
            span_bars = (jnp.arange(NB) >= i) & (jnp.arange(NB) < his[i])
            nonempty = span_bars & (counts > 0)
            any_ne = nonempty.any()
            fb = jnp.argmax(nonempty)
            pos = first_of_bar[fb]
            return jnp.where(do_span[i] & any_ne, o.at[pos].set(3), o)

        op = jax.lax.fori_loop(0, NB, first_nonempty, op)
        append_pos = jnp.where(do_append, last_of_bar[jnp.arange(NB)], S)
        op = op.at[append_pos].set(1, mode="drop")

        # Emit: same block-write machinery as octuple-level infilling.
        def emit(carry, i):
            write = carry
            o = op[i]
            row1 = jnp.where(o == 3, MASK_ROW, x[i])
            row2 = MASK_ROW
            w = jnp.where(o == 2, 0, jnp.where(o == 1, 2, 1))
            return write + w, (row1, row2, write, w)

        total, (r1, r2, offs, ws) = jax.lax.scan(emit, jnp.int32(0),
                                                 jnp.arange(S))
        buf = jnp.zeros((2 * S + 2, 8), dtype=x.dtype)
        idx1 = jnp.where(ws >= 1, offs, 2 * S)
        idx2 = jnp.where(ws == 2, offs + 1, 2 * S + 1)
        buf = buf.at[idx1].set(r1, mode="drop")
        buf = buf.at[idx2].set(r2, mode="drop")
        ok = total <= S
        out = jnp.where((rows < total)[:, None], buf[:S], PAD_ROW[None, :])
        return ok, out

    def cond(c):
        n, ok, _, _ = c
        return (~ok) & (n < max_attempts)

    def body(c):
        n, _, _, k = c
        k, sub = jax.random.split(k)
        ok, out = attempt(sub)
        return n + 1, ok, out, k

    k0, k1 = jax.random.split(key)
    ok0, out0 = attempt(k0)
    _, ok, out, _ = jax.lax.while_loop(cond, body, (jnp.int32(1), ok0, out0, k1))
    out = jnp.where(ok, out, x)
    return out, (out != x).any(axis=-1)


# ---------------------------------------------------------------------- 5
def document_rotation(key: jax.Array, x: jax.Array) -> Corruption:
    """Rotate by r ~ U{0..S-1}; loss everywhere unless r == 0
    (pretrain.py:508-517)."""
    S = x.shape[0]
    r = jax.random.randint(key, (), 0, S)
    out = jnp.roll(x, -r, axis=0)
    loss = jnp.broadcast_to(r != 0, (S,))
    return out, loss


# ----------------------------------------------------------------------
def corrupt(key: jax.Array, x: jax.Array, p: float = 0.15) -> Corruption:
    """One uniformly-chosen corruption for one sample (gen_mask,
    pretrain.py:519-546, with the shipped ablation pinning)."""
    k_choice, k_fn = jax.random.split(key)
    choice = jax.random.randint(k_choice, (), 0, 5)
    branches = [
        lambda k: token_deletion(k, x, p),
        lambda k: token_mask(k, x, p),
        lambda k: sentence_permutation(k, x),
        lambda k: token_infilling(k, x, p),
        lambda k: document_rotation(k, x),
    ]
    return jax.lax.switch(choice, branches, k_fn)


@functools.partial(jax.jit, static_argnames=("p",))
def corrupt_batch(key: jax.Array, batch: jax.Array,
                  p: float = 0.15) -> Tuple[jax.Array, jax.Array]:
    """Corrupt a (B, S, 8) batch; returns (corrupted, loss_mask (B, S, 8))."""
    keys = jax.random.split(key, batch.shape[0])
    out, loss = jax.vmap(lambda k, s: corrupt(k, s, p))(keys, batch)
    return out, jnp.repeat(loss[..., None].astype(jnp.float32), 8, axis=-1)
