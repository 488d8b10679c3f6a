"""Sequence-parallel pretraining step (ring attention over the sp axis).

Trains sequences LONGER than one chip's attention budget without the
reference's offline chunking (SURVEY §5: the reference hard-caps sequences
at 1024 and splits songs offline).  Structure:

* corruption + decoder shift run on GLOBAL sequences (cheap, fixed-shape,
  batch-sharded over dp) — they need whole rows;
* the model forward/backward runs inside ``shard_map`` with the sequence
  axis sharded over ``sp``: ring attention (``cfg.ring_axis``), per-shard
  global positional offsets, position-wise compute on local shards;
* the masked CE is computed as local (numerator, denominator) pairs and
  ``psum``-ed over (dp, sp) before the divide, so normalization matches the
  dense objective exactly;
* parameter gradients are ``psum``-ed over (dp, sp); the optimizer update
  happens outside shard_map on the replicated gradients.

``test_sp_train_step`` verifies loss and gradients match the dense step
bit-for-bit (same corruption rng) on a virtual dp×sp mesh.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .. import vocab as V
from ..models.config import PianoBartConfig
from ..models.heads import split_fields
from ..ops.noise import corrupt_batch
from .objective import shift_right, weighted_average_accuracy
from .pretrain import _fast_dropout_key
from .state import TrainState

_SOS_ROW = jnp.asarray(V.SOS, dtype=jnp.int32)
_BAR_PAD = V.PAD[0]


def _local_ce_sums(fused, targets, loss_mask, cfg):
    """Per-field (Σ nll·m, Σ m, Σ hit·m) on the local shard; psum outside."""
    fields = split_fields(fused.astype(jnp.float32), cfg)
    nums, dens, hits = [], [], []
    for i in range(cfg.n_fields):
        logp = jax.nn.log_softmax(fields[i], axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., i:i + 1], axis=-1)[..., 0]
        m = loss_mask[..., i]
        nums.append((nll * m).sum())
        dens.append(m.sum())
        hits.append(((fields[i].argmax(-1) == targets[..., i]) * m).sum())
    return jnp.stack(nums), jnp.stack(dens), jnp.stack(hits)


def _merge_psums(nums, dens, hits, axes):
    """psum local CE sums over ``axes`` and derive per-field loss/acc (the
    same merge for the train and eval twins — keep them in one place)."""
    nums = jax.lax.psum(nums, axes)
    dens = jax.lax.psum(dens, axes)
    hits = jax.lax.psum(hits, axes)
    per_field = jnp.where(dens > 0, nums / jnp.maximum(dens, 1.0), 0.0)
    accs = jnp.where(dens > 0, hits / jnp.maximum(dens, 1.0), 0.0)
    return per_field, accs


def make_sp_pretrain_step(cfg: PianoBartConfig, mesh,
                          mask_percent: float = 0.15,
                          axes: Tuple[str, str] = ("dp", "sp")):
    """Build a jitted sp-sharded train step for ``cfg`` (ring_axis set)."""
    assert cfg.ring_axis is not None, "set cfg.ring_axis (e.g. 'sp')"
    from ..models.pianobart import PianoBartLM
    model = PianoBartLM(cfg)
    dp_axis, sp_axis = axes
    n_tok = jnp.asarray(cfg.field_sizes, dtype=jnp.float32)

    def loss_and_grads(params, corrupted, dec_ids, targets, loss_mask,
                       enc_mask, dec_mask, dropout_rng):
        # Dropout stays ON in sp training (the dense pretrain_step and the
        # reference trainer both train with dropout); every shard draws an
        # independent stream by folding its (dp, sp) coordinates in.
        dropout_rng = jax.random.fold_in(
            jax.random.fold_in(dropout_rng, jax.lax.axis_index(dp_axis)),
            jax.lax.axis_index(sp_axis))
        # The differentiated function must stay LOCAL: in unchecked
        # shard_map the transpose of psum is psum, so putting psums on the
        # grad path double-counts (local grads come out already global and
        # an outer psum multiplies by the device count).  Global
        # denominators enter under stop_gradient; ONE psum outside the grad
        # reduces the per-shard contributions.
        def local_loss(p):
            # deterministic=False like the dense step: attention_/
            # activation_dropout must stay active even when cfg.dropout is
            # 0 (round-3 review; rate-0 Dropout layers are no-ops anyway)
            fused = model.apply({"params": p}, corrupted, dec_ids,
                                enc_mask, dec_mask, False,
                                rngs={"dropout": dropout_rng})
            nums, dens, hits = _local_ce_sums(fused, targets, loss_mask, cfg)
            gdens = jax.lax.stop_gradient(
                jax.lax.psum(dens, (dp_axis, sp_axis)))
            per_field_local = nums / jnp.maximum(gdens, 1.0)
            loss_local = (per_field_local * n_tok).sum() / n_tok.sum()
            return loss_local, (nums, dens, hits)

        (loss_local, (nums, dens, hits)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params)
        loss = jax.lax.psum(loss_local, (dp_axis, sp_axis))
        per_field, accs = _merge_psums(nums, dens, hits, (dp_axis, sp_axis))
        grads = jax.lax.psum(grads, (dp_axis, sp_axis))
        return loss, per_field, accs, grads

    sharded = jax.shard_map(
        loss_and_grads, mesh=mesh,
        in_specs=(P(),                                  # params replicated
                  P(dp_axis, sp_axis, None),            # corrupted ids
                  P(dp_axis, sp_axis, None),            # decoder ids
                  P(dp_axis, sp_axis, None),            # targets
                  P(dp_axis, sp_axis, None),            # loss mask
                  P(dp_axis, sp_axis),                  # enc mask
                  P(dp_axis, sp_axis),                  # dec mask
                  P()),                                 # dropout rng
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: jax.Array, rng: jax.Array):
        rngc, rngd = jax.random.split(jax.random.fold_in(rng, state.step))
        # reseed dropout onto the fast rbg generator like the dense step
        # (threefry mask generation measured ~60 ms/step at B=16;
        # per-shard fold_in below works on rbg keys too)
        rngd = _fast_dropout_key(rngd)
        corrupted, loss_mask = corrupt_batch(rngc, batch, mask_percent)
        dec_ids = shift_right(batch, _SOS_ROW)
        enc_mask = (corrupted[..., 0] != _BAR_PAD).astype(jnp.float32)
        dec_mask = (dec_ids[..., 0] != _BAR_PAD).astype(jnp.float32)
        loss, per_field, accs, grads = sharded(
            state.params, corrupted, dec_ids, batch, loss_mask,
            enc_mask, dec_mask, rngd)
        state = state.apply_gradients(grads=grads)
        from .state import get_grad_norm
        grad_norm = get_grad_norm(state.opt_state)  # logged clip: free
        if grad_norm is None:
            import optax
            grad_norm = optax.global_norm(grads)
        return state, {"loss": loss, "field_loss": per_field,
                       "field_acc": accs, "grad_norm": grad_norm}

    return step


def make_sp_eval_step(cfg: PianoBartConfig, mesh,
                      mask_percent: float = 0.15,
                      axes: Tuple[str, str] = ("dp", "sp")):
    """Validation twin of :func:`make_sp_pretrain_step` (no grads/update).

    ``sample_weight`` (B,) zeroes padded tail rows, mirroring
    :func:`pianobart_tpu.train.pretrain.pretrain_eval_step`.
    """
    assert cfg.ring_axis is not None, "set cfg.ring_axis (e.g. 'sp')"
    from ..models.pianobart import PianoBartLM
    model = PianoBartLM(cfg)
    dp_axis, sp_axis = axes
    n_tok = jnp.asarray(cfg.field_sizes, dtype=jnp.float32)

    def local_eval(params, corrupted, dec_ids, targets, loss_mask,
                   enc_mask, dec_mask):
        fused = model.apply({"params": params}, corrupted, dec_ids,
                            enc_mask, dec_mask, True)
        nums, dens, hits = _local_ce_sums(fused, targets, loss_mask, cfg)
        per_field, accs = _merge_psums(nums, dens, hits, (dp_axis, sp_axis))
        loss = (per_field * n_tok).sum() / n_tok.sum()
        return loss, per_field, accs

    sharded = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(), P(dp_axis, sp_axis, None), P(dp_axis, sp_axis, None),
                  P(dp_axis, sp_axis, None), P(dp_axis, sp_axis, None),
                  P(dp_axis, sp_axis), P(dp_axis, sp_axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def eval_step(state: TrainState, batch: jax.Array, rng: jax.Array,
                  sample_weight: jax.Array):
        rngc, _ = jax.random.split(rng)
        corrupted, loss_mask = corrupt_batch(rngc, batch, mask_percent)
        loss_mask = loss_mask * sample_weight[:, None, None]
        dec_ids = shift_right(batch, _SOS_ROW)
        enc_mask = (corrupted[..., 0] != _BAR_PAD).astype(jnp.float32)
        dec_mask = (dec_ids[..., 0] != _BAR_PAD).astype(jnp.float32)
        loss, per_field, accs = sharded(
            state.params, corrupted, dec_ids, batch, loss_mask,
            enc_mask, dec_mask)
        return {"loss": loss, "field_loss": per_field, "field_acc": accs,
                "weighted_acc": weighted_average_accuracy(accs, cfg)}

    return eval_step
