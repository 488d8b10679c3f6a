"""Device mesh + sharding rules.

The reference's entire distributed story is single-process
``nn.DataParallel`` (``pretrain.py:63-65`` and five clones).  The TPU-native
replacement is one ``jax.sharding.Mesh`` with named axes

* ``dp`` — data parallel (batch axis; gradient psum over ICI)
* ``tp`` — tensor parallel (attention heads / FFN / vocab shards)
* ``sp`` — sequence parallel (activation sequence axis, long-context option)

Model kernels carry *logical* axis names (``embed``, ``qkv``, ``mlp``,
``vocab``, ``fused``); :data:`LOGICAL_RULES` maps them onto mesh axes and
:func:`shard_params` materializes NamedShardings.  XLA inserts all
collectives — there is no hand-written communication backend to port.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
from flax import linen as nn
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: logical axis name -> mesh axis (None = replicate)
LOGICAL_RULES: Tuple[Tuple[str, Any], ...] = (
    ("batch", "dp"),
    ("seq", "sp"),
    ("embed", None),
    ("fused", None),
    ("qkv", "tp"),
    ("mlp", "tp"),
    ("vocab", "tp"),
)


def make_mesh(dp: Optional[int] = None, tp: int = 1, sp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a (dp, tp, sp) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (tp * sp) == 0, f"{n} devices not divisible by tp*sp={tp * sp}"
        dp = n // (tp * sp)
    need = dp * tp * sp
    assert need <= n, f"mesh {dp}x{tp}x{sp} needs {need} devices, have {n}"
    devices = devices[:need]  # explicit smaller meshes take a device subset
    arr = mesh_utils.create_device_mesh((dp, tp, sp), devices=devices)
    return Mesh(arr, ("dp", "tp", "sp"))


def single_device_mesh() -> Mesh:
    return make_mesh(dp=1, tp=1, sp=1, devices=jax.devices()[:1])


def logical_to_sharding(spec_tree, mesh: Mesh,
                        rules=LOGICAL_RULES):
    """Map a tree of logical PartitionSpecs to NamedShardings."""
    return nn.logical_to_mesh_sharding(spec_tree, mesh, rules)


def param_shardings(variables, mesh: Mesh, rules=LOGICAL_RULES):
    """Shardings for a (possibly boxed) variable tree from ``model.init``."""
    spec = nn.get_partition_spec(variables)
    return logical_to_sharding(spec, mesh, rules)


def batch_sharding(mesh: Mesh, ndim: int = 3,
                   batch_axis: int = 0) -> NamedSharding:
    """Batch tensors: ``batch_axis`` on dp, rest replicated."""
    spec = [None] * ndim
    spec[batch_axis] = "dp"
    return NamedSharding(mesh, P(*spec))


def put_batch_fn(mesh: Mesh):
    """Device-put for (B, S, 8) or K-stacked (K, B, S, 8) batches: the batch
    axis goes to dp; the step axis of stacked batches stays replicated."""
    import jax.numpy as jnp

    def put(b):
        b = jnp.asarray(b)
        axis = 1 if b.ndim == 4 else 0
        if b.shape[axis] % mesh.shape["dp"] != 0:
            raise ValueError(
                f"batch size {b.shape[axis]} not divisible by dp="
                f"{mesh.shape['dp']}; pick --batch_size k*dp or a smaller "
                f"--mesh")
        return jax.device_put(b, batch_sharding(mesh, b.ndim, axis))

    return put


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(variables, mesh: Mesh, rules=LOGICAL_RULES):
    """Unbox metadata and place parameters according to their annotations."""
    shardings = param_shardings(variables, mesh, rules)
    unboxed = nn.meta.unbox(variables)
    shardings = jax.tree.map(
        lambda s: s if isinstance(s, NamedSharding) else NamedSharding(mesh, s),
        shardings,
        is_leaf=lambda x: isinstance(x, (NamedSharding,))
        or not isinstance(x, dict))
    return jax.device_put(unboxed, shardings), shardings
