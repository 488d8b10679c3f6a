"""Worker for the multi-process (DCN-style) data-parallel smoke test.

The reference has no multi-node story at all (SURVEY §2.2: single-process
``nn.DataParallel``, pretrain.py:63-65).  This framework's design scales dp
over DCN via ``jax.distributed`` + the same one-Mesh code path; this worker
proves the wiring end-to-end on CPU: N processes × M local virtual devices
form one global mesh, the pretrain step runs pjit-sharded over the global
dp axis, and every process sees the identical (psum'd) loss.

Usage (spawned by tests/test_multiprocess_dp.py, one call per process):

    python scripts/multiproc_dp_worker.py <pid> <nprocs> <port> <outfile>
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Exit code for "jax.distributed is unavailable in this environment": the
# init call itself failed, before ANY pianobart_tpu code ran.  The test
# skips only on this code — every other failure is a real regression.
ENV_UNAVAILABLE_RC = 42


def main(pid: int, nprocs: int, port: int, outfile: str) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    try:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nprocs,
            process_id=pid,
        )
    except Exception as exc:  # init-time only: environment, not our code
        print(f"jax.distributed.initialize failed: {exc!r}", file=sys.stderr)
        raise SystemExit(ENV_UNAVAILABLE_RC)
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from pianobart_tpu import vocab as V
    from pianobart_tpu.models import PianoBartConfig, PianoBartLM
    from pianobart_tpu.parallel.mesh import make_mesh, shard_params
    from pianobart_tpu.train.pretrain import pretrain_step
    from pianobart_tpu.train.state import TrainState, make_optimizer

    assert jax.process_count() == nprocs
    n_global = len(jax.devices())
    assert n_global == 2 * nprocs, f"expected {2 * nprocs} devices, got {n_global}"

    cfg = PianoBartConfig(d_model=64, encoder_layers=2, decoder_layers=2,
                          ffn_dim=128, num_heads=2, max_len=64)
    model = PianoBartLM(cfg)
    rng = jax.random.PRNGKey(0)
    B, S = n_global * 2, cfg.max_len

    mesh = make_mesh(dp=n_global, tp=1, sp=1)
    ids0 = jnp.zeros((B, S, 8), jnp.int32)
    m0 = jnp.ones((B, S))
    variables = model.init(rng, ids0, ids0, m0, m0)
    params, _ = shard_params(variables, mesh)
    state = TrainState.create(apply_fn=model.apply, params=params["params"],
                              tx=make_optimizer())

    # Identical global batch on every process (deterministic seed); each
    # process owns the shards of its addressable devices.
    npr = np.random.default_rng(0)
    host = np.zeros((B, S, 8), dtype=np.int32)
    for f in range(8):
        host[..., f] = npr.integers(0, V.TOKEN_BOUNDARY[f], (B, S))
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P("dp"))
    batch = jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx])

    state, metrics = pretrain_step(state, batch, jax.random.PRNGKey(1), cfg, 0.15)
    loss0 = float(metrics["loss"])
    state, metrics = pretrain_step(state, batch, jax.random.PRNGKey(2), cfg, 0.15)
    loss1 = float(metrics["loss"])

    with open(outfile, "w") as f:
        f.write(f"{pid} {loss0:.6f} {loss1:.6f}\n")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
