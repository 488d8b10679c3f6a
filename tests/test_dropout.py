"""Bit-sampled dropout op: distribution and identity semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from pianobart_tpu.ops.dropout import Dropout


def _apply(rate, x, deterministic, seed=0):
    mod = Dropout(rate)
    variables = mod.init({"dropout": jax.random.PRNGKey(seed)}, x,
                         deterministic=True)
    return mod.apply(variables, x, deterministic=deterministic,
                     rngs={"dropout": jax.random.PRNGKey(seed)})


def test_deterministic_and_zero_rate_are_identity():
    x = jnp.arange(24.0).reshape(4, 6)
    np.testing.assert_array_equal(_apply(0.5, x, True), x)
    np.testing.assert_array_equal(_apply(0.0, x, False), x)


def test_drop_rate_and_scale():
    rate = 0.1
    q_rate = round(rate * 256) / 256.0  # actual (quantized) drop rate
    x = jnp.ones((512, 512))
    y = np.asarray(_apply(rate, x, False, seed=3))
    kept = y != 0.0
    # empirical keep rate within 1% of nominal
    assert abs(kept.mean() - (1 - rate)) < 0.01
    # surviving elements are scaled by the actual quantized keep rate
    np.testing.assert_allclose(y[kept], 1.0 / (1.0 - q_rate), rtol=1e-6)


def test_unbiased_expectation():
    rate = 0.3
    x = jnp.full((2048, 256), 2.0)
    y = np.asarray(_apply(rate, x, False, seed=9))
    assert abs(y.mean() - 2.0) < 0.02
