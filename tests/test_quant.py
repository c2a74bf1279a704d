"""W8A8 quantization building blocks (ops/quant.py).

The int8 serving path measured NEGATIVE at flagship scale (docs/PERF.md) —
these tests keep the parked building blocks correct, same policy as the
parked mbconv/ffn kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from multimodal_plankton_recognition_tpu.ops.quant import (
    dense_int8, int8_matmul, quantize_dynamic, quantize_per_channel,
    quantized_dense,
)


def test_per_channel_roundtrip_bound():
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(64, 32) * rs.rand(32), jnp.float32)
    w8, scale = quantize_per_channel(w)
    assert w8.dtype == jnp.int8 and scale.shape == (1, 32)
    # symmetric rounding: error within half a quantization step per channel
    err = jnp.abs(w - w8.astype(jnp.float32) * scale)
    assert float(jnp.max(err - scale / 2)) <= 1e-6


def test_dynamic_activation_roundtrip():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(8, 64) * 3, jnp.float32)
    x8, scale = quantize_dynamic(x)
    err = float(jnp.max(jnp.abs(x - x8.astype(jnp.float32) * scale)))
    assert err <= float(scale) / 2 + 1e-6


def test_int8_matmul_close_to_f32():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(16, 128), jnp.float32)
    w = jnp.asarray(rs.randn(128, 64), jnp.float32)
    w8, s = quantize_per_channel(w)
    y = int8_matmul(x, w8, s)
    ref = x @ w
    rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel
    # leading dims preserved
    y3 = int8_matmul(x.reshape(4, 4, 128), w8, s)
    assert y3.shape == (4, 4, 64)
    np.testing.assert_allclose(np.asarray(y3).reshape(16, 64),
                               np.asarray(y), rtol=1e-6)


class _MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(32, name="a")(x)
        x = nn.gelu(x)
        return nn.Dense(8, name="b")(x)


def test_interceptor_swaps_nested_dense():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(8, 16), jnp.float32)
    m = _MLP()
    v = m.init(jax.random.key(0), x)
    ref = m.apply(v, x)
    with quantized_dense():
        q = m.apply(v, x)
    rel = float(jnp.linalg.norm(q - ref) / jnp.linalg.norm(ref))
    assert 1e-5 < rel < 0.05, rel  # quantized (not identical), but close


def test_interceptor_restores_dense_outside_context():
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(4, 16), jnp.float32)
    m = nn.Dense(8)
    v = m.init(jax.random.key(0), x)
    ref = m.apply(v, x)
    with quantized_dense():
        m.apply(v, x)
    after = m.apply(v, x)
    np.testing.assert_array_equal(np.asarray(after), np.asarray(ref))


def test_dense_int8_respects_bias_and_dtype():
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(4, 16), jnp.float32)
    m = nn.Dense(8, use_bias=False, dtype=jnp.bfloat16)
    v = m.init(jax.random.key(0), x)
    with quantized_dense():
        y = m.apply(v, x)
    assert y.dtype == jnp.bfloat16
