"""int8 serving quantization: per-channel weights, dynamic activations.

The reference serves f32/AMP through torch (reference: experiments.ipynb
cells 4-8 run `Trainer(barebones=True).predict`); the TPU-native serving
lever is the MXU's doubled int8 rate — measured 228 vs 138 TOP/s through
XLA on the v5e (scripts/int8_probe.py, docs/PERF.md). This module provides
the quantized-matmul building blocks and a Flax interceptor that swaps
every ``nn.Dense`` in an ``apply`` under it onto the int8 path — no model
changes, training untouched (quantization is an inference-time transform).

Scheme (the standard W8A8 dynamic recipe):

* weights: symmetric per-output-channel int8, scales from ``max|w|``;
* activations: symmetric per-tensor int8, scale from the runtime
  ``max|x|`` (dynamic — no calibration corpus needed, one cheap VPU
  reduction per layer);
* accumulation int32 on the MXU, dequantized to f32, bias added in f32.
"""

from __future__ import annotations

import contextlib
from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quantize_per_channel(w: jnp.ndarray, axis: int = 0
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization of ``w`` reducing over ``axis``.

    For a (in, out) Dense kernel, ``axis=0`` gives one scale per output
    channel. Returns ``(w8, scale)`` with ``w ~= w8 * scale``.
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    w8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w8, scale


def quantize_dynamic(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-tensor int8 with a runtime scale. Returns (x8, scale)."""
    x = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x)), _EPS) / 127.0
    x8 = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return x8, scale


def int8_matmul(x: jnp.ndarray, w8: jnp.ndarray, w_scale: jnp.ndarray
                ) -> jnp.ndarray:
    """``x @ dequant(w8)`` with the contraction on the int8 MXU path.

    ``x``: (..., in) float; ``w8``: (in, out) int8; ``w_scale``: (1, out).
    Returns f32 (..., out).
    """
    x8, x_scale = quantize_dynamic(x)
    lead = x8.shape[:-1]
    y32 = jax.lax.dot_general(
        x8.reshape(-1, x8.shape[-1]), w8,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    y = y32.astype(jnp.float32) * (x_scale * w_scale)
    return y.reshape(*lead, w8.shape[-1])


def dense_int8(module, x: jnp.ndarray) -> jnp.ndarray:
    """int8 forward of a *bound* ``flax.linen.Dense``: quantize its kernel
    per-output-channel, run the MXU int8 matmul, add the f32 bias, return
    in the module's declared dtype."""
    kernel = module.get_variable("params", "kernel")
    w8, w_scale = quantize_per_channel(kernel, axis=0)
    y = int8_matmul(x, w8, w_scale)
    promote = [x.dtype, kernel.dtype]
    if module.use_bias:
        bias = module.get_variable("params", "bias")
        y = y + bias.astype(jnp.float32)
        promote.append(bias.dtype)
    # flax Dense with dtype=None promotes across input/kernel/bias
    # (bf16 x + f32 params -> f32); match that promotion so the interceptor
    # never narrows downstream dtypes relative to the bf16 path
    out_dtype = module.dtype if module.dtype is not None \
        else jnp.result_type(*promote)
    return y.astype(out_dtype)


@contextlib.contextmanager
def quantized_dense():
    """Context manager: every ``nn.Dense.__call__`` inside a Flax ``apply``
    executed under it runs the W8A8 int8 path. Inference-time only —
    gradients through the rounding are not defined."""
    import flax.linen as nn

    def interceptor(next_fn, args, kwargs, context):
        if (type(context.module) is nn.Dense
                and context.method_name == "__call__"):
            return dense_int8(context.module, args[0])
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        yield
