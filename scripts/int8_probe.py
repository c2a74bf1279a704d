#!/usr/bin/env python3
"""Go/no-go probe for int8-quantized serving: raw MXU matmul throughput at
int8 vs bf16 through XLA on this chip.

The v5e datasheet doubles MXU throughput at int8 (394 vs 197 TOPS). Whether
XLA actually lowers `lax.dot_general(int8, int8) -> int32` onto that path —
rather than widening to bf16/f32 — decides if a quantized encode path is a
real lever for the serving numbers (docs/PERF.md) or a dead end. Measures
the honest scan+fetch protocol (K matmuls inside one jitted lax.scan
dispatch, carry-dependent body, forced np.asarray fetch — see bench.py).

Usage: python scripts/int8_probe.py [--n 8192] [--k 20]
"""

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

REPS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from multimodal_plankton_recognition_tpu import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()
    n, K = args.n, args.k
    flops_per_step = 2.0 * n * n * n
    rs = np.random.RandomState(0)

    def measure(label, x, w, acc_dtype, recast):
        @jax.jit
        def run(c, w):
            def body(c, _):
                y = jax.lax.dot_general(
                    c, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype)
                return recast(y), ()
            return jax.lax.scan(body, c, None, length=K)[0]

        out = run(x, w)
        np.asarray(out[:1])  # compile + warm
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = run(x, w)
            np.asarray(out[:1])
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times)) / K
        tops = flops_per_step / dt / 1e12
        print(f"{label:>6}: {dt * 1e3:7.3f} ms/matmul  {tops:6.1f} TOP/s")
        return dt

    a = rs.randn(n, n)
    x8 = jnp.asarray(np.clip(a * 32, -127, 127), jnp.int8)
    w8 = jnp.asarray(np.clip(rs.randn(n, n) * 32, -127, 127), jnp.int8)
    xb = jnp.asarray(a, jnp.bfloat16)
    wb = jnp.asarray(rs.randn(n, n), jnp.bfloat16)

    t_bf16 = measure("bf16", xb, wb, jnp.float32,
                     lambda y: y.astype(jnp.bfloat16))
    t_int8 = measure("int8", x8, w8, jnp.int32,
                     lambda y: jnp.clip(y >> 7, -127, 127).astype(jnp.int8))
    print(f"int8 speedup over bf16: {t_bf16 / t_int8:.2f}x "
          f"(datasheet peak ratio 2.0x)")


if __name__ == "__main__":
    main()
