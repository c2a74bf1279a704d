#!/usr/bin/env python3
"""Per-kernel, per-block-shape timing for the fused MBConv Pallas kernels.

Attributes the fused-vs-unfused gap (scripts/perf_probe.py b0_fused_256 was
3.7x SLOWER than XLA in its first version) to individual kernels (KA/KB,
fwd/bwd) at every stride-1 block shape EfficientNet-B0 runs at 224px, and
times the XLA composition (mbconv_reference) of the same block as the
baseline. Timing uses the repo's scan+fetch protocol (see bench.py): K
invocations inside one jitted lax.scan with a carry-dependent body, forced
np.asarray fetch, min over reps.

Usage: python scripts/mbconv_probe.py [--bs 256] [--k-steps 10] [shape ...]
where shape names one of the SHAPES keys (default: all).
"""

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

#: stride-1 MBConv shapes of EfficientNet-B0 at 224 (h, w, cin, mid, cout,
#: kernel, has_expand) — models/image/efficientnet.py stage table, count =
#: how many blocks of the 16 run at this shape
SHAPES = {
    "s1_112x32": (112, 112, 32, 32, 16, 3, False, 1),
    "s2_56x144": (56, 56, 24, 144, 24, 3, True, 1),
    "s3_28x240": (28, 28, 40, 240, 40, 5, True, 1),
    "s4_14x480": (14, 14, 80, 480, 80, 3, True, 2),
    "s5_14x672": (14, 14, 112, 672, 112, 5, True, 3),
    "s6_7x1152": (7, 7, 192, 1152, 192, 5, True, 3),
    "s7_7x1152o320": (7, 7, 192, 1152, 320, 3, True, 1),
}


def _scan_time(fn, args, k_steps, reps=3):
    """min seconds per call of fn(*args) over k_steps-per-dispatch scans.
    The carry threads the first arg (x-like) to defeat loop hoisting."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x0, rest):
        def body(x, _):
            out = fn(x, *rest)
            lead = out[0] if isinstance(out, tuple) else out
            # carry must keep x's shape/dtype and depend on the output
            probe = jnp.mean(lead.astype(jnp.float32))
            return (x0 + probe.astype(x0.dtype) * 1e-6,
                    probe)
        return jax.lax.scan(body, x0, jnp.arange(k_steps))

    x0, rest = args[0], args[1:]
    _, probes = run(x0, rest)
    np.asarray(probes)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, probes = run(x0, rest)
        np.asarray(probes)
        times.append(time.perf_counter() - t0)
    return min(times) / k_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--k-steps", type=int, default=10)
    ap.add_argument("--grad", action="store_true",
                    help="also time full fwd+bwd via jax.grad")
    ap.add_argument("shapes", nargs="*", default=list(SHAPES))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from multimodal_plankton_recognition_tpu import enable_compilation_cache
    from multimodal_plankton_recognition_tpu.ops.pallas.experimental import mbconv as M
    enable_compilation_cache()

    rs = np.random.RandomState(0)
    interpret = jax.default_backend() != "tpu"
    total_fused = total_ref = 0.0

    for name in args.shapes:
        h, w, cin, mid, cout, k, has_expand, count = SHAPES[name]
        bs = args.bs
        x = jnp.asarray(rs.randn(bs, h, w, cin), jnp.bfloat16)
        wexp = jnp.asarray(rs.randn(cin, mid) * 0.1, jnp.float32) \
            if has_expand else None
        g1 = jnp.ones((mid,)) if has_expand else None
        b1 = jnp.zeros((mid,)) if has_expand else None
        wdw = jnp.asarray(rs.randn(k, k, 1, mid) * 0.1, jnp.float32)
        g2, b2 = jnp.ones((mid,)), jnp.zeros((mid,))
        red = max(1, cin // 4)
        wr = jnp.asarray(rs.randn(mid, red) * 0.1, jnp.float32)
        br = jnp.zeros((red,))
        we = jnp.asarray(rs.randn(red, mid) * 0.1, jnp.float32)
        be = jnp.zeros((mid,))
        wproj = jnp.asarray(rs.randn(mid, cout) * 0.1, jnp.float32)
        weights = (wexp, g1, b1, wdw, g2, b2, wr, br, we, be, wproj)

        res = {}
        # forward pieces
        res["ka_fwd"] = _scan_time(
            lambda x_, *w_: M._ka_fwd(x_, w_[0], w_[1], w_[2], w_[3],
                                      k=k, interpret=interpret),
            (x, wexp, g1, b1, wdw), args.k_steps)
        y2, m1, v1, m2, v2 = M._ka_fwd(x, wexp, g1, b1, wdw, k=k,
                                       interpret=interpret)
        res["kb_fwd"] = _scan_time(
            lambda y2_, *w_: M._kb_fwd(y2_, *w_, interpret=interpret),
            (y2, g2, b2, m2, v2, wr, br, we, be, wproj), args.k_steps)
        y3, m3, v3 = M._kb_fwd(y2, g2, b2, m2, v2, wr, br, we, be, wproj,
                               interpret=interpret)
        # backward pieces
        dy3 = jnp.asarray(rs.randn(bs, h, w, cout), jnp.bfloat16)
        res["kb_bwd"] = _scan_time(
            lambda y2_, *w_: M._kb_bwd(y2_, *w_, interpret=interpret),
            (y2, dy3, g2, b2, m2, v2, wr, br, we, be, wproj), args.k_steps)
        dy2 = M._kb_bwd(y2, dy3, g2, b2, m2, v2, wr, br, we, be, wproj,
                        interpret=interpret)[0]
        res["ka_bwd"] = _scan_time(
            lambda x_, *w_: M._ka_bwd(x_, *w_, k=k, interpret=interpret),
            (x, dy2, wexp, g1, b1, wdw, m1, v1), args.k_steps)

        # XLA reference composition fwd + full vjp
        res["ref_fwd"] = _scan_time(
            lambda x_, *w_: M.mbconv_reference(x_, *w_, k=k),
            (x,) + weights, args.k_steps)

        def ref_loss(x_, *w_):
            y3_, *_ = M.mbconv_reference(x_, *w_, k=k)
            return jnp.sum(y3_.astype(jnp.float32))

        res["ref_fwdbwd"] = _scan_time(
            lambda x_, *w_: jax.grad(ref_loss)(x_, *w_),
            (x,) + weights, args.k_steps)

        fused_total = sum(res[r] for r in
                          ("ka_fwd", "kb_fwd", "kb_bwd", "ka_bwd"))
        total_fused += count * fused_total * 1e3
        total_ref += count * res["ref_fwdbwd"] * 1e3
        print(f"{name} (x{count}): " + "  ".join(
            f"{k_}={v * 1e3:7.2f}ms" for k_, v in res.items())
            + f"  | fused_total={fused_total * 1e3:7.2f}ms", flush=True)

    print(f"\nALL stride-1 blocks, weighted: fused={total_fused:8.2f}ms  "
          f"xla_ref={total_ref:8.2f}ms  (bs={args.bs})")


if __name__ == "__main__":
    main()
