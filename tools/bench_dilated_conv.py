"""Microbench: ASPP dilated-conv strategies at the OS16 grid (14x14).

Compares, for d in {6, 12} at (32,14,14,2048)->512 fwd+bwd:
  xla    : plain conv_general_dilated (what ConvModule does today for d<grid)
  pad    : tap decomposition, lax.pad reassembly (DilatedConv3x3 partial)
  Useful-FLOP fractions at 14x14: d=6 ~51%, d=12 ~18% — the decomposed
  path skips the padding-zero multiplies XLA burns MXU cycles on.

Usage: python tools/bench_dilated_conv.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    n, hw, cin, cout = 32, 14, 2048, 512
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(n, hw, hw, cin).astype(np.float32)).astype(jnp.bfloat16)
    kern = jnp.asarray(r.randn(3, 3, cin, cout).astype(np.float32) * 0.01)

    def conv_xla(kern, x, d):
        return jax.lax.conv_general_dilated(
            x, kern.astype(x.dtype), (1, 1), [(d, d), (d, d)],
            rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def conv_pad(kern, x, d):
        k16 = kern.astype(x.dtype)
        nb, h, w, _ = x.shape
        out = jnp.dot(x, k16[1, 1])
        for ti, oy in enumerate((-d, 0, d)):
            for tj, ox in enumerate((-d, 0, d)):
                if oy == 0 and ox == 0:
                    continue
                y0, y1 = max(0, -oy), h - max(0, oy)
                x0, x1 = max(0, -ox), w - max(0, ox)
                if y1 <= y0 or x1 <= x0:
                    continue
                src = x[:, y0 + oy : y1 + oy, x0 + ox : x1 + ox, :]
                contrib = jnp.dot(src, k16[ti, tj])
                out = out + jax.lax.pad(
                    contrib, jnp.zeros((), contrib.dtype),
                    ((0, 0, 0), (y0, h - y1, 0), (x0, w - x1, 0), (0, 0, 0)),
                )
        return out

    def bench(fn, d, label, steps=30):
        f = jax.jit(jax.value_and_grad(
            lambda kern: jnp.sum(fn(kern, x, d).astype(jnp.float32) ** 2)
        ))
        loss, g = f(kern)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for _ in range(steps):
            loss, g = f(kern)
        jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / steps
        print(f"  {label} d={d}: {dt*1e6:8.0f} us/fwd+bwd  loss={float(loss):.1f}")
        return dt

    import itertools

    shapes = [(2048, 512, (6, 12, 18))]
    if os.environ.get("BENCH_D2", "0") == "1":
        # ResNet stage-4 3x3 convs at OS16 (dilation 2, 512ch): useful
        # fraction 0.82 — measure whether decomposition still wins
        shapes = [(512, 512, (2,))]
    for cin_, cout_, ds in shapes:
        if (cin_, cout_) != (cin, cout):
            x = jnp.asarray(
                r.randn(n, hw, hw, cin_).astype(np.float32)
            ).astype(jnp.bfloat16)
            kern = jnp.asarray(
                r.randn(3, 3, cin_, cout_).astype(np.float32) * 0.01
            )
        for d in ds:
            print(f"dilation {d} @ {hw}x{hw}, {cin_}->{cout_}:")
            t_ref = bench(conv_xla, d, "xla ")
            t_pad = bench(conv_pad, d, "pad ")
            print(f"  speedup pad: {t_ref/t_pad:.2f}x")


if __name__ == "__main__":
    main()
