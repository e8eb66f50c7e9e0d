"""Dense-loss crossover: naive XLA vs flash-style Pallas kernel.

Benchmarks value+grad of the CP2 dense loss in isolation at the lemon
resolution (512^2 -> S^2=1024, C=128) across batch sizes, recording
step time and device peak memory.  The naive path materializes
(N, S^2, S^2) logits/labels/softmax intermediates; the fused kernel
streams key tiles and keeps HBM flat in N.

Usage: python tools/bench_dense_loss.py [--s2 1024] [--c 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def peak_mb():
    import jax

    stats = jax.local_devices()[0].memory_stats() or {}
    return stats.get("peak_bytes_in_use", 0) / 1e6


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from cp2_tpu.ops.pallas.dense_loss import (
        dense_pair_loss,
        dense_pair_loss_reference,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--s2", type=int, default=1024)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--temp", type=float, default=0.2)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[8, 32, 64, 128, 256])
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    def run(fn, n, label):
        r = np.random.RandomState(0)
        q = r.randn(n, args.s2, args.c).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        k = r.randn(n, args.s2, args.c).astype(np.float32)
        k /= np.linalg.norm(k, axis=-1, keepdims=True)
        a = (r.rand(n, args.s2) > 0.5).astype(np.float32)
        b = (r.rand(n, args.s2) > 0.5).astype(np.float32)
        a[:, 0] = b[:, 0] = 1.0
        q, k, a, b = map(jnp.asarray, (q, k, a, b))

        grad_fn = jax.jit(jax.value_and_grad(
            lambda q, k: fn(q, k, a, b, args.temp), argnums=(0, 1)
        ))
        try:
            loss, grads = grad_fn(q, k)
            jax.block_until_ready(grads)
        except Exception as e:
            print(f"  {label} n={n}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})")
            return None
        t0 = time.perf_counter()
        for _ in range(args.steps):
            loss, grads = grad_fn(q, k)
        jax.block_until_ready(grads)
        dt = (time.perf_counter() - t0) / args.steps
        print(f"  {label} n={n}: {dt*1e3:8.2f} ms/step  "
              f"loss={float(loss):.4f}  peak_mem={peak_mb():8.0f} MB")
        return dt

    for n in args.batches:
        print(f"batch {n} (S2={args.s2}, C={args.c}):")
        t_naive = run(dense_pair_loss_reference, n, "naive")
        t_fused = run(dense_pair_loss, n, "fused")
        if t_naive and t_fused:
            print(f"  speedup: {t_naive/t_fused:.2f}x")


if __name__ == "__main__":
    main()
