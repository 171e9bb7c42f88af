"""Isolated A/B: fused W8A8 MLP-tail kernel vs the XLA W8A8 chain.

Prefill geometry (chunk 64 x 318 tokens, 7B widths): x [20352, 4096] bf16
(the mlp_norm output), gate/up/down int8. Baseline = the shipped path
(w8a8_matmul gate + up, silu*mul in bf16, w8a8_matmul down — each matmul
re-quantizing its activation input). Fused = quantize once ->
w8a8_mlp_fused (epilogue emits int8) -> w8a8_prequant_matmul down.

  python scripts/bench_fused_mlp.py        # real chip
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    import jax
    import jax.numpy as jnp

    from revisionllm_tpu.ops.quant import (
        set_w8a8,
        w8a8_matmul,
        w8a8_mlp_fused,
        w8a8_prequant_matmul,
        quantize_activation_rows,
    )

    set_w8a8(True)
    M = int(os.environ.get("BENCH_M", str(64 * 318)))
    K = int(os.environ.get("BENCH_K", "4096"))
    N = int(os.environ.get("BENCH_N", "11008"))
    bm = int(os.environ.get("BENCH_BM", "256"))
    bk = int(os.environ.get("BENCH_BK", "512"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
    gq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    uq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    dq = jnp.asarray(rng.integers(-127, 128, (N, K)), jnp.int8)
    gs = jnp.asarray(np.abs(rng.normal(size=(N,))) * 2e-3 + 1e-4, jnp.float32)
    us = jnp.asarray(np.abs(rng.normal(size=(N,))) * 2e-3 + 1e-4, jnp.float32)
    ds = jnp.asarray(np.abs(rng.normal(size=(K,))) * 2e-3 + 1e-4, jnp.float32)

    @jax.jit
    def baseline(x):
        g = w8a8_matmul(x, gq, gs)
        u = w8a8_matmul(x, uq, us)
        h = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(x.dtype)
        return w8a8_matmul(h, dq, ds)

    @jax.jit
    def fused(x):
        xq, xs = quantize_activation_rows(x)
        hq, hs = w8a8_mlp_fused(xq, xs, gq, gs, uq, us, block_m=bm, block_k=bk)
        return w8a8_prequant_matmul(hq, hs, dq, ds, out_dtype=x.dtype)

    def bench(fn, name):
        t0 = time.time()
        out = fn(x)
        np.asarray(out[:8])
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
        np.asarray(fn(x)[:8])
        t0 = time.time()
        for _ in range(iters):
            out = fn(x)
        np.asarray(out[:8])
        dt = (time.time() - t0) / iters * 1e3
        print(f"{name}: {dt:.2f} ms/iter", flush=True)
        return dt, out

    tb, ob = bench(baseline, "xla_w8a8_chain")
    tf, of = bench(fused, f"fused_kernel bm={bm} bk={bk}")
    rel = np.abs(np.asarray(of, np.float32) - np.asarray(ob, np.float32))
    den = np.abs(np.asarray(ob, np.float32)) + 1e-3
    print(f"delta: {tb - tf:+.2f} ms ({(tb - tf) / tb * 100:+.1f}%), "
          f"rel err p99 {np.quantile(rel / den, 0.99):.4f}")


if __name__ == "__main__":
    main()
