"""Dimension sweep at the reference's config (10k vectors, k=10).

Mirrors the reference's published table (PERFORMANCE_EVALUATION_LATEST.md:
72-78 — 98.5%/12ms @128d(16x), 97.8%/25ms @256d, 97.6%/42ms @512d,
96.2%/58ms @768d, 95.1%/76ms @1024d).  Per dim: the flagship auto scan and
the memory-bound adc_fast mode (the row comparable to the reference's
PQ-recall semantics).  Spectral corpus, Q=1024.

Usage: python benchmarks/bench_dims.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")


def log(*a):
    print(*a, flush=True)


def timed_loop(fn, *args, reps=20):
    # args are jit ARGUMENTS, never closures — closed-over device arrays
    # become captured constants shipped to the remote compiler (CLAUDE.md)
    @jax.jit
    def loop(*a):
        def body(i, eps):
            return fn(*a, eps) * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    _ = float(loop(*args))
    t0 = time.time()
    _ = float(loop(*args))
    return (time.time() - t0) / reps


def main():
    from vector_db_tpu.api.config import HnswPqConfig
    from vector_db_tpu.index.hnsw_pq import HnswPqIndex, exact_scan_search
    from vector_db_tpu.ops import adc as adc_ops
    from vector_db_tpu.ops.distance import blocked_knn, pack_bf16_rows

    n, nq, k = 10_000, 1024, 10
    gen = jax.jit(
        lambda key, shape: jax.random.normal(key, shape, jnp.float32),
        static_argnames="shape",
    )
    ref = {128: "98.5%/12ms", 256: "97.8%/25ms", 512: "97.6%/42ms",
           768: "96.2%/58ms", 1024: "95.1%/76ms"}
    for dim in (128, 256, 512, 768, 1024):
        # reference uses 16x at 128d, 32x elsewhere
        sub = dim // 4 if dim == 128 else dim // 8
        scale = jnp.asarray((np.arange(dim) + 1.0) ** -0.5, jnp.float32)
        vj = gen(jax.random.PRNGKey(42), (n, dim)) * scale[None, :]
        qj = gen(jax.random.PRNGKey(7), (nq, dim)) * scale[None, :]
        _, gt_i = blocked_knn(qj, vj, jnp.ones(n, bool), k, block_n=8192)
        gt = np.asarray(gt_i)
        gt_sets = [set(gt[i].tolist()) for i in range(nq)]

        cfg = HnswPqConfig(num_subspaces=sub, training_samples=n,
                           search_mode="adc_fast", adc_pool="approx",
                           adc_select_r=128, refine_store="bf16")
        idx = HnswPqIndex(dim, n, "l2", cfg)
        t0 = time.time()
        idx.bulk_load(range(n), vj)
        t_build = time.time() - t0

        def rec(ids):
            a = np.asarray(ids)
            return float(np.mean(
                [len(set(a[i].tolist()) & gt_sets[i]) / k
                 for i in range(nq)]))

        st = idx.store.state
        ids_scan, _ = idx.search_batch(np.asarray(qj), k)
        r_adc = rec(ids_scan)
        ct, cbt, cnorms = idx._fast_tables()
        packed = pack_bf16_rows(st.vectors)

        def mb(q, ct_, cbt_, base_, cn_, pk_, eps):
            d, _ = adc_ops.adc_fast_search(
                q + eps, ct_, cbt_, st.valid, base_, st.ids, k,
                bucket=32, winners=1, pool_mode="approx", code_norms=cn_,
                perm=idx.perm, packed_base=pk_, select_r=128)
            return d[0, 0]
        dt_adc = timed_loop(mb, qj, ct, cbt, st.vectors, cnorms, packed)

        def scan(q, base_, eps):
            d, _ = exact_scan_search(q + eps, base_, st.norms, st.valid,
                                     st.ids, 16, "l2", 16384, 0.99)
            return d[0, 0]
        dt_scan = timed_loop(scan, qj, st.vectors)
        ratio = 4.0 * dim / sub
        log(f"dim={dim:5d} ({ratio:.0f}x): build {t_build:5.1f}s | "
            f"adc_fast recall {r_adc:.1%} {nq/dt_adc:8,.0f} QPS | "
            f"exact scan {nq/dt_scan:8,.0f} QPS | "
            f"[reference: {ref[dim]}]")


if __name__ == "__main__":
    main()
