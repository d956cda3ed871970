"""Small-Q latency A/B (VERDICT r3 #6).

Q=1 costs 5.0 ms at 512d x 100k through the default path — the full batch
machinery for one query (the reference's published QPS story is
single-query, PERFORMANCE_EVALUATION_LATEST.md:64).  Same-process A/B of
every candidate small-Q path, device-timed with serialized in-jit loops:

- scan_exact        : current auto default (blocked_knn_fast, one block)
- scan_bf16         : bf16 cross-term scan + exact refine
- pallas_bf16       : fused VMEM pool kernel (internal q_tile=1024)
- pallas_bf16_q32   : same kernel at q_tile=32 (no 1024-row padding waste)
- pallas_int8       : s8 x s8 fused pool (q_tile=1024)
- pallas_int8_q32   : same at q_tile=32
- graph             : HNSW beam traversal (ef=4k floor) over the raw store

Usage: python benchmarks/bench_small_q.py [dim] [n]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    # CPU smoke of the script plumbing (kernels run in interpret mode);
    # env vars alone cannot force CPU under the axon plugin (CLAUDE.md)
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")


def log(*a):
    print(*a, flush=True)


def timed(fn, q, arrays=(), reps=50, passes=3):
    """Best-of-passes serialized in-jit loop (CLAUDE.md timing protocol).

    Corpus-sized operands MUST ride ``arrays`` (explicit jit args): a
    closed-over device array becomes a captured CONSTANT, and for Pallas
    programs the remote compiler rejects the serialized payload with
    HTTP 413 (observed r5: the bf16-shadow variants at 100k x 512)."""

    @jax.jit
    def loop(qq, *arrs):
        def body(i, eps):
            d = fn(qq + eps, *arrs)
            return d.reshape(-1)[0] * 1e-30

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    _ = float(loop(q, *arrays))  # compile + warm
    best = float("inf")
    for _ in range(passes):
        t0 = time.time()
        _ = float(loop(q, *arrays))
        best = min(best, (time.time() - t0) / reps)
    return best


def main(dim=512, n=100_000):
    dim, n = int(dim), int(n)
    from vector_db_tpu.api.config import HnswConfig, HnswPqConfig
    from vector_db_tpu.index.hnsw import HnswIndex
    from vector_db_tpu.index.hnsw_pq import (HnswPqIndex, bf16_scan_refine,
                                             exact_scan_search,
                                             pallas_scan8_refine,
                                             pallas_scan_refine)
    from vector_db_tpu.ops import hnsw_graph as hg
    from vector_db_tpu.ops.distance import blocked_rerank
    from vector_db_tpu.ops.pallas_kernels import (fused_int8_pool,
                                                  fused_raw_pool)

    gen = jax.jit(
        lambda key, shape: jax.random.normal(key, shape, jnp.float32),
        static_argnames="shape",
    )
    vj = gen(jax.random.PRNGKey(42), (n, dim))
    log(f"small-Q bench {dim}d x {n}, k=10, devices={jax.devices()}")

    cfg = HnswPqConfig(num_subspaces=64, training_samples=20000)
    idx = HnswPqIndex(dim, n, "l2", cfg)
    t0 = time.time()
    idx.bulk_load(range(n), vj)
    log(f"build: {time.time() - t0:.1f}s")
    st = idx.store.state
    cap = st.capacity
    k = 16

    base16, off16, sc16, cvec16 = idx._scan16_shadow(st)
    base8, off8, sc8, cvec8 = idx._scan8_shadow(st)
    w = min(2048, cap)

    def small_pool_variant(pool_kernel, q_tile):
        """pallas_scan*_refine body with an explicit q_tile; shadow arrays
        arrive as jit args (base, shadow, off, sc, cvec)."""

        def f(q, base, shadow, off, sc, cvec):
            qc = q - cvec[None, :]
            vals, pidx = pool_kernel(qc, shadow, off, sc, w=w,
                                     q_tile=q_tile)
            nv, sel = jax.lax.approx_max_k(-vals, 64, recall_target=0.95)
            cand = jnp.take_along_axis(pidx, sel, axis=1)
            cand = jnp.where(jnp.isfinite(nv), cand, -1)
            d, _ = blocked_rerank(q, base, cand, k, "l2", rb=64)
            return d

        return f

    # (fn, corpus-sized args) — args ride the jit boundary, never closures
    paths = {
        "scan_exact": (
            lambda q, v, nr, va, ii: exact_scan_search(
                q, v, nr, va, ii, k, "l2",
                idx._f32_scan_block(cap, 8), 0.99)[0],
            (st.vectors, st.norms, st.valid, st.ids)),
        "scan_bf16": (
            lambda q, v, nr, va, ii: bf16_scan_refine(
                q, v, nr, va, ii, k, "l2", 64, 0.99, block_n=0)[0],
            (st.vectors, st.norms, st.valid, st.ids)),
        "pallas_bf16": (
            lambda q, v, b, o, s, c: pallas_scan_refine(
                q, v, b, o, s, c, st.ids, k, "l2", pool=64, w=w)[0],
            (st.vectors, base16, off16, sc16, cvec16)),
        "pallas_bf16_q32": (
            small_pool_variant(fused_raw_pool, 32),
            (st.vectors, base16, off16, sc16, cvec16)),
        "pallas_int8": (
            lambda q, v, b, o, s, c: pallas_scan8_refine(
                q, v, b, o, s, c, st.ids, k, "l2", pool=64, w=w)[0],
            (st.vectors, base8, off8, sc8, cvec8)),
        "pallas_int8_q32": (
            small_pool_variant(fused_int8_pool, 32),
            (st.vectors, base8, off8, sc8, cvec8)),
    }

    # graph traversal over the same corpus (exact distances, raw store)
    gidx = HnswIndex(dim, n, "l2", HnswConfig(m=32))
    t0 = time.time()
    gidx.add_batch(range(n), np.asarray(vj))
    gidx.build()
    log(f"graph build: {time.time() - t0:.1f}s")
    gst = gidx.store.state

    def graph_path(ef):
        def f(q, base, norms, valid):
            d, _ = hg.hnsw_search(gidx.graph, base, norms, valid, q, k, ef)
            return d

        return f

    garrs = (gst.vectors, gst.norms, gst.valid)
    paths["graph_ef64"] = (graph_path(64), garrs)
    paths["graph_ef128"] = (graph_path(128), garrs)

    results = {}
    for name, (fn, arrays) in paths.items():
        for qn in (1, 8):
            q = gen(jax.random.PRNGKey(100 + qn), (max(qn, 8), dim))
            try:
                dt = timed(fn, q, arrays)
            except Exception as e:  # noqa: BLE001
                log(f"{name} Q={qn}: FAILED {type(e).__name__}: {e}")
                continue
            results[(name, qn)] = dt
            log(f"{name:18s} Q={qn}: {dt * 1000:7.3f} ms")

    log("RESULT " + " ".join(
        f"{name}_q{qn}={dt * 1000:.3f}ms"
        for (name, qn), dt in sorted(results.items())))


if __name__ == "__main__":
    main(*sys.argv[1:])
