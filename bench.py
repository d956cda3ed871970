"""Flagship benchmark — prints ONE JSON line for the driver.

Config mirrors BASELINE.json's north star: HNSW+PQ flagship at 512-dim x
100k vectors, 32x compression (64 subspaces x 8 bits), k=10, seed 42.
Measures Recall@10 against the on-device brute-force ground truth and
batched device-side QPS of the flagship's default (auto) search path.

Baseline: the reference's published 2,391 QPS / 97.60% Recall@10 at 512-dim
(PERFORMANCE_EVALUATION_LATEST.md:62-64; BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    sys.path.insert(0, ".")
    from vector_db_tpu.api.config import HnswPqConfig
    from vector_db_tpu.index.hnsw_pq import HnswPqIndex, exact_scan_search
    from vector_db_tpu.ops.distance import blocked_knn

    dim, n, nq, k = 512, 100_000, 1024, 10
    log(f"bench: flagship HNSWPQ {dim}d x {n} vectors, 32x, k={k}, "
        f"devices={jax.devices()}")
    # generate the corpus ON DEVICE: transferring 200 MB through the TPU
    # tunnel costs ~10 minutes; generating it costs milliseconds
    t0 = time.time()
    gen = jax.jit(
        lambda key, shape: jax.random.normal(key, shape, jnp.float32),
        static_argnames="shape",
    )
    vj = gen(jax.random.PRNGKey(42), (n, dim))
    qj = gen(jax.random.PRNGKey(7), (nq, dim))
    jax.block_until_ready(qj)
    log(f"data gen (on device): {time.time()-t0:.1f}s")

    # ground truth (exact, on device; cached on disk — it is a pure
    # function of the fixed seeds/shapes)
    t0 = time.time()
    gt_path = f"/tmp/bench_gt_gaussian_{dim}_{n}_{nq}_{k}.npy"
    try:
        gt_i = np.load(gt_path)
    except Exception:  # missing OR truncated (a killed run
        # leaves a partial .npy; never block the JSON line on it)
        _, gi = blocked_knn(qj, vj, jnp.ones(n, bool), k, block_n=16384)
        gt_i = np.asarray(gi)
        np.save(gt_path + '.tmp.npy', gt_i)
        os.replace(gt_path + '.tmp.npy', gt_path)
    gt_sets = [set(gt_i[i].tolist()) for i in range(nq)]
    log(f"ground truth: {time.time()-t0:.1f}s")

    # build the flagship index (zero-copy ingest, PQ train + encode on device)
    cfg = HnswPqConfig(num_subspaces=64, training_samples=20000)
    idx = HnswPqIndex(dim, n, "l2", cfg)
    t0 = time.time()
    idx.bulk_load(range(n), vj)
    t_build = time.time() - t0
    log(f"build (ingest+train+encode): {t_build:.1f}s  trained={idx.trained}  "
        f"ratio={idx.stats()['compression_ratio']}x")

    # recall through the public API
    ids, _ = idx.search_batch(np.asarray(qj), k)
    recall = float(np.mean(
        [len(set(ids[i].tolist()) & gt_sets[i]) / k for i in range(nq)]
    ))
    log(f"Recall@10: {recall:.4f}")

    # batched device-side QPS of the flagship search program.  The timing
    # loop runs INSIDE one jit (each iteration data-depends on the previous)
    # because the tunneled runtime's async dispatch makes host-side rep loops
    # under-measure; a single final scalar materialisation closes the chain.
    st = idx.store.state
    # reps amortize the CALIBRATED ~26-28 ms per-dispatch tunnel floor
    # (benchmarks/probe_harness_floor.py: zero per-rep cost, pure
    # dispatch+fetch): at reps=30 a 2.3 ms program reads ~+0.9 ms
    # (+39%); reps=120 bounds the artifact at ~0.23 ms
    reps = 120
    # the same Q/capacity-aware block the shipped search path picks (FEW BIG
    # blocks: per-block approx_max_k fixed costs dominate small blocks)
    blk = idx._f32_scan_block(n, nq)

    @jax.jit
    def timed_loop(q):
        def body(i, eps):
            d, _ = exact_scan_search(
                q + eps, st.vectors, st.norms, st.valid, st.ids, 16, "l2",
                blk, cfg.scan_recall_target,
            )
            return d[0, 0] * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    def best_of(loop_fn, arg, passes=3):
        """Best of several timed passes (each = `reps` serialized in-jit
        iterations): the tunneled runtime's per-process clock/host jitter is
        ±10-20%; the minimum is the honest device number."""
        _ = float(loop_fn(arg))  # compile + warm
        best = float("inf")
        for _i in range(passes):
            t0 = time.time()
            _ = float(loop_fn(arg))
            best = min(best, (time.time() - t0) / reps)
        return best

    dt = best_of(timed_loop, qj)
    qps = nq / dt
    log(f"device QPS: {qps:.0f}  ({dt*1000:.2f} ms / {nq}-query batch, "
        f"{reps} serialized reps in one program)")

    # single-query latency through the production program (VERDICT r4 #3):
    # search_batch pads Q=1 to 8 (pad_queries_pow2 min_q=8) and picks the
    # small-batch block via _f32_scan_block — this times exactly that
    # program (reference single-query story: 2,391 QPS / 42 ms at 1/10th
    # the corpus, PERFORMANCE_EVALUATION_LATEST.md:64-65)
    blk1 = idx._f32_scan_block(n, 8)

    @jax.jit
    def q1_loop(q):
        def body(i, eps):
            d, _ = exact_scan_search(
                q + eps, st.vectors, st.norms, st.valid, st.ids, 16, "l2",
                blk1, cfg.scan_recall_target,
            )
            return d[0, 0] * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    dt1 = best_of(q1_loop, qj[:8])
    log(f"Q=1 device latency: {dt1*1000:.3f} ms (production small-Q path)")

    # ---- memory-bound mode (candidate scoring reads ONLY codes+codebooks) --
    # Corpus: power-law eigenspectrum (what real embedding models emit; PQ at
    # 32x on isotropic noise is information-theoretically recall-capped — see
    # BENCH_REPORT appendix A4 for the gaussian worst-case frontier).
    from vector_db_tpu.ops import adc as adc_ops
    from vector_db_tpu.ops.distance import pack_bf16_rows

    scale = jnp.asarray((np.arange(dim) + 1.0) ** -0.5, jnp.float32)
    vj2 = gen(jax.random.PRNGKey(42), (n, dim)) * scale[None, :]
    qj2 = gen(jax.random.PRNGKey(7), (nq, dim)) * scale[None, :]
    t0 = time.time()
    gt2_path = f"/tmp/bench_gt_spectral_{dim}_{n}_{nq}_{k}.npy"
    try:
        gt2 = np.load(gt2_path)
    except Exception:  # see above
        _, g2 = blocked_knn(qj2, vj2, jnp.ones(n, bool), k, block_n=16384)
        gt2 = np.asarray(g2)
        np.save(gt2_path + '.tmp.npy', gt2)
        os.replace(gt2_path + '.tmp.npy', gt2_path)
    gt2_sets = [set(gt2[i].tolist()) for i in range(nq)]
    log(f"memory-bound ground truth: {time.time()-t0:.1f}s")
    cfg2 = HnswPqConfig(num_subspaces=64, training_samples=20000,
                        search_mode="adc_fast", adc_pool="approx",
                        adc_select_r=128, refine_store="bf16")
    idx2 = HnswPqIndex(dim, n, "l2", cfg2)
    t0 = time.time()
    idx2.bulk_load(range(n), vj2)
    log(f"memory-bound build: {time.time()-t0:.1f}s")
    ids2, _ = idx2.search_batch(np.asarray(qj2), k)
    recall2 = float(np.mean(
        [len(set(ids2[i].tolist()) & gt2_sets[i]) / k for i in range(nq)]
    ))
    log(f"memory-bound Recall@10: {recall2:.4f}")
    st2 = idx2.store.state
    ct2, cbt2, cnorms2 = idx2._fast_tables()
    packed2 = pack_bf16_rows(st2.vectors)

    @jax.jit
    def mb_loop(q):
        def body(i, eps):
            d, _ = adc_ops.adc_fast_search(
                q + eps, ct2, cbt2, st2.valid, st2.vectors, st2.ids, 16,
                bucket=cfg2.adc_bucket, winners=1, pool_mode="approx",
                code_norms=cnorms2, perm=idx2.perm, packed_base=packed2,
                select_r=128)
            return d[0, 0] * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    dt2 = best_of(mb_loop, qj2)
    qps2 = nq / dt2
    log(f"memory-bound device QPS: {qps2:.0f}  ({dt2*1000:.2f} ms / "
        f"{nq}-query batch)")

    baseline_qps = 2391.0  # reference flagship single-chip QPS
    print(json.dumps({
        "metric": "hnswpq_flagship_batched_qps_512d_100k_k10",
        "value": round(qps, 1),
        "unit": "QPS",
        "vs_baseline": round(qps / baseline_qps, 2),
        "recall_at_10": round(recall, 4),
        "baseline_recall_at_10": 0.976,
        "build_seconds": round(t_build, 1),
        # single-query (Q=1) device latency through the production
        # small-Q path; reference: 42 ms at 1/10th the corpus
        "q1_latency_ms": round(dt1 * 1000, 3),
        # memory-bound mode: candidate scoring reads only codes + codebooks
        # (raw rows touched only in the top-128 exact refine), power-law
        # corpus, same 512d x 100k x 32x shapes
        "adc_fast_qps": round(qps2, 1),
        "adc_fast_recall_at_10": round(recall2, 4),
        "adc_fast_vs_baseline": round(qps2 / baseline_qps, 2),
    }))


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        # Wedge-proof outer harness (VERDICT r3 #1): the axon tunnel can
        # hang INSIDE PJRT init, so the driver-invoked process must never
        # touch the backend itself.  Probe in a subprocess, run the real
        # bench as `bench.py --inner`, retry once across a fresh probe,
        # and degrade to a stale-marked last-good capture instead of rc=1.
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from benchmarks.tpu_guard import run_guarded

        here = os.path.dirname(os.path.abspath(__file__))
        sys.exit(run_guarded(
            [sys.executable, "-u", os.path.abspath(__file__), "--inner"],
            cache_path=os.path.join(here, "BENCH_LAST_GOOD.json"),
            cwd=here,
        ))
