"""Incremental graph insertion throughput (VERDICT r3 #3).

10k incremental `add_batch` calls at 512d with use_graph=True, measuring
amortized ms/vec of the deferred-insert policy (pending buffer + exact-kNN
delta flushes, ops/hnsw_graph.bulk_insert_delta) and recall parity with a
full rebuild.  Reference native: 0.484 ms/vec sequential insert
(docs/OPTIMIZATION_SUMMARY.md:59).  Target: <= 0.5 ms/vec amortized, recall
within 1pt of the rebuilt graph.

Usage: python benchmarks/bench_incremental.py [dim] [n] [batch]
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


def run_stream(vecs_np, dim, n, batch, policy, tag, flush_chunk=0):
    from vector_db_tpu.api.config import HnswConfig
    from vector_db_tpu.index.hnsw import HnswIndex

    idx = HnswIndex(dim, n, "l2", HnswConfig(
        m=32, insert_policy=policy, flush_chunk=flush_chunk))
    lats = []  # per-add_batch wall latency: the synchronous defer-flush
    # spike lands on whichever call crosses the threshold (VERDICT r4
    # weak #4) — p99/max expose it
    t0 = time.time()
    for s in range(0, n, batch):
        ta = time.time()
        idx.add_batch(range(s, s + batch), vecs_np[s:s + batch])
        lats.append(time.time() - ta)
    idx.flush_pending()
    dt = time.time() - t0
    lats_ms = 1000.0 * np.asarray(lats)
    log(f"{tag} [{policy}] {n} adds in batches of {batch}: "
        f"{dt:.1f}s = {1000 * dt / n:.3f} ms/vec  per-call latency "
        f"p50={np.percentile(lats_ms, 50):.1f} "
        f"p99={np.percentile(lats_ms, 99):.1f} "
        f"max={lats_ms.max():.1f} ms")
    return idx, dt, lats_ms


def recall_at10(idx, q_np, gt):
    ids, _ = idx.search_batch(q_np, 10)
    return float(np.mean(
        [len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10
         for i in range(len(gt))]
    ))


def main(dim=512, n=10_000, batch=100):
    dim, n, batch = int(dim), int(n), int(batch)
    gen = jax.jit(
        lambda key, shape: jax.random.normal(key, shape, jnp.float32),
        static_argnames="shape",
    )
    vj = gen(jax.random.PRNGKey(42), (n, dim))
    vecs_np = np.asarray(vj)
    qj = gen(jax.random.PRNGKey(7), (256, dim))
    q_np = np.asarray(qj)

    from vector_db_tpu.ops.distance import blocked_knn

    _, gt_i = blocked_knn(qj, vj, jnp.ones(n, bool), 10, block_n=8192)
    gt = np.asarray(gt_i)

    # cold pass populates the compile cache; warm pass is the number
    run_stream(vecs_np, dim, n, batch, "defer", "cold")
    idx, t_warm, lats_ms = run_stream(vecs_np, dim, n, batch, "defer",
                                      "warm")
    r_inc = recall_at10(idx, q_np, gt)

    # bounded flush (flush_chunk, VERDICT r4 weak #4): each triggering
    # add_batch connects at most one fixed-size chunk — the p99/max spike
    # trades against a slightly higher amortized ms/vec (more delta calls)
    run_stream(vecs_np, dim, n, batch, "defer", "cold-chunk",
               flush_chunk=512)
    idxc, t_chunk, lats_c = run_stream(vecs_np, dim, n, batch, "defer",
                                       "warm-chunk", flush_chunk=512)
    r_chunk = recall_at10(idxc, q_np, gt)
    log(f"RESULT_CHUNK chunk=512 ms_per_vec={1000 * t_chunk / n:.3f} "
        f"recall={r_chunk:.4f} "
        f"add_p50_ms={np.percentile(lats_c, 50):.1f} "
        f"add_p99_ms={np.percentile(lats_c, 99):.1f} "
        f"add_max_ms={lats_c.max():.1f}")

    # rebuilt-graph baseline (bulk exact-kNN build)
    from vector_db_tpu.api.config import HnswConfig
    from vector_db_tpu.index.hnsw import HnswIndex

    reb = HnswIndex(dim, n, "l2", HnswConfig(m=32))
    t0 = time.time()
    reb.add_batch(range(n), vecs_np)
    reb.build()
    t_reb = time.time() - t0
    r_reb = recall_at10(reb, q_np, gt)

    log(f"recall@10: incremental {r_inc:.4f} vs rebuilt {r_reb:.4f} "
        f"(delta {100 * (r_inc - r_reb):+.2f}pt)")
    log(f"RESULT incremental_ms_per_vec={1000 * t_warm / n:.3f} "
        f"recall_inc={r_inc:.4f} recall_rebuilt={r_reb:.4f} "
        f"rebuild_s={t_reb:.1f} "
        f"add_p50_ms={np.percentile(lats_ms, 50):.1f} "
        f"add_p99_ms={np.percentile(lats_ms, 99):.1f} "
        f"add_max_ms={lats_ms.max():.1f} "
        f"ref_native_ms_per_vec=0.484")


if __name__ == "__main__":
    main(*sys.argv[1:])
