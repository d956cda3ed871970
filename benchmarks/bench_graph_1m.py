"""Graph-mode vs scan at 1M x 512 — settles the 'graph is the large-N path'
question (round-2 VERDICT weak #5) with a measurement.

Builds the flagship index at 1M x 512 WITH the HNSW graph (bulk exact-kNN
construction), then measures Recall@10 + QPS for:
  * graph traversal (ADC beam + exact refine, use_graph path)
  * the blocked exact scan (auto)
  * adc_fast (codes + refine)

Run: python benchmarks/bench_graph_1m.py [--n 1000000]
"""

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")

DIM, NQ, K = 512, 1024, 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()
    n = args.n

    from vector_db_tpu.api.config import HnswPqConfig
    from vector_db_tpu.index.hnsw_pq import HnswPqIndex
    from vector_db_tpu.ops.distance import blocked_knn_fast

    gen = jax.jit(
        lambda k_, shape: jax.random.normal(k_, shape, jnp.float32),
        static_argnames="shape",
    )
    vj = gen(jax.random.PRNGKey(42), (n, DIM))
    qj = gen(jax.random.PRNGKey(7), (NQ, DIM))

    # ground truth (exact blocked reduction)
    _, gt_i = blocked_knn_fast(qj, vj, jnp.ones(n, bool), K,
                               recall_target=1.0, block_n=32768)
    gt = np.asarray(gt_i)
    gt_sets = [set(gt[i].tolist()) for i in range(NQ)]

    cfg = HnswPqConfig(num_subspaces=64, training_samples=20000,
                       use_graph=True, ef_search=256, refine_k=1024)
    idx = HnswPqIndex(DIM, n, "l2", cfg)
    t0 = time.time()
    idx.bulk_load(range(n), vj)
    print(f"build (ingest+train+encode+GRAPH bulk-build): "
          f"{time.time()-t0:.1f}s", flush=True)

    q_np = np.asarray(qj)

    def run(mode, reps=3, nq=NQ):
        # graph mode at 1M carries [Q, cap] visited masks + beam state;
        # cap its batch to stay inside HBM alongside the 2 GB corpus
        idx.config.search_mode = mode
        qs = q_np[:nq]
        try:
            idx.search_batch(qs[:256], K)  # warm/compile at a smaller Q
            t0 = time.time()
            ids, _ = idx.search_batch(qs, K)
            t0 = time.time()
            for _ in range(reps):
                ids, _ = idx.search_batch(qs, K)
            dt = (time.time() - t0) / reps
        except Exception as e:  # record and keep going — one mode failing
            # must not lose the others' measurements
            print(f"{mode:10s} FAILED: {type(e).__name__}: {e}", flush=True)
            return None
        rec = float(np.mean(
            [len(set(ids[i].tolist()) & gt_sets[i]) / K for i in range(nq)]
        ))
        print(f"{mode:10s} recall@10={rec:.4f}  {dt*1e3:.1f} ms/batch  "
              f"{nq/dt:,.0f} QPS (api)  [Q={nq}]", flush=True)
        return rec, nq / dt

    run("scan_exact")
    run("adc_fast")
    run("graph", nq=256)


if __name__ == "__main__":
    main()
