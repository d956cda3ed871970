"""Per-index CRUD + performance comparison demo.

Parity with the reference's VectorDatabaseExample.java (328 lines): build a
database per index type, exercise add/get/delete/search, and print a
side-by-side table of build time / search latency / Recall@10 vs brute force.

Run: python examples/vector_database_example.py [--n 10000] [--dim 128]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vector_db_tpu import (
    AnnoyConfig,
    HnswConfig,
    HnswPqConfig,
    IndexType,
    IvfConfig,
    LshConfig,
    PqConfig,
    VectorDatabase,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    rng = np.random.default_rng(42)
    # power-law eigenspectrum — realistic embedding structure (isotropic
    # noise is the quantizers' information-theoretic worst case and no
    # real workload; see BENCH_REPORT A4)
    scale = ((np.arange(args.dim) + 1.0) ** -0.5).astype(np.float32)
    vecs = (rng.standard_normal((args.n, args.dim)) * scale
            ).astype(np.float32)
    queries = (rng.standard_normal((args.queries, args.dim)) * scale
               ).astype(np.float32)

    # ground truth
    gt = (VectorDatabase.builder().with_dimension(args.dim)
          .with_max_elements(args.n).with_index_type(IndexType.BRUTE).build())
    gt.add_batch(range(args.n), vecs)
    gt_res = gt.search_batch(queries, args.k)
    gt_sets = [{r.id for r in row} for row in gt_res]

    configs = [
        (IndexType.BRUTE, None),
        (IndexType.HNSW, HnswConfig(m=16, ef_construction=64, ef_search=64)),
        (IndexType.HNSWPQ, HnswPqConfig(num_subspaces=max(4, args.dim // 8))),
        (IndexType.IVF, IvfConfig()),
        # PQ at the reference's published comparison point (16x: dim/4
        # subspaces — README.md:225-232 reports 82% there; the 8-subspace
        # default would be 64x at 128d, a 4x coarser quantizer)
        (IndexType.PQ, PqConfig(num_subspaces=max(8, args.dim // 4))),
        (IndexType.LSH, LshConfig()),
        (IndexType.ANNOY, AnnoyConfig()),
    ]

    print(f"\n{'index':8s} {'build s':>8s} {'QPS':>9s} {'ms/query':>9s} "
          f"{'Recall@10':>10s} {'memory MB':>10s}")
    print("-" * 62)
    for itype, cfg in configs:
        b = (VectorDatabase.builder().with_dimension(args.dim)
             .with_max_elements(args.n).with_index_type(itype))
        if cfg is not None:
            b = b.with_index_config(cfg)
        db = b.build()

        t0 = time.time()
        db.add_batch(range(args.n), vecs)
        db.rebuild_index()
        t_build = time.time() - t0

        db.search_batch(queries, args.k)  # warm the jit cache
        t0 = time.time()
        res = db.search_batch(queries, args.k)
        dt = time.time() - t0

        recall = np.mean(
            [len({r.id for r in res[i]} & gt_sets[i]) / args.k
             for i in range(args.queries)]
        )
        st = db.stats()
        mem = (st.get("index_bytes", 0)
               + st.get("store_bytes", st["capacity"] * args.dim * 4)) / 1e6
        print(f"{itype.value:8s} {t_build:8.1f} {args.queries/dt:9.0f} "
              f"{dt*1000/args.queries:9.2f} {recall:10.1%} {mem:10.1f}")

        # CRUD smoke (reference walks the same sequence)
        assert db.add_vector(10**6, vecs[0])
        assert db.get_vector(10**6) is not None
        assert db.delete_vector(10**6)
        db.close()

    print("\ndone.")


if __name__ == "__main__":
    main()
