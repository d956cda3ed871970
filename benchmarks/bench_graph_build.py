"""Warm HNSW graph build time at the reference's config (VERDICT #8).

512d x 10k, m=32 bulk exact-kNN construction.  The round-1 report showed
73.6 s, dominated by one-time remote compilation; this measures the warm
number (compile cache populated by the first build) plus recall through the
graph path.  Reference Java: 2.6 s at 128d (README.md:225-232).

Usage: python benchmarks/bench_graph_build.py [dim] [n]
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


def build_once(vecs_np, dim, n, tag):
    from vector_db_tpu.api.config import HnswConfig
    from vector_db_tpu.index.hnsw import HnswIndex

    idx = HnswIndex(dim, n, "l2", HnswConfig(m=32))
    t0 = time.time()
    idx.add_batch(range(n), vecs_np)
    idx.build()
    dt = time.time() - t0
    log(f"{tag} build ({dim}d x {n}): {dt:.1f}s")
    return idx, dt


def main(dim=512, n=10_000):
    dim, n = int(dim), int(n)
    gen = jax.jit(
        lambda key, shape: jax.random.normal(key, shape, jnp.float32),
        static_argnames="shape",
    )
    vj = gen(jax.random.PRNGKey(42), (n, dim))
    vecs_np = np.asarray(vj)
    qj = gen(jax.random.PRNGKey(7), (256, dim))
    q_np = np.asarray(qj)

    from vector_db_tpu.ops.distance import blocked_knn

    gt_d, gt_i = blocked_knn(qj, vj, jnp.ones(n, bool), 10, block_n=8192)
    gt = np.asarray(gt_i)

    idx, t_cold = build_once(vecs_np, dim, n, "cold")
    idx2, t_warm = build_once(vecs_np, dim, n, "warm")

    ids, _ = idx2.search_batch(q_np, 10)
    recall = float(np.mean(
        [len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10
         for i in range(256)]
    ))
    log(f"graph-path Recall@10 at defaults: {recall:.4f}")
    log(f"RESULT cold={t_cold:.1f}s warm={t_warm:.1f}s recall={recall:.4f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
