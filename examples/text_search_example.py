"""Text search demo across index types — the reference comparison table.

Parity with the reference's TextSearchExample.java (516 lines): 1536-dim
embeddings of a generated 1,000-phrase corpus (VECTOR_DIMENSION=1536,
DATASET_SIZE=1000, NUM_QUERIES=100 — TextSearchExample.java:28-37), indexed
under every index type, then the per-index comparison table the reference
prints (TextSearchExample.java:110-125): avg add time, rebuild time, avg
search time, Top-1/Top-3/Top-5 accuracy, memory.

Queries are noisy variants of corpus phrases (the reference queries
near-duplicate words, :82); accuracy = the target phrase retrieved.

Run: python examples/text_search_example.py [--dim 1536] [--n 1000]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vector_db_tpu import (
    HnswConfig, HnswPqConfig, IndexType, VectorDatabase,
)
from vector_db_tpu.utils import text_vectorizer as tv

SUBJECTS = [
    "machine learning", "vector databases", "nearest neighbor search",
    "product quantization", "navigable small worlds", "sensitive hashing",
    "projection forests", "coarse quantizers", "transformer embeddings",
    "semantic search", "image similarity", "recommendation engines",
    "customer clustering", "anomaly detection", "record deduplication",
    "resume matching", "query routing", "cache eviction", "graph traversal",
    "stream processing",
]
VERBS = [
    "accelerates", "compresses", "indexes", "retrieves", "ranks",
    "partitions", "deduplicates", "embeds", "shards", "quantizes",
]
OBJECTS = [
    "dense embeddings", "sparse signals", "user histories", "telemetry",
    "documents", "image features", "session logs", "product catalogs",
    "knowledge bases", "audio fingerprints",
]


def make_corpus(n: int) -> list[str]:
    """Deterministic combinatorial phrase corpus (the reference generates
    1,000 random words from a fixed character set, :66-73)."""
    out = []
    i = 0
    while len(out) < n:
        s = SUBJECTS[i % len(SUBJECTS)]
        v = VERBS[(i // len(SUBJECTS)) % len(VERBS)]
        o = OBJECTS[(i // (len(SUBJECTS) * len(VERBS))) % len(OBJECTS)]
        out.append(f"{s} {v} {o} #{i}")
        i += 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=1536)
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--queries", type=int, default=100)
    args = ap.parse_args()
    dim, n = args.dim, args.n

    print(f"corpus: {n} phrases, {dim}-dim deterministic char-hash "
          f"embeddings (reference: 1536d x 1000 words x 100 queries)")
    corpus = make_corpus(n)
    t0 = time.time()
    vecs = np.stack([tv.text_to_vector(t, dim) for t in corpus])
    print(f"vectorized in {time.time()-t0:.1f}s")

    rng = np.random.default_rng(42)
    targets = rng.integers(0, n, args.queries)
    queries = np.stack([
        tv.generate_similar_vector(vecs[t], noise=0.25, seed=1000 + i)
        for i, t in enumerate(targets)
    ])

    types = [IndexType.BRUTE, IndexType.HNSW, IndexType.IVF, IndexType.PQ,
             IndexType.LSH, IndexType.ANNOY, IndexType.HNSWPQ]
    print(f"\n{'index':8s} {'add ms/v':>9s} {'rebuild s':>10s} "
          f"{'search ms/q':>12s} {'Top-1':>7s} {'Top-3':>7s} {'Top-5':>7s} "
          f"{'memory KB':>10s}")
    print("-" * 78)
    for itype in types:
        b = (VectorDatabase.builder().with_dimension(dim)
             .with_max_elements(n * 2).with_index_type(itype)
             .with_metric("cosine"))
        if itype == IndexType.HNSW:
            b = b.with_index_config(
                HnswConfig(m=16, ef_construction=64, ef_search=64))
        if itype == IndexType.HNSWPQ:
            b = b.with_index_config(
                HnswPqConfig(num_subspaces=max(1, dim // 8),
                             training_samples=n))
        db = b.build()
        t0 = time.time()
        db.add_batch(range(n), vecs)
        t_add = (time.time() - t0) * 1000 / n
        t0 = time.time()
        db.rebuild_index()
        t_build = time.time() - t0

        db.search_batch(queries, 5)  # warm the jit
        t0 = time.time()
        res = db.search_batch(queries, 5)
        t_q = (time.time() - t0) * 1000 / len(queries)
        ids = [[r.id for r in row] for row in res]
        top1 = np.mean([targets[i] == ids[i][0] for i in range(len(ids))])
        top3 = np.mean([targets[i] in ids[i][:3] for i in range(len(ids))])
        top5 = np.mean([targets[i] in ids[i][:5] for i in range(len(ids))])
        st = db.stats()
        # memory: index structures + the vector store (the reference
        # estimates JVM memory, :255; here the stats are exact byte counts)
        mem = st.get("index_bytes", 0) + st.get(
            "store_bytes", st["capacity"] * dim * 4)
        print(f"{itype.value:8s} {t_add:9.2f} {t_build:10.1f} {t_q:12.2f} "
              f"{top1:7.0%} {top3:7.0%} {top5:7.0%} {mem/1024:10.0f}")
        db.close()

    # one detailed result set (the reference prints per-query verification)
    db = (VectorDatabase.builder().with_dimension(dim)
          .with_max_elements(n * 2)
          .with_index_type(IndexType.BRUTE).with_metric("cosine").build())
    db.add_batch(range(n), vecs)
    q = tv.generate_similar_vector(vecs[targets[0]], noise=0.25, seed=1000)
    print(f"\nquery: noisy variant of {corpus[targets[0]]!r}")
    for r in db.search(q, 3):
        print(f"  {r.similarity:6.4f}  {corpus[r.id]}")
    db.close()


if __name__ == "__main__":
    main()
