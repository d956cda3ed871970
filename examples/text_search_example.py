"""Text search demo across index types.

Parity with the reference's TextSearchExample.java (516 lines): embed a
corpus of phrases with the deterministic TextVectorizer, index them under
several index types, then run similarity queries and report Top-3 / Top-5
accuracy per index.

Run: python examples/text_search_example.py [--dim 1536]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from vector_db_tpu import HnswConfig, IndexType, VectorDatabase
from vector_db_tpu.utils import text_vectorizer as tv

CORPUS = [
    "machine learning on accelerators",
    "vector databases for retrieval",
    "approximate nearest neighbor search",
    "product quantization compresses embeddings",
    "hierarchical navigable small worlds",
    "locality sensitive hashing buckets",
    "random projection forests",
    "inverted file coarse quantizers",
    "transformer embeddings of documents",
    "semantic search over paragraphs",
    "image similarity with deep features",
    "recommendation by nearest users",
    "clustering customers by behaviour",
    "anomaly detection in telemetry",
    "deduplicating near-identical records",
    "matching resumes to job postings",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=1536)
    args = ap.parse_args()
    dim = args.dim

    vecs = np.stack([tv.text_to_vector(t, dim) for t in CORPUS])
    queries = [
        ("machine learning on accelerator", 0),   # one-char edit of doc 0
        ("vector database for retrieval", 1),
        ("approximate nearest neighbour search", 2),
        ("semantic search over paragraph", 9),
    ]

    for itype in (IndexType.BRUTE, IndexType.HNSW, IndexType.LSH, IndexType.ANNOY):
        b = (VectorDatabase.builder().with_dimension(dim)
             .with_max_elements(len(CORPUS) * 2).with_index_type(itype)
             .with_metric("cosine"))
        if itype == IndexType.HNSW:
            b = b.with_index_config(HnswConfig(m=8, ef_construction=32, ef_search=32))
        db = b.build()
        db.add_batch(range(len(CORPUS)), vecs)
        db.rebuild_index()

        top3 = top5 = 0
        for text, want in queries:
            q = tv.text_to_vector(text, dim)
            res = db.search(q, 5)
            ids = [r.id for r in res]
            top3 += want in ids[:3]
            top5 += want in ids[:5]
        print(f"{itype.value:8s} Top-3 {top3}/{len(queries)}  Top-5 {top5}/{len(queries)}")
        db.close()

    # show one result set in detail
    db = (VectorDatabase.builder().with_dimension(dim)
          .with_max_elements(len(CORPUS) * 2)
          .with_index_type(IndexType.BRUTE).with_metric("cosine").build())
    db.add_batch(range(len(CORPUS)), vecs)
    q = tv.text_to_vector("machine learning on accelerator", dim)
    print("\nquery: 'machine learning on accelerator'")
    for r in db.search(q, 3):
        print(f"  {r.similarity:6.4f}  {CORPUS[r.id]}")
    db.close()


if __name__ == "__main__":
    main()
