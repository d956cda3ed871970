"""CI benchmark report — small CPU-backend sweep, markdown output.

The analog of the reference's `benchmark-report` CI job
(reference: .github/workflows/native-build.yml `performance-test` +
`benchmark-report` jobs, which run `mvn test -Pbenchmark` and publish a
markdown summary).  Real performance numbers come from TPU hardware via
bench.py / benchmarks/full_bench.py; this job tracks functional recall and
relative timing regressions on the CPU backend so every PR gets a report.

Usage: python benchmarks/ci_bench.py [out.md]
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402


def main(out_path="BENCH_CI.md"):
    sys.path.insert(0, ".")
    from vector_db_tpu.api.database import VectorDatabase
    from vector_db_tpu.ops.distance import blocked_knn
    import jax.numpy as jnp

    dim, n, nq, k = 64, 2000, 32, 10
    rng = np.random.default_rng(42)
    data = rng.normal(size=(n, dim)).astype(np.float32)
    queries = rng.normal(size=(nq, dim)).astype(np.float32)

    gt_d, gt_i = blocked_knn(
        jnp.asarray(queries), jnp.asarray(data), jnp.ones(n, bool), k,
        block_n=1024,
    )
    gt = [set(np.asarray(gt_i)[i].tolist()) for i in range(nq)]

    rows = []
    for kind in ("brute", "hnsw", "hnswpq", "ivf", "pq", "lsh", "annoy"):
        b = (VectorDatabase.builder()
             .with_dimension(dim).with_max_elements(n)
             .with_index_type(kind))
        if kind == "pq":
            # pure-ADC ranking at 8 bytes/vec on random data needs the exact
            # refine stage to be comparable with the reference's 82% row
            from vector_db_tpu.api.config import PqConfig
            b = b.with_index_config(PqConfig(refine_k=64))
        db = b.build()
        t0 = time.time()
        db.add_batch(list(range(n)), data)
        db.rebuild_index()
        t_build = time.time() - t0
        t0 = time.time()
        results = db.search_batch(queries, k)
        t_search = time.time() - t0
        # external ids == slots here (ids 0..n-1 inserted in order)
        recall = float(np.mean(
            [len({r.id for r in results[i]} & gt[i]) / k for i in range(nq)]
        ))
        rows.append((kind, t_build, t_search * 1000 / nq, recall))
        db.close()

    lines = [
        "# CI benchmark report (CPU backend, 64d x 2000, k=10)",
        "",
        "Functional recall / regression tracking only — TPU numbers live in "
        "BENCH_REPORT.md.",
        "",
        "| index | build (s) | search (ms/q) | Recall@10 |",
        "|---|---|---|---|",
    ]
    for kind, tb, ts, rec in rows:
        lines.append(f"| {kind} | {tb:.2f} | {ts:.2f} | {rec:.3f} |")
    md = "\n".join(lines) + "\n"
    with open(out_path, "w") as f:
        f.write(md)
    print(md)
    # regression floors (reference README.md:225-232 proportions)
    floors = {"brute": 1.0, "hnsw": 0.9, "hnswpq": 0.9, "ivf": 0.8,
              "pq": 0.75, "lsh": 0.7, "annoy": 0.8}
    bad = [(kind, rec) for kind, _, _, rec in rows if rec < floors[kind]]
    if bad:
        print(f"RECALL REGRESSION: {bad}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main(*sys.argv[1:])
