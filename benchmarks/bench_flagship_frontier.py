"""Flagship frontier sweep at the north-star point (512d x 100k, 32x):

  * approx_max_k recall_target sweep on the exact-scan path — the
    headline's recall/QPS frontier knob (same-process, best-of-3)
  * single-query (Q=1) device latency — the reference publishes 42 ms
    per query (PERFORMANCE_EVALUATION_LATEST.md:65)
  * Recall@5 — the reference publishes 98.50% (:63)

Usage: python benchmarks/bench_flagship_frontier.py
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


def timed(fn, *args, reps=5, best_of=3):
    @jax.jit
    def loop(*a):
        def body(i, eps):
            return fn(*a, eps) * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    _ = float(loop(*args))
    best = float("inf")
    for _i in range(best_of):
        t0 = time.time()
        _ = float(loop(*args))
        best = min(best, (time.time() - t0) / reps)
    return best


def main():
    from vector_db_tpu.index.hnsw_pq import exact_scan_search
    from vector_db_tpu.ops.distance import blocked_knn

    dim, n, nq = 512, 100_000, 1024
    gen = jax.jit(
        lambda key, shape: jax.random.normal(key, shape, jnp.float32),
        static_argnames="shape",
    )
    vj = gen(jax.random.PRNGKey(42), (n, dim))
    qj = gen(jax.random.PRNGKey(7), (nq, dim))
    jax.block_until_ready(qj)
    valid = jnp.ones(n, bool)
    norms = jnp.sum(vj * vj, axis=1)
    ids = jnp.arange(n, dtype=jnp.int32)

    gt_path = f"/tmp/gt_iso_{dim}_{n}_{nq}.npy"
    try:
        gt = np.load(gt_path)
    except OSError:
        _, gt_i = blocked_knn(qj, vj, valid, 10, block_n=65536)
        gt = np.asarray(gt_i)
        np.save(gt_path, gt)

    def rec(e, kk):
        a = np.asarray(e)[:, :kk]
        g = gt[:, :kk]
        return float(np.mean(
            [len(set(a[i].tolist()) & set(g[i].tolist())) / kk
             for i in range(a.shape[0])]
        ))

    bn = 100_096  # full-row (pads to capacity-aligned)

    # ---- recall_target sweep (k=10, batched) ------------------------------
    for rt in (0.90, 0.95, 0.97, 0.99):
        def run(q, base, v, nr, eps, _rt=rt):
            d, e = exact_scan_search(q + eps, base, nr, v, ids, 16, "l2",
                                     bn, _rt)
            return d[0, 0]

        d, e = exact_scan_search(qj, vj, norms, valid, ids, 16, "l2", bn, rt)
        dt = timed(run, qj, vj, valid, norms)
        log(f"rt={rt}: R@10={rec(e, 10):.4f}  R@5={rec(e, 5):.4f}  "
            f"{dt*1e3:.2f} ms  {nq/dt:,.0f} QPS")

    # ---- single-query device latency --------------------------------------
    q1 = qj[:1]

    def run1(q, base, v, nr, eps):
        d, e = exact_scan_search(q + eps, base, nr, v, ids, 16, "l2",
                                 bn, 0.99)
        return d[0, 0]

    d, e = exact_scan_search(q1, vj, norms, valid, ids, 16, "l2", bn, 0.99)
    dt = timed(run1, q1, vj, valid, norms)
    log(f"single query (Q=1): R@10={rec(e, 10):.4f}  {dt*1e3:.3f} ms device "
        f"latency  [reference: 42 ms]")

    # ---- bf16 full-row selection + tiny exact refine (round 4) -----------
    # The exact scan's bound at 100k is the f32 [Q, N] buffer round-trip
    # (400 MB at Q=1024); a bf16 selection buffer halves it.  The pool+
    # refine pipeline only loses to the one-call exact when the pool is
    # wide (64-row rerank gathers ~1.2-1.8 ms); a JUST-ABOVE-k pool may
    # undercut the 2.3 ms headline — this sweep measures where.
    from vector_db_tpu.index.hnsw_pq import bf16_scan_refine

    for pool in (16, 32, 64):
        def runb(q, base, v, nr, eps, _p=pool):
            d, e = bf16_scan_refine(q + eps, base, nr, v, ids, 16, "l2",
                                    _p, 0.99, block_n=0)
            return d[0, 0]

        d, e = bf16_scan_refine(qj, vj, norms, valid, ids, 16, "l2",
                                pool, 0.99, block_n=0)
        dt = timed(runb, qj, vj, valid, norms)
        log(f"bf16 full-row pool={pool}: R@10={rec(e, 10):.4f}  "
            f"{dt*1e3:.2f} ms  {nq/dt:,.0f} QPS")

    # ---- pre-masked norms: does the where(valid) cost an HBM pass? -------
    # Fold the validity mask into the norms vector ONCE (O(N) per mutation
    # epoch if productized) so the [Q, N] program is matmul + adds +
    # approx_max_k with no select.  If this beats the shipped one-call
    # (2.3 ms), the where is a real [Q, N] pass XLA fails to fuse; if
    # neutral, the mask is fused free and the remaining gap to the ~1.2 ms
    # HBM floor is the f32 buffer round-trip (the bf16 rows above).
    masked_norms = jnp.where(valid, norms, jnp.inf)

    def runm(q, base, mn, eps):
        qn2 = jnp.sum((q + eps) * (q + eps), axis=1)
        d = (qn2[:, None] + mn[None, :]
             - 2.0 * jax.lax.dot_general((q + eps), base,
                                         (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32))
        neg, idx = jax.lax.approx_max_k(-d, 16, recall_target=0.99)
        return -neg[0, 0]

    dtm = timed(runm, qj, vj, masked_norms)
    log(f"pre-masked norms one-call f32: {dtm*1e3:.2f} ms  "
        f"{nq/dtm:,.0f} QPS  (shipped one-call reference above)")

    # retime the shipped path same-process for an honest A/B anchor
    def runs(q, base, v, nr, eps):
        d, e = exact_scan_search(q + eps, base, nr, v, ids, 16, "l2",
                                 bn, 0.99)
        return d[0, 0]

    dts = timed(runs, qj, vj, valid, norms)
    log(f"shipped one-call retime: {dts*1e3:.2f} ms  {nq/dts:,.0f} QPS")


if __name__ == "__main__":
    main()
