"""Same-process scan-mode A/B at a given N (raw tier), or compressed-tier
A/B with --compressed: the data auto mode needs for its crossover table.

Raw tier rows: blocked exact scan (scan_exact), bf16 fused pool
(scan_pallas), s8 fused pool (scan_pallas_int8) — all end-to-end
(pool + exact refine) with recall vs device ground truth.

Compressed tier rows: fused packed-pool kernel (scan_pallas_int8) vs the
XLA blocked int8 scan (scan_int8), both over the same packed rows; with
--residual the second int8 level is built and a residual-refine row is
measured per pool (the refine-precision ceiling removed — expect recall
near the raw exact scan's at the same kernel QPS class).

Usage: python benchmarks/bench_scan_modes.py [N] [--compressed] [--residual]
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
    from vector_db_tpu.index.hnsw_pq import (
        _build_scan16_shadow, _build_scan8_shadow, _build_scan8p_shadow,
        exact_scan_search, pallas_scan_refine, pallas_scan8_refine,
        pallas_scan8p_refine,
    )
    from vector_db_tpu.ops.distance import (
        blocked_knn, blocked_knn_int8, pack_int8_residual, pack_int8_rows,
    )

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    compressed = "--compressed" in sys.argv
    residual = "--residual" in sys.argv
    n = int(args[0]) if args else 524_288
    n -= n % 2048
    dim, nq, k = 512, 1024, 10
    gen = jax.jit(
        lambda key, shape: jax.random.normal(key, shape, jnp.float32),
        static_argnames="shape",
    )
    scale = jnp.asarray((np.arange(dim) + 1.0) ** -0.5, jnp.float32)
    vj = gen(jax.random.PRNGKey(42), (n, dim)) * scale[None, :]
    qj = gen(jax.random.PRNGKey(7), (nq, dim)) * scale[None, :]
    jax.block_until_ready(qj)
    log(f"data: {n} x {dim}  compressed={compressed}")

    gt_path = f"/tmp/gt_spectral_{dim}_{n}_{nq}_{k}.npy"
    try:
        gt = np.load(gt_path)
    except OSError:
        _, gt_i = blocked_knn(qj, vj, jnp.ones(n, bool), k, block_n=65536)
        gt = np.asarray(gt_i)
        np.save(gt_path, gt)
    gt_sets = [set(gt[i].tolist()) for i in range(nq)]
    log("ground truth ready")

    valid = jnp.ones(n, bool)
    norms = jnp.sum(vj * vj, axis=1)
    ids = jnp.arange(n, dtype=jnp.int32)
    w = 2048
    pool = 64

    def rec(e):
        a = np.asarray(e)
        return float(np.mean(
            [len(set(a[i].tolist()) & gt_sets[i]) / k for i in range(nq)]
        ))

    if compressed:
        packed, scales = pack_int8_rows(vj)
        jax.block_until_ready(packed)
        rp = rs = None
        if residual:
            rp, rs = pack_int8_residual(vj, packed, scales)
            jax.block_until_ready(rp)
            log("residual level ready")
        if "--adc" in sys.argv:
            # compressed-tier adc_fast row (codes trained on the raw chunk
            # before it dies): the auto-mode A/B vs the fused packed scan
            from vector_db_tpu.ops import adc as adc_ops
            from vector_db_tpu.ops.kmeans import subspace_kmeans_fit

            t0 = time.time()
            cb = subspace_kmeans_fit(jax.random.PRNGKey(42), vj[:20000],
                                     num_subspaces=64, k=256, iters=10)
            codes = adc_ops.pq_encode(vj, cb)
            ct = jnp.transpose(codes, (1, 0))
            cbt = adc_ops.codebooks_to_cbt(cb)
            cnorms = None  # derived in-program (code_norms_from_codes)
            jax.block_until_ready(ct)
            log(f"PQ train+encode: {time.time()-t0:.1f}s")

            def adc_run(q, ctt, cbtt, cn, p, s, nm, eps):
                d, _ = adc_ops.adc_fast_search(
                    q + eps, ctt, cbtt, valid, p, ids, k, bucket=128,
                    winners=1, pool_mode="approx", code_norms=cn,
                    select_r=512, int8_base=p, int8_scales=s,
                    int8_norms=nm)
                return d[0, 0]

            d, e = adc_ops.adc_fast_search(
                qj, ct, cbt, valid, packed, ids, k, bucket=128, winners=1,
                pool_mode="approx", code_norms=cnorms, select_r=512,
                int8_base=packed, int8_scales=scales, int8_norms=norms)
            dt = timed(adc_run, qj, ct, cbt, cnorms, packed, scales, norms)
            log(f"compressed adc_fast R=512 + int8 refine: "
                f"recall={rec(e):.4f}  {dt*1e3:.2f} ms  {nq/dt:,.0f} QPS")
        del vj  # the compressed tier has no raw matrix
        off, sc, cvec = _build_scan8p_shadow(packed, scales, norms, valid,
                                             "l2")
        jax.block_until_ready(off)
        log("packed + conditioning ready")

        for pp in (pool, 128, 256):
            def fused_run(q, p, s, nm, o, c, cv, eps, _pp=pp):
                d, _ = pallas_scan8p_refine(q + eps, p, s, nm, o, c, cv,
                                            ids, k, "l2", pool=_pp, w=w)
                return d[0, 0]

            d, e = pallas_scan8p_refine(qj, packed, scales, norms, off, sc,
                                        cvec, ids, k, "l2", pool=pp, w=w)
            dt = timed(fused_run, qj, packed, scales, norms, off, sc, cvec)
            log(f"fused packed-pool e2e pool={pp}: recall={rec(e):.4f}  "
                f"{dt*1e3:.2f} ms  {nq/dt:,.0f} QPS")
            if residual:
                def fused_res(q, p, s, nm, o, c, cv, rpp, rss, eps, _pp=pp):
                    d, _ = pallas_scan8p_refine(
                        q + eps, p, s, nm, o, c, cv, ids, k, "l2",
                        pool=_pp, w=w, resid=rpp, rscales=rss)
                    return d[0, 0]

                d, e = pallas_scan8p_refine(
                    qj, packed, scales, norms, off, sc, cvec, ids, k, "l2",
                    pool=pp, w=w, resid=rp, rscales=rs)
                dt = timed(fused_res, qj, packed, scales, norms, off, sc,
                           cvec, rp, rs)
                log(f"fused packed-pool +residual pool={pp}: "
                    f"recall={rec(e):.4f}  {dt*1e3:.2f} ms  "
                    f"{nq/dt:,.0f} QPS")

        def xla_run(q, p, s, v, nr, eps):
            d, _ = blocked_knn_int8(q + eps, p, s, v, k, b_norms=nr,
                                    block_n=131072, recall_target=0.95)
            return d[0, 0]

        d, i = blocked_knn_int8(qj, packed, scales, valid, k, b_norms=norms,
                                block_n=131072, recall_target=0.95)
        dt = timed(xla_run, qj, packed, scales, valid, norms)
        log(f"xla scan_int8: recall={rec(i):.4f}  {dt*1e3:.2f} ms  "
            f"{nq/dt:,.0f} QPS")
        return

    # ---- raw tier: exact vs bf16 pallas vs int8 pallas --------------------
    def exact_run(q, base, v, nr, eps):
        d, _ = exact_scan_search(q + eps, base, nr, v, ids, k, "l2",
                                 min(262144, n), 0.99)
        return d[0, 0]

    d, e = exact_scan_search(qj, vj, norms, valid, ids, k, "l2",
                             min(262144, n), 0.99)
    dt = timed(exact_run, qj, vj, valid, norms)
    log(f"scan_exact e2e: recall={rec(e):.4f}  {dt*1e3:.2f} ms  "
        f"{nq/dt:,.0f} QPS")

    b16, off16, sc16, cv16, _aux16 = _build_scan16_shadow(vj, norms, valid,
                                                          "l2", w)
    jax.block_until_ready(b16)

    def bf16_run(q, base, b, o, s, c, eps):
        d, _ = pallas_scan_refine(q + eps, base, b, o, s, c, ids, k, "l2",
                                  pool=pool, w=w)
        return d[0, 0]

    d, e = pallas_scan_refine(qj, vj, b16, off16, sc16, cv16, ids, k, "l2",
                              pool=pool, w=w)
    dt = timed(bf16_run, qj, vj, b16, off16, sc16, cv16)
    log(f"scan_pallas e2e: recall={rec(e):.4f}  {dt*1e3:.2f} ms  "
        f"{nq/dt:,.0f} QPS")
    del b16, off16, sc16

    b8, off8, sc8, cv8, _aux8 = _build_scan8_shadow(vj, norms, valid,
                                                    "l2", w)
    jax.block_until_ready(b8)

    def int8_run(q, base, b, o, s, c, eps):
        d, _ = pallas_scan8_refine(q + eps, base, b, o, s, c, ids, k, "l2",
                                   pool=pool, w=w)
        return d[0, 0]

    d, e = pallas_scan8_refine(qj, vj, b8, off8, sc8, cv8, ids, k, "l2",
                               pool=pool, w=w)
    dt = timed(int8_run, qj, vj, b8, off8, sc8, cv8)
    log(f"scan_pallas_int8 e2e: recall={rec(e):.4f}  {dt*1e3:.2f} ms  "
        f"{nq/dt:,.0f} QPS")


if __name__ == "__main__":
    from tpu_guard import wait_for_backend

    # probe-first (CLAUDE.md wedge protocol): never hang in PJRT init
    if not wait_for_backend():
        sys.exit(1)
    main()
