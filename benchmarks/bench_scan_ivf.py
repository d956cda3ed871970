"""Same-process A/B: cluster-pruned fused scan (scan_ivf) vs the
exhaustive fused packed-pool scan, on the compressed (packed int8) tier.

The exhaustive kernels run at ~93% of their own MXU+HBM floor
(BENCH_REPORT §MFU) — the next multiple must come from reading LESS.
scan_ivf prunes the work to the probed clusters (ops/ivf_scan): its MXU
work ratio vs the exhaustive scan is ~ Q / (1.3 * p_cap)
= nlist / (5.2 * nprobe) at the auto p_cap, so the win grows with
nlist.  This bench sweeps (nlist, nprobe) and reports the e2e
recall/QPS frontier next to the exhaustive baseline, plus the Q=1
latency row (where scan_ivf also READS only nprobe clusters).

Reference analog: IVFIndex nprobe sweeps
(native/index/IVFIndex.cpp:120-210); the reference has no fused
partition-scan — its IVF gathers ragged member lists per probe.

Usage: python benchmarks/bench_scan_ivf.py [N] [--nlist X[,Y..]]
           [--nprobe A[,B..]] [--residual] [--raw] [--q1] [--cpu]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
else:
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


def opt(name, default):
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return [int(x) for x in a.split("=", 1)[1].split(",")]
    return default


def main():
    from vector_db_tpu.index.base import pow2
    from vector_db_tpu.index.hnsw_pq import (
        _build_scan8_shadow, _build_scan8p_shadow, _gather_ivf_cm,
        _pack_rows_i8, pallas_ivf_refine_packed, pallas_ivf_refine_raw,
        pallas_scan8p_refine,
    )
    from vector_db_tpu.ops import ivf_scan
    from vector_db_tpu.ops.distance import (
        blocked_knn, pack_int8_residual, pack_int8_rows,
    )
    from vector_db_tpu.ops.kmeans import kmeans_fit
    from vector_db_tpu.ops.pallas_kernels import IVF_PW, LANES

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    residual = "--residual" in sys.argv
    raw = "--raw" in sys.argv
    n = int(args[0]) if args else 1_048_576
    n -= n % 2048
    dim, nq, k = 512, 1024, 10
    winners = 4
    cap_max = (IVF_PW // winners) * LANES

    gen = jax.jit(
        lambda key, shape: jax.random.normal(key, shape, jnp.float32),
        static_argnames="shape",
    )
    scale = jnp.asarray((np.arange(dim) + 1.0) ** -0.5, jnp.float32)
    vj = gen(jax.random.PRNGKey(42), (n, dim)) * scale[None, :]
    qj = gen(jax.random.PRNGKey(7), (nq, dim)) * scale[None, :]
    jax.block_until_ready(qj)
    log(f"data: {n} x {dim}  raw={raw} residual={residual}")

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

    def rec(e, rows=None):
        a = np.asarray(e)
        idx = range(a.shape[0]) if rows is None else rows
        return float(np.mean(
            [len(set(a[i].tolist()) & gt_sets[i]) / k for i in idx]))

    # --- store tier + conditioning (mirrors HnswPqIndex shadows)
    if raw:
        base8, off, sc, cvec = _build_scan8_shadow(vj, norms, valid, "l2")
        packed_src = _pack_rows_i8(base8)
        choices_src, choices_scales = vj, None
        rp = rs = None
    else:
        packed, scales = pack_int8_rows(vj)
        jax.block_until_ready(packed)
        rp = rs = None
        if residual:
            rp, rs = pack_int8_residual(vj, packed, scales)
            jax.block_until_ready(rp)
        del vj  # compressed tier has no raw matrix
        off, sc, cvec = _build_scan8p_shadow(packed, scales, norms, valid,
                                             "l2")
        packed_src = packed
        choices_src, choices_scales = packed, scales
    jax.block_until_ready(off)
    log("store + conditioning ready")

    # --- exhaustive baseline (same process)
    if not raw:
        from vector_db_tpu.ops.pallas_kernels import preserved_pool_width

        w = preserved_pool_width(n)

        def base_run(q, p, s, nm, o, c, cv, rpp, rss, eps):
            d, _ = pallas_scan8p_refine(q + eps, p, s, nm, o, c, cv, ids,
                                        k, "l2", pool=64, w=w,
                                        resid=rpp, rscales=rss)
            return d[0, 0]

        _, e = pallas_scan8p_refine(qj, packed, scales, norms, off, sc,
                                    cvec, ids, k, "l2", pool=64, w=w,
                                    resid=rp, rscales=rs)
        dt = timed(base_run, qj, packed, scales, norms, off, sc, cvec,
                   rp, rs)
        log(f"BASE fused packed-pool pool=64: recall={rec(e):.4f}  "
            f"{dt*1e3:.2f} ms  {nq/dt:,.0f} QPS")

    # --- scan_ivf sweep
    auto_nlist = ivf_scan.auto_ivf_geometry(n, winners=winners)[0]
    nlists = opt("nlist", sorted({auto_nlist, pow2(4 * auto_nlist)}))
    nprobes = opt("nprobe", [16, 32, 64, 128])
    k_pad = pow2(k)

    for nlist in nlists:
        cap = min(max(-(-int(n / nlist * 1.3) // LANES) * LANES, LANES),
                  cap_max)
        if nlist * cap < n:
            log(f"nlist={nlist}: cap_max overflow, skipped")
            continue
        t0 = time.time()
        samp_n = min(n, max(256 * nlist, 262144))
        if samp_n < n:
            rng = np.random.default_rng(49)
            rows = jnp.asarray(
                np.sort(rng.choice(n, samp_n, replace=False)))
            if raw:
                samp = choices_src[rows]
            else:
                pr = choices_src[rows]
                samp = jax.lax.bitcast_convert_type(
                    pr, jnp.int8).reshape(samp_n, dim).astype(
                        jnp.float32) * choices_scales[rows][:, None]
        else:
            if raw:
                samp = choices_src
            else:
                samp = jax.lax.bitcast_convert_type(
                    choices_src, jnp.int8).reshape(n, dim).astype(
                        jnp.float32) * choices_scales[:, None]
        cents, _ = kmeans_fit(jax.random.PRNGKey(43), samp, k=nlist,
                              iters=10, plus_plus=False)
        jax.block_until_ready(cents)
        t_train = time.time() - t0

        t0 = time.time()
        chunk = 2048
        while chunk * nlist > (1 << 27):
            chunk //= 2
        choices = ivf_scan.coarse_choices(
            choices_src, choices_scales, cents, "l2", 8, chunk,
            approx=nlist > 1024)
        pos2slot, slot2pos, spilled = ivf_scan.balanced_layout_dev(
            choices, valid, nlist, cap)
        cm, off_cm, sc_cm = _gather_ivf_cm(packed_src, off, sc, pos2slot)
        jax.block_until_ready(cm)
        t_lay = time.time() - t0
        log(f"nlist={nlist} cap={cap}: train {t_train:.1f}s  "
            f"layout {t_lay:.1f}s  spilled={int(spilled)}")
        lay_args = (cents, cm, off_cm, sc_cm, cvec, pos2slot)

        for nprobe in nprobes:
            if nprobe > nlist:
                continue
            p_cap = int(np.clip(pow2(max(1, 4 * nq * nprobe // nlist)),
                                32, 512))
            pool = min(max(4 * k_pad, 256), nprobe * IVF_PW)

            if raw:
                def run(q, *a, _np=nprobe, _pc=p_cap, _pl=pool):
                    eps = a[-1]
                    d, _ = pallas_ivf_refine_raw(
                        q + eps, *a[:-1], None, k, "l2", _np, _pc, _pl,
                        winners)
                    return d[0, 0]

                dargs = (*lay_args, vj, valid, ids)
                _, e = pallas_ivf_refine_raw(
                    qj, *dargs, None, k, "l2", nprobe, p_cap, pool,
                    winners)
            else:
                def run(q, *a, _np=nprobe, _pc=p_cap, _pl=pool):
                    eps = a[-1]
                    d, _ = pallas_ivf_refine_packed(
                        q + eps, *a[:-3], None, k, "l2", _np, _pc, _pl,
                        winners, resid=a[-3], rscales=a[-2])
                    return d[0, 0]

                dargs = (*lay_args, packed, scales, norms, valid, ids,
                         rp, rs)
                _, e = pallas_ivf_refine_packed(
                    qj, *dargs[:-2], None, k, "l2", nprobe, p_cap, pool,
                    winners, resid=rp, rscales=rs)
            dt = timed(run, qj, *dargs)
            log(f"IVF nlist={nlist} nprobe={nprobe} p_cap={p_cap} "
                f"pool={pool}: recall={rec(e):.4f}  {dt*1e3:.2f} ms  "
                f"{nq/dt:,.0f} QPS")

            if "--q1" in sys.argv:
                q1 = qj[:1]
                pc1 = 32
                if raw:
                    _, e1 = pallas_ivf_refine_raw(
                        q1, *dargs, None, k, "l2", nprobe, pc1, pool,
                        winners)

                    def run1(q, *a, _np=nprobe, _pl=pool):
                        eps = a[-1]
                        d, _ = pallas_ivf_refine_raw(
                            q + eps, *a[:-1], None, k, "l2", _np, pc1,
                            _pl, winners)
                        return d[0, 0]
                else:
                    _, e1 = pallas_ivf_refine_packed(
                        q1, *dargs[:-2], None, k, "l2", nprobe, pc1,
                        pool, winners, resid=rp, rscales=rs)

                    def run1(q, *a, _np=nprobe, _pl=pool):
                        eps = a[-1]
                        d, _ = pallas_ivf_refine_packed(
                            q + eps, *a[:-3], None, k, "l2", _np, pc1,
                            _pl, winners, resid=a[-3], rscales=a[-2])
                        return d[0, 0]
                dt1 = timed(run1, q1, *dargs)
                log(f"  Q=1 nprobe={nprobe}: recall={rec(e1, [0]):.2f}  "
                    f"{dt1*1e3:.3f} ms")


if __name__ == "__main__":
    if "--cpu" not in sys.argv:
        from tpu_guard import wait_for_backend

        if not wait_for_backend():
            sys.exit(1)
    main()
