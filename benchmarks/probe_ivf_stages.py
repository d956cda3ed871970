"""Stage decomposition of the scan_ivf pipeline (1M x 512 compressed).

The first e2e capture (bench_scan_ivf) measured 33.3 ms at nlist=512,
nprobe=16, p_cap=128 — SLOWER than the exhaustive fused packed scan
(14.1 ms) despite ~6x less MXU work.  This prober times each stage of
ops/ivf_scan.ivf_pool_candidates in isolation to find where the time
actually goes before any kernel redesign:

  probe      centroid dists + approx select           [Q, nlist]
  invert     argsort + segment-rank + scatters        [Q*nprobe]
  qsel       query quantize/pack + prober gather      [nlist*p_cap, d/4]
  kernel     fused_ivf_pool over the full worklist    grid = U steps
  kernel/4   same on a quarter worklist (per-step fixed-cost probe)
  merge      pool gather + mask + approx select       [Q, nprobe*128]
  rerank     blocked_rerank_int8 on a fixed slot set  [Q, pool]

Usage: python benchmarks/probe_ivf_stages.py [N] [--nlist X] [--nprobe Y]
"""

import functools
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


def opt(name, default):
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return int(a.split("=", 1)[1])
    return default


def main():
    from vector_db_tpu.index.base import pow2
    from vector_db_tpu.index.hnsw_pq import (
        _build_scan8p_shadow, _gather_ivf_cm,
    )
    from vector_db_tpu.ops import ivf_scan
    from vector_db_tpu.ops.distance import (
        blocked_rerank_int8, pack_int8_rows,
    )
    from vector_db_tpu.ops.ivf_scan import _pack_i8
    from vector_db_tpu.ops.kmeans import kmeans_fit_blocked
    from vector_db_tpu.ops.pallas_kernels import IVF_PW, LANES, fused_ivf_pool

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_048_576
    n -= n % 2048
    dim, nq, k = 512, 1024, 10
    winners = 4
    nlist = opt("nlist", 512)
    nprobe = opt("nprobe", 16)
    cap_max = (IVF_PW // winners) * LANES

    gen = jax.jit(
        lambda key, shape: jax.random.normal(key, shape, jnp.float32),
        static_argnames="shape",
    )
    scale = jnp.asarray((np.arange(dim) + 1.0) ** -0.5, jnp.float32)
    vj = gen(jax.random.PRNGKey(42), (n, dim)) * scale[None, :]
    qj = gen(jax.random.PRNGKey(7), (nq, dim)) * scale[None, :]
    jax.block_until_ready(qj)

    valid = jnp.ones(n, bool)
    norms = jnp.sum(vj * vj, axis=1)
    packed, scales = pack_int8_rows(vj)
    del vj
    off, sc, cvec = _build_scan8p_shadow(packed, scales, norms, valid, "l2")
    jax.block_until_ready(off)

    cap = min(max(-(-int(n / nlist * 1.3) // LANES) * LANES, LANES), cap_max)
    samp_n = min(n, max(256 * nlist, 262144))
    chunk_km = max(128, min(samp_n, (1 << 26) // nlist) // 128 * 128)
    samp_n = samp_n // chunk_km * chunk_km
    rows = jnp.asarray(np.sort(np.random.default_rng(49).choice(
        n, samp_n, replace=False)))
    samp = jax.lax.bitcast_convert_type(
        packed[rows], jnp.int8).reshape(samp_n, dim).astype(
            jnp.float32) * scales[rows][:, None]
    cents = kmeans_fit_blocked(jax.random.PRNGKey(43), samp, k=nlist,
                               iters=10, chunk=chunk_km)
    del samp
    chunk = 2048
    while chunk * nlist > (1 << 27):
        chunk //= 2
    choices = ivf_scan.coarse_choices(packed, scales, cents, "l2", 8,
                                      chunk, approx=nlist > 1024)
    pos2slot, slot2pos, spilled = ivf_scan.balanced_layout_dev(
        choices, valid, nlist, cap)
    cm, off_cm, sc_cm = _gather_ivf_cm(packed, off, sc, pos2slot)
    jax.block_until_ready(cm)
    p_cap = int(np.clip(pow2(max(1, 4 * nq * nprobe // nlist)), 32, 512))
    pool = min(max(4 * pow2(k), 256), nprobe * IVF_PW)
    log(f"layout ready: nlist={nlist} cap={cap} p_cap={p_cap} "
        f"nprobe={nprobe} pool={pool} spilled={int(spilled)}")

    # ---- fixed intermediates for stage isolation
    cn = jnp.sum(cents * cents, axis=1)

    @jax.jit
    def probe_fn(q, eps):
        cd = cn[None, :] - 2.0 * jax.lax.dot_general(
            q + eps, cents, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if nlist > 4 * nprobe and nlist > 256:
            _, top_c = jax.lax.approx_max_k(-cd, nprobe, recall_target=0.99)
        else:
            _, top_c = jax.lax.top_k(-cd, nprobe)
        return top_c.astype(jnp.float32)[0, 0]

    dt = timed(lambda q, eps: probe_fn(q, eps), qj)
    log(f"probe:   {dt*1e3:7.3f} ms")

    top_c = jax.jit(lambda q: jax.lax.approx_max_k(
        -(cn[None, :] - 2.0 * q @ cents.T), nprobe,
        recall_target=0.99)[1] if (nlist > 4 * nprobe and nlist > 256)
        else jax.lax.top_k(-(cn[None, :] - 2.0 * q @ cents.T), nprobe)[1]
    )(qj)
    top_c = jax.block_until_ready(top_c.astype(jnp.int32))

    @functools.partial(jax.jit, static_argnames=())
    def invert_fn(tc, eps):
        probers, ppos = ivf_scan.invert_probers(tc, nlist, p_cap)
        return probers[0].astype(jnp.float32) * (1 + eps)

    dt = timed(lambda tc, eps: invert_fn(tc, eps), top_c)
    log(f"invert:  {dt*1e3:7.3f} ms")

    probers, ppos = jax.jit(
        lambda tc: ivf_scan.invert_probers(tc, nlist, p_cap))(top_c)
    jax.block_until_ready(probers)

    @jax.jit
    def qsel_fn(q, pr, eps):
        qc = q + eps - cvec[None, :]
        sq = jnp.maximum(jnp.max(jnp.abs(qc)), 1e-12) / 127.0
        q8 = jnp.clip(jnp.round(qc / sq), -127, 127).astype(jnp.int8)
        return _pack_i8(q8)[pr].astype(jnp.float32)[0, 0]

    dt = timed(lambda q, pr, eps: qsel_fn(q, pr, eps), qj, probers)
    log(f"qsel:    {dt*1e3:7.3f} ms")

    @jax.jit
    def qsel_build(q, pr):
        qc = q - cvec[None, :]
        sq = jnp.maximum(jnp.max(jnp.abs(qc)), 1e-12) / 127.0
        q8 = jnp.clip(jnp.round(qc / sq), -127, 127).astype(jnp.int8)
        return _pack_i8(q8)[pr], sc_cm * sq

    qsel, sc2 = jax.block_until_ready(qsel_build(qj, probers))

    for u_n in (nlist, max(nlist // 4, 1)):
        work = jnp.arange(u_n, dtype=jnp.int32)

        def kern_fn(w, qs, cmx, o, s, eps, _u=u_n):
            vals, _ = fused_ivf_pool(w, qs, cmx, o + eps, s, nlist, cap,
                                     p_cap, winners)
            return vals[0, 0]

        dt = timed(kern_fn, work, qsel, cm, off_cm, sc2)
        log(f"kernel U={u_n}: {dt*1e3:7.3f} ms  "
            f"({dt/u_n*1e6:.1f} us/step)")

    work = jnp.arange(nlist, dtype=jnp.int32)
    vals, pos = jax.block_until_ready(fused_ivf_pool(
        work, qsel, cm, off_cm, sc2, nlist, cap, p_cap, winners))

    @jax.jit
    def merge_fn(vv, pp, tc, pq, eps):
        rows = tc * p_cap + pq
        vals_g = vv[jnp.maximum(rows, 0)] + eps
        pos_g = pp[jnp.maximum(rows, 0)]
        live = pq[:, :, None] >= 0
        vals_g = jnp.where(live, vals_g, jnp.inf).reshape(nq, -1)
        pos_g = jnp.where(live, pos_g, -1).reshape(nq, -1)
        neg, sel = jax.lax.approx_max_k(-vals_g, min(pool, vals_g.shape[1]),
                                        recall_target=0.95)
        return -neg[0, 0]

    dt = timed(lambda vv, pp, tc, pq, eps: merge_fn(vv, pp, tc, pq, eps),
               vals, pos, top_c, ppos)
    log(f"merge:   {dt*1e3:7.3f} ms")

    slots_fix = jnp.asarray(
        np.random.default_rng(3).integers(0, n, (nq, pool)), jnp.int32)

    @jax.jit
    def rerank_fn(q, p, s, sl, nm, eps):
        d, _ = blocked_rerank_int8(q + eps, p, s, sl, k, "l2", b_norms=nm)
        return d[0, 0]

    dt = timed(lambda q, p, s, sl, nm, eps: rerank_fn(q, p, s, sl, nm, eps),
               qj, packed, scales, slots_fix, norms)
    log(f"rerank:  {dt*1e3:7.3f} ms")

    # ---- full pipeline cross-check
    from vector_db_tpu.index.hnsw_pq import pallas_ivf_refine_packed

    def full_fn(q, ce, cmx, o, s, cv, p2s, p, sca, nm, v, i, eps):
        d, _ = pallas_ivf_refine_packed(
            q + eps, ce, cmx, o, s, cv, p2s, p, sca, nm, v, i, None, k,
            "l2", nprobe, p_cap, pool, winners)
        return d[0, 0]

    ids = jnp.arange(n, dtype=jnp.int32)
    dt = timed(full_fn, qj, cents, cm, off_cm, sc_cm, cvec, pos2slot,
               packed, scales, norms, valid, ids)
    log(f"FULL:    {dt*1e3:7.3f} ms  ({nq/dt:,.0f} QPS)")


if __name__ == "__main__":
    from tpu_guard import wait_for_backend

    if not wait_for_backend():
        sys.exit(1)
    main()
