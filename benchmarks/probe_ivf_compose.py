"""Composition bisection of the scan_ivf pipeline (1M x 512 compressed).

probe_harness_floor calibrated the timed() harness at ~26-28 ms per
call (pure dispatch+fetch; zero per-rep cost), which rewrites
probe_ivf_stages: the ISOLATED stages sum to ~5 ms real, yet the
composed pipeline costs ~22 ms real.  This prober times nested PREFIX
chains of the real composition at reps=20 (floor ~1.3 ms, subtract it)
— the first prefix that jumps past its stage-sum localizes where the
composed program loses the time (layout copies feeding the Pallas call,
fusion-blocked gathers, etc.).

Chains: probe | +invert | +qsel | +kernel | +merge | +slots | FULL.

Usage: python benchmarks/probe_ivf_compose.py [N]
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


def timed(fn, *args, reps=20, best_of=3):
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
    from vector_db_tpu.index.base import pow2
    from vector_db_tpu.index.hnsw_pq import (
        _build_scan8p_shadow, _gather_ivf_cm, pallas_ivf_refine_packed,
    )
    from vector_db_tpu.ops import ivf_scan
    from vector_db_tpu.ops.distance import (
        blocked_rerank_int8, pack_int8_rows,
    )
    from vector_db_tpu.ops.ivf_scan import _pack_i8, invert_probers
    from vector_db_tpu.ops.kmeans import kmeans_fit_blocked
    from vector_db_tpu.ops.pallas_kernels import (
        IVF_PW, LANES, fused_ivf_pool,
    )

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_048_576
    n -= n % 2048
    dim, nq, k = 512, 1024, 10
    winners, nlist, nprobe = 4, 512, 16

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
    cap_max = (IVF_PW // winners) * LANES
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
    choices = ivf_scan.coarse_choices(packed, scales, cents, "l2", 8, 2048,
                                      approx=nlist > 1024)
    pos2slot, _, _ = ivf_scan.balanced_layout_dev(choices, valid, nlist, cap)
    cm, off_cm, sc_cm = _gather_ivf_cm(packed, off, sc, pos2slot)
    jax.block_until_ready(cm)
    p_cap = int(np.clip(pow2(max(1, 4 * nq * nprobe // nlist)), 32, 512))
    pool = min(max(4 * pow2(k), 256), nprobe * IVF_PW)
    log(f"layout ready: nlist={nlist} cap={cap} p_cap={p_cap} pool={pool}")

    cn = jnp.sum(cents * cents, axis=1)
    ids = jnp.arange(n, dtype=jnp.int32)

    # --- prefix chains of the REAL composition (each is one jit).  Big
    # device arrays are passed as ARGS, never closed over (a closed-over
    # array becomes a captured CONSTANT shipped to the remote compiler).
    def chain(upto):
        def fn(q, cents_a, cm_a, offcm_a, sccm_a, cvec_a, p2s_a, packed_a,
               scales_a, norms_a, valid_a, eps):
            qq = q + eps
            cn_a = jnp.sum(cents_a * cents_a, axis=1)
            cd = cn_a[None, :] - 2.0 * jax.lax.dot_general(
                qq, cents_a, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            _, top_c = jax.lax.approx_max_k(-cd, nprobe, recall_target=0.99)
            if upto == "probe":
                return top_c.astype(jnp.float32)[0, 0]
            probers, ppos = invert_probers(top_c, nlist, p_cap)
            if upto == "invert":
                return probers[0].astype(jnp.float32)
            qc = qq - cvec_a[None, :]
            sq = jnp.maximum(jnp.max(jnp.abs(qc)), 1e-12) / 127.0
            q8 = jnp.clip(jnp.round(qc / sq), -127, 127).astype(jnp.int8)
            qsel = _pack_i8(q8)[probers]
            if upto == "qsel":
                return qsel.astype(jnp.float32)[0, 0]
            sc2 = sccm_a * sq
            work = jnp.arange(nlist, dtype=jnp.int32)
            vals, pos = fused_ivf_pool(work, qsel, cm_a, offcm_a, sc2,
                                       nlist, cap, p_cap, winners)
            if upto == "kernel":
                return vals[0, 0]
            rows_m = top_c * p_cap + ppos
            vals_g = vals[jnp.maximum(rows_m, 0)]
            pos_g = pos[jnp.maximum(rows_m, 0)]
            live = ppos[:, :, None] >= 0
            vals_g = jnp.where(live, vals_g, jnp.inf).reshape(nq, -1)
            pos_g = jnp.where(live, pos_g, -1).reshape(nq, -1)
            neg, sel = jax.lax.approx_max_k(
                -vals_g, min(pool, vals_g.shape[1]), recall_target=0.95)
            if upto == "merge":
                return -neg[0, 0]
            cand_pos = jnp.take_along_axis(pos_g, sel, axis=1)
            ok = jnp.isfinite(-neg) & (cand_pos >= 0)
            slots = jnp.where(ok, p2s_a[jnp.maximum(cand_pos, 0)], -1)
            slots = jnp.where(
                (slots >= 0) & valid_a[jnp.maximum(slots, 0)], slots, -1)
            if upto == "slots":
                return slots.astype(jnp.float32)[0, 0]
            d, out = blocked_rerank_int8(qq, packed_a, scales_a, slots, k,
                                         "l2", b_norms=norms_a)
            return d[0, 0]

        return fn

    big = (cents, cm, off_cm, sc_cm, cvec, pos2slot, packed, scales,
           norms, valid)
    for upto in ("probe", "invert", "qsel", "kernel", "merge", "slots",
                 "full"):
        dt = timed(chain(upto), qj, *big)
        log(f"chain->{upto:7s}: {dt*1e3:7.3f} ms/rep (incl ~1.3 floor)")

    # cross-check: the shipped jitted wrapper itself at reps=20
    def full_fn(q, cents_a, cm_a, offcm_a, sccm_a, cvec_a, p2s_a,
                packed_a, scales_a, norms_a, valid_a, eps):
        d, _ = pallas_ivf_refine_packed(
            q + eps, cents_a, cm_a, offcm_a, sccm_a, cvec_a, p2s_a,
            packed_a, scales_a, norms_a, valid_a, ids, None, k, "l2",
            nprobe, p_cap, pool, winners)
        return d[0, 0]

    dt = timed(full_fn, qj, *big)
    log(f"shipped FULL:    {dt*1e3:7.3f} ms/rep ({nq/dt:,.0f} QPS)")


if __name__ == "__main__":
    from tpu_guard import wait_for_backend

    if not wait_for_backend():
        sys.exit(1)
    main()
