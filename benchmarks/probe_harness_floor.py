"""Calibrate the timed()-harness floor (per-dispatch overhead amortized
over reps) so stage-decomposition numbers can be read as real costs.

probe_ivf_stages measured EVERY scan_ivf stage at ~5 ms — either each
stage genuinely costs that (gathers/sorts run ~100x below stream rate on
this stack) or the in-jit-loop harness has a ~5 ms floor at reps=5
(one dispatch+fetch RTT / reps).  This prints the same timed() on a
trivial op at reps 1/5/20 — if the reported time falls ~1/reps, it is
the floor; if flat, dispatch overhead is negligible and the stage rows
are real.  Also re-times the fused_ivf_pool kernel at reps=20.

Usage: python benchmarks/probe_harness_floor.py [N]
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
    from vector_db_tpu.index.base import pow2
    from vector_db_tpu.index.hnsw_pq import (
        _build_scan8p_shadow, _gather_ivf_cm,
    )
    from vector_db_tpu.ops import ivf_scan
    from vector_db_tpu.ops.distance import pack_int8_rows
    from vector_db_tpu.ops.ivf_scan import _pack_i8
    from vector_db_tpu.ops.kmeans import kmeans_fit_blocked
    from vector_db_tpu.ops.pallas_kernels import IVF_PW, LANES, fused_ivf_pool

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_048_576
    n -= n % 2048
    dim, nq = 512, 1024
    winners, nlist, nprobe = 4, 512, 16

    gen = jax.jit(
        lambda key, shape: jax.random.normal(key, shape, jnp.float32),
        static_argnames="shape",
    )
    scale = jnp.asarray((np.arange(dim) + 1.0) ** -0.5, jnp.float32)
    vj = gen(jax.random.PRNGKey(42), (n, dim)) * scale[None, :]
    qj = gen(jax.random.PRNGKey(7), (nq, dim)) * scale[None, :]
    jax.block_until_ready(qj)

    # --- floor calibration: a trivial stage through the same harness
    for reps in (1, 5, 20):
        dt = timed(lambda q, eps: jnp.sum(q[0] + eps), qj, reps=reps)
        log(f"floor reps={reps:3d}: {dt*1e3:7.3f} ms/rep")

    # --- the fused_ivf_pool kernel at reps=20 (dilute any floor)
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

    cn = jnp.sum(cents * cents, axis=1)
    top_c = jax.jit(lambda q: jax.lax.approx_max_k(
        -(cn[None, :] - 2.0 * q @ cents.T), nprobe,
        recall_target=0.99)[1])(qj)
    probers, ppos = jax.jit(
        lambda tc: ivf_scan.invert_probers(tc.astype(jnp.int32), nlist,
                                           p_cap))(top_c)

    @jax.jit
    def qsel_build(q, pr):
        qc = q - cvec[None, :]
        sq = jnp.maximum(jnp.max(jnp.abs(qc)), 1e-12) / 127.0
        q8 = jnp.clip(jnp.round(qc / sq), -127, 127).astype(jnp.int8)
        return _pack_i8(q8)[pr], sc_cm * sq

    qsel, sc2 = jax.block_until_ready(qsel_build(qj, probers))
    for u_n in (nlist, nlist // 4):
        work = jnp.arange(u_n, dtype=jnp.int32)

        def kern_fn(w, qs, cmx, o, s, eps, _u=u_n):
            vals, _ = fused_ivf_pool(w, qs, cmx, o + eps, s, nlist, cap,
                                     p_cap, winners)
            return vals[0, 0]

        dt = timed(kern_fn, work, qsel, cm, off_cm, sc2, reps=20)
        log(f"kernel U={u_n} reps=20: {dt*1e3:7.3f} ms "
            f"({dt/u_n*1e6:.1f} us/step)")

    # --- the qsel gather alone at reps=20 (the gather-rate hypothesis)
    qp = jax.block_until_ready(_pack_i8(jnp.clip(
        jnp.round(qj / 0.01), -127, 127).astype(jnp.int8)))

    def gath_fn(qpk, pr, eps):
        return qpk[pr].astype(jnp.float32)[0, 0] + eps

    dt = timed(gath_fn, qp, probers, reps=20)
    log(f"qsel gather [{probers.shape[0]}, {qp.shape[1]}] reps=20: "
        f"{dt*1e3:7.3f} ms")


if __name__ == "__main__":
    from tpu_guard import wait_for_backend

    if not wait_for_backend():
        sys.exit(1)
    main()
