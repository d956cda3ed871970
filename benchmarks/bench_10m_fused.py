"""10M x 512 fused packed-pool scan on ONE chip — the exhaustive-search
option for the compressed (>HBM) regime.

Raw f32 at 10M x 512 is 20 GB (does not fit); the int8 rows are 5.1 GB.
The fused s8 x s8 kernel (ops/pallas_kernels.fused_packed_pool) streams
them through VMEM at s8 MXU rate; the int8 refine re-scores with exact
write-time norms.  Complements bench_10m.py's multi-stage rows (pca /
adc_fast): this is the near-exhaustive path — no codes, no proxy, no
training.

With --residual, a second int8 level (each row's quantization residual,
ops/distance.pack_int8_residual; +5.1 GB -> 10.4 GB resident) is built
and the refine adds it: ~16-bit effective refine precision, which removes
the refine-ordering recall ceiling (HnswPqConfig.refine_residual).

Usage: python benchmarks/bench_10m_fused.py [--residual]
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

CHUNK = 131072
N_CHUNKS = 76
DIM = 512
NQ = 1024
K = 10


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, reps=3, best_of=3):
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
        _build_scan8p_shadow, pallas_scan8p_refine,
    )
    from vector_db_tpu.ops.distance import (
        pack_int8_residual, pack_int8_rows, pairwise_sq_l2,
    )

    residual = "--residual" in sys.argv
    n = CHUNK * N_CHUNKS
    assert n % 2048 == 0
    scale = jnp.asarray((np.arange(DIM) + 1.0) ** -0.5, jnp.float32)
    gen_chunk = jax.jit(
        lambda c: jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(42), c),
            (CHUNK, DIM), jnp.float32) * scale[None, :],
    )
    qj = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(7), (NQ, DIM),
                                  jnp.float32) * scale[None, :]
    )()
    q_norms = jnp.sum(qj * qj, axis=1)

    int8s = jnp.zeros((n, DIM // 4), jnp.int32)
    scales = jnp.zeros((n,), jnp.float32)
    norms = jnp.zeros((n,), jnp.float32)
    resid = jnp.zeros((n, DIM // 4), jnp.int32) if residual else None
    rscales = jnp.zeros((n,), jnp.float32) if residual else None
    gt_d = jnp.full((NQ, K), jnp.inf, jnp.float32)
    gt_i = jnp.full((NQ, K), -1, jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5, 6, 7))
    def build_step(c, int8s, scales, norms, gt_d, gt_i, resid, rscales):
        raw = gen_chunk(c)                                   # transient 268MB
        start = c * CHUNK
        p8, sc = pack_int8_rows(raw)
        int8s = jax.lax.dynamic_update_slice(int8s, p8, (start, 0))
        scales = jax.lax.dynamic_update_slice(scales, sc, (start,))
        norms = jax.lax.dynamic_update_slice(
            norms, jnp.sum(raw * raw, axis=1), (start,))
        if resid is not None:
            rp, rs = pack_int8_residual(raw, p8, sc)
            resid = jax.lax.dynamic_update_slice(resid, rp, (start, 0))
            rscales = jax.lax.dynamic_update_slice(rscales, rs, (start,))
        d_blk = pairwise_sq_l2(qj, raw, q_norms)
        i_blk = start + jax.lax.broadcasted_iota(jnp.int32, (NQ, CHUNK), 1)
        cat_d = jnp.concatenate([gt_d, d_blk], axis=1)
        cat_i = jnp.concatenate([gt_i, i_blk], axis=1)
        neg, arg = jax.lax.top_k(-cat_d, K)
        return (int8s, scales, norms, -neg,
                jnp.take_along_axis(cat_i, arg, axis=1), resid, rscales)

    state = (int8s, scales, norms, gt_d, gt_i, resid, rscales)
    t0 = time.time()
    for c in range(N_CHUNKS):
        state = build_step(jnp.int32(c), *state)
    int8s, scales, norms, gt_d, gt_i, resid, rscales = (
        jax.block_until_ready(state))
    log(f"streamed build of {n:,} rows: {time.time()-t0:.1f}s "
        f"(int8 {'10.4' if residual else '5.1'} GB resident)")
    gt = np.asarray(gt_i)
    gt_sets = [set(gt[i].tolist()) for i in range(NQ)]

    valid = jnp.ones(n, bool)
    ids = jnp.arange(n, dtype=jnp.int32)

    t0 = time.time()
    off, sc, cvec = _build_scan8p_shadow(int8s, scales, norms, valid, "l2")
    jax.block_until_ready(off)
    log(f"conditioning pass: {time.time()-t0:.1f}s")

    def rec(e):
        a = np.asarray(e)
        return float(np.mean(
            [len(set(a[i].tolist()) & gt_sets[i]) / K for i in range(NQ)]
        ))

    w = 2048
    tag = "residual " if residual else ""
    for pool in (64, 128):
        if residual:
            def run(q, p, s, nm, o, c, cv, rp, rs, eps, _pool=pool):
                d, _ = pallas_scan8p_refine(q + eps, p, s, nm, o, c, cv,
                                            ids, K, "l2", pool=_pool, w=w,
                                            resid=rp, rscales=rs)
                return d[0, 0]

            d, e = pallas_scan8p_refine(qj, int8s, scales, norms, off, sc,
                                        cvec, ids, K, "l2", pool=pool, w=w,
                                        resid=resid, rscales=rscales)
            dt = timed(run, qj, int8s, scales, norms, off, sc, cvec,
                       resid, rscales)
        else:
            def run(q, p, s, nm, o, c, cv, eps, _pool=pool):
                d, _ = pallas_scan8p_refine(q + eps, p, s, nm, o, c, cv,
                                            ids, K, "l2", pool=_pool, w=w)
                return d[0, 0]

            d, e = pallas_scan8p_refine(qj, int8s, scales, norms, off, sc,
                                        cvec, ids, K, "l2", pool=pool, w=w)
            dt = timed(run, qj, int8s, scales, norms, off, sc, cvec)
        log(f"fused packed {tag}10M pool={pool}: recall={rec(e):.4f}  "
            f"{dt*1e3:.1f} ms  {NQ/dt:,.0f} QPS")


if __name__ == "__main__":
    from tpu_guard import wait_for_backend

    # probe-first (CLAUDE.md wedge protocol): never hang in PJRT init
    if not wait_for_backend():
        sys.exit(1)
    main()
