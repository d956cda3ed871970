"""Stage-by-stage device timing of the adc_fast pipeline at the target
config (512d x 100k, 32x PQ, Q=1024, k=10) — where do the milliseconds go?

Usage: python benchmarks/probe_adc_stages.py
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


def timed(fn, *args, reps=10):
    @jax.jit
    def loop(*a):
        def body(i, eps):
            out = fn(*a, eps)
            return out * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    _ = float(loop(*args))
    t0 = time.time()
    _ = float(loop(*args))
    return (time.time() - t0) / reps


def main():
    from vector_db_tpu.ops import adc
    from vector_db_tpu.ops.distance import pack_bf16_rows, blocked_rerank_packed
    from vector_db_tpu.ops.kmeans import subspace_kmeans_fit
    from vector_db_tpu.ops.pallas_kernels import pq_decode_recon_t, fused_adc_pool

    dim, n, nq, k = 512, 100_000, 1024, 10
    gen = jax.jit(
        lambda key, shape: jax.random.normal(key, shape, jnp.float32),
        static_argnames="shape",
    )
    scale = jnp.asarray((np.arange(dim) + 1.0) ** -0.5, jnp.float32)
    vj = gen(jax.random.PRNGKey(42), (n, dim)) * scale[None, :]
    qj = gen(jax.random.PRNGKey(7), (nq, dim)) * scale[None, :]

    sample = vj[:20000]
    v = np.asarray(jnp.var(sample, axis=0))
    perm = jnp.asarray(adc.balanced_subspace_perm(v, 64))
    cb = subspace_kmeans_fit(jax.random.PRNGKey(42), sample[:, perm],
                             num_subspaces=64, k=256, iters=25)
    codes = adc.pq_encode(vj[:, perm], cb)
    codes_t = jnp.transpose(codes, (1, 0))
    cbt = adc.codebooks_to_cbt(cb)
    r32 = pq_decode_recon_t(codes_t, cbt).astype(jnp.float32)
    cnorms = jnp.sum(r32 * r32, axis=0)
    masked = cnorms  # all valid
    packed = pack_bf16_rows(vj)
    jax.block_until_ready(packed)
    qp = jnp.asarray(np.asarray(qj))[:, perm].astype(jnp.bfloat16)
    log("setup done")

    # stage 1: decode only
    def s1(q, eps):
        r = pq_decode_recon_t(codes_t, cbt)
        return r[0, 0].astype(jnp.float32) + q[0, 0] * 0 + eps * 0
    log(f"decode [512,100k]: {timed(s1, qp)*1e3:.2f} ms")

    # stage 2: decode + matmul (no pool)
    def s2(q, eps):
        r = pq_decode_recon_t(codes_t, cbt)
        cross = jax.lax.dot_general(
            q + eps.astype(jnp.bfloat16), r, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return cross[0, 0]
    log(f"decode+matmul: {timed(s2, qp)*1e3:.2f} ms")

    # stage 3: + dist + bucket pool (256)
    def s3(q, eps):
        r = pq_decode_recon_t(codes_t, cbt)
        cross = jax.lax.dot_general(
            q + eps.astype(jnp.bfloat16), r, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dist = masked[None, :] - 2.0 * cross
        n_pad = (-n) % 256
        dist = jnp.pad(dist, ((0, 0), (0, n_pad)), constant_values=jnp.inf)
        d3 = dist.reshape(nq, 256, -1)
        val = jnp.min(d3, axis=1)
        return val[0, 0]
    log(f"decode+matmul+bucket256 pool: {timed(s3, qp)*1e3:.2f} ms")

    # stage 3b: + approx_max_k r=390 instead
    def s3b(q, eps):
        r = pq_decode_recon_t(codes_t, cbt)
        cross = jax.lax.dot_general(
            q + eps.astype(jnp.bfloat16), r, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dist = masked[None, :] - 2.0 * cross
        neg, idx = jax.lax.approx_max_k(-dist, 390, recall_target=0.95)
        return neg[0, 0]
    log(f"decode+matmul+approx390: {timed(s3b, qp)*1e3:.2f} ms")

    # stage 4: fused kernel pool (w=512)
    def s4(q, eps):
        vals, idx = fused_adc_pool(q.astype(jnp.float32) + eps, codes_t, cbt,
                                   masked, 512)
        return vals[0, 0]
    try:
        log(f"fused kernel pool w=512: {timed(s4, qp)*1e3:.2f} ms")
    except Exception as e:
        log(f"fused kernel FAILED: {type(e).__name__}: {str(e)[:200]}")

    # stage 5: packed refine alone at R in {64, 128, 256}
    qf = jnp.asarray(np.asarray(qj))
    pool390 = jnp.asarray(
        np.random.default_rng(0).integers(0, n, (nq, 390)).astype(np.int32))
    for r_ in (64, 128, 256):
        cand = pool390[:, :r_]
        def s5(q, eps):
            d, s = blocked_rerank_packed(q + eps, packed, cand, k, "l2",
                                         rb=512)
            return d[0, 0]
        log(f"packed refine R={r_}: {timed(s5, qf)*1e3:.2f} ms")

    # decode tile-size sweep
    for bn in (1024, 2048, 4096):
        def sD(q, eps):
            r = pq_decode_recon_t(codes_t, cbt, block_n=bn)
            return r[0, 0].astype(jnp.float32) + q[0, 0] * 0 + eps * 0
        try:
            log(f"decode block_n={bn}: {timed(sD, qp)*1e3:.2f} ms")
        except Exception as e:
            log(f"decode block_n={bn} FAILED: {str(e)[:120]}")

    # pre-cast codes to int32 on HBM (is the uint8->int32 cast in the 3ms?)
    codes_i32 = codes_t.astype(jnp.int32)
    jax.block_until_ready(codes_i32)
    def sE(q, eps):
        r = pq_decode_recon_t(codes_i32, cbt)
        return r[0, 0].astype(jnp.float32) + q[0, 0] * 0 + eps * 0
    log(f"decode (pre-cast int32 codes): {timed(sE, qp)*1e3:.2f} ms")

    # full pipeline reference point: approx ranked-direct 128 + packed refine
    from vector_db_tpu.ops.adc import adc_fast_search
    valid = jnp.ones(n, bool)
    ids = jnp.arange(n, dtype=jnp.int32)
    qf32 = jnp.asarray(np.asarray(qj))
    def sF(q, eps):
        d, _ = adc_fast_search(q + eps, codes_t, cbt, valid, vj, ids, 10,
                               bucket=32, winners=1, pool_mode="approx",
                               code_norms=cnorms, perm=perm,
                               packed_base=packed, select_r=128)
        return d[0, 0]
    log(f"full pipeline approx+sel128+packed: {timed(sF, qf32)*1e3:.2f} ms")

    # stage 6: select (approx over pool vals [Q, 390] -> 128)
    pv = jnp.abs(gen(jax.random.PRNGKey(3), (nq, 390)))
    def s6(q, eps):
        _, sel = jax.lax.approx_max_k(-(pv + eps), 128, recall_target=0.99)
        return sel[0, 0].astype(jnp.float32) + q[0, 0] * 0
    log(f"select 390->128: {timed(s6, qf)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
