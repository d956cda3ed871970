"""Probe: building blocks for the fast memory-bound (codes-only) search mode.

Measures, on the real TPU:
  1. whether tpu.dynamic_gather (jnp.take_along_axis inside Pallas) compiles
     and is correct, for lane-gather (axis=1) and sublane-gather (axis=0),
     at K=128 and K=256
  2. a PQ decode kernel prototype: codes [N, S] -> recon [d, N] bf16
  3. refine gather bandwidth: base[cand] einsum re-rank at various R
  4. approx_max_k cost at large k over [Q, N]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, reps=20):
    """Serialized in-jit timing: returns seconds per rep."""

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


# ---------------------------------------------------------------- probe 1
def probe_gather(k_tab: int, axis: int):
    sd = 8
    if axis == 1:
        x_shape = (sd, k_tab)     # table^T: [sd, K] lanes=K
    else:
        x_shape = (k_tab, sd)     # table:   [K, sd] sublanes=K
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=x_shape).astype(np.float32))
    idx_1d = rng.integers(0, k_tab, size=k_tab).astype(np.int32)
    if axis == 1:
        idx = jnp.broadcast_to(jnp.asarray(idx_1d)[None, :], x_shape)
    else:
        idx = jnp.broadcast_to(jnp.asarray(idx_1d)[:, None], x_shape)

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], i_ref[:, :], axis=axis)

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x_shape, jnp.float32),
        )(x, idx)
        want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=axis)
        ok = np.allclose(np.asarray(out), want)
        log(f"gather axis={axis} K={k_tab}: compiled, correct={ok}")
        return ok
    except Exception as e:
        log(f"gather axis={axis} K={k_tab}: FAILED {type(e).__name__}: "
            f"{str(e)[:200]}")
        return False


# ---------------------------------------------------------------- probe 2
def make_decode_kernel(block_n: int, s: int, k_tab: int, sd: int):
    """codesT [S, block_n] int32, cbT [S*sd, K] f32 -> reconT [S*sd, block_n]
    bf16.

    cbT layout: cbT[s*sd + j, c] = codebooks[s, c, j].  One batched
    tpu.dynamic_gather covers ALL subspaces per 128-code chunk: x is the
    [S*sd, 128] table stack, idx repeats each subspace's code row sd times
    along sublanes.  dynamic_gather handles 128 lanes (one vreg); K=256
    tables gather as lo/hi halves + select.
    """
    lanes = 128
    chunks = block_n // lanes
    d = s * sd

    def kernel(codes_ref, cbt_ref, out_ref):
        lo = cbt_ref[:, 0:lanes]                                 # [d, 128]
        if k_tab > lanes:
            hi = cbt_ref[:, lanes:2 * lanes]
        for c in range(chunks):
            cc = codes_ref[:, c * lanes:(c + 1) * lanes]         # [S, 128]
            idx = jnp.broadcast_to(
                cc.reshape(s, 1, lanes), (s, sd, lanes)
            ).reshape(d, lanes)
            if k_tab > lanes:
                g_lo = jnp.take_along_axis(
                    lo, jnp.minimum(idx, lanes - 1), axis=1)
                g_hi = jnp.take_along_axis(
                    hi, jnp.maximum(idx - lanes, 0), axis=1)
                g = jnp.where(idx < lanes, g_lo, g_hi)
            else:
                g = jnp.take_along_axis(lo, idx, axis=1)
            out_ref[:, c * lanes:(c + 1) * lanes] = g.astype(jnp.bfloat16)

    return kernel


def probe_decode(n=102400, s=64, k_tab=256, sd=8, block_n=2048):
    d = s * sd
    rng = np.random.default_rng(1)
    codes_np = rng.integers(0, k_tab, size=(n, s)).astype(np.int32)
    codes_t = jnp.asarray(codes_np.T.copy())                    # [S, N]
    cb = rng.normal(size=(s, k_tab, sd)).astype(np.float32)
    cbt = jnp.asarray(cb.transpose(0, 2, 1).reshape(s * sd, k_tab))

    kernel = make_decode_kernel(block_n, s, k_tab, sd)
    try:
        f = pl.pallas_call(
            kernel,
            grid=(n // block_n,),
            in_specs=[
                pl.BlockSpec((s, block_n), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s * sd, k_tab), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((s * sd, block_n), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((d, n), jnp.bfloat16),
        )
        t0 = time.time()
        out = f(codes_t, cbt)
        out.block_until_ready()
        log(f"decode kernel K={k_tab} block_n={block_n}: compiled+ran "
            f"in {time.time()-t0:.1f}s (cold)")
        # correctness on a sample
        out_s = np.asarray(out[:, :512]).astype(np.float32)
        want = np.concatenate(
            [cb[si, codes_np[:512, si], :] for si in range(s)], axis=1
        ).T.astype(np.float32)
        err = np.max(np.abs(out_s - want))
        ok = err < 0.02  # bf16 rounding tolerance
        log(f"decode correct={ok} (max err {err:.4f})")

        def run(c, cbt_, eps):
            o = f(c, cbt_)
            return o[0, 0].astype(jnp.float32) + eps

        dt = timed(run, codes_t, cbt)
        gb = n * d * 2 / 1e9
        log(f"decode {n}x{d}: {dt*1e3:.3f} ms  ({gb/dt:.0f} GB/s recon write)")

        # end-to-end fast ADC scan: decode -> matmul -> approx top-R
        q = jnp.asarray(rng.normal(size=(1024, d)).astype(np.float32))

        def scan(c, cbt_, qq, eps):
            recon_t = f(c, cbt_)
            qb = (qq + eps).astype(jnp.bfloat16)
            cross = jax.lax.dot_general(
                qb, recon_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # [Q, N]
            cn = jnp.sum(
                recon_t.astype(jnp.float32) * recon_t.astype(jnp.float32),
                axis=0,
            )
            dist = cn[None, :] - 2.0 * cross
            neg, idx = jax.lax.approx_max_k(-dist, 2048, recall_target=0.95)
            return neg[0, 0]

        dt2 = timed(scan, codes_t, cbt, q, reps=10)
        log(f"decode+matmul+top2048 Q=1024: {dt2*1e3:.3f} ms "
            f"({1024/dt2:.0f} QPS scan-only)")
        return True
    except Exception as e:
        log(f"decode kernel FAILED: {type(e).__name__}: {str(e)[:300]}")
        return False


# ---------------------------------------------------------------- probe 3
def probe_refine(nq=1024, n=102400, d=512):
    rng = np.random.default_rng(2)
    base = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    base16 = base.astype(jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(nq, d)).astype(np.float32))

    for r in (512, 2048, 6144):
        cand = jnp.asarray(rng.integers(0, n, size=(nq, r)).astype(np.int32))

        def rerank(qq, bb, cc, eps, rb=512):
            qq = qq + eps
            q_norms = jnp.sum(qq * qq, axis=1)

            def body(carry, blk):
                cnd = jax.lax.dynamic_slice_in_dim(cc, blk * rb, rb, axis=1)
                vecs = bb[cnd]
                dots = jnp.einsum("qd,qrd->qr", qq, vecs.astype(jnp.float32),
                                  preferred_element_type=jnp.float32)
                vn = jnp.sum(vecs.astype(jnp.float32) ** 2, axis=2)
                dd = q_norms[:, None] + vn - 2.0 * dots
                m = jnp.min(dd, axis=1)
                return jnp.minimum(carry, m), None

            init = jnp.full((nq,), jnp.inf, jnp.float32)
            out, _ = jax.lax.scan(body, init,
                                  jnp.arange(r // rb, dtype=jnp.int32))
            return out[0]

        dt32 = timed(lambda qq, cc, eps: rerank(qq, base, cc, eps), q, cand)
        dt16 = timed(lambda qq, cc, eps: rerank(qq, base16, cc, eps), q, cand)
        bytes32 = nq * r * d * 4
        log(f"refine R={r}: f32 {dt32*1e3:.2f} ms ({bytes32/dt32/1e9:.0f} GB/s"
            f", {nq/dt32:.0f} QPS)   bf16 {dt16*1e3:.2f} ms "
            f"({bytes32/2/dt16/1e9:.0f} GB/s, {nq/dt16:.0f} QPS)")


# ---------------------------------------------------------------- probe 3b
def probe_refine_packed(nq=1024, n=102400, d=512):
    """bf16 rows bit-packed into an f32-typed array: halves gather bytes at
    f32 gather efficiency (bf16-typed gathers measured SLOWER than f32)."""
    rng = np.random.default_rng(2)
    base = rng.normal(size=(n, d)).astype(np.float32)
    base16 = jnp.asarray(base).astype(jnp.bfloat16)            # [N, d]
    packed = jax.lax.bitcast_convert_type(
        base16.reshape(n, d // 2, 2), jnp.float32
    )                                                          # [N, d/2] f32
    q = jnp.asarray(rng.normal(size=(nq, d)).astype(np.float32))

    for r in (512, 2048, 6144):
        cand = jnp.asarray(rng.integers(0, n, size=(nq, r)).astype(np.int32))

        def rerank(qq, pk, cc, eps, rb=512):
            qq = (qq + eps)
            q_norms = jnp.sum(qq * qq, axis=1)
            qb = qq.astype(jnp.bfloat16)

            def body(carry, blk):
                cnd = jax.lax.dynamic_slice_in_dim(cc, blk * rb, rb, axis=1)
                vp = pk[cnd]                                   # [Q, rb, d/2]
                v16 = jax.lax.bitcast_convert_type(
                    vp, jnp.bfloat16
                ).reshape(nq, rb, d)
                dots = jnp.einsum("qd,qrd->qr", qb, v16,
                                  preferred_element_type=jnp.float32)
                v32 = v16.astype(jnp.float32)
                vn = jnp.sum(v32 * v32, axis=2)
                dd = q_norms[:, None] + vn - 2.0 * dots
                return jnp.minimum(carry, jnp.min(dd, axis=1)), None

            init = jnp.full((nq,), jnp.inf, jnp.float32)
            out, _ = jax.lax.scan(body, init,
                                  jnp.arange(r // rb, dtype=jnp.int32))
            return out[0]

        dt = timed(lambda qq, cc, eps: rerank(qq, packed, cc, eps), q, cand)
        bytes_l = nq * r * d * 2
        log(f"refine-packed R={r}: {dt*1e3:.2f} ms "
            f"({bytes_l/dt/1e9:.0f} GB/s logical-bf16, {nq/dt:.0f} QPS)")


# ---------------------------------------------------------------- probe 4
def probe_topr(nq=1024, n=102400):
    rng = np.random.default_rng(3)
    dmat = jnp.asarray(rng.normal(size=(nq, n)).astype(np.float32))
    dmat16 = dmat.astype(jnp.bfloat16)

    for r in (1024, 2048, 8192):
        def sel(dd, eps):
            neg, idx = jax.lax.approx_max_k(-(dd + eps), r,
                                            recall_target=0.95)
            return neg[0, 0].astype(jnp.float32)

        dt = timed(sel, dmat, reps=10)
        dt16 = timed(sel, dmat16, reps=10)
        log(f"approx_max_k R={r}: f32 {dt*1e3:.2f} ms   bf16 {dt16*1e3:.2f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(f"devices: {jax.devices()}")
    if which in ("all", "gather"):
        probe_gather(128, 1)
        probe_gather(256, 1)
        probe_gather(256, 0)
    if which in ("all", "decode"):
        probe_decode()
    if which in ("all", "refine"):
        probe_refine()
    if which in ("all", "refine_packed"):
        probe_refine_packed()
    if which in ("all", "topr"):
        probe_topr()
