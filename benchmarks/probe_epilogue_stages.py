"""Epilogue stage decomposition for the fused int8g pool (VERDICT r4 #8).

The integer-epilogue kernel (ops/pallas_kernels.fused_int8g_pool) spends
its non-MXU time in ~4 VPU ops per [Q, N] element: dist assembly
(subtract) + compare + two selects.  This probe times the SAME kernel
with stages peeled off, same-process (tunnel variance across processes is
±25% — CLAUDE.md):

  full      matmul + subtract + min-accumulate (value+index)  [shipped]
  noidx     matmul + subtract + value-only min (no index select)
  assemble  matmul + subtract + overwrite      (no compare/select at all)
  mxu       matmul + overwrite                 (no subtract either)

The deltas pin where the next 2x lives (or doesn't): full-noidx = the
index select; noidx-assemble = compare+select; assemble-mxu = dist
assembly; mxu = MXU + VMEM write floor.

Usage: python benchmarks/probe_epilogue_stages.py [N] [--cpu]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")


def log(*a):
    print(*a, flush=True)


def _make_stage_kernel(block_n: int, nb_w: int, stage: str):
    from jax.experimental import pallas as pl

    def kernel(q_ref, b_ref, offi_ref, val_ref, idx_ref):
        cross = jax.lax.dot_general(
            q_ref[:, :], b_ref[:, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        jd = pl.program_id(2)
        qt = cross.shape[0]

        @pl.when(jd == 0)
        def _():
            idx_ref[:, :] = jnp.full((qt, block_n), -1, jnp.int32)

        if stage == "mxu":
            val_ref[:, :] = cross
            return
        dist = offi_ref[0, :][None, :] - cross
        if stage == "assemble":
            val_ref[:, :] = dist
            return

        @pl.when(jd == 0)
        def _():
            val_ref[:, :] = jnp.full((qt, block_n), jnp.int32(2**31 - 1),
                                     jnp.int32)

        if stage == "noidx":
            val_ref[:, :] = jnp.minimum(dist, val_ref[:, :])
            return
        # full: the shipped min-accumulate (value + global slot index)
        jm = pl.program_id(1)
        block_i = jd * nb_w + jm
        slot = (block_i * block_n
                + jax.lax.broadcasted_iota(jnp.int32, (qt, block_n), 1))
        better = dist < val_ref[:, :]
        val_ref[:, :] = jnp.where(better, dist, val_ref[:, :])
        idx_ref[:, :] = jnp.where(better, slot, idx_ref[:, :])

    return kernel


@functools.partial(jax.jit, static_argnames=("w", "block_n", "stage",
                                              "interpret"))
def stage_pool(q8, base8, off_i, w, block_n=512, stage="full",
               interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = base8.shape
    qp = q8.shape[0]
    nb_w = w // block_n
    passes = n // w
    return pl.pallas_call(
        _make_stage_kernel(block_n, nb_w, stage),
        grid=(qp // min(1024, qp), nb_w, passes),
        in_specs=[
            pl.BlockSpec((min(1024, qp), d), lambda i, jm, jd: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i, jm, jd: (jd * nb_w + jm, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, jm, jd: (0, jd * nb_w + jm),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((min(1024, qp), block_n), lambda i, jm, jd: (i, jm),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((min(1024, qp), block_n), lambda i, jm, jd: (i, jm),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, w), jnp.int32),
            jax.ShapeDtypeStruct((qp, w), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n * d,
            bytes_accessed=n * (d + 4) + qp * d + 2 * qp * w * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q8, base8, off_i[None, :])


def timed(fn, args, reps=5, passes=3):
    @jax.jit
    def loop(*a):
        def body(i, eps):
            v, _ = fn(*a)
            return eps + v[0, 0].astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    _ = float(loop(*args))
    best = float("inf")
    for _ in range(passes):
        t0 = time.time()
        _ = float(loop(*args))
        best = min(best, (time.time() - t0) / reps)
    return best


def main():
    from vector_db_tpu.index.hnsw_pq import _build_scan8g_shadow
    from vector_db_tpu.ops.pallas_kernels import _quantize_rows_int8

    interpret = jax.default_backend() == "cpu"
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    dim, nq, w = 512, 1024, 2048
    if interpret:
        n, dim, nq, w = 8192, 64, 32, 1024
    gen = jax.jit(lambda key, shape: jax.random.normal(key, shape,
                                                       jnp.float32),
                  static_argnames="shape")
    scale = jnp.asarray((np.arange(dim) + 1.0) ** -0.5, jnp.float32)
    vj = gen(jax.random.PRNGKey(42), (n, dim)) * scale[None, :]
    qj = gen(jax.random.PRNGKey(7), (nq, dim)) * scale[None, :]
    norms = jnp.sum(vj * vj, axis=1)
    valid = jnp.ones(n, bool)
    base8, off, sv, sgn, cvec, _aux = _build_scan8g_shadow(
        vj, norms, valid, "l2", w)
    qc = qj - cvec[None, :]
    sq = jnp.maximum(jnp.max(jnp.abs(qc)), 1e-12) / 127.0
    q8 = jnp.clip(jnp.round(qc / sq), -127, 127).astype(jnp.int8)
    q8 = jnp.pad(q8, ((0, (-nq) % 32), (0, 0)))
    c = float(sgn) * sv * sq
    lim = float(1 << 26)
    off_i = jnp.where(jnp.isfinite(off), jnp.clip(jnp.round(off / c),
                                                  -lim, lim),
                      float(1 << 29)).astype(jnp.int32)
    log(f"probe_epilogue_stages: {n} x {dim}, Q={nq}, w={w}, "
        f"backend={jax.default_backend()}")
    results = {}
    order = ["mxu", "assemble", "noidx", "full", "mxu"]  # retime mxu last
    for i, stage in enumerate(order):
        dt = timed(lambda a, b, o, s=stage: stage_pool(
            a, b, o, w=w, stage=s, interpret=interpret), (q8, base8, off_i))
        key = stage if i < 4 else "mxu_retime"
        results[key] = dt
        log(f"{key:12s}: {dt*1e3:7.2f} ms")
    f, ni, asm, mx = (results["full"], results["noidx"],
                      results["assemble"], results["mxu"])
    log(f"deltas: index-select={1e3*(f-ni):.2f} ms  "
        f"compare/min={1e3*(ni-asm):.2f} ms  "
        f"assembly(sub)={1e3*(asm-mx):.2f} ms  "
        f"mxu+write-floor={1e3*mx:.2f} ms  "
        f"(mxu retime {1e3*results['mxu_retime']:.2f} ms)")


if __name__ == "__main__":
    main()
