"""Probe: does Mosaic (Pallas TPU) support the gather primitives a fused
hvp kernel needs, and how fast are they?

A fused hvp = take(vp, idx) -> batched element matvec -> gather-table
assembly, all in one kernel.  Everything hinges on dynamic row gathers
(jnp.take along the sublane axis) compiling and running fast under Mosaic.

Run on TPU (default env).  Prints per-variant status + timing.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    m1 = 16130  # L=7 fine subspace + pad
    rows = 49152  # nelem * nl = 8192 * 6
    lanes = 128
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((m1, lanes)), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, m1, size=rows), dtype=jnp.int32)

    # XLA reference
    def xla_gather(v, idx):
        return v[idx]

    t = timeit(jax.jit(xla_gather), v, idx)
    ref = np.asarray(jax.jit(xla_gather)(v, idx))
    print(f"xla_gather: {t*1e3:.3f} ms")

    # 0) take_along_axis with broadcast 2-D indices (Mosaic dynamic_gather
    # wants indices shaped like the output)
    def k_tala(v_ref, idx_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None], (rows, lanes))
        # gather within a same-shape table: pad v by tiling is not viable;
        # this only works if Mosaic accepts (rows != m1) source
        out_ref[:] = jnp.take_along_axis(
            v_ref[:], idx2, axis=0, mode="clip"
        )

    def pallas_tala(v, idx):
        return pl.pallas_call(
            k_tala,
            out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(v, idx)

    try:
        out = np.asarray(jax.jit(pallas_tala)(v, idx))
        ok = np.allclose(out, ref)
        t = timeit(jax.jit(pallas_tala), v, idx)
        print(f"pallas_take_along_axis: OK match={ok} {t*1e3:.3f} ms")
    except Exception as e:
        print(
            f"pallas_take_along_axis: FAIL {type(e).__name__}: {str(e)[:300]}"
        )

    # 1) jnp.take along sublanes inside pallas, whole problem in one program
    def k_take(v_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(v_ref[:], idx_ref[:], axis=0)

    def pallas_take(v, idx):
        return pl.pallas_call(
            k_take,
            out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(v, idx)

    try:
        out = np.asarray(jax.jit(pallas_take)(v, idx))
        ok = np.allclose(out, ref)
        t = timeit(jax.jit(pallas_take), v, idx)
        print(f"pallas_take(sublane): OK match={ok} {t*1e3:.3f} ms")
    except Exception as e:
        print(f"pallas_take(sublane): FAIL {type(e).__name__}: {str(e)[:300]}")

    # 2) gather-table sum (the assembly direction): out[a] = sum_w p[tbl[a,w]]
    width = 8
    tbl = jnp.asarray(
        rng.integers(0, rows + 1, size=(m1, width)), dtype=jnp.int32
    )
    p = jnp.asarray(
        rng.standard_normal((rows + 1, lanes)), dtype=jnp.float32
    )

    def xla_tblsum(p, tbl):
        return jnp.sum(p[tbl], axis=1)

    ref2 = np.asarray(jax.jit(xla_tblsum)(p, tbl))
    t = timeit(jax.jit(xla_tblsum), p, tbl)
    print(f"xla_tblsum: {t*1e3:.3f} ms")

    def k_tblsum(p_ref, tbl_ref, out_ref):
        acc = jnp.zeros((m1, lanes), dtype=jnp.float32)
        for w in range(width):
            acc = acc + jnp.take(p_ref[:], tbl_ref[:, w], axis=0)
        out_ref[:] = acc

    def pallas_tblsum(p, tbl):
        return pl.pallas_call(
            k_tblsum,
            out_shape=jax.ShapeDtypeStruct((m1, lanes), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(p, tbl)

    try:
        out = np.asarray(jax.jit(pallas_tblsum)(p, tbl))
        ok = np.allclose(out, ref2)
        t = timeit(jax.jit(pallas_tblsum), p, tbl)
        print(f"pallas_tblsum: OK match={ok} {t*1e3:.3f} ms")
    except Exception as e:
        print(f"pallas_tblsum: FAIL {type(e).__name__}: {str(e)[:300]}")

    # 3) fused hvp shape: gather -> batched matvec -> tblsum in ONE kernel
    nelem, nl, C = 8192, 6, 12
    nf = 2
    m_fine = 16129
    He = jnp.asarray(
        rng.standard_normal((nelem, C, C)), dtype=jnp.float32
    )
    idx_e = jnp.asarray(
        rng.integers(0, m_fine, size=(nelem, nl)), dtype=jnp.int32
    )
    vp = jnp.asarray(
        rng.standard_normal((m_fine + 1, nf)), dtype=jnp.float32
    )
    tblw = 8
    tbl_f = jnp.asarray(
        rng.integers(0, nelem * nl + 1, size=(m_fine + 1, tblw)),
        dtype=jnp.int32,
    )

    def xla_hvp(He, idx_e, vp, tbl_f):
        ve = vp[idx_e].reshape(nelem, nl * nf)
        # note: toy layout (nl, nf) flattened; consistency w/ kernel only
        hve = jnp.einsum("eab,eb->ea", He, ve)
        flat = hve.reshape(nelem * nl, nf)
        padded = jnp.concatenate(
            [flat, jnp.zeros((1, nf), dtype=flat.dtype)], axis=0
        )
        return jnp.sum(padded[tbl_f], axis=1)

    ref3 = np.asarray(jax.jit(xla_hvp)(He, idx_e, vp, tbl_f))
    t = timeit(jax.jit(xla_hvp), He, idx_e, vp, tbl_f)
    print(f"xla_hvp(toy): {t*1e3:.3f} ms")

    idx_flat = idx_e.reshape(-1)

    def k_hvp(he_ref, idx_ref, vp_ref, tbl_ref, out_ref):
        ve = jnp.take(vp_ref[:], idx_ref[:], axis=0)  # (nelem*nl, nf)
        ve = ve.reshape(nelem, nl * nf)
        hve = jax.lax.dot_general(
            he_ref[:],
            ve,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (nelem, C)
        flat = hve.reshape(nelem * nl, nf)
        padded = jnp.concatenate(
            [flat, jnp.zeros((1, nf), dtype=jnp.float32)], axis=0
        )
        acc = jnp.zeros((m_fine + 1, nf), dtype=jnp.float32)
        for w in range(tblw):
            acc = acc + jnp.take(padded, tbl_ref[:, w], axis=0)
        out_ref[:] = acc

    def pallas_hvp(He, idx_flat, vp, tbl_f):
        return pl.pallas_call(
            k_hvp,
            out_shape=jax.ShapeDtypeStruct((m_fine + 1, nf), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(He, idx_flat, vp, tbl_f)

    try:
        out = np.asarray(jax.jit(pallas_hvp)(He, idx_flat, vp, tbl_f))
        ok = np.allclose(out, ref3, atol=1e-3)
        t = timeit(jax.jit(pallas_hvp), He, idx_flat, vp, tbl_f)
        print(f"pallas_hvp(fused): OK match={ok} {t*1e3:.3f} ms")
    except Exception as e:
        print(f"pallas_hvp(fused): FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
