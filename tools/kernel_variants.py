"""Experimental decode-matmul kernel variants, timed against the production
kernel (mendeliht_tpu/ops/pallas_kernels.py) on the real chip.

Variants:
  * mxu      — production kernel (hi/lo split bf16 MXU dots per plane)
  * mxu_raw  — MXU dots with plain bf16 rhs (no hi/lo split; lossy ~1e-3)
  * vpu      — no MXU: f32 multiply + lane-reduction per (plane, col);
               exact f32, no bf16 relayouts, no hi/lo doubling
  * vpu_acc  — accumulate planes into an f32 buffer, single reduction per col

Timing fetches a scalar (axon's block_until_ready does not synchronize).
"""

import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mendeliht_tpu.ops import pallas_kernels as pk
from mendeliht_tpu.ops import decode

_TP = 512
_TN4 = 512


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------- vpu variant
def _vpu_kernel(packed_ref, rhs_ref, a_ref, *, m, want_missing, m_ref=None):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        a_ref[:] = jnp.zeros_like(a_ref)
        if want_missing:
            m_ref[:] = jnp.zeros_like(m_ref)

    t = packed_ref[:].astype(jnp.int32)
    h = (t >> 1) & 0x55
    w8 = h + (h & t)
    if want_missing:
        lo05 = t & 0x55
        m8 = lo05 - (lo05 & h)
    acc = a_ref[:]
    accm = m_ref[:] if want_missing else None
    for s in range(4):
        c = ((w8 >> (2 * s)) & 0x3).astype(jnp.float32)    # (TP, TN4)
        for col in range(m):
            r_sj = rhs_ref[s, col, :][None, :]             # (1, TN4)
            acc = acc.at[:, col].add(jnp.sum(c * r_sj, axis=1))
        if want_missing:
            mm = (((m8 >> (2 * s)) & 0x1)).astype(jnp.float32)
            for col in range(m):
                r_sj = rhs_ref[s, col, :][None, :]
                accm = accm.at[:, col].add(jnp.sum(mm * r_sj, axis=1))
    a_ref[:] = acc
    if want_missing:
        m_ref[:] = accm


def vpu_xt(packed, rhsT, want_missing):
    """packed (p_pad, n4_pad), rhsT (4, m, n4_pad) f32 -> (p_pad, m) [+miss]"""
    p_pad, n4_pad = packed.shape
    m = rhsT.shape[1]
    grid = (p_pad // _TP, n4_pad // _TN4)
    in_specs = [
        pl.BlockSpec((_TP, _TN4), lambda i, j: (i, j)),
        pl.BlockSpec((4, m, _TN4), lambda i, j: (0, 0, j)),
    ]
    out_spec = pl.BlockSpec((_TP, m), lambda i, j: (i, 0))
    n_out = 1 + int(want_missing)
    kern = functools.partial(_vpu_kernel, m=m, want_missing=want_missing)
    if want_missing:
        def kern2(p_r, r_r, a_r, m_r):
            kern(p_r, r_r, a_r, m_ref=m_r)
        return pl.pallas_call(
            kern2, grid=grid, in_specs=in_specs,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((p_pad, m), jnp.float32),) * 2,
        )(packed, rhsT)
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=(out_spec,),
        out_shape=(jax.ShapeDtypeStruct((p_pad, m), jnp.float32),),
    )(packed, rhsT)


# ------------------------------------------------------------ mxu_raw variant
def _mxu_raw_kernel(packed_ref, rhs_ref, a_ref, *, want_missing, m_ref=None):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        a_ref[:] = jnp.zeros_like(a_ref)
        if want_missing:
            m_ref[:] = jnp.zeros_like(m_ref)

    t = packed_ref[:].astype(jnp.int32)
    h = (t >> 1) & 0x55
    w8 = h + (h & t)
    if want_missing:
        lo05 = t & 0x55
        m8 = lo05 - (lo05 & h)
    acc = a_ref[:]
    accm = m_ref[:] if want_missing else None
    dn = (((1,), (1,)), ((), ()))
    for s in range(4):
        val = (((w8 >> (2 * s)) & 0x3)).astype(jnp.bfloat16)
        rhs_s = rhs_ref[s]
        acc = acc + jax.lax.dot_general(rhs_s, val, dn,
                                        preferred_element_type=jnp.float32)
        if want_missing:
            mm = (((m8 >> (2 * s)) & 0x1)).astype(jnp.bfloat16)
            accm = accm + jax.lax.dot_general(rhs_s, mm, dn,
                                              preferred_element_type=jnp.float32)
    a_ref[:] = acc
    if want_missing:
        m_ref[:] = accm


def mxu_raw_xt(packed, rhsT_bf16, want_missing):
    p_pad, n4_pad = packed.shape
    m = rhsT_bf16.shape[1]
    grid = (p_pad // _TP, n4_pad // _TN4)
    in_specs = [
        pl.BlockSpec((_TP, _TN4), lambda i, j: (i, j)),
        pl.BlockSpec((4, m, _TN4), lambda i, j: (0, 0, j)),
    ]
    out_spec = pl.BlockSpec((m, _TP), lambda i, j: (0, i))
    kern = functools.partial(_mxu_raw_kernel, want_missing=want_missing)
    if want_missing:
        def kern2(p_r, r_r, a_r, m_r):
            kern(p_r, r_r, a_r, m_ref=m_r)
        return pl.pallas_call(
            kern2, grid=grid, in_specs=in_specs,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((m, p_pad), jnp.float32),) * 2,
        )(packed, rhsT_bf16)
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=(out_spec,),
        out_shape=(jax.ShapeDtypeStruct((m, p_pad), jnp.float32),),
    )(packed, rhsT_bf16)


# ------------------------------------------------------------------- harness
def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench_cache/xla")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    M = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    ITERS, CALLS = 10, 3
    rng = np.random.default_rng(0)
    n4 = -(-(-(-N // 4)) // _TN4) * _TN4
    p_pad = _cdiv(P, _TP) * _TP
    packed = jnp.asarray(rng.integers(0, 256, size=(p_pad, n4), dtype=np.uint8))
    rhs = jnp.asarray(rng.standard_normal((4 * n4, M)), jnp.float32)
    print(f"packed {p_pad}x{n4} = {packed.nbytes/1e9:.2f} GB m={M}", flush=True)

    A_ref, _, _ = decode.xt_dots(packed, rhs, want_missing=False)
    A_ref = np.asarray(A_ref)
    scale = max(1.0, np.abs(A_ref).max())

    # ---- one-shot correctness checks
    rT0 = jnp.transpose(rhs.reshape(4, n4, -1), (0, 2, 1))
    try:
        A_v = np.asarray(vpu_xt(packed, rT0, False)[0])
        print(f"vpu err: {np.max(np.abs(A_v - A_ref))/scale:.2e}", flush=True)
    except Exception as e:
        print(f"vpu check FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)
    try:
        A_r = np.asarray(mxu_raw_xt(packed, rT0.astype(jnp.bfloat16),
                                    False)[0]).T
        print(f"mxu_raw err: {np.max(np.abs(A_r - A_ref))/scale:.2e}",
              flush=True)
    except Exception as e:
        print(f"mxu_raw check FAIL {type(e).__name__}: {str(e)[:140]}",
              flush=True)

    def timeit(name, loop):
        try:
            r = loop(packed, rhs)
            np.asarray(r[0, 0])
            t0 = time.time()
            for i in range(CALLS):
                r = loop(packed, r)
            np.asarray(r[0, 0])
            dt = (time.time() - t0) / CALLS / ITERS
            bw = packed.nbytes / dt
            print(f"{name:12s}: {dt*1e3:7.2f} ms  {bw/1e9:6.1f} GB/s",
                  flush=True)
        except Exception as e:
            print(f"{name:12s}: FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)

    for wm in (False, True):
        tag = "_wm" if wm else ""

        @jax.jit
        def prod_loop(pm, r0, wm=wm):
            def body(r, _):
                A, Mm, _ = pk.xt_dots(pm, r, want_missing=wm)
                return r * (1.0 + A[1, 0] * 1e-12) + A[0, 0] * 1e-7, ()
            r, _ = jax.lax.scan(body, r0, None, length=ITERS)
            return r

        timeit("mxu" + tag, prod_loop)

        @jax.jit
        def vpu_loop(pm, r0, wm=wm):
            def body(r, _):
                rT = jnp.transpose(r.reshape(4, n4, -1), (0, 2, 1))
                A = vpu_xt(pm, rT, wm)[0]
                return (r * (1.0 + A[1, 0] * 1e-12) + A[0, 0] * 1e-7), ()
            r, _ = jax.lax.scan(body, r0, None, length=ITERS)
            return r

        timeit("vpu" + tag, vpu_loop)

        @jax.jit
        def raw_loop(pm, r0, wm=wm):
            def body(r, _):
                rT = jnp.transpose(r.reshape(4, n4, -1), (0, 2, 1))
                A = mxu_raw_xt(pm, rT.astype(jnp.bfloat16), wm)[0].T
                return (r * (1.0 + A[1, 0] * 1e-12) + A[0, 0] * 1e-7), ()
            r, _ = jax.lax.scan(body, r0, None, length=ITERS)
            return r

        timeit("mxu_raw" + tag, raw_loop)


if __name__ == "__main__":
    main()
