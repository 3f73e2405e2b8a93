"""Kernel lab round 5: find the production/transposed crossover and probe
int4 MXU ingestion.

Round-4 history: the transposed-words variant (vt) measured 5.2 ms at m=1-8
vs the production quad kernel's 9.2 ms, and loses only at m=100 (27.8 vs
23.6).  This lab (a) sweeps the full m range for both kernels to find the
crossover for the layout-adaptive dispatch, and (b) probes whether Mosaic
on this chip accepts int4 dot operands (decoded genotype values {0,1,2}
are int4-exact -> halves MXU value-ingestion bytes).

Usage: python tools/kernel_lab5.py [--quick]
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench_cache/xla")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _cdiv(a, b):
    return -(-a // b)


def fetch_rtt(reps=5):
    x = jnp.zeros((), jnp.float32)
    add = jax.jit(lambda a, b: a + b)
    np.asarray(add(x, jnp.float32(0)))
    t0 = time.time()
    for i in range(reps):
        np.asarray(add(x, jnp.float32(i + 1)))
    return (time.time() - t0) / reps


def time_kernel(fn, arr, n_pad, m, iters=25):
    """Carry-dependent timing of an X'R-like fn(arr, rhs)->(p, m)."""
    @functools.partial(jax.jit, static_argnames=("it",))
    def loop(a, rhs0, it):
        def body(r, _):
            A = fn(a, r)
            r2 = r * (1.0 + A[1, 0] * 1e-12) + A[0, 0] * 1e-6
            return r2, jnp.sum(A[0])
        _, outs = jax.lax.scan(body, rhs0, None, length=it)
        return outs

    rhs0 = jnp.ones((n_pad, m), jnp.float32)
    np.asarray(loop(arr, rhs0, iters)[-1])
    rtt = fetch_rtt()
    t0 = time.time()
    np.asarray(loop(arr, rhs0 * (1.0 + 1e-7), iters)[-1])
    return max(time.time() - t0 - rtt, 1e-9) / iters


# ---------------------------------------------------------------------------
# int4 feasibility probes
# ---------------------------------------------------------------------------

def probe_int4():
    """Can Mosaic on this chip (a) bitcast i32 -> i4 (8x sublane expand),
    (b) run dot_general with an int4 operand (i4 x i8, i4 x i4)?"""
    out = {}

    def try_one(name, kern, in_shapes, out_shape):
        try:
            args = [jnp.arange(np.prod(s), dtype=jnp.int32).reshape(s) % 3
                    for s in in_shapes]
            r = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.int32),
            )(*args)
            np.asarray(r)
            out[name] = "ok"
        except Exception as e:  # noqa: BLE001
            out[name] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"

    def k_bitcast(x_ref, o_ref):
        v = pltpu.bitcast(x_ref[:], jnp.int4)          # (8*r, c) i4
        o_ref[:] = v.astype(jnp.int32)

    try_one("bitcast_i32_to_i4", k_bitcast, [(32, 256)], (256, 256))

    def k_dot_i4_i8(x_ref, y_ref, o_ref):
        a = pltpu.bitcast(x_ref[:], jnp.int4)          # (256, 256) i4
        b = y_ref[:].astype(jnp.int8)
        o_ref[:] = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    try_one("dot_i4_i8", k_dot_i4_i8, [(32, 256), (256, 128)], (256, 128))

    def k_dot_i4_i4(x_ref, y_ref, o_ref):
        a = pltpu.bitcast(x_ref[:], jnp.int4)
        b = pltpu.bitcast(y_ref[:], jnp.int4)          # (8*32, 128)
        o_ref[:] = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    try_one("dot_i4_i4_256x256_256x128", k_dot_i4_i4,
            [(32, 256), (16, 128)], (256, 128))

    def k_dot_i8_weights_i4(x_ref, y_ref, o_ref):
        # decoded-as-weights orientation: int4 big operand on the rhs
        a = x_ref[:].astype(jnp.int8)                   # (8, 256) streaming
        b = pltpu.bitcast(y_ref[:], jnp.int4)           # (256, 512)
        o_ref[:] = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    try_one("dot_i8_lhs_i4_rhs", k_dot_i8_weights_i4,
            [(8, 256), (32, 512)], (8, 512))
    return out


def bench_int4_ingestion():
    """Raw MXU ingestion rate: same logical dot, int8 vs int4 big operand.

    Big operand (K=M rows large, streamed), small rhs (N=8).  Measures
    whether int4 halves the per-byte ingestion cost on this chip."""
    res = {}
    M, K, N = 8192, 2048, 8
    reps = 200

    def mk(dtype_tag):
        def kern(x_ref, y_ref, o_ref):
            if dtype_tag == "i8":
                a = pltpu.bitcast(x_ref[:], jnp.int8)      # (4R, K)
            else:
                a = pltpu.bitcast(x_ref[:], jnp.int4)      # (8R, K)
            b = y_ref[:].astype(jnp.int8)
            o_ref[:] = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        rows = M // 4 if dtype_tag == "i8" else M // 8
        x = jnp.ones((rows, K), jnp.int32)
        y = jnp.ones((K, N), jnp.int8)
        out_rows = M if dtype_tag == "i8" else M
        call = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((out_rows, N), jnp.int32))

        @jax.jit
        def loop(x, y):
            def body(c, _):
                o = call(x, y + c.astype(jnp.int8))
                return c + o[0, 0] * 0, ()
            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=reps)
            return c
        try:
            np.asarray(loop(x, y))
            rtt = fetch_rtt()
            t0 = time.time()
            np.asarray(loop(x, y))
            dt = max(time.time() - t0 - rtt, 1e-9) / reps
            return dt * 1e6
        except Exception as e:  # noqa: BLE001
            return f"FAIL: {type(e).__name__}: {str(e)[:160]}"

    res["i8_us"] = mk("i8")
    res["i4_us"] = mk("i4")
    return res


# ---------------------------------------------------------------------------
# transposed byte-decode variant (round-4 lab design)
# ---------------------------------------------------------------------------

def _kernel_T(wordsT_ref, rhs_ref, scale_ref, o_ref, acc_ref, *, tw):
    j = pl.program_id(1)
    mc = o_ref.shape[0]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    t = wordsT_ref[:]
    h = (t >> 1) & 0x55555555
    w = h + (h & t)
    acc = acc_ref[:]
    dn = (((1,), (0,)), ((), ()))
    for q in range(4):
        xq = (w >> (2 * q)) & 0x03030303
        vq = pltpu.bitcast(xq, jnp.int8)                   # (4tw, tp)
        rhs_q = rhs_ref[q, :, pl.ds(j * 4 * tw, 4 * tw)]   # (3mc, 4tw)
        acc = acc + jax.lax.dot_general(
            rhs_q, vq, dn, preferred_element_type=jnp.int32)
    acc_ref[:] = acc

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        s = scale_ref[:]
        a = acc.astype(jnp.float32)
        o_ref[:] = (16384.0 * a[0:mc] + 128.0 * a[mc:2 * mc]
                    + a[2 * mc:3 * mc]) * s


def xt_dots_T(wordsT, rhs, tp=1024, tw=None):
    from mendeliht_tpu.ops.pallas_kernels import _quantize_rhs_planes

    nw, p = wordsT.shape
    n4 = 4 * nw
    m = rhs.shape[1]
    if tw is None:
        tw = min(nw, 512)
    nw_pad = _cdiv(nw, tw) * tw
    planes, scale = _quantize_rhs_planes(rhs)            # (3m, n_pad), (m,)
    rr = planes.reshape(3 * m, 4, n4).transpose(1, 0, 2)  # (4, 3m, n4)
    if nw_pad != nw:
        rr = jnp.pad(rr, ((0, 0), (0, 0), (0, 4 * (nw_pad - nw))))

    grid = (_cdiv(p, tp), _cdiv(nw, tw))
    kern = functools.partial(_kernel_T, tw=tw)
    out = pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((tw, tp), lambda i, j: (j, i)),
            pl.BlockSpec((4, 3 * m, 4 * nw_pad), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((m, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m, tp), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3 * m, tp), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * p * 16 * nw * 3 * m,
            bytes_accessed=p * nw * 4 + 16 * nw_pad * 3 * m + p * m * 4,
            transcendentals=0),
    )(wordsT, rr, scale[:, None])
    return out.T


def attrib(g):
    """Attribute the m=100 gap to floor (VERDICT r4 weak #2): time the vt
    kernel with 3, 2, 1 digit planes (same DMA + decode, 1/3..3/3 of the
    MXU work) and a decode-free reader.  The plane sweep separates
    MXU-dot time from decode+DMA time."""
    from mendeliht_tpu.ops import pallas_kernels as pk
    from mendeliht_tpu.utils import profiling

    out = {}
    g = g.with_dual_layout()
    WT = g.words_t
    n_pad = g.n_pad
    m = 100
    for planes in (3, 2, 1):
        def f(a, r, planes=planes):
            A, _, _ = pk.xt_dots_words_t(a, r, want_missing=False, p=g.p)
            return A
        if planes == 3:
            dt = time_kernel(f, WT, n_pad, m)
        else:
            # fewer digit planes: time a truncated-rhs call by shrinking m
            # so the digit-row count matches (300 -> 200 -> 100 rows)
            dt = time_kernel(f, WT, n_pad, m * planes // 3)
        out[f"digit_rows_{planes * 100}"] = dt * 1e3
        print(f"vt m-equiv {planes}/3 digit rows: {dt*1e3:7.2f} ms",
              flush=True)
    bw = profiling.stream_bandwidth_pallas(g)
    out["reader_only_ms"] = g.words.nbytes / bw * 1e3
    print(f"decode-free reader pass:  {out['reader_only_ms']:7.2f} ms",
          flush=True)
    return out


def main():
    import bench
    from mendeliht_tpu.ops import pallas_kernels as pk

    quick = "--quick" in sys.argv
    results = {"device": str(jax.devices()[0].device_kind)}

    if "--attrib" in sys.argv:
        g, y, causal, beta = bench.load_problem()
        np.asarray(jnp.sum(g.words[0]))
        results["attrib_m100"] = attrib(g)
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "kernel_lab5_results.json")
        try:
            with open(out) as f:
                prev = json.load(f)
        except Exception:
            prev = {}
        prev.update(results)
        with open(out, "w") as f:
            json.dump(prev, f, indent=2)
        print("wrote", out, flush=True)
        return

    print("== int4 probes ==", flush=True)
    results["int4_probe"] = probe_int4()
    for k, v in results["int4_probe"].items():
        print(f"  {k}: {v}", flush=True)
    results["int4_ingestion"] = bench_int4_ingestion()
    print(f"  ingestion: {results['int4_ingestion']}", flush=True)

    g, y, causal, beta = bench.load_problem()
    words = g.words
    print(g, flush=True)
    np.asarray(jnp.sum(words[0]))

    ms = (1, 8, 100) if quick else (1, 2, 4, 8, 16, 32, 64, 100, 128)
    n_pad = g.n_pad

    res_v0 = {}
    for m in ms:
        def v0(a, r):
            A, _, _ = pk.xt_dots_words(a, r, want_missing=False)
            return A
        dt = time_kernel(v0, words, n_pad, m)
        res_v0[m] = dt * 1e3
        print(f"quad production m={m:3d}: {dt*1e3:7.2f} ms", flush=True)
    results["quad_ms"] = res_v0

    print("building transposed words on host...", flush=True)
    from mendeliht_tpu.genotype.snparray import _LANE
    d = np.load(os.path.join(bench.CACHE,
                             f"gauss_nm_{bench.N}x{bench.P}_L{_LANE}.npz"))
    packed = d["packed"]                                  # (p, n4) u8
    wh = packed.view(np.dtype("<i4")).reshape(packed.shape[0], -1)  # (p, nw)
    WT = jnp.asarray(np.ascontiguousarray(wh.T))
    del wh, d, packed
    np.asarray(jnp.sum(WT[0]))
    print("transposed words on device", flush=True)

    res_vt = {}
    for m in ms:
        def vt(a, r):
            return xt_dots_T(a, r, tp=1024, tw=min(512, WT.shape[0]))
        dt = time_kernel(vt, WT, n_pad, m)
        res_vt[m] = dt * 1e3
        print(f"vt transposed   m={m:3d}: {dt*1e3:7.2f} ms", flush=True)
    results["vt_ms"] = res_vt

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "kernel_lab5_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
