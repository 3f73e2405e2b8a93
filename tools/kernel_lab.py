"""Kernel experiment lab (round 4): verify the stream ceiling with
independent harnesses and race the byte-decode (transposed-words) kernel
variant against the production 16-round kernel.

Not part of the library — a measurement harness whose results drive
ops/pallas_kernels.py design decisions and ROOFLINE.json.

Usage: python tools/kernel_lab.py [--quick]
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


# ---------------------------------------------------------------------------
# stream-ceiling harnesses
# ---------------------------------------------------------------------------

def pallas_reader(words, tp=1024):
    """Sum-reduce the words through an explicitly tiled Pallas pipeline:
    measures the max DMA rate the pallas_call grid pipeline can sustain."""
    p, nw = words.shape

    def kern(c_ref, x_ref, o_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[0, 0] = c_ref[0, 0]

        acc_ref[0, 0] += jnp.sum(x_ref[:])

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[0, 0] = acc_ref[0, 0]

    return pl.pallas_call(
        kern,
        grid=(_cdiv(p, tp),),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((tp, nw), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        cost_estimate=pl.CostEstimate(flops=p * nw, bytes_accessed=p * nw * 4,
                                      transcendentals=0),
    )


def time_reader(words, tp, iters=50):
    reader = pallas_reader(words, tp=tp)

    @jax.jit
    def loop(w, c0):
        def body(c, _):
            s = reader(jnp.full((1, 1), c, jnp.int32), w)
            return c + s[0, 0], ()
        c, _ = jax.lax.scan(body, c0, None, length=iters)
        return c

    np.asarray(loop(words, jnp.int32(0)))
    rtt = fetch_rtt()
    t0 = time.time()
    np.asarray(loop(words, jnp.int32(1)))
    dt = max(time.time() - t0 - rtt, 1e-9) / iters
    return words.nbytes / dt


def time_xla_reduce(words, iters=50):
    @jax.jit
    def loop(w, s0):
        def body(c, _):
            s = jnp.sum(w ^ c, dtype=jnp.int32)
            return c + s, ()
        c, _ = jax.lax.scan(body, s0, None, length=iters)
        return c

    np.asarray(loop(words, jnp.int32(0)))
    rtt = fetch_rtt()
    t0 = time.time()
    np.asarray(loop(words, jnp.int32(1)))
    dt = max(time.time() - t0 - rtt, 1e-9) / iters
    return words.nbytes / dt


def time_rw_copy(words, iters=6):
    """Carry the full array: forces a fresh materialized copy per iteration —
    measures combined read+write bandwidth (reported as traffic = 2x bytes)."""
    @jax.jit
    def loop(w, y0):
        def body(y, _):
            y2 = w ^ y[:1, :1]
            return y2, ()
        y, _ = jax.lax.scan(body, y0, None, length=iters)
        return y[0, 0]

    y0 = words ^ jnp.int32(123)
    np.asarray(loop(words, y0))
    rtt = fetch_rtt()
    t0 = time.time()
    np.asarray(loop(words, y0 ^ jnp.int32(1)))
    dt = max(time.time() - t0 - rtt, 1e-9) / iters
    return 2 * words.nbytes / dt


def fetch_rtt(reps=5):
    x = jnp.zeros((), jnp.float32)
    add = jax.jit(lambda a, b: a + b)
    np.asarray(add(x, jnp.float32(0)))
    t0 = time.time()
    for i in range(reps):
        np.asarray(add(x, jnp.float32(i + 1)))
    return (time.time() - t0) / reps


# ---------------------------------------------------------------------------
# transposed byte-decode kernel variant
# ---------------------------------------------------------------------------

def _kernel_T(wordsT_ref, rhs_ref, scale_ref, o_ref, acc_ref, *, tw):
    """wordsT tile (tw, tp) i32; rhs (4, rows, 4*nw_pad) i8 resident;
    byte-level decode: bitcast expands sublanes 4x so sample-bytes form the
    contraction dim — 4 big int8 dots instead of 16 small ones."""
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
        # extract crumb q of every byte in i32 domain (Mosaic cannot shift
        # i8 vectors), then bitcast: (tw, tp) i32 -> (4tw, tp) i8 where row
        # 4a+k = byte k of word-row a — sample-bytes form the contraction dim
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
    """Transposed-variant X'R (value dot only): wordsT (nw, p) i32,
    rhs (n_pad, m) f32 -> (p, m) f32."""
    from mendeliht_tpu.ops.pallas_kernels import _quantize_rhs_planes

    nw, p = wordsT.shape
    n4 = 4 * nw
    m = rhs.shape[1]
    if tw is None:
        tw = min(nw, 512)
    nw_pad = _cdiv(nw, tw) * tw
    planes, scale = _quantize_rhs_planes(rhs)            # (3m, n_pad), (m,)
    # super-round planes: q-th = samples [q*n4, (q+1)*n4), byte index = lane
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


def main():
    import bench
    from mendeliht_tpu.ops import pallas_kernels as pk

    quick = "--quick" in sys.argv
    g, y, causal, beta = bench.load_problem()
    words = g.words
    print(g, flush=True)
    print("flushing words to device...", flush=True)
    np.asarray(jnp.sum(words[0]))

    results = {"device": str(jax.devices()[0].device_kind)}

    # ---- stream ceiling cross-check -----------------------------------
    bw_xla = time_xla_reduce(words)
    print(f"xla xor-reduce: {bw_xla/1e9:7.1f} GB/s", flush=True)
    bws_pallas = {}
    for tp in (512, 1024, 2048):
        bw = time_reader(words, tp)
        bws_pallas[tp] = bw
        print(f"pallas reader tp={tp}: {bw/1e9:7.1f} GB/s", flush=True)
    bw_rw = time_rw_copy(words)
    print(f"xla rw-copy (r+w traffic): {bw_rw/1e9:7.1f} GB/s", flush=True)
    results["stream"] = {
        "xla_xor_reduce_gbs": bw_xla / 1e9,
        "pallas_reader_gbs": {k: v / 1e9 for k, v in bws_pallas.items()},
        "xla_rw_copy_traffic_gbs": bw_rw / 1e9,
    }

    # ---- correctness of the transposed variant (small) ----------------
    rng = np.random.default_rng(0)
    from mendeliht_tpu.genotype.snparray import PackedGenotypes
    codes = rng.choice(np.arange(4, dtype=np.uint8), size=(300, 500),
                       p=[0.4, 0.1, 0.3, 0.2])
    gs = PackedGenotypes.from_codes(codes)
    Wt_s = jnp.asarray(np.ascontiguousarray(np.asarray(gs.words).T))
    rhs_s = jnp.asarray(rng.standard_normal((gs.n_pad, 5)), jnp.float32)
    A_ref, _, _ = pk.xt_dots_words(gs.words, rhs_s, want_missing=False)
    A_T = xt_dots_T(Wt_s, rhs_s, tp=256, tw=32)
    err = float(jnp.max(jnp.abs(A_T - A_ref)) /
                (jnp.max(jnp.abs(A_ref)) + 1e-9))
    print(f"transposed-variant max rel err vs production: {err:.2e}",
          flush=True)
    assert err < 1e-4, err
    results["transposed_correct"] = err

    # ---- timing race --------------------------------------------------
    ms = (1, 8, 100) if quick else (1, 2, 8, 64, 100, 128)
    n_pad = g.n_pad

    res_v0 = {}
    for m in ms:
        def v0(a, r):
            A, _, _ = pk.xt_dots_words(a, r, want_missing=False)
            return A
        dt = time_kernel(v0, words, n_pad, m)
        res_v0[m] = dt * 1e3
        print(f"V0 production   m={m:3d}: {dt*1e3:7.2f} ms", flush=True)
    results["v0_ms"] = res_v0

    print("building transposed words on host...", flush=True)
    from mendeliht_tpu.genotype.snparray import _bytes_to_words, _LANE
    d = np.load(os.path.join(bench.CACHE,
                             f"gauss_nm_{bench.N}x{bench.P}_L{_LANE}.npz"))
    words_host = _bytes_to_words(d["packed"])            # (p, nw) i32 view
    WT = jnp.asarray(np.ascontiguousarray(words_host.T))
    del words_host, d
    np.asarray(jnp.sum(WT[0]))
    print("transposed words on device", flush=True)

    res_vt = {}
    for m in ms:
        for tw in ((512,) if quick else (256, 512, 640)):
            tw_eff = min(tw, WT.shape[0])
            def vt(a, r, tw_eff=tw_eff):
                return xt_dots_T(a, r, tp=1024, tw=tw_eff)
            dt = time_kernel(vt, WT, n_pad, m)
            res_vt[f"{m}_{tw_eff}"] = dt * 1e3
            print(f"VT transposed   m={m:3d} tw={tw_eff}: {dt*1e3:7.2f} ms",
                  flush=True)
    results["vt_ms"] = res_vt

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "kernel_lab_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
