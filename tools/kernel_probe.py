"""HISTORICAL (round 3) — kernel design probe for the previous canonical
layout ((p, nw) row-major words, 16 decode rounds).  Superseded in round 4
by tools/kernel_lab.py and the quad-word byte-plane kernel
(ops/pallas_kernels.py); this file is retained as provenance for the
numbers quoted in round-3 artifacts and DOES NOT run against the current
(ceil(p/4), n4) quad-word storage.

Original description:

Empirical probe of candidate 2-bit decode-matmul kernel designs (round 3).

Run on the real chip against the cached bench problem. Variants:

  v0      — shipped kernel (bf16 hi/lo rhs, 16 decode rounds)
  v1      — 16-round int8: same lane-preserving round extraction, but the
            rhs is quantized to three int8 "digit" planes (hi*16384 +
            mid*128 + lo, 21 significant bits) and the dots run on the int8
            MXU (2x bf16 throughput on v5e); int32 accumulate.
  stream  — XOR-accumulate read of the words: in-pallas DMA ceiling.
  decode  — decode-only (no MXU): VPU ceiling of the 16-round extraction.

Timing honesty: every measured loop is carry-dependent through a small
operand (the rhs, or a 1x1 seed XORed inside the kernel) so nothing is
hoistable, and nothing materializes a copy of the 2.5 GB words array
(an earlier harness did `words ^ carry` per iteration — that alone adds
5 GB/iter of traffic and poisons the number).

Usage: python tools/kernel_probe.py [m ...]
"""

import functools
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

TP = 1024


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------- rhs prep
def quantize_rhs_planes(rhs):
    """f32 (n_pad, m) -> (planes (3m, n_pad) int8 [hi|mid|lo], scale (m,))."""
    rhsT = rhs.T.astype(jnp.float32)                     # (m, n_pad)
    mx = jnp.max(jnp.abs(rhsT), axis=1)
    scale = jnp.where(mx > 0, mx, 1.0) / (1 << 20)
    R = jnp.round(rhsT / scale[:, None]).astype(jnp.int32)
    rh = jnp.round(R.astype(jnp.float32) / 16384.0).astype(jnp.int32)
    rm = jnp.round((R - rh * 16384).astype(jnp.float32) / 128.0).astype(jnp.int32)
    rl = R - rh * 16384 - rm * 128
    planes = jnp.concatenate([rh, rm, rl], axis=0).astype(jnp.int8)
    return planes, scale


def rounds_restride(planes, nw, tw):
    """(rows, n_pad) -> (16, rows, nw_pad): round r=(s=r%4, b=r//4) plane."""
    rows = planes.shape[0]
    nw_pad = _cdiv(nw, tw) * tw
    r = jnp.transpose(planes.reshape(rows, 4, nw, 4), (3, 1, 0, 2))
    r = r.reshape(16, rows, nw)
    if nw_pad != nw:
        r = jnp.pad(r, ((0, 0), (0, 0), (0, nw_pad - nw)))
    return r


# ---------------------------------------------------------------- v1 kernel
def _kernel_i8_rounds(words_ref, rhs_ref, scale_ref, out_ref, acc_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    m = out_ref.shape[0]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    t = words_ref[:]
    h = (t >> 1) & 0x55555555
    w = h + (h & t)
    acc = acc_ref[:]
    dn = (((1,), (1,)), ((), ()))
    for r in range(16):
        shift = 2 * (r % 4) + 8 * (r // 4)
        c = ((w >> shift) & 0x3).astype(jnp.int8)
        acc = acc + jax.lax.dot_general(
            rhs_ref[r], c, dn, preferred_element_type=jnp.int32)
    acc_ref[:] = acc

    @pl.when(j == nj - 1)
    def _():
        a = acc_ref[:].astype(jnp.float32)
        comb = 16384.0 * a[0:m] + 128.0 * a[m:2 * m] + a[2 * m:3 * m]
        out_ref[:] = comb * scale_ref[:]


@functools.partial(jax.jit, static_argnames=("tp", "tw"))
def xt_i8_rounds(words, rhs, tp=TP, tw=None):
    p, nw = words.shape
    m = rhs.shape[1]
    if tw is None:
        tw = nw
    planes, scale = quantize_rhs_planes(rhs)
    rr = rounds_restride(planes, nw, tw)                 # (16, 3m, nw_pad)
    grid = (_cdiv(p, tp), _cdiv(nw, tw))
    out = pl.pallas_call(
        _kernel_i8_rounds,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, tw), lambda i, j: (i, j)),
            pl.BlockSpec((16, 3 * m, tw), lambda i, j: (0, 0, j)),
            pl.BlockSpec((m, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m, tp), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3 * m, tp), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * p * 16 * nw * 3 * m,
            bytes_accessed=p * nw * 4 + 16 * nw * 3 * m + p * m * 4,
            transcendentals=0),
    )(words, rr, scale[:, None])
    return out.T


# --------------------------------------------------------- no-rhs kernels
def _kernel_stream(words_ref, seed_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = out_ref[:] ^ (words_ref[:] + seed_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("tp",))
def stream_xor(words, seed, tp=TP):
    """Pure read ceiling: XOR-accumulate tiles into one tile-shaped output
    (write traffic = one tile; VPU ~2 ops/word)."""
    p, nw = words.shape
    return pl.pallas_call(
        _kernel_stream,
        grid=(_cdiv(p, tp),),
        in_specs=[pl.BlockSpec((tp, nw), lambda i: (i, 0)),
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((tp, nw), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((tp, nw), jnp.int32),
    )(words, seed)


def _kernel_decode_only(words_ref, seed_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    t = words_ref[:] + seed_ref[0, 0]
    h = (t >> 1) & 0x55555555
    w = h + (h & t)
    acc = jnp.zeros_like(t)
    for r in range(16):
        shift = 2 * (r % 4) + 8 * (r // 4)
        acc = acc + ((w >> shift) & 0x3)
    out_ref[:] = out_ref[:] ^ acc


@functools.partial(jax.jit, static_argnames=("tp", "tw"))
def decode_only(words, seed, tp=TP, tw=None):
    p, nw = words.shape
    if tw is None:
        tw = nw
    return pl.pallas_call(
        _kernel_decode_only,
        grid=(_cdiv(p, tp), _cdiv(nw, tw)),
        in_specs=[pl.BlockSpec((tp, tw), lambda i, j: (i, j)),
                  pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((tp, tw), lambda i, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((tp, tw), jnp.int32),
    )(words, seed)


# ---------------------------------------------------------------- drivers
def timeit(fn, words, rhs, iters=10):
    """Carry-dependent in-jit loop: rhs perturbed by the previous output."""
    @jax.jit
    def loop(w, r0):
        def body(r, _):
            out = fn(w, r)
            return r * (1.0 + out[0, 0] * 1e-12) + out[1, 0] * 1e-9, ()
        r, _ = jax.lax.scan(body, r0, None, length=iters)
        return r

    np.asarray(loop(words, rhs))                          # compile
    t0 = time.time()
    np.asarray(loop(words, rhs * (1.0 + 1e-7)))
    return (time.time() - t0) / iters


def timeit_roofline_style(fn, words, rhs, iters=10):
    """Exact shape of profiling.kernel_roofline's loop (summed per-iter out)."""
    @jax.jit
    def loop(arr, rhs0):
        def body(r, _):
            A = fn(arr, r)
            r2 = r * (1.0 + A[1, 0] * 1e-12) + A[0, 0] * 1e-6
            return r2, jnp.sum(A)
        _, outs = jax.lax.scan(body, rhs0, None, length=iters)
        return outs

    np.asarray(loop(words, rhs)[-1])
    t0 = time.time()
    np.asarray(loop(words, rhs * (1.0 + 1e-7))[-1])
    return (time.time() - t0) / iters


def timeit_seeded(fn, words, iters=10):
    """For kernels taking (words, seed(1,1)): chain seed through the output."""
    @jax.jit
    def loop(w, c0):
        def body(c, _):
            out = fn(w, c)
            return c + out[0:1, 0:1], ()
        c, _ = jax.lax.scan(body, c0, None, length=iters)
        return c

    seed = jnp.zeros((1, 1), jnp.int32)
    np.asarray(loop(words, seed))
    t0 = time.time()
    np.asarray(loop(words, seed + 1))
    return (time.time() - t0) / iters


def main():
    import bench
    from mendeliht_tpu.ops import pallas_kernels as pk

    ms = [int(a) for a in sys.argv[1:]] or [1, 8, 64]
    g, y, causal, beta = bench.load_problem()
    words = g.words
    p, nw = words.shape
    gb = words.nbytes / 1e9
    print(f"words ({p}, {nw}) = {gb:.2f} GB", flush=True)

    for _ in range(2):
        dt = timeit_seeded(stream_xor, words)
        print(f"stream-xor   : {dt*1e3:7.2f} ms  {gb/dt:6.1f} GB/s", flush=True)
    for _ in range(2):
        dt = timeit_seeded(decode_only, words)
        print(f"decode-only  : {dt*1e3:7.2f} ms  {gb/dt:6.1f} GB/s", flush=True)

    # correctness spot check vs shipped kernel (no missing in bench data)
    rng = np.random.default_rng(0)
    rhs1 = jnp.asarray(rng.standard_normal((g.n_pad, 2)), jnp.float32)
    A0, _, _ = pk.xt_dots_words(words, rhs1, want_missing=False)
    A1 = xt_i8_rounds(words, rhs1)
    err = float(jnp.max(jnp.abs(A1 - A0)) / jnp.max(jnp.abs(A0)))
    print(f"i8-rounds max rel err vs v0: {err:.2e}", flush=True)

    v0 = lambda w, r: pk.xt_dots_words(w, r, want_missing=False)[0]
    for m in ms:
        rhs = jnp.asarray(rng.standard_normal((g.n_pad, m)), jnp.float32)
        variants = [
            ("v0", v0, timeit),
            ("v0-roofl", v0, timeit_roofline_style),
            ("v1", xt_i8_rounds, timeit),
            ("v1-roofl", xt_i8_rounds, timeit_roofline_style),
            ("v1tp512", functools.partial(xt_i8_rounds, tp=512), timeit),
            ("v1tp2048", functools.partial(xt_i8_rounds, tp=2048), timeit),
        ]
        for name, fn, tmr in variants:
            try:
                d1 = tmr(fn, words, rhs)
                d2 = tmr(fn, words, rhs)
                print(f"m={m:4d} {name:9s} {d1*1e3:7.2f}/{d2*1e3:7.2f} ms "
                      f"{gb/min(d1,d2):6.1f} GB/s", flush=True)
            except Exception as e:
                print(f"m={m:4d} {name:9s} FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
