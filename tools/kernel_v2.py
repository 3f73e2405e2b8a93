"""Next-gen decode-matmul kernel variants, timed on the real chip.

The production kernel (ops/pallas_kernels.py) widens every packed byte to its
own int32 lane -> ~17 VPU lane-ops per byte; measured ~2e12 lane-ops/s makes
it VPU-bound at ~25% of streaming bandwidth.  Variants here process 4 bytes
per 32-bit lane:

  * v_stream — load u8 tiles + trivial reduce: the pallas streaming ceiling.
  * v_word   — i32-word recode, per-crumb extract + astype(bf16)
               (~13 lane-ops/byte).
  * v_pair   — i32-word recode, build PAIRS of bf16-coded values with integer
               ops and bitcast (no astype): each out lane = two bf16 with
               value (4 + c); the +4 bias is folded into the colsum
               correction outside (~9 lane-ops/byte).

Timing fetches a scalar (axon's block_until_ready does not synchronize).
Usage: python tools/kernel_v2.py [p] [n] [m]
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

from mendeliht_tpu.ops import decode

_TP = 512
_TN4 = 512


def _cdiv(a, b):
    return -(-a // b)


# ----------------------------------------------------------------- v_stream
def _stream_kernel(words_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    t = words_ref[:]
    out_ref[:] += jnp.sum(t.astype(jnp.float32), axis=1, keepdims=True)


def stream_sum(words, tp=_TP, tw=_TN4 // 4):
    p_pad, nw = words.shape
    grid = (p_pad // tp, nw // tw)
    return pl.pallas_call(
        _stream_kernel, grid=grid,
        in_specs=[pl.BlockSpec((tp, tw), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((tp, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((p_pad, 1), jnp.float32),
    )(words)


# ------------------------------------------------------------------- v_word
def _word_kernel(words_ref, rhs_ref, a_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)

    t = words_ref[:]
    h = (t >> 1) & 0x55555555
    w = h + (h & t)                      # all 16 crumbs value-coded
    acc = a_ref[:]
    dn = (((1,), (1,)), ((), ()))
    for r in range(16):                  # round r = (s, b): shift 2s + 8b
        s, b = r % 4, r // 4
        c = (w >> (2 * s + 8 * b)) & 0x3
        val = c.astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(rhs_ref[r], val, dn,
                                        preferred_element_type=jnp.float32)
    a_ref[:] = acc


def word_xt(words, rhs_rounds, tp=_TP, tw=_TN4 // 4):
    """words (p_pad, nw) i32; rhs_rounds (16, m2, nw) bf16 -> (m2, p_pad)."""
    p_pad, nw = words.shape
    m2 = rhs_rounds.shape[1]
    grid = (p_pad // tp, nw // tw)
    return pl.pallas_call(
        _word_kernel, grid=grid,
        in_specs=[pl.BlockSpec((tp, tw), lambda i, j: (i, j)),
                  pl.BlockSpec((16, m2, tw), lambda i, j: (0, 0, j))],
        out_specs=pl.BlockSpec((m2, tp), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m2, p_pad), jnp.float32),
    )(words, rhs_rounds)


# ------------------------------------------------------------------- v_pair
# out lane = (bf16(4 + c_hi) << 16) | bf16(4 + c_lo), where bf16(4 + c) has
# bit pattern 0x4080 | (c << 5).  Rounds (s, b) with b in {0, 1}: crumb pair
# at bits (2s + 8b, 2s + 8b + 16) -> samples s*n4 + 4w + b (+2).
def _pair_kernel(words_ref, rhs_ref, a_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)

    t = words_ref[:]
    h = (t >> 1) & 0x55555555
    w = h + (h & t)
    acc = a_ref[:]
    dn = (((1,), (1,)), ((), ()))
    tp, tw = t.shape
    for r in range(8):                   # round r = (s, b), b in {0, 1}
        s, b = r % 4, r // 4
        v = (w >> (2 * s + 8 * b)) << 5
        bits = (v & 0x00600060) | 0x40804080
        pair = jax.lax.bitcast_convert_type(bits, jnp.bfloat16)  # (tp, tw, 2)
        val = pair.reshape(tp, 2 * tw)
        acc = acc + jax.lax.dot_general(rhs_ref[r], val, dn,
                                        preferred_element_type=jnp.float32)
    a_ref[:] = acc


def pair_xt(words, rhs_rounds, tp=_TP, tw=_TN4 // 4):
    """words (p_pad, nw) i32; rhs_rounds (8, m2, 2*nw... per-tile 2*tw) bf16
    -> (m2, p_pad) of sum (4 + c) * r; caller subtracts 4 * colsum."""
    p_pad, nw = words.shape
    m2 = rhs_rounds.shape[1]
    grid = (p_pad // tp, nw // tw)
    return pl.pallas_call(
        _pair_kernel, grid=grid,
        in_specs=[pl.BlockSpec((tp, tw), lambda i, j: (i, j)),
                  pl.BlockSpec((8, m2, 2 * tw), lambda i, j: (0, 0, j))],
        out_specs=pl.BlockSpec((m2, tp), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m2, p_pad), jnp.float32),
    )(words, rhs_rounds)


# ------------------------------------------------------------------- v_f32
# magic-constant float decode: (c | 0x4B400000) bitcast f32 == 12582912 + c,
# same-width bitcast (supported by Mosaic), NO astype, NO hi/lo split — the
# dot runs f32 x f32 (exact via multi-pass bf16) and the caller subtracts
# 12582912 * colsum(rhs).
_MAGIC_I = 0x4B400000
_MAGIC_F = 12582912.0


def _f32_kernel(words_ref, rhs_ref, a_ref, *, precision):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)

    t = words_ref[:]
    h = (t >> 1) & 0x55555555
    w = h + (h & t)
    acc = a_ref[:]
    dn = (((1,), (1,)), ((), ()))
    for r in range(16):
        s, b = r % 4, r // 4
        c = ((w >> (2 * s + 8 * b)) & 0x3) | _MAGIC_I
        val = jax.lax.bitcast_convert_type(c, jnp.float32)
        acc = acc + jax.lax.dot_general(rhs_ref[r], val, dn,
                                        preferred_element_type=jnp.float32,
                                        precision=precision)
    a_ref[:] = acc


def f32_xt(words, rhs_rounds, tp=_TP, tw=_TN4 // 4, precision="highest"):
    p_pad, nw = words.shape
    m = rhs_rounds.shape[1]
    grid = (p_pad // tp, nw // tw)
    kern = functools.partial(_f32_kernel, precision=precision)
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[pl.BlockSpec((tp, tw), lambda i, j: (i, j)),
                  pl.BlockSpec((16, m, tw), lambda i, j: (0, 0, j))],
        out_specs=pl.BlockSpec((m, tp), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, p_pad), jnp.float32),
    )(words, rhs_rounds)


# ------------------------------------------------------------------- v_i16
# int16 lanes (2 bytes / lane, 2x VPU density): build bf16 bit patterns
# 0x4080 | (c << 5) == bf16(4 + c) with i16 ops, same-width bitcast to bf16,
# caller subtracts 4 * colsum.  Needs hi/lo split rhs for f32 accuracy.
def _i16_kernel(half_ref, rhs_ref, a_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)

    t = half_ref[:]
    h = (t >> 1) & jnp.int16(0x5555)
    w = h + (h & t)
    acc = a_ref[:]
    dn = (((1,), (1,)), ((), ()))
    for r in range(8):                   # round (s, b), b in {0, 1}
        s, b = r % 4, r // 4
        c = (w >> (2 * s + 8 * b)) & jnp.int16(0x3)
        bits = (c << 5) | jnp.int16(0x4080)
        val = jax.lax.bitcast_convert_type(bits, jnp.bfloat16)
        acc = acc + jax.lax.dot_general(rhs_ref[r], val, dn,
                                        preferred_element_type=jnp.float32)
    a_ref[:] = acc


def i16_xt(halves, rhs_rounds, tp=_TP, th=_TN4 // 2):
    p_pad, nh = halves.shape
    m2 = rhs_rounds.shape[1]
    grid = (p_pad // tp, nh // th)
    return pl.pallas_call(
        _i16_kernel, grid=grid,
        in_specs=[pl.BlockSpec((tp, th), lambda i, j: (i, j)),
                  pl.BlockSpec((8, m2, th), lambda i, j: (0, 0, j))],
        out_specs=pl.BlockSpec((m2, tp), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m2, p_pad), jnp.float32),
    )(halves, rhs_rounds)


# ------------------------------------------------------------------ helpers
def to_words(packed):
    p, n4 = packed.shape
    return jax.lax.bitcast_convert_type(
        packed.reshape(p, n4 // 4, 4), jnp.int32)


def rhs_rounds_word(rhs, n4):
    """rhs (4*n4, m) f32 -> (16, m, n4//4) f32: round (s,b) element w =
    sample s*n4 + 4w + b."""
    m = rhs.shape[1]
    r = rhs.reshape(4, n4 // 4, 4, m)           # [s, w, b, m]
    return jnp.transpose(r, (2, 0, 3, 1)).reshape(16, m, n4 // 4)[
        jnp.asarray([4 * b + s for b in range(4) for s in range(4)])]


def rhs_rounds_pair(rhs, n4):
    """rhs (4*n4, m) f32 -> (8, m, n4//2): round (s,b in 0..1) element e =
    sample s*n4 + 2e + b."""
    m = rhs.shape[1]
    r = rhs.reshape(4, n4 // 2, 2, m)           # [s, e, b, m]
    out = jnp.transpose(r, (2, 0, 3, 1))        # [b, s, m, e]
    return out.reshape(8, m, n4 // 2)


def to_halves(packed):
    p, n4 = packed.shape
    return jax.lax.bitcast_convert_type(
        packed.reshape(p, n4 // 2, 2), jnp.int16)


def rhs_rounds_half(rhs, n4):
    """rhs (4*n4, m) -> (8, m, n4//2): round (s, b in 0..1) element e =
    sample s*n4 + 2e + b (i16 half h holds bytes 2h, 2h+1)."""
    return rhs_rounds_pair(rhs, n4)


# ------------------------------------------------------------------ harness
def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench_cache/xla")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    M = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    ITERS = 20
    n4 = _cdiv(_cdiv(N, 4), _TN4) * _TN4
    p_pad = _cdiv(P, _TP) * _TP

    key = jax.random.PRNGKey(0)
    packed = jax.jit(lambda k: jax.random.randint(
        k, (p_pad, n4), 0, 256, jnp.int32).astype(jnp.uint8))(key)
    rhs = jax.jit(lambda k: jax.random.normal(k, (4 * n4, M), jnp.float32))(
        jax.random.PRNGKey(1))
    np.asarray(packed[0, 0]); np.asarray(rhs[0, 0])
    print(f"packed {p_pad}x{n4} = {packed.nbytes/1e9:.2f} GB m={M}", flush=True)

    A_ref, _, _ = decode.xt_dots(packed, rhs, want_missing=False)
    A_ref = np.asarray(A_ref)
    scale = max(1.0, np.abs(A_ref).max())
    colsum = np.asarray(jnp.sum(rhs, axis=0))

    # correctness
    words = to_words(packed)
    halves = to_halves(packed)
    try:
        rw = rhs_rounds_word(rhs, n4).astype(jnp.bfloat16)
        A_w = np.asarray(word_xt(words, rw)).T
        print(f"v_word err: {np.max(np.abs(A_w - A_ref))/scale:.2e}", flush=True)
    except Exception as e:
        print(f"v_word FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
    for prec in ("highest", "float32"):
        try:
            rf = rhs_rounds_word(rhs, n4)
            A_f = (np.asarray(f32_xt(words, rf, precision=prec)).T
                   - _MAGIC_F * colsum[None, :])
            print(f"v_f32({prec}) err: "
                  f"{np.max(np.abs(A_f - A_ref))/scale:.2e}", flush=True)
        except Exception as e:
            print(f"v_f32({prec}) FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    try:
        rh = rhs_rounds_half(rhs, n4).astype(jnp.bfloat16)
        A_h = np.asarray(i16_xt(halves, rh)).T - 4.0 * colsum[None, :]
        print(f"v_i16 err: {np.max(np.abs(A_h - A_ref))/scale:.2e}", flush=True)
    except Exception as e:
        print(f"v_i16 FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

    def timeit(name, loop, *args):
        try:
            r = loop(*args)
            np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
            t0 = time.time()
            r = loop(*args)
            np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
            dt = (time.time() - t0) / ITERS
            bw = packed.nbytes / dt
            print(f"{name:10s}: {dt*1e3:7.2f} ms  {bw/1e9:6.1f} GB/s", flush=True)
        except Exception as e:
            print(f"{name:10s}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    @jax.jit
    def stream_loop(wm):
        def body(c, _):
            o = stream_sum(wm)
            return c + o[0, 0] * 1e-20, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c

    timeit("v_stream", stream_loop, words)

    def make_word_loop(tp, tw):
        @jax.jit
        def word_loop(wm, r0):
            def body(r, _):
                rw = rhs_rounds_word(r, n4).astype(jnp.bfloat16)
                A = word_xt(wm, rw, tp=tp, tw=tw)
                return r * (1.0 + A[0, 0] * 1e-20), ()
            r, _ = jax.lax.scan(body, r0, None, length=ITERS)
            return r
        return word_loop

    for tp, tw in [(512, 128), (1024, 128), (512, 256), (1024, 256),
                   (2048, 128), (512, 640), (1024, 640)]:
        timeit(f"v_word tp={tp} tw={tw}", make_word_loop(tp, tw), words, rhs)

    def make_f32_loop(tp, tw, prec):
        @jax.jit
        def f32_loop(wm, r0):
            def body(r, _):
                rf = rhs_rounds_word(r, n4)
                A = f32_xt(wm, rf, tp=tp, tw=tw, precision=prec)
                return r * (1.0 + A[0, 0] * 1e-20), ()
            r, _ = jax.lax.scan(body, r0, None, length=ITERS)
            return r
        return f32_loop

    for tp, tw in [(512, 128), (1024, 128), (1024, 256)]:
        for prec in ("highest", "float32"):
            timeit(f"v_f32 tp={tp} tw={tw} {prec}",
                   make_f32_loop(tp, tw, prec), words, rhs)

    def make_i16_loop(tp, th):
        @jax.jit
        def i16_loop(hm, r0):
            def body(r, _):
                rh = rhs_rounds_half(r, n4).astype(jnp.bfloat16)
                A = i16_xt(hm, rh, tp=tp, th=th)
                return r * (1.0 + A[0, 0] * 1e-20), ()
            r, _ = jax.lax.scan(body, r0, None, length=ITERS)
            return r
        return i16_loop

    for tp, th in [(512, 256), (1024, 256), (1024, 512)]:
        timeit(f"v_i16 tp={tp} th={th}", make_i16_loop(tp, th), halves, rhs)

    # production kernel for comparison
    from mendeliht_tpu.ops import pallas_kernels as pk

    @jax.jit
    def prod_loop(pm, r0):
        def body(r, _):
            A, _, _ = pk.xt_dots(pm, r, want_missing=False)
            return r * (1.0 + A[0, 0] * 1e-20), ()
        r, _ = jax.lax.scan(body, r0, None, length=ITERS)
        return r

    timeit("prod", prod_loop, packed, rhs)


if __name__ == "__main__":
    main()
