"""Isolate the production-kernel vs v_word gap (224 vs 300 GB/s).

Variants, all words-native, m=1, want_missing=False:
  A  production xt_dots_words (hi/lo split -> m2=2)
  B  production guts WITHOUT hi/lo (bf16 rhs, m2=1)    — isolates the split
  C  B + dimension_semantics=("parallel","arbitrary")  — pipelining hint
  D  A + dimension_semantics
Tile sweep on the winner.

Timing fetches a scalar (axon block_until_ready doesn't sync); best of 3.
Usage: python tools/kernel_sweep2.py [P] [N]
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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench_cache/xla")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from mendeliht_tpu.ops import pallas_kernels as pk

ITERS = 20


def _cdiv(a, b):
    return -(-a // b)


def _kernel1(words_ref, rhs_ref, a_ref):
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
        shift = 2 * (r % 4) + 8 * (r // 4)
        c = (w >> shift) & 0x3
        val = c.astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(rhs_ref[r], val, dn,
                                        preferred_element_type=jnp.float32)
    a_ref[:] = acc


def raw_call(words, rounds, tp, tw, dimsem=False):
    p, nw = words.shape
    m2 = rounds.shape[1]
    grid = (_cdiv(p, tp), _cdiv(nw, tw))
    kw = {}
    if dimsem:
        from jax.experimental.pallas import tpu as pltpu
        try:
            kw["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"))
        except AttributeError:
            kw["compiler_params"] = pltpu.TPUCompilerParams(
                dimension_semantics=("parallel", "arbitrary"))
    return pl.pallas_call(
        _kernel1, grid=grid,
        in_specs=[pl.BlockSpec((tp, tw), lambda i, j: (i, j)),
                  pl.BlockSpec((16, m2, tw), lambda i, j: (0, 0, j))],
        out_specs=pl.BlockSpec((m2, tp), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m2, p), jnp.float32),
        **kw,
    )(words, rounds)


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    n4 = _cdiv(_cdiv(N, 4), 128) * 128
    nw = n4 // 4

    key = jax.random.PRNGKey(0)
    words = jax.jit(lambda k: jax.random.randint(
        k, (P, nw), -2**31, 2**31 - 1, jnp.int32))(key)
    rhs = jax.jit(lambda k: jax.random.normal(k, (4 * n4, 1), jnp.float32))(
        jax.random.PRNGKey(1))
    np.asarray(words[0, 0]); np.asarray(rhs[0, 0])
    nbytes = words.nbytes
    print(f"words {P}x{nw} = {nbytes/1e9:.2f} GB", flush=True)

    def timeit(name, loop, *args):
        try:
            r = loop(*args)
            np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                r = loop(*args)
                np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
                best = min(best, (time.time() - t0) / ITERS)
            print(f"{name:34s}: {best*1e3:7.2f} ms  {nbytes/best/1e9:6.1f} GB/s",
                  flush=True)
        except Exception as e:
            print(f"{name:34s}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # A: production path
    @jax.jit
    def prod_loop(wm, r0):
        def body(r, _):
            A, _, _ = pk.xt_dots_words(wm, r, want_missing=False)
            return r * (1.0 + A[0, 0] * 1e-20), ()
        r, _ = jax.lax.scan(body, r0, None, length=ITERS)
        return r

    timeit("A prod (hi/lo m2=2)", prod_loop, words, rhs)

    def rounds_of(r, split):
        rr = jnp.transpose(r.astype(jnp.float32).reshape(4, nw, 4, 1),
                           (2, 0, 3, 1)).reshape(16, 1, nw)
        if split:
            return pk._split_hi_lo_rows(rr)
        return rr.astype(jnp.bfloat16)

    def make_loop(split, tp, tw, dimsem):
        @jax.jit
        def loop(wm, r0):
            def body(r, _):
                rr = rounds_of(r, split)
                A = raw_call(wm, rr, tp, tw, dimsem)
                return r * (1.0 + A[0, 0] * 1e-20), ()
            r, _ = jax.lax.scan(body, r0, None, length=ITERS)
            return r
        return loop

    timeit("B raw nosplit tp1024 tw256", make_loop(False, 1024, 256, False),
           words, rhs)
    timeit("C raw nosplit + dimsem", make_loop(False, 1024, 256, True),
           words, rhs)
    timeit("D raw hi/lo tp1024 tw256", make_loop(True, 1024, 256, False),
           words, rhs)
    timeit("E raw hi/lo + dimsem", make_loop(True, 1024, 256, True),
           words, rhs)
    for tp, tw in [(512, 256), (1024, 128), (2048, 256), (1024, 512),
                   (2048, 512), (4096, 256), (512, 640), (1024, 640),
                   (2048, 640)]:
        timeit(f"hi/lo+dimsem tp{tp} tw{tw}", make_loop(True, tp, tw, True),
               words, rhs)


if __name__ == "__main__":
    main()


def sweep_m(m_values=(2, 8, 64)):
    """Tile sweep at larger rhs widths (cv batches)."""
    P, N = 1_000_000, 10_000
    n4 = _cdiv(_cdiv(N, 4), 128) * 128
    nw = n4 // 4
    key = jax.random.PRNGKey(0)
    words = jax.jit(lambda k: jax.random.randint(
        k, (P, nw), -2**31, 2**31 - 1, jnp.int32))(key)
    np.asarray(words[0, 0])
    nbytes = words.nbytes

    for m in m_values:
        rhs = jax.jit(lambda k: jax.random.normal(
            k, (4 * n4, m), jnp.float32))(jax.random.PRNGKey(1))
        np.asarray(rhs[0, 0])

        def rounds_of(r):
            rr = jnp.transpose(r.astype(jnp.float32).reshape(4, nw, 4, m),
                               (2, 0, 3, 1)).reshape(16, m, nw)
            return pk._split_hi_lo_rows(rr)

        def make_loop(tp, tw):
            @jax.jit
            def loop(wm, r0):
                def body(r, _):
                    rr = rounds_of(r)
                    A = raw_call(wm, rr, tp, tw, False)
                    return r * (1.0 + A[0, 0] * 1e-20), ()
                r, _ = jax.lax.scan(body, r0, None, length=ITERS)
                return r
            return loop

        def timeit(name, loop, *args):
            try:
                r = loop(*args)
                np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
                best = 1e9
                for _ in range(3):
                    t0 = time.time()
                    r = loop(*args)
                    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
                    best = min(best, (time.time() - t0) / ITERS)
                print(f"m={m:3d} {name:22s}: {best*1e3:7.2f} ms  "
                      f"{nbytes/best/1e9:6.1f} GB/s", flush=True)
            except Exception as e:
                print(f"m={m:3d} {name:22s}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)

        for tp, tw in [(1024, 640), (2048, 640), (512, 640), (1024, 128),
                       (256, 640), (1024, 256)]:
            timeit(f"tp{tp} tw{tw}", make_loop(tp, tw), words, rhs)
