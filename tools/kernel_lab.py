"""Kernel measurement lab (round 4).

History: this lab's round-4 races drove the production kernel design —
(1) the stream-ceiling cross-check exposed the RTT bug behind the round-3
420 GB/s figure (verified ceiling ~750 GB/s via the Pallas reader);
(2) a transposed-words byte-decode variant measured 5.2 ms at m=1 vs the
old 16-round kernel's 20 ms, which decomposed into (a) byte-plane decode
(~12 VPU ops / 16 genotypes) and (b) the MXU-natural dot orientation
(values streaming as lhs) — both now live in the production quad-word
kernel (ops/pallas_kernels.py), which keeps SNP gathers contiguous where
the fully-transposed layout would not.

What remains here: carry-dependent timing of the PRODUCTION kernel across
the m sweep plus the stream harnesses (the committed artifact generator is
tools/roofline.py; this lab is for interactive iteration).

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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench_cache/xla")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


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


def main():
    import bench
    from mendeliht_tpu.ops import pallas_kernels as pk
    from mendeliht_tpu.utils import profiling

    quick = "--quick" in sys.argv
    g, y, causal, beta = bench.load_problem()
    words = g.words
    print(g, flush=True)
    print("flushing words to device...", flush=True)
    np.asarray(jnp.sum(words[0]))

    results = {"device": str(jax.devices()[0].device_kind)}

    bw_xla = profiling.stream_bandwidth(g)
    print(f"xla xor-reduce: {bw_xla/1e9:7.1f} GB/s", flush=True)
    bw_pl = profiling.stream_bandwidth_pallas(g)
    print(f"pallas reader : {bw_pl/1e9:7.1f} GB/s", flush=True)
    results["stream_gbs"] = {"xla": bw_xla / 1e9, "pallas": bw_pl / 1e9}

    ms = (1, 8, 100) if quick else (1, 2, 8, 64, 100, 128)
    res = {}
    for m in ms:
        def prod(a, r):
            A, _, _ = pk.xt_dots_words(a, r, want_missing=False, p=g.p)
            return A
        dt = time_kernel(prod, words, g.n_pad, m)
        res[m] = dt * 1e3
        floor = max(words.nbytes / max(bw_pl, bw_xla),
                    2e-12 * bench.P * g.n_pad * 3 * m / 394)
        print(f"production m={m:3d}: {dt*1e3:7.2f} ms "
              f"({floor/dt*100:5.1f}% of floor)", flush=True)
    results["production_ms"] = res

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "kernel_lab_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
