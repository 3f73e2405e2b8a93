"""Sweep rhs column count m for the fused decode-matmul kernel: distinguishes
MXU-pipeline-latency-bound (time flat in m) from bandwidth/VPU-bound.

Timing: chained data-dependent calls (each call's input derives from the
previous call's output) so neither XLA nor the axon remote runtime can
memoize any execution.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
ITERS = 10           # in-jit scan length
CALLS = 3            # chained jit calls (first is also the compile warmup)


def chain_time(loop_fn, packed, rhs0):
    """Run CALLS chained invocations; return seconds per inner iteration.

    NOTE: on the axon remote backend `jax.block_until_ready` does NOT wait
    for execution — only a host fetch synchronizes.  Every timing below
    fetches a scalar to force completion."""
    r, outs = loop_fn(packed, rhs0)        # compile + warm
    np.asarray(outs[-1])                   # sync
    t0 = time.time()
    for i in range(CALLS):
        r, outs = loop_fn(packed, r)
    np.asarray(outs[-1])                   # sync
    return (time.time() - t0) / (CALLS * ITERS)


def main():
    from mendeliht_tpu.ops import pallas_kernels as pk
    from mendeliht_tpu.utils.profiling import device_hbm_bandwidth

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench_cache/xla")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    rng = np.random.default_rng(0)
    n4 = -(-N // 4)
    n4 = -(-n4 // 256) * 256
    packed = jnp.asarray(rng.integers(0, 256, size=(P, n4), dtype=np.uint8))
    roof = device_hbm_bandwidth()
    print(f"packed {P}x{n4} = {packed.nbytes/1e9:.2f} GB, roofline "
          f"{roof/1e9:.0f} GB/s", flush=True)

    def run(m, wm, dd=jnp.int32, tp=512, tn4=512, want_sq=False, tag=""):
        rhs0 = jnp.asarray(rng.standard_normal((4 * n4, m)), jnp.float32)

        @jax.jit
        def loop(pk_mat, r0):
            def body(r, _):
                A, Mm, Sq = pk.xt_dots(pk_mat, r, want_missing=wm,
                                       want_sq=want_sq, tp=tp, tn4=tn4,
                                       decode_dtype=dd)
                # data-dependence: next input derives from this output
                r2 = r * (1.0 + A[1, 0] * 1e-12) + A[0, 0] * 1e-7
                return r2, jnp.sum(A)
            r, outs = jax.lax.scan(body, r0, None, length=ITERS)
            return r, outs

        try:
            dt = chain_time(loop, packed, rhs0)
            bw = packed.nbytes / dt
            print(f"m={m:4d} wm={int(wm)} sq={int(want_sq)} tp={tp:5d} "
                  f"tn4={tn4:5d} dd={dd.__name__:6s}{tag}: {dt*1e3:7.2f} ms "
                  f" {bw/1e9:6.1f} GB/s  {bw/roof*100:5.1f}% roof", flush=True)
        except Exception as e:
            print(f"m={m:4d} wm={int(wm)} tp={tp} tn4={tn4} dd={dd.__name__}: "
                  f"FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)

    for m in (1, 2, 8, 32, 64, 128):
        run(m, False)
    for m in (1, 2, 32):
        run(m, True)
    run(2, False, want_sq=True)
    # tile-size confirmation with honest timing
    run(2, False, tp=1024)
    run(2, False, tp=2048)
    run(2, True, tp=1024)
    run(2, False, tp=1024, tn4=1024)
    run(2, False, dd=jnp.int16)


if __name__ == "__main__":
    main()
