"""Sweep tile sizes / decode dtypes for the fused decode-matmul pallas kernel.

Times the X'R pass (the IHT hot op) on a synthetic packed matrix on the real
chip and reports achieved packed-bytes bandwidth vs the HBM roofline.

Usage: python tools/tune_kernel.py [p] [n] [m]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
M = int(sys.argv[3]) if len(sys.argv) > 3 else 2
ITERS = 20

from mendeliht_tpu.ops import pallas_kernels as pk
from mendeliht_tpu.ops import decode
from mendeliht_tpu.utils.profiling import device_hbm_bandwidth


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench_cache/xla")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    rng = np.random.default_rng(0)
    n4 = -(-N // 4)
    n4 = -(-n4 // 256) * 256
    packed = jnp.asarray(rng.integers(0, 256, size=(P, n4), dtype=np.uint8))
    rhs0 = jnp.asarray(rng.standard_normal((4 * n4, M)), jnp.float32)
    roof = device_hbm_bandwidth()
    print(f"packed {P}x{n4} = {packed.nbytes/1e9:.2f} GB, m={M}, "
          f"roofline {roof/1e9:.0f} GB/s", flush=True)

    # reference output for correctness
    A_ref, M_ref, _ = decode.xt_dots(packed, rhs0, want_missing=True)
    A_ref = np.asarray(A_ref)

    import functools

    def run(tp, tn4, dd, want_missing=True):
        @functools.partial(jax.jit, static_argnames=("wm",))
        def loop(packed, r0, wm):
            def body(r, _):
                A, Mm, _ = pk.xt_dots(packed, r, want_missing=wm,
                                      tp=tp, tn4=tn4, decode_dtype=dd)
                r2 = r * (1.0 + A[1, 0] * 1e-12) + A[0, 0] * 1e-6
                return r2, jnp.sum(A)
            _, outs = jax.lax.scan(body, r0, None, length=ITERS)
            return outs

        try:
            A, Mm, _ = pk.xt_dots(packed, rhs0, want_missing=want_missing,
                                  tp=tp, tn4=tn4, decode_dtype=dd)
            err = float(np.max(np.abs(np.asarray(A) - A_ref))
                        / max(1.0, np.max(np.abs(A_ref))))
            jax.block_until_ready(loop(packed, rhs0, want_missing))
            r1 = rhs0 * (1.0 + 1e-7)
            t0 = time.time()
            jax.block_until_ready(loop(packed, r1, want_missing))
            dt = (time.time() - t0) / ITERS
            bw = packed.nbytes / dt
            print(f"tp={tp:5d} tn4={tn4:5d} dd={dd.__name__:6s} "
                  f"wm={int(want_missing)} : {dt*1e3:7.2f} ms  "
                  f"{bw/1e9:6.1f} GB/s  {bw/roof*100:5.1f}% roof  err={err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"tp={tp:5d} tn4={tn4:5d} dd={dd.__name__:6s}: "
                  f"FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)

    for tp, tn4 in [(512, 512), (256, 512), (1024, 512), (512, 1024),
                    (256, 1024), (512, 2048), (256, 2048), (1024, 1024)]:
        if (P % tp == 0 or True) and tn4 <= n4:
            for dd in (jnp.int32, jnp.uint8, jnp.int8):
                run(tp, tn4, dd)
    # no-missing variant at the current default
    run(512, 512, jnp.int32, want_missing=False)
    run(512, 1024, jnp.uint8, want_missing=False)


if __name__ == "__main__":
    main()
