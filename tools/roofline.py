"""Commit-able roofline evidence for the fused 2-bit decode-matmul kernel.

Runs on the real chip against the cached 10k x 1M benchmark problem and
writes ROOFLINE.json at the repo root:

  * measured achievable HBM read bandwidth (plain reduction over the packed
    words) — the honest denominator for this chip,
  * kernel ms/pass + packed-bytes GB/s for m in {1, 2, 8, 64} rhs columns,
  * fractions of both the nominal spec roofline and the measured one.

Usage: python tools/roofline.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench_cache/xla")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    import bench
    from mendeliht_tpu.utils import profiling

    g, y, causal, beta = bench.load_problem()
    print(g, flush=True)
    dev = jax.devices()[0]
    print("device:", dev.device_kind, flush=True)

    stream = profiling.stream_bandwidth(g)
    print(f"stream read bandwidth: {stream/1e9:.1f} GB/s", flush=True)

    rows = []
    for m in (1, 2, 8, 64):
        r = profiling.kernel_roofline(g, m=m, iters=10, measured_roof=stream)
        print(f"m={m:3d}: {r['ms_per_pass']:7.2f} ms  "
              f"{r['packed_gbytes_per_s']:6.1f} GB/s  "
              f"{r['measured_roofline_fraction']*100:5.1f}% of measured  "
              f"({r['hbm_roofline_fraction']*100:5.1f}% of nominal)",
              flush=True)
        rows.append(r)

    out = {
        "device_kind": dev.device_kind,
        "problem": {"n": bench.N, "p": bench.P,
                    "packed_bytes": int(g.words.nbytes)},
        "nominal_hbm_gbytes_per_s": profiling.device_hbm_bandwidth() / 1e9,
        "measured_stream_gbytes_per_s": stream / 1e9,
        "kernel": rows,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROOFLINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
