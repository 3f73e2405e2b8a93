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

    # int8 MXU peak for the compute floor (v5e: 394 TOPS int8; the kernel
    # runs 3 int8 digit-planes per rhs column — see pallas_kernels.py)
    INT8_TOPS = {"TPU v5 lite": 394e12, "TPU v4": 275e12,
                 "TPU v6 lite": 1836e12}.get(dev.device_kind, 394e12)
    n_pad = g.n_pad

    rows = []
    for m in (1, 2, 8, 64, 128):
        r = profiling.kernel_roofline(g, m=m, iters=10, measured_roof=stream)
        # per-pass floors: the DMA floor (read every packed byte once at the
        # measured stream rate) and the int8-MXU floor (2*p*n_pad*3m int ops
        # at peak).  Small m is stream/VPU-bound; large m is compute-bound —
        # for those, bytes/s is the wrong lens and fraction-of-floor is the
        # honest metric.
        dma_floor = g.words.nbytes / stream
        mxu_floor = 2.0 * bench.P * n_pad * 3 * m / INT8_TOPS
        floor = max(dma_floor, mxu_floor)
        r["dma_floor_ms"] = dma_floor * 1e3
        r["int8_mxu_floor_ms"] = mxu_floor * 1e3
        r["bound_by"] = "mxu" if mxu_floor > dma_floor else "stream"
        r["fraction_of_floor"] = floor / (r["ms_per_pass"] / 1e3)
        print(f"m={m:3d}: {r['ms_per_pass']:7.2f} ms  "
              f"{r['packed_gbytes_per_s']:6.1f} GB/s  "
              f"{r['measured_roofline_fraction']*100:5.1f}% of measured  "
              f"({r['hbm_roofline_fraction']*100:5.1f}% of nominal)  "
              f"[{r['bound_by']}-bound, {r['fraction_of_floor']*100:5.1f}% "
              f"of floor]", flush=True)
        rows.append(r)

    out = {
        "device_kind": dev.device_kind,
        "problem": {"n": bench.N, "p": bench.P,
                    "packed_bytes": int(g.words.nbytes)},
        "nominal_hbm_gbytes_per_s": profiling.device_hbm_bandwidth() / 1e9,
        "measured_stream_gbytes_per_s": stream / 1e9,
        "int8_mxu_peak_tops": INT8_TOPS / 1e12,
        "note": ("kernel = fused 2-bit decode + 3-digit-int8-plane MXU dots "
                 "(ops/pallas_kernels.py). Small m is stream/VPU-decode "
                 "bound; m >= ~32 is int8-MXU compute bound, so "
                 "fraction_of_floor (time vs max(DMA, MXU) floor) is the "
                 "honest utilization metric there, not bytes/s."),
        "kernel": rows,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROOFLINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
