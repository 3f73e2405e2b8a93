"""Commit-able roofline evidence for the fused 2-bit decode-matmul kernel.

Runs on the real chip against the cached 10k x 1M benchmark problem and
writes ROOFLINE.json at the repo root:

  * ``ceiling_crosscheck`` — the measured achievable HBM read bandwidth from
    THREE independent harnesses (XLA carry-dependent reduce, a Pallas tiled
    reader with two tile sizes, and an XLA read+write copy), all with the
    RTT-corrected timing (round-3 ADVICE: the old fetch_rtt measured a
    cached host copy, silently leaving ~one tunnel RTT inside every
    10-iteration loop — which is how the round-3 artifact under-measured
    the stream ceiling at 420 GB/s; the verified ceiling is ~750+ GB/s,
    ~92% of the 820 GB/s v5e spec),
  * kernel ms/pass + packed-bytes GB/s for m in {1, 2, 8, 64, 100, 128},
  * fractions of the nominal spec roofline, the VERIFIED measured ceiling,
    and the max(DMA, int8-MXU) per-pass floor.

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
    import jax.numpy as jnp
    np.asarray(jnp.sum(g.words[0]))    # flush the words transfer

    crosscheck = {}
    crosscheck["xla_xor_reduce_gbs"] = profiling.stream_bandwidth(g) / 1e9
    print(f"xla xor-reduce : {crosscheck['xla_xor_reduce_gbs']:7.1f} GB/s",
          flush=True)
    for tp in (256, 400):         # x n4 i32: ~2.6 / ~4.1 MiB tiles
        bw = profiling.stream_bandwidth_pallas(g, tp=tp) / 1e9
        crosscheck[f"pallas_reader_tp{tp}_gbs"] = bw
        print(f"pallas tp={tp:4d} : {bw:7.1f} GB/s", flush=True)
    crosscheck["xla_rw_copy_traffic_gbs"] = profiling.stream_bandwidth_rw(
        g) / 1e9
    print(f"xla rw-copy    : {crosscheck['xla_rw_copy_traffic_gbs']:7.1f} "
          f"GB/s (r+w traffic)", flush=True)
    read_keys = [k for k in crosscheck if not k.startswith("xla_rw")]
    stream = max(crosscheck[k] for k in read_keys) * 1e9
    crosscheck["verified_read_ceiling_gbs"] = stream / 1e9
    print(f"verified ceiling: {stream/1e9:.1f} GB/s "
          f"({stream/profiling.device_hbm_bandwidth()*100:.0f}% of nominal)",
          flush=True)

    # int8 MXU peak for the compute floor (v5e: 394 TOPS int8; the kernel
    # runs 3 int8 digit-planes per rhs column — see pallas_kernels.py)
    INT8_TOPS = {"TPU v5 lite": 394e12, "TPU v4": 275e12,
                 "TPU v6 lite": 1836e12}.get(dev.device_kind, 394e12)
    n_pad = g.n_pad

    def floors(r, m):
        dma_floor = g.words.nbytes / stream
        mxu_floor = 2.0 * bench.P * n_pad * 3 * m / INT8_TOPS
        floor = max(dma_floor, mxu_floor)
        r["dma_floor_ms"] = dma_floor * 1e3
        r["int8_mxu_floor_ms"] = mxu_floor * 1e3
        r["bound_by"] = "mxu" if mxu_floor > dma_floor else "stream"
        r["fraction_of_floor"] = floor / (r["ms_per_pass"] / 1e3)
        return r

    rows = []
    for m in (1, 2, 8, 64, 100, 128):
        r = floors(profiling.kernel_roofline(
            g, m=m, iters=(25 if m <= 8 else 10), measured_roof=stream), m)
        print(f"quad m={m:3d}: {r['ms_per_pass']:7.2f} ms  "
              f"{r['packed_gbytes_per_s']:6.1f} GB/s  "
              f"{r['measured_roofline_fraction']*100:5.1f}% of verified  "
              f"({r['hbm_roofline_fraction']*100:5.1f}% of nominal)  "
              f"[{r['bound_by']}-bound, {r['fraction_of_floor']*100:5.1f}% "
              f"of floor]", flush=True)
        rows.append(r)

    # ---- production dual-layout (transposed, weight-stationary) path ------
    print("building dual layout on device...", flush=True)
    gd = g.with_dual_layout()
    rows_vt = []
    for m in (1, 2, 8, 64, 100, 128):
        r = floors(profiling.kernel_roofline(
            gd, m=m, iters=(25 if m <= 8 else 10), measured_roof=stream,
            layout="vt"), m)
        print(f"vt   m={m:3d}: {r['ms_per_pass']:7.2f} ms  "
              f"[{r['bound_by']}-bound, {r['fraction_of_floor']*100:5.1f}% "
              f"of floor]", flush=True)
        rows_vt.append(r)

    out = {
        "device_kind": dev.device_kind,
        "problem": {"n": bench.N, "p": bench.P,
                    "packed_bytes": int(g.words.nbytes)},
        "nominal_hbm_gbytes_per_s": profiling.device_hbm_bandwidth() / 1e9,
        "ceiling_crosscheck": crosscheck,
        "measured_stream_gbytes_per_s": stream / 1e9,
        "int8_mxu_peak_tops": INT8_TOPS / 1e12,
        "note": ("kernel = fused quad-word byte-plane 2-bit decode + "
                 "3-digit-int8-plane MXU dots (ops/pallas_kernels.py, round-4 "
                 "design). The stream ceiling is cross-checked by three "
                 "independent harnesses with RTT-corrected timing; round 3's "
                 "420 GB/s figure was an artifact of the fetch_rtt caching "
                 "bug (ADVICE r3) and every round-3 kernel fraction was "
                 "correspondingly inflated. Small m is stream-bound; large "
                 "m is int8-MXU bound, so fraction_of_floor (time vs "
                 "max(DMA, MXU) floor) is the honest utilization metric "
                 "there, not bytes/s."),
        "kernel": rows,
        "kernel_vt": rows_vt,
        "production_path": (
            "dual-layout problems (packed <= linalg._dual_budget) dispatch "
            "the score to the transposed weight-stationary kernel "
            "(kernel_vt rows) at every RHS width (_VT_MAX_M); larger "
            "problems run the quad kernel (kernel rows)"),
        "walls": {
            "mosaic_compiler_variance": (
                "measured round 5: the SAME quad-kernel source compiled by "
                "the round-4 Mosaic service (persistent-cache binaries, the "
                "'kernel' rows when cache-warm) runs m=1 9.3 ms / m=100 "
                "23.4 ms, while a fresh round-5 recompile runs 24.7 / 38.6 "
                "ms (tools/kernel_lab_results.json) — a 1.6-2.6x codegen "
                "regression outside this repo's control. The transposed "
                "kernel does not exhibit it (5.1 ms fresh at m=1, matching "
                "its round-4 lab measurement), which is why the production "
                "dispatch prefers it whenever dual storage exists."),
            "m100_mid_block": (
                "m=100 -> 300 int8 digit rows = 2.34 128-sublane MXU "
                "blocks; whole-block processing caps mid-block m at 300/384 "
                "= 78% of the rhs-columns floor before any other overhead"),
            "m100_attribution": (
                "digit-plane sweep (tools/kernel_lab5_results.json "
                "attrib_m100: 3/3 / 2/3 / 1/3 planes + decode-free reader) "
                "is linear at ~7 ms per 100 digit rows -> the MXU dot costs "
                "~21 ms at m=100, i.e. exactly the mid-block-capped floor "
                "(15.6 ms / 0.78 = 20 ms), with the remaining ~2-3.4 ms the "
                "decode+DMA stream (3.4 ms DMA floor). Every point between "
                "the measured fraction_of_floor (0.69) and the 78% cap is "
                "accounted: measured ms = capped MXU dot + stream residual; "
                "closing it requires sub-block MXU row issue, which Mosaic "
                "does not expose"),
            "orientation": (
                "quad layout streams decoded values as the dot lhs "
                "(gather-friendly storage); weight-stationary ingestion "
                "measured ~2x faster at narrow m — recovered by the dual "
                "layout, paid for in +2 bits/genotype HBM"),
        },
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROOFLINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
