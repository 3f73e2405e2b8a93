"""Diagnose host->device streaming overlap on this backend (round-5: the
round-4 streamed pass measured 47% overlap vs the design's ~100%).

Questions probed:
  1. does jax.device_put return before the copy completes (async)?
  2. do two in-flight device_puts overlap each other?
  3. does the current StreamedPackedOp.xtr drain pattern serialize?

Usage: python tools/stream_probe.py
"""

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

MB = 1 << 20
BLOCK = 128 * MB


def make_blocks(k):
    return [np.random.default_rng(i).integers(
        0, 2**31 - 1, size=(BLOCK // 4,), dtype=np.int32) for i in range(k)]


def t(msg, dt, nbytes=None):
    rate = f"  {nbytes / dt / 1e6:7.1f} MB/s" if nbytes else ""
    print(f"{msg:55s} {dt:7.3f} s{rate}", flush=True)


def main():
    print("device:", jax.devices(), flush=True)
    red = jax.jit(lambda x: jnp.sum(x))
    blocks = make_blocks(6)
    # warm
    d = jax.device_put(blocks[0])
    np.asarray(red(d))

    # 1. is device_put itself blocking?
    t0 = time.time()
    d1 = jax.device_put(blocks[1])
    dt_put = time.time() - t0
    t0 = time.time()
    np.asarray(red(d1))
    dt_use = time.time() - t0
    t("device_put returns in", dt_put, BLOCK)
    t("  ...then first use waits", dt_use, BLOCK)

    # 2. two puts in flight: total time vs 2x single?
    t0 = time.time()
    a = jax.device_put(blocks[2])
    b = jax.device_put(blocks[3])
    np.asarray(red(a)); np.asarray(red(b))
    dt2 = time.time() - t0
    t("two puts end-to-end", dt2, 2 * BLOCK)

    # 3. sequential baseline: put, use, put, use
    t0 = time.time()
    for i in (4, 5):
        d = jax.device_put(blocks[i])
        np.asarray(red(d))
    dt_seq = time.time() - t0
    t("sequential put+use x2", dt_seq, 2 * BLOCK)

    # 4. the current xtr drain pattern on a synthetic streamed matrix
    from mendeliht_tpu.ops.streaming import (HostStreamedGenotypes,
                                             StreamedPackedOp)
    from mendeliht_tpu.genotype.snparray import _ceil_to, _LANE
    n, p = 8192, 131072 * 4            # words ~ (p/4, n4) i32
    n4 = _ceil_to(-(-n // 4), _LANE)
    rng = np.random.default_rng(0)
    words = rng.integers(0, 2**31 - 1, size=(p // 4, n4), dtype=np.int32)
    print(f"synthetic streamed matrix: {words.nbytes/1e9:.2f} GB, "
          f"n4={n4}", flush=True)
    g = HostStreamedGenotypes(
        words_np=words, mu=jnp.zeros(p), inv_sd=jnp.ones(p), n=n, p=p,
        has_missing=False, block_bytes=256 * MB)
    sop = StreamedPackedOp(g)
    R = jnp.ones((1, sop.n_pad), jnp.float32)
    np.asarray(sop.xtr(R)[0, :8])                      # warm compile
    t0 = time.time()
    np.asarray(sop.xtr(R * 1.5)[0, :8])
    dt_pass = time.time() - t0
    t("streamed xtr pass (current drain)", dt_pass, words.nbytes)

    # 5. pure transfer of the same bytes, fully sequential put+use
    nb = g.block_p // 4
    t0 = time.time()
    for lo in range(0, p // 4, nb):
        d = jax.device_put(np.ascontiguousarray(words[lo:lo + nb]))
        np.asarray(red(d[:1, :1]))
    dt_xfer = time.time() - t0
    t("same bytes, sequential put+tiny-use", dt_xfer, words.nbytes)
    print(f"overlap efficiency = {dt_xfer / dt_pass:.2f}", flush=True)


if __name__ == "__main__":
    main()
