"""Pallas TPU kernels for 2-bit genotype linear algebra.

The hot op of IHT is the full-width score product `X' R` (reference's
SnpLinAlg mul!, SURVEY.md §2.10): every iteration reads the whole packed
matrix once.  This kernel fuses in-register 2-bit decode with the sample-axis
contraction so the packed bytes are read from HBM exactly once per pass:

    HBM (p, n4) uint8 --DMA--> VMEM tile --shift/mask decode--> {0,1,2} planes
        --MXU dot with rhs plane--> accumulated (p, m) output

Decode algebra per crumb c (see ops/decode.py): value = (c>>1) + ((c>>1)&c&1),
missing = (c&1) & ~(c>>1).  The four shift-planes map to four contiguous
sample blocks thanks to the crumb-transposed layout (genotype/snparray.py),
so the rhs is consumed as a (4, n4, m) reshape with no gathers.

Precision: the MXU multiplies in bf16.  Decoded values {0,1,2} are bf16-exact,
and the rhs is pre-split into bf16 (hi, lo) halves concatenated along the
column axis — one matmul computes both halves (output lanes are padded to 128
anyway for m <= 64), and `A = out_hi + out_lo` reconstructs full f32 accuracy
(~1e-5 relative, equal to an f32 dot) at bf16 MXU throughput.

The multi-RHS design is the point: cross-validation batches (m = q*|path|
tasks) and multivariate traits ride the `m` axis, so the decode cost is paid
once for the whole batch and the MXU contracts all columns in one pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile sizes: TP SNP rows x TN4 packed bytes (= TN4 samples per shift plane)
_TP = 512
_TN4 = 512


def _cdiv(a, b):
    return -(-a // b)


def _split_hi_lo(rhs):
    """f32 (n, m) -> bf16 (n, 2m): [hi | lo] with hi + lo ~= rhs to ~1e-7.

    NOTE: the naive `hi = bf16(rhs); lo = rhs - f32(hi)` is folded to lo == 0
    by XLA's convert-round-trip simplification; mask the mantissa via bitcast
    instead (top 16 bits are exactly representable in bf16)."""
    bits = jax.lax.bitcast_convert_type(rhs, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000),
                                          jnp.float32)
    lo = rhs - hi_f32
    return jnp.concatenate([hi_f32.astype(jnp.bfloat16),
                            lo.astype(jnp.bfloat16)], axis=-1)


def _kernel(packed_ref, rhs_ref, a_ref, m_ref, s_ref, *, want_missing,
            want_sq):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        a_ref[:] = jnp.zeros_like(a_ref)
        if want_missing:
            m_ref[:] = jnp.zeros_like(m_ref)
        if want_sq:
            s_ref[:] = jnp.zeros_like(s_ref)

    t32 = packed_ref[:].astype(jnp.int32)
    acc_a = a_ref[:]
    acc_m = m_ref[:] if want_missing else None
    acc_s = s_ref[:] if want_sq else None
    for s in range(4):
        c = (t32 >> (2 * s)) & 0x3
        hi = c >> 1
        hl = hi & c
        rhs_s = rhs_ref[s]
        val = (hi + hl).astype(jnp.bfloat16)
        acc_a = acc_a + jnp.dot(val, rhs_s,
                                preferred_element_type=jnp.float32)
        if want_missing:
            miss = ((c & 1) - hl).astype(jnp.bfloat16)
            acc_m = acc_m + jnp.dot(miss, rhs_s,
                                    preferred_element_type=jnp.float32)
        if want_sq:
            sq = (hi + 3 * hl).astype(jnp.bfloat16)
            acc_s = acc_s + jnp.dot(sq, rhs_s,
                                    preferred_element_type=jnp.float32)
    a_ref[:] = acc_a
    if want_missing:
        m_ref[:] = acc_m
    if want_sq:
        s_ref[:] = acc_s


@functools.partial(jax.jit, static_argnames=("want_missing", "want_sq"))
def xt_dots(packed: jnp.ndarray, rhs: jnp.ndarray, *, want_missing: bool,
            want_sq: bool = False):
    """Fused decode + multi-RHS dots; same contract as decode.xt_dots.

    packed (p, n4) uint8; rhs (4*n4, m) float32.
    Returns (A, M, S): (p, m) value dot, missing dot (or None), squared-value
    dot (or None)."""
    p, n4 = packed.shape
    m = rhs.shape[1]
    p_pad = _cdiv(p, _TP) * _TP
    n4_pad = _cdiv(n4, _TN4) * _TN4
    if p_pad != p:
        packed = jnp.pad(packed, ((0, p_pad - p), (0, 0)))
    rhs_planes = rhs.astype(jnp.float32).reshape(4, n4, m)
    if n4_pad != n4:
        packed = jnp.pad(packed, ((0, 0), (0, n4_pad - n4)))
        rhs_planes = jnp.pad(rhs_planes, ((0, 0), (0, n4_pad - n4), (0, 0)))
    rhs_planes = _split_hi_lo(rhs_planes)               # (4, n4_pad, 2m)
    m2 = 2 * m

    grid = (p_pad // _TP, n4_pad // _TN4)
    in_specs = [
        pl.BlockSpec((_TP, _TN4), lambda i, j: (i, j)),
        pl.BlockSpec((4, _TN4, m2), lambda i, j: (0, j, 0)),
    ]
    out_spec = pl.BlockSpec((_TP, m2), lambda i, j: (i, 0))
    n_out = 1 + int(want_missing) + int(want_sq)
    flops = 2 * p_pad * 4 * n4_pad * m2 * n_out
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=p_pad * n4_pad + 4 * n4_pad * m2 * 2 + p_pad * m2 * 4,
        transcendentals=0)

    kern = functools.partial(_kernel, want_missing=want_missing,
                             want_sq=want_sq)
    outs = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((p_pad, m2), jnp.float32),) * 3,
        cost_estimate=cost,
    )(packed, rhs_planes)

    def merge(o):
        return o[:p, :m] + o[:p, m:]

    A = merge(outs[0])
    M = merge(outs[1]) if want_missing else None
    S = merge(outs[2]) if want_sq else None
    return A, M, S
