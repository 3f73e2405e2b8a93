"""Pallas TPU kernels for 2-bit genotype linear algebra.

The hot op of IHT is the full-width score product `X' R` (reference's
SnpLinAlg mul!, SURVEY.md §2.10): every iteration reads the whole packed
matrix once.  This kernel fuses in-register 2-bit decode with the sample-axis
contraction so the packed bytes are read from HBM exactly once per pass:

    HBM (p, n4) uint8 --DMA--> VMEM tile --recode+shift decode--> {0,1,2}
        --MXU dot--> accumulated (m, p) output

Decode: PLINK crumb c (hi = c>>1, lo = c&1) has value hi + (hi&lo) and
missing = lo & ~hi.  The per-byte *recode* ``w8 = ((t>>1)&0x55) + (((t>>1)&
0x55) & t)`` converts all four crumbs to value-coded 2-bit fields in four ops,
after which each plane is a shift+mask (SURVEY.md §7 "2-bit decode at HBM
roofline").  The four shift-planes map to four contiguous sample blocks
thanks to the crumb-transposed layout (genotype/snparray.py), so the rhs is
consumed as (4, n4, m) planes with no gathers.

Orientation: the dots run as (m, n4-tile) x (n4-tile, p-tile) -> (m, p-tile),
i.e. the *small* task axis m maps to MXU sublanes (padded to 8) and the big
SNP axis fills the 128 lanes.  The naive orientation (p-tile, n4)x(n4, m)
pads m up to 128 lanes and is ~3x slower for the single-fit m=2 case
(measured 17 ms vs 5.5 ms per 2.56 GB pass on v5e).

Precision: the MXU multiplies in bf16.  Decoded values {0,1,2} are bf16-exact,
and the rhs is pre-split into bf16 (hi, lo) halves stacked along the row axis
— `A = out_hi + out_lo` reconstructs full f32 accuracy (~1e-6 relative, equal
to an f32 dot) at bf16 MXU throughput.

The multi-RHS design is the point: cross-validation batches (m = q*|path|
tasks) and multivariate traits ride the `m` axis, so the decode cost is paid
once for the whole batch; large m is processed in chunks that keep the rhs
tile inside VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# tile sizes: TP SNP rows x TN4 packed bytes (= TN4 samples per shift plane)
_TP = 512
_TN4 = 512
# max (2*m) columns handled per kernel launch; above this the rhs is chunked
_M2_CHUNK = 512


def _cdiv(a, b):
    return -(-a // b)


def _split_hi_lo_rows(rhsT):
    """f32 (4, m, n4) -> bf16 (4, 2m, n4): rows [hi | lo], hi + lo ~= rhs.

    NOTE: the naive `hi = bf16(rhs); lo = rhs - f32(hi)` is folded to lo == 0
    by XLA's convert-round-trip simplification; mask the mantissa via bitcast
    instead (top 16 bits are exactly representable in bf16)."""
    bits = jax.lax.bitcast_convert_type(rhsT, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000),
                                          jnp.float32)
    lo = rhsT - hi_f32
    return jnp.concatenate([hi_f32.astype(jnp.bfloat16),
                            lo.astype(jnp.bfloat16)], axis=1)


def _kernel(packed_ref, rhs_ref, a_ref, m_ref, s_ref, *, want_missing,
            want_sq, decode_dtype=jnp.int32):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        a_ref[:] = jnp.zeros_like(a_ref)
        if want_missing:
            m_ref[:] = jnp.zeros_like(m_ref)
        if want_sq:
            s_ref[:] = jnp.zeros_like(s_ref)

    t = packed_ref[:].astype(decode_dtype)
    h = (t >> 1) & 0x55
    w8 = h + (h & t)                      # all 4 crumbs value-coded {0,1,2}
    if want_missing:
        # miss = lo & ~hi per crumb: lo bits sit at 0x55 positions, hi bits
        # shifted down land at the same positions (== h).
        lo05 = t & 0x55
        m8 = lo05 - (lo05 & h)
    acc_a = a_ref[:]
    acc_m = m_ref[:] if want_missing else None
    acc_s = s_ref[:] if want_sq else None
    dn = (((1,), (1,)), ((), ()))         # (m, n) x (p, n) -> (m, p)
    for s in range(4):
        c = (w8 >> (2 * s)) & 0x3
        val = c.astype(jnp.bfloat16)      # (TP, TN4)
        rhs_s = rhs_ref[s]                # (M2, TN4)
        acc_a = acc_a + jax.lax.dot_general(
            rhs_s, val, dn, preferred_element_type=jnp.float32)
        if want_missing:
            miss = (((m8 >> (2 * s)) & 0x1)).astype(jnp.bfloat16)
            acc_m = acc_m + jax.lax.dot_general(
                rhs_s, miss, dn, preferred_element_type=jnp.float32)
        if want_sq:
            sq = (val * val).astype(jnp.bfloat16)     # {0,1,4}, bf16-exact
            acc_s = acc_s + jax.lax.dot_general(
                rhs_s, sq, dn, preferred_element_type=jnp.float32)
    a_ref[:] = acc_a
    if want_missing:
        m_ref[:] = acc_m
    if want_sq:
        s_ref[:] = acc_s


def _xt_dots_chunk(packed, rhsT_bf16, *, want_missing, want_sq, tp=_TP,
                   tn4=_TN4, decode_dtype=jnp.int32):
    """packed (p_pad, n4_pad) uint8, rhsT_bf16 (4, M2, n4_pad) bf16 ->
    (A, M, S) each (M2, p_pad) f32."""
    p_pad, n4_pad = packed.shape
    m2 = rhsT_bf16.shape[1]
    grid = (p_pad // tp, n4_pad // tn4)
    in_specs = [
        pl.BlockSpec((tp, tn4), lambda i, j: (i, j)),
        pl.BlockSpec((4, m2, tn4), lambda i, j: (0, 0, j)),
    ]
    out_spec = pl.BlockSpec((m2, tp), lambda i, j: (0, i))
    n_out = 1 + int(want_missing) + int(want_sq)
    flops = 2 * p_pad * 4 * n4_pad * m2 * n_out
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=p_pad * n4_pad + 4 * n4_pad * m2 * 2
        + p_pad * m2 * 4 * n_out,
        transcendentals=0)
    kern = functools.partial(_kernel, want_missing=want_missing,
                             want_sq=want_sq, decode_dtype=decode_dtype)
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((m2, p_pad), jnp.float32),) * 3,
        cost_estimate=cost,
    )(packed, rhsT_bf16)


@functools.partial(jax.jit, static_argnames=("want_missing", "want_sq", "tp",
                                             "tn4", "decode_dtype"))
def xt_dots(packed: jnp.ndarray, rhs: jnp.ndarray, *, want_missing: bool,
            want_sq: bool = False, tp: int = _TP, tn4: int = _TN4,
            decode_dtype=jnp.int32):
    """Fused decode + multi-RHS dots; same contract as decode.xt_dots.

    packed (p, n4) uint8; rhs (4*n4, m) float32.
    Returns (A, M, S): (p, m) value dot, missing dot (or None), squared-value
    dot (or None)."""
    p, n4 = packed.shape
    m = rhs.shape[1]
    p_pad = _cdiv(p, tp) * tp
    n4_pad = _cdiv(n4, tn4) * tn4
    if p_pad != p:
        packed = jnp.pad(packed, ((0, p_pad - p), (0, 0)))
    rhs_planes = rhs.astype(jnp.float32).reshape(4, n4, m)
    if n4_pad != n4:
        packed = jnp.pad(packed, ((0, 0), (0, n4_pad - n4)))
        rhs_planes = jnp.pad(rhs_planes, ((0, 0), (0, n4_pad - n4), (0, 0)))
    rhsT = jnp.transpose(rhs_planes, (0, 2, 1))         # (4, m, n4_pad)
    rhsT2 = _split_hi_lo_rows(rhsT)                     # (4, 2m, n4_pad) bf16

    outs = [[], [], []]
    for lo in range(0, m, _M2_CHUNK // 2):
        hi = min(lo + _M2_CHUNK // 2, m)
        chunk = jnp.concatenate([rhsT2[:, lo:hi], rhsT2[:, m + lo:m + hi]],
                                axis=1)                 # (4, 2c, n4_pad)
        o = _xt_dots_chunk(packed, chunk, want_missing=want_missing,
                           want_sq=want_sq, tp=tp, tn4=tn4,
                           decode_dtype=decode_dtype)
        c = hi - lo
        for k in range(3):
            outs[k].append(o[k][:c] + o[k][c:2 * c])    # merge hi+lo rows

    def merge(parts):
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return out[:, :p].T                             # (p, m)

    A = merge(outs[0])
    M = merge(outs[1]) if want_missing else None
    S = merge(outs[2]) if want_sq else None
    return A, M, S
