"""Pallas TPU kernels for 2-bit genotype linear algebra.

The hot op of IHT is the full-width score product `X' R` (reference's
SnpLinAlg mul!, SURVEY.md §2.10): every iteration reads the whole packed
matrix once.  This kernel fuses in-register 2-bit decode with the sample-axis
contraction so the packed bytes are read from HBM exactly once per pass:

    HBM (p, nw) int32 --DMA--> VMEM tile --word recode+shift decode--> {0,1,2}
        --MXU dot--> accumulated (m, p) output

Word-packed decode (the key to VPU efficiency): the (p, n4) uint8 buffer is
bitcast to (p, n4/4) int32 *words* so every bitwise op processes 4 bytes
(16 genotypes) per 32-bit VPU lane.  PLINK crumb c (hi = c>>1, lo = c&1) has
value hi + (hi&lo) and missing = lo & ~hi; the per-word recode
``w = h + (h & t)`` with ``h = (t >> 1) & 0x55555555`` value-codes all 16
crumbs in 4 lane-ops.  Each of the 16 decode *rounds* (s, b) then extracts
one crumb per word — ``(w >> (2s + 8b)) & 3`` — and feeds the MXU.  Total
~13 VPU lane-ops per byte vs ~17 for a byte-per-lane design; measured ~300
GB/s of packed bytes on a v5e-class chip (the kernel is VPU-decode-bound,
not HBM-bound: a pure streaming pass runs >800 GB/s, so ~100% of the
achievable decode roofline).

Sample mapping: with the crumb-transposed layout (genotype/snparray.py),
byte b' of SNP row j holds crumb s of sample ``s*n4 + b'``; word w packs
bytes 4w..4w+3, so round (s, b) of word w is sample ``s*n4 + 4w + b``.  The
rhs is pre-restrided into (16, m, nw) round-planes outside the kernel — no
gathers inside.

Orientation: the dots run as (m2, tw) x (tp, tw) -> (m2, tp), i.e. the
*small* task axis maps to MXU sublanes and the big SNP axis fills the 128
lanes.  The naive orientation pads m up to 128 lanes and is ~3x slower for
the single-fit m=1..2 case.

Precision: the MXU multiplies in bf16.  Decoded values {0,1,2} are
bf16-exact, and the rhs is pre-split into bf16 (hi, lo) halves stacked along
the row axis — `A = out_hi + out_lo` reconstructs full f32 accuracy (~1e-6
relative, equal to an f32 dot) at bf16 MXU throughput.

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

# tile sizes: TP SNP rows x TW packed int32 words (= 4*TW bytes, 16*TW crumbs)
_TP = 1024
# words-block VMEM budget: prefer covering the WHOLE sample axis in one
# reduction tile (grid j == 1) — measured 309 GB/s vs 255 at tw=256 on v5e
# (fewer tile revisits => better DMA pipelining); fall back to fixed tw only
# when tp*nw*4 would blow VMEM (n > ~131k samples at tp=1024).
_TW_BYTES_BUDGET = 8 * 2**20
_TW_FALLBACK = 2048
# max (2*m) rhs columns handled per kernel launch; above this the rhs is
# chunked so the (16, m2, tw) rhs block stays comfortably inside VMEM
_M2_CHUNK = 512


def _pick_tw(nw: int, tp: int) -> int:
    if nw * tp * 4 <= _TW_BYTES_BUDGET:
        return nw
    return _TW_FALLBACK


def _cdiv(a, b):
    return -(-a // b)


def _split_hi_lo_rows(rhsT):
    """f32 (16, m, nw) -> bf16 (16, 2m, nw): rows [hi | lo], hi + lo == rhs.

    NOTE: the naive `hi = bf16(rhs); lo = rhs - f32(hi)` is folded to lo == 0
    by XLA's convert-round-trip simplification; mask the mantissa via bitcast
    instead (top 16 bits are exactly representable in bf16)."""
    bits = jax.lax.bitcast_convert_type(rhsT, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000),
                                          jnp.float32)
    lo = rhsT - hi_f32
    return jnp.concatenate([hi_f32.astype(jnp.bfloat16),
                            lo.astype(jnp.bfloat16)], axis=1)


def _kernel(words_ref, rhs_ref, *out_refs, want_missing, want_sq,
            interpret=False):
    # out_refs holds exactly the requested planes, in order [A, M?, S?] —
    # allocating all three unconditionally costs ~1.5x bandwidth when only A
    # is wanted (the single-fit hot path).
    it = iter(out_refs)
    a_ref = next(it)
    m_ref = next(it) if want_missing else None
    s_ref = next(it) if want_sq else None
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        a_ref[:] = jnp.zeros_like(a_ref)
        if want_missing:
            m_ref[:] = jnp.zeros_like(m_ref)
        if want_sq:
            s_ref[:] = jnp.zeros_like(s_ref)

    t = words_ref[:]
    h = (t >> 1) & 0x55555555
    w = h + (h & t)                       # all 16 crumbs value-coded {0,1,2}
    if want_missing:
        # miss = lo & ~hi per crumb: lo bits sit at 0x55..5 positions, hi
        # bits shifted down land at the same positions (== h).
        lo05 = t & 0x55555555
        m16 = lo05 - (lo05 & h)
    acc_a = a_ref[:]
    acc_m = m_ref[:] if want_missing else None
    acc_s = s_ref[:] if want_sq else None
    dn = (((1,), (1,)), ((), ()))         # (m2, K) x (tp, K) -> (m2, tp)
    for r in range(16):                   # round r = (s, b): shift 2s + 8b
        shift = 2 * (r % 4) + 8 * (r // 4)
        c = (w >> shift) & 0x3
        val = c.astype(jnp.bfloat16)      # (tp, tw)
        rhs_r = rhs_ref[r]                # (m2, tw)
        acc_a = acc_a + jax.lax.dot_general(
            rhs_r, val, dn, preferred_element_type=jnp.float32)
        if want_missing:
            miss = ((m16 >> shift) & 0x1).astype(jnp.bfloat16)
            acc_m = acc_m + jax.lax.dot_general(
                rhs_r, miss, dn, preferred_element_type=jnp.float32)
        if want_sq:
            sq = val * val                # {0,1,4}, bf16-exact
            acc_s = acc_s + jax.lax.dot_general(
                rhs_r, sq, dn, preferred_element_type=jnp.float32)
    a_ref[:] = acc_a
    if want_missing:
        m_ref[:] = acc_m
    if want_sq:
        s_ref[:] = acc_s


def _xt_dots_chunk(words, rounds_bf16, *, want_missing, want_sq, tp, tw,
                   interpret=False):
    """words (p, nw) int32, rounds_bf16 (16, M2, nw_pad) bf16 with
    nw_pad = ceil(nw/tw)*tw and zero tail -> (A, M, S) each (M2, p) f32.

    Edge tiles of `words` (p % tp rows, nw % tw cols) are partial: Pallas
    masks the stores, and garbage loads on the reduction tail are multiplied
    by the rhs zero padding."""
    p, nw = words.shape
    m2 = rounds_bf16.shape[1]
    grid = (_cdiv(p, tp), _cdiv(nw, tw))
    in_specs = [
        pl.BlockSpec((tp, tw), lambda i, j: (i, j)),
        pl.BlockSpec((16, m2, tw), lambda i, j: (0, 0, j)),
    ]
    out_spec = pl.BlockSpec((m2, tp), lambda i, j: (0, i))
    n_out = 1 + int(want_missing) + int(want_sq)
    flops = 2 * p * 16 * nw * m2 * n_out
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=p * nw * 4 + 16 * nw * m2 * 2 + p * m2 * 4 * n_out,
        transcendentals=0)
    kern = functools.partial(_kernel, want_missing=want_missing,
                             want_sq=want_sq)
    outs = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=(out_spec,) * n_out,
        out_shape=(jax.ShapeDtypeStruct((m2, p), jnp.float32),) * n_out,
        cost_estimate=cost,
        interpret=interpret,
    )(words, rounds_bf16)
    it = iter(outs)
    return (next(it),
            next(it) if want_missing else None,
            next(it) if want_sq else None)


@functools.partial(jax.jit, static_argnames=("want_missing", "want_sq", "tp",
                                             "tw", "interpret"))
def xt_dots_words(words: jnp.ndarray, rhs: jnp.ndarray, *, want_missing: bool,
                  want_sq: bool = False, tp: int = _TP, tw: int | None = None,
                  interpret: bool = False):
    """Fused decode + multi-RHS dots over the canonical int32-word storage.

    words (p, nw) int32 (= PackedGenotypes.words); rhs (16*nw, m) float32.
    Returns (A, M, S): (p, m) value dot, missing dot (or None), squared-value
    dot (or None).

    The big words matrix passes through untouched: partial edge tiles (p % tp,
    nw % tw) are handled by Pallas masked loads/stores.  Out-of-bounds words
    decode to finite garbage in {0..3} which is annihilated by the zero-padded
    rhs along the reduction axis, so no O(p*nw) pad or relayout copy is ever
    made per pass (that copy was the round-1 kernel's hidden memory blow-up).
    Only the small (16, m, nw) rhs planes are padded/transposed per call."""
    p, nw = words.shape
    m = rhs.shape[1]
    if tw is None:
        tw = _pick_tw(nw, tp)
    nw_pad = _cdiv(nw, tw) * tw
    # round r = (s = r%4, b = r//4) plane: element w = sample s*n4 + 4w + b,
    # so planes are ordered [b, s] -> flat index 4b + s == r
    rhs_rounds = jnp.transpose(
        rhs.astype(jnp.float32).reshape(4, nw, 4, m),      # [s, w, b, m]
        (2, 0, 3, 1)).reshape(16, m, nw)                   # [b, s, m, w]
    if nw_pad != nw:
        rhs_rounds = jnp.pad(rhs_rounds, ((0, 0), (0, 0), (0, nw_pad - nw)))
    rounds2 = _split_hi_lo_rows(rhs_rounds)                # (16, 2m, nw) bf16

    outs = [[], [], []]
    for lo in range(0, m, _M2_CHUNK // 2):
        hi = min(lo + _M2_CHUNK // 2, m)
        chunk = jnp.concatenate(
            [rounds2[:, lo:hi], rounds2[:, m + lo:m + hi]], axis=1)
        o = _xt_dots_chunk(words, chunk, want_missing=want_missing,
                           want_sq=want_sq, tp=tp, tw=tw, interpret=interpret)
        c = hi - lo
        for k in range(3):
            if o[k] is not None:
                outs[k].append(o[k][:c] + o[k][c:2 * c])   # merge hi+lo rows

    def merge(parts):
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return out.T                                       # (p, m)

    A = merge(outs[0])
    M = merge(outs[1]) if want_missing else None
    S = merge(outs[2]) if want_sq else None
    return A, M, S


def xt_dots(packed: jnp.ndarray, rhs: jnp.ndarray, *, want_missing: bool,
            want_sq: bool = False, tp: int = _TP, tw: int | None = None,
            interpret: bool = False):
    """Byte-view wrapper with the decode.xt_dots contract (tests/oracles).

    packed (p, n4) uint8 with n4 % 4 == 0; rhs (4*n4, m) float32.  Production
    callers should pass the canonical word storage to :func:`xt_dots_words`
    instead — this wrapper's u8->i32 bitcast costs a relayout copy on TPU."""
    p, n4 = packed.shape
    words = jax.lax.bitcast_convert_type(
        packed.reshape(p, n4 // 4, 4), jnp.int32)
    return xt_dots_words(words, rhs, want_missing=want_missing,
                         want_sq=want_sq, tp=tp, tw=tw, interpret=interpret)
