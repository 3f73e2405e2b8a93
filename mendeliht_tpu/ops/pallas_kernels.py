"""Pallas TPU kernels for 2-bit genotype linear algebra.

The hot op of IHT is the full-width score product `X' R` (reference's
SnpLinAlg mul!, SURVEY.md §2.10): every iteration reads the whole packed
matrix once.  This kernel fuses in-register 2-bit decode with the sample-axis
contraction so the packed bytes are read from HBM exactly once per pass:

    HBM (p, nw) int32 --DMA--> VMEM tile --word recode+shift decode--> {0,1,2}
        --int8 MXU dot--> int32 accumulators --digit combine--> (m, p) f32

Word-packed decode (the key to VPU efficiency): the (p, n4) uint8 buffer is
bitcast to (p, n4/4) int32 *words* so every bitwise op processes 4 bytes
(16 genotypes) per 32-bit VPU lane.  PLINK crumb c (hi = c>>1, lo = c&1) has
value hi + (hi&lo) and missing = lo & ~hi; the per-word recode
``w = h + (h & t)`` with ``h = (t >> 1) & 0x55555555`` value-codes all 16
crumbs in 4 lane-ops.  Each of the 16 decode *rounds* (s, b) then extracts
one crumb per word — ``(w >> (2s + 8b)) & 3`` — and feeds the MXU.

int8 MXU path (round 3; replaces the round-2 bf16 hi/lo design): decoded
values {0,1,2} are int8-exact, and the rhs is quantized to three int8
*digit* planes ``r ~= scale * (hi*16384 + mid*128 + lo)`` with per-column
scale = max|r| / 2^20 and every digit in [-64, 64].  The dots accumulate
exactly in int32 (|acc| <= 2*64*n < 2^31 up to n = 160M samples) and one
f32 digit-combine per output tile reconstructs the value.  Why it wins on
both ends of the m axis (committed v5e numbers: ROOFLINE.json, regenerated
by tools/roofline.py on the 10k x 1M problem):

  * m = 1 (single fit, VPU-decode-bound): 3 int8 rows replace 2 bf16 rows
    and int8 converts are cheaper than bf16 converts — 9.5 ms -> 7.7 ms
    (331 GB/s = 78.7% of the ~420 GB/s measured stream ceiling; a pure
    XOR-read of the same array runs 5.9 ms, so decode adds only ~1.8 ms).
  * m >= ~32 (cross-validation batches, MXU-bound): 3m int8 rows at the
    MXU's 394 TOPS int8 rate beat 2m bf16 rows at 197 TFLOP/s — m=64:
    17.0 -> 13.8 ms, 72% of the int8-MXU compute floor (bytes/s is the
    wrong lens here — see the dma/mxu floor fields in ROOFLINE.json), and
    a reference-shaped cv batch (m = 100 = q*|path|) runs in ONE words
    pass (21.6 ms) thanks to the VMEM-resident rhs planes.

Accuracy: 21 significant bits relative to each column's max — measured
~5e-6 relative error on the full X'R pass, comparable to the previous bf16
hi/lo split (~1e-6) and far inside the solver's 1e-4 convergence tolerance;
tests/test_pallas.py pins it below 2e-5.

Sample mapping: with the crumb-transposed layout (genotype/snparray.py),
byte b' of SNP row j holds crumb s of sample ``s*n4 + b'``; word w packs
bytes 4w..4w+3, so round (s, b) of word w is sample ``s*n4 + 4w + b``.  The
rhs digit planes are pre-restrided into (16, rows, nw) round-planes outside
the kernel — no gathers inside.

Orientation: the dots run as (rows, tw) x (tp, tw) -> (rows, tp), i.e. the
*small* task axis maps to MXU sublanes and the big SNP axis fills the 128
lanes.  The naive orientation pads m up to 128 lanes and is ~3x slower for
the single-fit m=1..2 case.

The multi-RHS design is the point: cross-validation batches (m = q*|path|
tasks) and multivariate traits ride the `m` axis, so the decode cost is paid
once for the whole batch.  The full digit planes for an m-chunk are
VMEM-RESIDENT (constant block index, fetched once) and each grid step slices
its reduction window out of them, so the words are the only O(p) HBM
traffic; (tw, mc) are picked jointly from an explicit VMEM byte budget to
minimize full passes over the words (a reference-shaped cv batch m = 100
fits ONE chunk) — no shape can blow VMEM at compile time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile sizes: TP SNP rows x TW packed int32 words (= 4*TW bytes, 16*TW crumbs)
_TP = 1024
# total VMEM working-set target (v5e has ~16 MiB/core; tp=2048 at m=64,
# ~16.4 MiB with double-buffering, is an empirically confirmed Mosaic
# compile failure — keep headroom)
_VMEM_BUDGET = 12 * 2**20
# test hook: force a small m-chunk regardless of the budget
_FORCE_M_CHUNK = None


def _pick_tiles(nw: int, tp: int, m: int, n_acc: int):
    """Joint (tw, mc) choice minimizing full HBM passes over the words.

    The rhs digit planes for a whole m-chunk stay VMEM-RESIDENT for the
    entire kernel (constant block index — fetched once, single-buffered),
    and each grid step slices its tw-word window out of them, so shrinking
    tw costs no extra rhs traffic.  Every m-chunk beyond the first re-reads
    the full packed matrix from HBM, so the picker prefers the fewest
    chunks, then the largest reduction tile.  VMEM accounting per chunk:
    double-buffered (tp, tw) words, resident (16, 3*mc, nw_pad) int8 rhs,
    n_acc int32 accumulators (3*mc, tp), and n_acc revolving f32 output
    tiles (mc, tp) (ADVICE r2 #1: budget from bytes, never a fixed cap)."""
    best = None
    for tw in sorted({min(nw, t) for t in (nw, 2048, 1024, 512, 256, 128)},
                     reverse=True):
        nw_pad = _cdiv(nw, tw) * tw
        fixed = 2 * tp * tw * 4
        per_mc = 16 * 3 * nw_pad + n_acc * (3 * tp * 4 + 2 * tp * 4)
        mc = min((_VMEM_BUDGET - fixed) // per_mc, 256)
        if mc < 1:
            continue
        mc = int(min(mc, m))
        cand = (_cdiv(m, mc), -tw, mc)
        if best is None or cand < best:
            best = cand
    if best is None:  # pathological shapes: smallest tiles, let Mosaic try
        return 128, 8
    chunks, neg_tw, mc = best
    if _FORCE_M_CHUNK is not None:
        mc = _FORCE_M_CHUNK
    return -neg_tw, mc


def _cdiv(a, b):
    return -(-a // b)


def _quantize_rhs_planes(rhs):
    """f32 (n_pad, m) -> ((3m, n_pad) int8 digit planes [hi|mid|lo],
    (m,) f32 per-column scale).

    r ~= scale * (hi*16384 + mid*128 + lo), every digit in [-64, 64]
    (|R| <= 2^20 so hi = round(R/2^14) <= 64, and each remainder is at most
    half the next digit's weight).  All-zero columns get scale 2^-20 and
    zero digits.  NaN/Inf columns produce garbage digits — the caller
    re-poisons the output with 0*colsum (see xt_dots_words)."""
    rhsT = rhs.T.astype(jnp.float32)                     # (m, n_pad)
    mx = jnp.max(jnp.abs(rhsT), axis=1)
    scale = jnp.where(mx > 0, mx, 1.0) / (1 << 20)
    R = jnp.round(rhsT / scale[:, None]).astype(jnp.int32)
    rh = jnp.round(R.astype(jnp.float32) * (1.0 / 16384.0)).astype(jnp.int32)
    rm = jnp.round((R - rh * 16384).astype(jnp.float32) * (1.0 / 128.0)
                   ).astype(jnp.int32)
    rl = R - rh * 16384 - rm * 128
    planes = jnp.concatenate([rh, rm, rl], axis=0).astype(jnp.int8)
    return planes, scale


def _rounds_restride(planes, nw, tw):
    """(rows, 16*nw) sample-ordered -> (16, rows, nw_pad) round-planes.

    Round r = (s = r%4, b = r//4): plane element w = sample s*n4 + 4w + b,
    so planes are ordered [b, s] -> flat index 4b + s == r.  The zero tail
    (nw_pad - nw words) annihilates garbage decoded from out-of-bounds
    words on the reduction tail."""
    rows = planes.shape[0]
    nw_pad = _cdiv(nw, tw) * tw
    r = jnp.transpose(planes.reshape(rows, 4, nw, 4),    # [m, s, w, b]
                      (3, 1, 0, 2)).reshape(16, rows, nw)
    if nw_pad != nw:
        r = jnp.pad(r, ((0, 0), (0, 0), (0, nw_pad - nw)))
    return r


def _kernel(words_ref, rhs_ref, scale_ref, *refs, want_missing, want_sq, tw):
    """refs = out_refs [A, M?, S?] then scratch accs [a, m?, h?].

    rhs_ref holds the FULL (16, 3mc, nw_pad) digit planes (constant block
    index — VMEM-resident across the whole kernel); each grid step slices
    its (3mc, tw) reduction window at j*tw."""
    n_out = 1 + int(want_missing) + int(want_sq)
    out_refs = refs[:n_out]
    acc_refs = refs[n_out:]
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    mc = out_refs[0].shape[0]

    @pl.when(j == 0)
    def _init():
        for a in acc_refs:
            a[:] = jnp.zeros_like(a)

    t = words_ref[:]
    h = (t >> 1) & 0x55555555
    w = h + (h & t)                       # all 16 crumbs value-coded {0,1,2}
    if want_missing:
        # miss = lo & ~hi per crumb: lo bits sit at 0x55..5 positions, hi
        # bits shifted down land at the same positions (== h).
        lo05 = t & 0x55555555
        m16 = lo05 - (lo05 & h)
    it = iter(acc_refs)
    acc_a = next(it)[:]
    acc_m = next(it)[:] if want_missing else None
    acc_h = next(it)[:] if want_sq else None
    dn = (((1,), (1,)), ((), ()))         # (rows, K) x (tp, K) -> (rows, tp)
    for r in range(16):                   # round r = (s, b): shift 2s + 8b
        shift = 2 * (r % 4) + 8 * (r // 4)
        val = ((w >> shift) & 0x3).astype(jnp.int8)      # (tp, tw)
        rhs_r = rhs_ref[r, :, pl.ds(j * tw, tw)]         # (3mc, tw) int8
        acc_a = acc_a + jax.lax.dot_general(
            rhs_r, val, dn, preferred_element_type=jnp.int32)
        if want_missing:
            miss = ((m16 >> shift) & 0x1).astype(jnp.int8)
            acc_m = acc_m + jax.lax.dot_general(
                rhs_r, miss, dn, preferred_element_type=jnp.int32)
        if want_sq:
            # h-bit == [value >= 1]; with v in {0,1,2}: v^2 = 3v - 2*[v>=1]
            hb = ((h >> shift) & 0x1).astype(jnp.int8)
            acc_h = acc_h + jax.lax.dot_general(
                rhs_r, hb, dn, preferred_element_type=jnp.int32)
    it = iter(acc_refs)
    next(it)[:] = acc_a
    if want_missing:
        next(it)[:] = acc_m
    if want_sq:
        next(it)[:] = acc_h

    @pl.when(j == nj - 1)
    def _combine():
        s = scale_ref[:]                                 # (mc, 1) f32

        def comb(acc):
            a = acc.astype(jnp.float32)
            return (16384.0 * a[0:mc] + 128.0 * a[mc:2 * mc]
                    + a[2 * mc:3 * mc]) * s

        A = comb(acc_a)
        out_refs[0][:] = A
        k = 1
        if want_missing:
            out_refs[k][:] = comb(acc_m)
            k += 1
        if want_sq:
            out_refs[k][:] = 3.0 * A - 2.0 * comb(acc_h)


def _xt_dots_chunk(words, rounds_i8, scale, *, want_missing, want_sq, tp, tw,
                   interpret=False):
    """words (p, nw) int32, rounds_i8 (16, 3*mc, nw_pad) int8, scale (mc,)
    -> (A, M, S) each (mc, p) f32.

    Edge tiles of `words` (p % tp rows, nw % tw cols) are partial: Pallas
    masks the stores, and garbage decodes on the reduction tail are
    annihilated by the rhs zero padding."""
    p, nw = words.shape
    mc = rounds_i8.shape[1] // 3
    nw_pad = rounds_i8.shape[2]
    grid = (_cdiv(p, tp), _cdiv(nw, tw))
    in_specs = [
        pl.BlockSpec((tp, tw), lambda i, j: (i, j)),
        # constant block index: the full digit planes are DMA'd once and stay
        # VMEM-resident; the kernel slices its (3mc, tw) window per grid step
        pl.BlockSpec((16, 3 * mc, nw_pad), lambda i, j: (0, 0, 0)),
        pl.BlockSpec((mc, 1), lambda i, j: (0, 0)),
    ]
    out_spec = pl.BlockSpec((mc, tp), lambda i, j: (0, i))
    n_out = 1 + int(want_missing) + int(want_sq)
    flops = 2 * p * 16 * nw * 3 * mc * n_out
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=p * nw * 4 + 16 * nw_pad * 3 * mc + p * mc * 4 * n_out,
        transcendentals=0)
    kern = functools.partial(_kernel, want_missing=want_missing,
                             want_sq=want_sq, tw=tw)
    outs = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=(out_spec,) * n_out,
        out_shape=(jax.ShapeDtypeStruct((mc, p), jnp.float32),) * n_out,
        scratch_shapes=[pltpu.VMEM((3 * mc, tp), jnp.int32)] * n_out,
        cost_estimate=cost,
        interpret=interpret,
    )(words, rounds_i8, scale[:, None])
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

    words (p, nw) int32 (= PackedGenotypes.words); rhs (16*nw, m) float.
    Returns (A, M, S): (p, m) value dot, missing dot (or None), squared-value
    dot (or None), all f32.

    The big words matrix passes through untouched: partial edge tiles (p % tp,
    nw % tw) are handled by Pallas masked loads/stores, and out-of-bounds
    words decode to finite garbage in {0..3} which is annihilated by the
    zero-padded rhs along the reduction axis, so no O(p*nw) pad or relayout
    copy is ever made per pass.  Only the small int8 digit planes are
    restrided per call.

    NaN/Inf rhs columns (a failed cv task's residual) would quantize to
    finite garbage and silently un-fail the task; ``0 * colsum`` re-poisons
    every output row so NaN propagates exactly like the f32 oracle."""
    p, nw = words.shape
    m = rhs.shape[1]
    n_acc = 1 + int(want_missing) + int(want_sq)
    tw_pick, mc = _pick_tiles(nw, tp, m, n_acc)
    if tw is None:
        tw = tw_pick
    planes, scale = _quantize_rhs_planes(rhs)            # (3m, n_pad), (m,)
    nan_guard = (jnp.sum(rhs, axis=0) * 0.0).astype(jnp.float32)   # (m,)

    outs = [[], [], []]
    for lo in range(0, m, mc):
        hi = min(lo + mc, m)
        chunk = jnp.concatenate([planes[lo:hi], planes[m + lo:m + hi],
                                 planes[2 * m + lo:2 * m + hi]], axis=0)
        rr = _rounds_restride(chunk, nw, tw)             # (16, 3c, nw_pad)
        o = _xt_dots_chunk(words, rr, scale[lo:hi],
                           want_missing=want_missing, want_sq=want_sq,
                           tp=tp, tw=tw, interpret=interpret)
        for k in range(3):
            if o[k] is not None:
                outs[k].append(o[k])

    def merge(parts):
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return (out + nan_guard[:, None]).T              # (p, m)

    A = merge(outs[0])
    M = merge(outs[1]) if want_missing else None
    S = merge(outs[2]) if want_sq else None
    return A, M, S


def xt_dots(packed: jnp.ndarray, rhs: jnp.ndarray, *, want_missing: bool,
            want_sq: bool = False, tp: int = _TP, tw: int | None = None,
            interpret: bool = False):
    """Byte-view wrapper with the decode.xt_dots contract (tests/oracles).

    packed (p, n4) uint8 with n4 % 4 == 0; rhs (4*n4, m) float.  Production
    callers should pass the canonical word storage to :func:`xt_dots_words`
    instead — this wrapper's u8->i32 bitcast costs a relayout copy on TPU."""
    p, n4 = packed.shape
    words = jax.lax.bitcast_convert_type(
        packed.reshape(p, n4 // 4, 4), jnp.int32)
    return xt_dots_words(words, rhs, want_missing=want_missing,
                         want_sq=want_sq, tp=tp, tw=tw, interpret=interpret)
