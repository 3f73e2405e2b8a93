"""Pallas TPU kernels for 2-bit genotype linear algebra.

The hot op of IHT is the full-width score product `X' R` (reference's
SnpLinAlg mul!, SURVEY.md §2.10): every iteration reads the whole packed
matrix once.  This kernel fuses in-register 2-bit decode with the sample-axis
contraction so the packed bytes are read from HBM exactly once per pass:

    HBM (p4, n4) i32 quad words --DMA--> VMEM tile --4 crumb-plane extracts
        + sublane bitcast--> int8 {0,1,2} --int8 MXU dot--> int32 accumulators
        --digit combine--> (m, p) f32

Byte-plane decode over SNP-QUAD words (round 4; replaces the round-3
16-round per-crumb extraction): the canonical storage packs the bytes of
FOUR consecutive SNPs into each int32 word (byte k of ``words[i, w]`` =
crumb-transposed byte ``w`` of SNP ``4i+k``; genotype/snparray.py).  In the
kernel, one ``xq = (w >> 2q) & 0x03030303`` extracts crumb-plane q of all
four SNPs at once, and ``pltpu.bitcast(xq, int8)`` — which expands the
SUBLANE dim 4x in exactly word-major byte order — turns the (tpq, tw) i32
tile into a (4*tpq, tw) i8 operand whose rows are SNPs and whose lanes are
the contraction (sample-block) axis.  Decode cost: 4 recode + 4x2 extract
= ~12 VPU lane-ops per 16 genotypes, vs ~52 for the previous design
(16 rounds x shift+mask+i8-convert), and 4 big MXU dots per tile instead
of 16 small ones.  Measured on the v5e (tools/kernel_lab.py, 10k x 1M,
honest RTT-corrected harness): m=1 20.1 -> 5.2 ms/pass vs the 3.4 ms pure
DMA floor at the 750 GB/s Pallas-measured stream ceiling.

Crumb decode algebra (per byte, all four SNPs in parallel): PLINK crumb c
(hi = c>>1, lo = c&1) has additive value hi + (hi&lo) and missing = lo&~hi;
the word-level recode ``w = h + (h & t)`` with ``h = (t >> 1) & 0x55...5``
value-codes all 16 crumbs in 4 lane-ops; crumbs never cross byte
boundaries, so the recode commutes with the quad-byte interleave.

int8 MXU path: decoded values {0,1,2} are int8-exact, and the rhs is
quantized to three int8 *digit* planes ``r ~= scale * (hi*16384 + mid*128
+ lo)`` with per-column scale = max|r| / 2^20 and every digit in [-64, 64].
The dots accumulate exactly in int32 (|acc| <= 2*64*n < 2^31 up to n =
160M samples) and one f32 digit-combine per output tile reconstructs the
value.  Accuracy: 21 significant bits relative to each column's max —
tests/test_pallas.py pins parity with the f32 XLA oracle below 2e-5.

The multi-RHS design is the point: cross-validation batches (m = q*|path|
tasks) and multivariate traits ride the `m` axis, so the decode cost is
paid once for the whole batch.  The digit planes for an m-chunk are
VMEM-RESIDENT (constant block index, fetched once) and each grid step
slices its reduction window out of them, so the words are the only O(p)
HBM traffic; (tw, mc) are picked jointly from an explicit VMEM byte budget
to minimize full passes over the words (a reference-shaped cv batch
m = 100 fits ONE chunk) — no shape can blow VMEM at compile time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile sizes: TP SNPs (= TP/4 quad-word sublanes) x TW packed bytes (lanes)
_TP = 1024
# total VMEM working-set target (v5e has ~16 MiB/core; keep headroom for
# Mosaic's own buffers — an over-budget pick is an empirical compile failure)
_VMEM_BUDGET = 12 * 2**20
# test hook: force a small m-chunk regardless of the budget
_FORCE_M_CHUNK = None


def _cdiv(a, b):
    return -(-a // b)


def _pick_tiles(n4: int, tp: int, m: int, n_acc: int):
    """Joint (tw, mc) choice minimizing full HBM passes over the words.

    The rhs digit planes for a whole m-chunk stay VMEM-RESIDENT for the
    entire kernel (constant block index — fetched once, single-buffered),
    and each grid step slices its tw-byte window out of them, so shrinking
    tw costs no extra rhs traffic.  Every m-chunk beyond the first re-reads
    the full packed matrix from HBM, so the picker prefers the fewest
    chunks, then the largest reduction tile.  VMEM accounting per chunk:
    double-buffered (tp/4, tw) i32 words tile, resident (4, 3*mc, n4_pad)
    int8 rhs, n_acc int32 accumulators (3*mc, tp), and n_acc revolving f32
    output tiles (mc, tp)."""
    tpq = tp // 4
    best = None
    # n4/2 and n4/4 stay multiples of 128 lanes (n4 is a multiple of 512)
    # and divide n4 exactly — no padded reduction columns
    for tw in sorted({min(n4, t) for t in (n4, max(n4 // 2, 128),
                                           max(n4 // 4, 128),
                                           8192, 4096, 2048, 1024, 512)},
                     reverse=True):
        n4_pad = _cdiv(n4, tw) * tw
        # 2x double-buffered words tile + ~3 tile-sized decode temporaries
        # (h/w recode values, the extracted crumb plane, the i8 operand):
        # Mosaic stack-allocates these, and ignoring them OOMs the 2-output
        # (want_sq) variant at cv scale (observed 18.9 MiB vs the 16 MiB
        # scoped limit with the old 2-buffer accounting)
        fixed = (2 + 3) * tpq * tw * 4
        per_mc = 12 * n4_pad + n_acc * (3 * tp * 4 + 2 * tp * 4)
        if fixed >= _VMEM_BUDGET:
            continue
        mc = min((_VMEM_BUDGET - fixed) // per_mc, 256)
        if mc < 1:
            continue
        mc = int(min(mc, m))
        # fewest full HBM passes first, then least padded reduction work,
        # then the largest tile
        cand = (_cdiv(m, mc), n4_pad - n4, -tw, mc)
        if best is None or cand < best:
            best = cand
    if best is None:  # pathological shapes: smallest tiles, let Mosaic try
        return 512, 8
    chunks, _pad, neg_tw, mc = best
    if _FORCE_M_CHUNK is not None:
        mc = _FORCE_M_CHUNK
    return -neg_tw, mc


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


def _crumb_restride(planes, n4, tw):
    """(rows, n_pad = 4*n4) sample-ordered -> (4, n4_pad, rows) crumb planes
    in WEIGHTS orientation (contraction on the second axis' sublanes).

    Crumb-plane q of byte w is sample ``q*n4 + w`` (the crumb-transposed
    byte layout), so plane q is simply the contiguous sample slice
    [q*n4, (q+1)*n4).  The zero rows (n4_pad - n4) annihilate garbage
    decoded from out-of-bounds bytes on the reduction tail."""
    rows = planes.shape[0]
    n4_pad = _cdiv(n4, tw) * tw
    r = jnp.transpose(planes.reshape(rows, 4, n4), (1, 2, 0))  # (4, n4, rows)
    if n4_pad != n4:
        r = jnp.pad(r, ((0, 0), (0, n4_pad - n4), (0, 0)))
    return r


def _kernel(words_ref, rhs_ref, scale_ref, *refs, want_missing, want_sq, tw):
    """refs = out_refs [A, M?, S?] then scratch accs [a, m?, h?].

    words_ref: (tpq, tw) i32 quad words; rhs_ref holds the FULL
    (4, n4_pad, 3mc) digit planes (constant block index — VMEM-resident
    across the whole kernel); each grid step slices its (tw, 3mc) reduction
    window at j*tw.

    Dot orientation matters enormously on the MXU: the decoded values are
    the NATURALLY-ORIENTED streaming lhs (contraction on its lanes) and the
    digit planes are the weights (contraction on their sublanes) — i.e.
    dot_general(vq (tp, tw), rhs_q (tw, 3mc)) -> (tp, 3mc).  The reversed
    orientation (values as the (tp, tw) operand contracted on LANES of a
    (3mc, tw) lhs) forces Mosaic to transpose the big operand every dot and
    measures ~4x slower at m = 1 (tools/kernel_lab.py round-4 race)."""
    n_out = 1 + int(want_missing) + int(want_sq)
    out_refs = refs[:n_out]
    acc_refs = refs[n_out:]
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    mc = out_refs[0].shape[1]

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
    dn = (((1,), (0,)), ((), ()))         # (tp, tw) x (tw, 3mc) -> (tp, 3mc)
    for q in range(4):                    # crumb-plane q = samples q*n4 + w
        rhs_q = rhs_ref[q, pl.ds(j * tw, tw), :]              # (tw, 3mc) i8
        # (tpq, tw) i32 -> (4*tpq, tw) i8: sublane-expanding bitcast puts
        # byte k (= SNP 4i+k) in row 4i+k — SNPs on MXU output sublanes
        vq = pltpu.bitcast((w >> (2 * q)) & 0x03030303, jnp.int8)
        acc_a = acc_a + jax.lax.dot_general(
            vq, rhs_q, dn, preferred_element_type=jnp.int32)
        if want_missing:
            mq = pltpu.bitcast((m16 >> (2 * q)) & 0x01010101, jnp.int8)
            acc_m = acc_m + jax.lax.dot_general(
                mq, rhs_q, dn, preferred_element_type=jnp.int32)
        if want_sq:
            # h-bit == [value >= 1]; with v in {0,1,2}: v^2 = 3v - 2*[v>=1]
            hq = pltpu.bitcast((h >> (2 * q)) & 0x01010101, jnp.int8)
            acc_h = acc_h + jax.lax.dot_general(
                hq, rhs_q, dn, preferred_element_type=jnp.int32)
    it = iter(acc_refs)
    next(it)[:] = acc_a
    if want_missing:
        next(it)[:] = acc_m
    if want_sq:
        next(it)[:] = acc_h

    @pl.when(j == nj - 1)
    def _combine():
        s = scale_ref[:]                                 # (1, mc) f32

        def comb(acc):
            a = acc.astype(jnp.float32)
            return (16384.0 * a[:, 0:mc] + 128.0 * a[:, mc:2 * mc]
                    + a[:, 2 * mc:3 * mc]) * s

        A = comb(acc_a)
        out_refs[0][:] = A
        k = 1
        if want_missing:
            out_refs[k][:] = comb(acc_m)
            k += 1
        if want_sq:
            out_refs[k][:] = 3.0 * A - 2.0 * comb(acc_h)


def _xt_dots_chunk(words, crumbs_i8, scale, *, want_missing, want_sq, tp, tw,
                   interpret=False):
    """words (p4, n4) i32, crumbs_i8 (4, 3*mc, n4_pad) i8, scale (mc,)
    -> (A, M, S) each (mc, 4*p4) f32.

    Edge tiles of `words` (p4 % tpq rows, n4 % tw lanes) are partial: Pallas
    masks the stores, and garbage decodes on the reduction tail are
    annihilated by the rhs zero padding."""
    p4, n4 = words.shape
    tpq = tp // 4
    mc = crumbs_i8.shape[2] // 3
    n4_pad = crumbs_i8.shape[1]
    grid = (_cdiv(p4, tpq), _cdiv(n4, tw))
    in_specs = [
        pl.BlockSpec((tpq, tw), lambda i, j: (i, j)),
        # constant block index: the full digit planes are DMA'd once and stay
        # VMEM-resident; the kernel slices its (tw, 3mc) window per grid step
        pl.BlockSpec((4, n4_pad, 3 * mc), lambda i, j: (0, 0, 0)),
        pl.BlockSpec((1, mc), lambda i, j: (0, 0)),
    ]
    out_spec = pl.BlockSpec((tp, mc), lambda i, j: (i, 0))
    n_out = 1 + int(want_missing) + int(want_sq)
    flops = 2 * 4 * p4 * 4 * n4 * 3 * mc * n_out
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=p4 * n4 * 4 + 12 * n4_pad * mc + 4 * p4 * mc * 4 * n_out,
        transcendentals=0)
    kern = functools.partial(_kernel, want_missing=want_missing,
                             want_sq=want_sq, tw=tw)
    outs = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=(out_spec,) * n_out,
        out_shape=(jax.ShapeDtypeStruct((4 * p4, mc), jnp.float32),) * n_out,
        scratch_shapes=[pltpu.VMEM((tp, 3 * mc), jnp.int32)] * n_out,
        cost_estimate=cost,
        interpret=interpret,
    )(words, crumbs_i8, scale[None, :])
    it = iter(outs)
    return (next(it),
            next(it) if want_missing else None,
            next(it) if want_sq else None)


@functools.partial(jax.jit, static_argnames=("want_missing", "want_sq", "tp",
                                             "tw", "interpret", "p"))
def xt_dots_words(words: jnp.ndarray, rhs: jnp.ndarray, *, want_missing: bool,
                  want_sq: bool = False, tp: int = _TP, tw: int | None = None,
                  interpret: bool = False, p: int | None = None):
    """Fused decode + multi-RHS dots over the canonical quad-word storage.

    words (p4, n4) int32 (= PackedGenotypes.words); rhs (4*n4, m) float.
    Returns (A, M, S): value dot, missing dot (or None), squared-value dot
    (or None), all f32 with leading dim ``p`` (pass it to slice off the
    quad-padding rows 4*p4 - p; default keeps them — they are inert zeros).

    The big words matrix passes through untouched: partial edge tiles are
    handled by Pallas masked loads/stores, and out-of-bounds bytes decode to
    finite garbage in {0..3} which is annihilated by the zero-padded rhs
    along the reduction axis, so no O(p*n4) pad or relayout copy is ever
    made per pass.  Only the small int8 digit planes are restrided per call.

    NaN/Inf rhs columns (a failed cv task's residual) would quantize to
    finite garbage and silently un-fail the task; ``0 * colsum`` re-poisons
    every output row so NaN propagates exactly like the f32 oracle."""
    p4, n4 = words.shape
    m = rhs.shape[1]
    n_acc = 1 + int(want_missing) + int(want_sq)
    tw_pick, mc = _pick_tiles(n4, tp, m, n_acc)
    if tw is None:
        tw = tw_pick
    planes, scale = _quantize_rhs_planes(rhs)            # (3m, n_pad), (m,)
    nan_guard = (jnp.sum(rhs, axis=0) * 0.0).astype(jnp.float32)   # (m,)

    outs = [[], [], []]
    for lo in range(0, m, mc):
        hi = min(lo + mc, m)
        chunk = jnp.concatenate([planes[lo:hi], planes[m + lo:m + hi],
                                 planes[2 * m + lo:2 * m + hi]], axis=0)
        rr = _crumb_restride(chunk, n4, tw)              # (4, 3c, n4_pad)
        o = _xt_dots_chunk(words, rr, scale[lo:hi],
                           want_missing=want_missing, want_sq=want_sq,
                           tp=tp, tw=tw, interpret=interpret)
        for k in range(3):
            if o[k] is not None:
                outs[k].append(o[k])

    def merge(parts):
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        out = out + nan_guard[None, :]                   # (4*p4, m)
        return out if p is None else out[:p]

    A = merge(outs[0])
    M = merge(outs[1]) if want_missing else None
    S = merge(outs[2]) if want_sq else None
    return A, M, S


# ---------------------------------------------------------------------------
# transposed-words variant: decoded values ride the MXU as WEIGHTS
# ---------------------------------------------------------------------------
# Same decode algebra over the TRANSPOSED per-SNP word view ``words_t
# (nw = n4/4, p)`` (element (w, j) = bytes [4w, 4w+4) of SNP j's
# crumb-transposed row).  The i32->i8 sublane bitcast of a (tw, tp) tile
# yields a (4tw, tp) i8 operand whose SUBLANES are sample bytes and lanes are
# SNPs — the decoded tile becomes the dot's stationary-weights operand,
# ``dot(rhs_q (3mc, 4tw), vq (4tw, tp)) -> (3mc, tp)``.  Measured on the
# v5e (tools/kernel_lab5.py): weight-stationary ingestion is ~2x faster than
# the quad kernel's streaming-lhs orientation at small RHS width (m=1:
# 5.1 ms/pass vs 9.2-24 ms, vs the 3.4 ms DMA floor), and stays ahead or
# equal through m~64.  The price is gather locality: a per-SNP column gather
# from words_t touches a full 128-lane block per sample-word row (~327 KB
# per SNP at n=10k), so words_t NEVER serves the k-sparse forward/gather
# products — it is a second, score-only layout (dual storage, +2 bits per
# genotype) selected per call by RHS width (see linalg._xt_dots).

_VT_TP = 1024
_VT_MAX_M = 4096   # RHS-width cutover to the quad kernel when dual storage
                   # exists. Default = effectively always-vt: the round-5
                   # race (tools/kernel_lab5.py, fresh compiles) measured vt
                   # <= quad at EVERY m (m=1: 5.1 vs 24 ms; m=100: 28 vs
                   # 39 ms) under the current Mosaic version; under the
                   # round-4 Mosaic the quad kernel won only m >= 64 by
                   # ~15% (23.6 vs 27.8 at m=100) — see ROOFLINE.json
                   # compiler_variance wall. Override: MENDELIHT_VT_MAX_M
                   # (e.g. 32 restores the conservative crossover).
                   # Problems whose packed bytes exceed the dual-storage
                   # budget (linalg._dual_budget) never build words_t and
                   # always run the gather-friendly quad kernel.


def _pick_tiles_t(nw: int, tp: int, m: int, n_acc: int):
    """(tw, mc) for the transposed kernel under the VMEM budget.

    Per chunk: double-buffered (tw, tp) i32 words tile + ~3 tile-sized
    decode temporaries (fixed), resident (4, 3mc, 4*nw_pad) i8 rhs planes,
    n_acc (3mc, tp) i32 accumulators + (mc, tp) f32 outputs (per_mc)."""
    best = None
    for tw in (512, 256, 128, 64, 32, 16, 8):
        if tw > nw and tw != 8:
            continue
        tw_eff = min(tw, nw)
        nw_pad = _cdiv(nw, tw_eff) * tw_eff
        fixed = (2 + 3) * tw_eff * tp * 4
        per_mc = 48 * nw_pad + n_acc * (3 * tp * 4 + tp * 4)
        if fixed >= _VMEM_BUDGET:
            continue
        mc = min((_VMEM_BUDGET - fixed) // per_mc, 256)
        if mc < 1:
            continue
        mc = int(min(mc, m))
        cand = (_cdiv(m, mc), -tw_eff, mc)
        if best is None or cand < best:
            best = cand
    if best is None:
        return min(8, nw), 1
    _chunks, neg_tw, mc = best
    return -neg_tw, mc


def _kernel_t(wordsT_ref, rhs_ref, scale_ref, *refs, want_missing, want_sq,
              tw):
    """refs = out_refs [A, M?, S?] then scratch accs; wordsT tile (tw, tp)
    i32; rhs_ref holds the FULL (4, 3mc, 4*nw_pad) digit planes (constant
    block index, VMEM-resident); each grid step slices its (3mc, 4tw)
    window at j*4*tw."""
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

    t = wordsT_ref[:]
    h = (t >> 1) & 0x55555555
    w = h + (h & t)
    if want_missing:
        lo05 = t & 0x55555555
        m16 = lo05 - (lo05 & h)
    it = iter(acc_refs)
    acc_a = next(it)[:]
    acc_m = next(it)[:] if want_missing else None
    acc_h = next(it)[:] if want_sq else None
    dn = (((1,), (0,)), ((), ()))       # (3mc, 4tw) x (4tw, tp) -> (3mc, tp)
    for q in range(4):
        rhs_q = rhs_ref[q, :, pl.ds(j * 4 * tw, 4 * tw)]       # (3mc, 4tw)
        vq = pltpu.bitcast((w >> (2 * q)) & 0x03030303, jnp.int8)
        acc_a = acc_a + jax.lax.dot_general(
            rhs_q, vq, dn, preferred_element_type=jnp.int32)
        if want_missing:
            mq = pltpu.bitcast((m16 >> (2 * q)) & 0x01010101, jnp.int8)
            acc_m = acc_m + jax.lax.dot_general(
                rhs_q, mq, dn, preferred_element_type=jnp.int32)
        if want_sq:
            hq = pltpu.bitcast((h >> (2 * q)) & 0x01010101, jnp.int8)
            acc_h = acc_h + jax.lax.dot_general(
                rhs_q, hq, dn, preferred_element_type=jnp.int32)
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


def _xt_dots_chunk_t(wordsT, rr, scale, *, want_missing, want_sq, tp, tw,
                     interpret=False):
    """wordsT (nw, p) i32, rr (4, 3mc, 4*nw_pad) i8, scale (mc,)
    -> (A, M, S) each (mc, p) f32."""
    nw, p = wordsT.shape
    mc = rr.shape[1] // 3
    nw_pad = rr.shape[2] // 4
    grid = (_cdiv(p, tp), _cdiv(nw, tw))
    in_specs = [
        pl.BlockSpec((tw, tp), lambda i, j: (j, i)),
        pl.BlockSpec((4, 3 * mc, 4 * nw_pad), lambda i, j: (0, 0, 0)),
        pl.BlockSpec((mc, 1), lambda i, j: (0, 0)),
    ]
    out_spec = pl.BlockSpec((mc, tp), lambda i, j: (0, i))
    n_out = 1 + int(want_missing) + int(want_sq)
    cost = pl.CostEstimate(
        flops=2 * p * 16 * nw * 3 * mc * n_out,
        bytes_accessed=p * nw * 4 + 48 * nw_pad * mc + p * mc * 4 * n_out,
        transcendentals=0)
    kern = functools.partial(_kernel_t, want_missing=want_missing,
                             want_sq=want_sq, tw=tw)
    outs = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=(out_spec,) * n_out,
        out_shape=(jax.ShapeDtypeStruct((mc, p), jnp.float32),) * n_out,
        scratch_shapes=[pltpu.VMEM((3 * mc, tp), jnp.int32)] * n_out,
        cost_estimate=cost,
        interpret=interpret,
    )(wordsT, rr, scale[:, None])
    it = iter(outs)
    return (next(it),
            next(it) if want_missing else None,
            next(it) if want_sq else None)


@functools.partial(jax.jit, static_argnames=("want_missing", "want_sq", "tp",
                                             "tw", "interpret", "p"))
def xt_dots_words_t(words_t: jnp.ndarray, rhs: jnp.ndarray, *,
                    want_missing: bool, want_sq: bool = False,
                    tp: int = _VT_TP, tw: int | None = None,
                    interpret: bool = False, p: int | None = None):
    """Transposed-layout fused decode + multi-RHS dots (xt_dots_words
    contract, transposed storage): words_t (nw, p) int32, rhs (16*nw, m).

    Returns (A, M, S) each (p_out, m) f32 like xt_dots_words (p_out = p or
    the stored column count).  NaN rhs columns re-poison like the quad path."""
    nw, p_tot = words_t.shape
    n4 = 4 * nw
    m = rhs.shape[1]
    n_acc = 1 + int(want_missing) + int(want_sq)
    tw_pick, mc = _pick_tiles_t(nw, tp, m, n_acc)
    if tw is None:
        tw = tw_pick
    nw_pad = _cdiv(nw, tw) * tw
    planes, scale = _quantize_rhs_planes(rhs)            # (3m, n_pad), (m,)
    nan_guard = (jnp.sum(rhs, axis=0) * 0.0).astype(jnp.float32)   # (m,)

    outs = [[], [], []]
    for lo in range(0, m, mc):
        hi = min(lo + mc, m)
        chunk = jnp.concatenate([planes[lo:hi], planes[m + lo:m + hi],
                                 planes[2 * m + lo:2 * m + hi]], axis=0)
        # (3c, 4, n4) -> (4, 3c, n4): crumb-plane q = samples [q*n4, (q+1)n4)
        rr = jnp.transpose(chunk.reshape(3 * (hi - lo), 4, n4), (1, 0, 2))
        if nw_pad != nw:
            rr = jnp.pad(rr, ((0, 0), (0, 0), (0, 4 * (nw_pad - nw))))
        o = _xt_dots_chunk_t(words_t, rr, scale[lo:hi],
                             want_missing=want_missing, want_sq=want_sq,
                             tp=tp, tw=tw, interpret=interpret)
        for k in range(3):
            if o[k] is not None:
                outs[k].append(o[k])

    def merge(parts):
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        out = out.T + nan_guard[None, :]                 # (p_tot, m)
        return out if p is None else out[:p]

    A = merge(outs[0])
    M = merge(outs[1]) if want_missing else None
    S = merge(outs[2]) if want_sq else None
    return A, M, S


def build_words_t(words: jnp.ndarray, p: int,
                  chunk_q: int = 32768) -> jnp.ndarray:
    """Derive the transposed per-SNP word view (nw, p) ON DEVICE from the
    canonical quad words (p4, n4) — no host round-trip (the packed matrix
    may be GBs and the host link slow).

    CHUNKED + JITTED: an eager whole-matrix relayout materializes every
    intermediate separately (~7x packed bytes live at once — measured OOM at
    10k x 1M on a 14.5 GiB chip); the chunked jitted step bounds the
    transient to O(chunk) beyond input + output (~2x packed + ~0.4 GB)."""
    p4, n4 = words.shape
    nw = n4 // 4
    p_tot = 4 * p4

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("c",))
    def step(out, w_chunk, lo, c):
        # byte-extract / byte-pack arithmetically in 2-D i32 — a (..., 4)
        # minor axis would be 128-lane padded on TPU (u32[c, n4, 4] wants
        # 32x its logical bytes at compile time; measured 40 GiB alloc
        # failure at 10k x 1M)
        rows = jnp.stack(
            [(w_chunk >> (8 * k)) & 0xFF for k in range(4)],
            axis=1).reshape(4 * c, n4)              # row 4i+k = SNP 4i+k
        sw = (rows[:, 0::4] | (rows[:, 1::4] << 8)
              | (rows[:, 2::4] << 16) | (rows[:, 3::4] << 24))  # (4c, nw)
        return jax.lax.dynamic_update_slice(
            out, jnp.transpose(sw, (1, 0)), (0, 4 * lo))

    out = jnp.zeros((nw, p_tot), jnp.int32)
    for lo in range(0, p4, chunk_q):
        hi = min(lo + chunk_q, p4)
        c = hi - lo
        out = step(out, words[lo:hi], jnp.int32(lo), c)
    # keep the quad-padded column count: pad SNPs are zero rows, and the
    # kernel's `p` argument slices them off the OUTPUT — avoids a full
    # out-sized slice copy here
    return out


def xt_dots(packed: jnp.ndarray, rhs: jnp.ndarray, *, want_missing: bool,
            want_sq: bool = False, tp: int = _TP, tw: int | None = None,
            interpret: bool = False):
    """Byte-view wrapper with the decode.xt_dots contract (tests/oracles).

    packed (p, n4) uint8 crumb-transposed rows; rhs (4*n4, m) float.
    Production callers should pass the canonical quad-word storage to
    :func:`xt_dots_words` instead — this wrapper quad-packs on device."""
    p, n4 = packed.shape
    p4 = _cdiv(p, 4)
    if 4 * p4 != p:
        packed = jnp.pad(packed, ((0, 4 * p4 - p), (0, 0)))
    quad = jnp.transpose(packed.reshape(p4, 4, n4), (0, 2, 1))
    words = jax.lax.bitcast_convert_type(quad, jnp.int32)    # (p4, n4)
    return xt_dots_words(words, rhs, want_missing=want_missing,
                         want_sq=want_sq, tp=tp, tw=tw, interpret=interpret,
                         p=p)
