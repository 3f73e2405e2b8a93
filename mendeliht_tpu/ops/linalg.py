"""Genotype operator abstraction: standardized matvec/matmul products.

Two interchangeable backends:
  * :class:`PackedOp` — 2-bit packed genotypes decoded on the fly
    (XLA fallback in decode.py; Pallas kernels in pallas_kernels.py).
  * :class:`DenseOp` — plain dense design matrix, used verbatim (matches the
    reference's ``Matrix{Float64}`` path where the user pre-standardizes,
    e.g. test/L0_reg_test.jl:269-297).

All batched ops use a leading task axis B (cross-validation (fold, k) tasks,
or 1 for a single fit): the whole point of the TPU design is that B tasks
share one pass over X (SURVEY.md §3.3 masking trick + MXU batching).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import decode
from ..genotype.snparray import PackedGenotypes

_KERNEL_BACKEND = "auto"  # "auto" | "xla" | "pallas"


def set_kernel_backend(name: str):
    global _KERNEL_BACKEND
    assert name in ("auto", "xla", "pallas")
    _KERNEL_BACKEND = name


def _use_pallas() -> bool:
    if _KERNEL_BACKEND == "pallas":
        return True
    if _KERNEL_BACKEND == "xla":
        return False
    if jax.default_backend() != "tpu":
        return False
    try:
        from . import pallas_kernels  # noqa: F401
        return True
    except ImportError:
        return False


def _vt_max_m() -> int:
    """Largest RHS width routed to the transposed (weight-stationary) kernel
    when the dual layout is stored.  Default from the measured crossover
    (tools/kernel_lab5.py: vt wins every m <= 32 raced on the v5e)."""
    import os
    from .pallas_kernels import _VT_MAX_M
    try:
        return int(os.environ.get("MENDELIHT_VT_MAX_M", _VT_MAX_M))
    except ValueError:
        return _VT_MAX_M


# Dual-layout policy: store the transposed score layout alongside the quad
# words when BOTH fit comfortably in HBM. 2x packed bytes must stay well
# under the chip's HBM minus solver state; the v5e (16 GiB) bound below
# leaves >= 10 GiB for everything else. Override with
# MENDELIHT_DUAL_MAX_BYTES (0 disables dual storage entirely).
_DUAL_MAX_BYTES = 3 * 2**30


def _dual_budget() -> int:
    import os
    try:
        return int(os.environ.get("MENDELIHT_DUAL_MAX_BYTES",
                                  _DUAL_MAX_BYTES))
    except ValueError:
        return _DUAL_MAX_BYTES


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedOp:
    geno: PackedGenotypes

    def tree_flatten(self):
        return (self.geno,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def n(self):
        return self.geno.n

    @property
    def p(self):
        return self.geno.p

    @property
    def n_pad(self):
        return self.geno.n_pad

    @property
    def dtype(self):
        return self.geno.mu.dtype

    def _xt_dots(self, RT, want_sq=False):
        """Dispatch the full-width raw dots to the active backend.

        Pallas consumes the canonical int32 words directly; when the dual
        (transposed) layout is stored AND the RHS is narrow, the
        weight-stationary transposed kernel runs instead (~2x at m <= 8,
        tools/kernel_lab5.py; crossover threshold MENDELIHT_VT_MAX_M).  The
        XLA oracle derives the byte view (cheap relative to its own decode
        cost, and only used off-TPU / in tests)."""
        g = self.geno
        if _use_pallas():
            from . import pallas_kernels as pk
            if g.words_t is not None and RT.shape[1] <= _vt_max_m():
                return pk.xt_dots_words_t(
                    g.words_t, RT, want_missing=g.has_missing,
                    want_sq=want_sq, p=g.p)
            return pk.xt_dots_words(g.words, RT, want_missing=g.has_missing,
                                    want_sq=want_sq, p=g.p)
        return decode.xt_dots(g.packed, RT, want_missing=g.has_missing,
                              want_sq=want_sq)

    def xtr(self, R: jnp.ndarray) -> jnp.ndarray:
        """Standardized X' R for R (B, n_pad) -> (B, p)."""
        g = self.geno
        A, M, _ = self._xt_dots(R.T, want_sq=False)
        colsum = jnp.sum(R, axis=1)                       # (B,)
        corr = M - colsum[None, :] if g.has_missing else -colsum[None, :]
        out = g.inv_sd[:, None] * (A + g.mu[:, None] * corr)
        return out.T

    def forward_sel(self, idx: jnp.ndarray, coef: jnp.ndarray,
                    valid: jnp.ndarray) -> jnp.ndarray:
        """Standardized X[:, idx] @ coef -> (B, n_pad).

        idx (B, S) SNP indices; coef (B, S); valid (B, S) 0/1. Invalid slots
        are ignored regardless of index value.
        """
        g = self.geno
        coef_s = coef * g.inv_sd[idx] * valid
        rows = decode.take_rows_bytes(g.words, idx)
        raw = decode.sparse_forward_rows(rows, idx, coef_s, g.mu,
                                         want_missing=g.has_missing)
        const = jnp.sum(coef_s * g.mu[idx], axis=1)       # (B,)
        return raw - const[:, None]

    def forward_sel_multi(self, idx: jnp.ndarray, coef: jnp.ndarray,
                          valid: jnp.ndarray) -> jnp.ndarray:
        """Multi-trait standardized forward product: idx (B,S), coef (B,R,S),
        valid (B,S) -> (B, R, n_pad)."""
        g = self.geno
        coef_s = coef * (g.inv_sd[idx] * valid)[:, None, :]
        rows = decode.take_rows_bytes(g.words, idx)
        raw = decode.sparse_forward_rows_multi(rows, idx, coef_s, g.mu,
                                               want_missing=g.has_missing)
        const = jnp.sum(coef_s * g.mu[idx][:, None, :], axis=2)   # (B, R)
        return raw - const[:, :, None]

    def gather_cols(self, idx: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        """Materialize standardized columns X[:, idx] -> (B, S, n_pad);
        invalid slots are zeroed. Used by the (small-S) debias refit."""
        g = self.geno
        rows = decode.take_rows_bytes(g.words, idx)
        val, miss = decode.gather_decode_rows(rows, self.dtype,
                                              want_missing=g.has_missing)
        mu = g.mu[idx][:, :, None]
        inv = g.inv_sd[idx][:, :, None]
        if g.has_missing:
            val = val + mu * miss
        out = (val - mu) * inv
        return out * valid[:, :, None]

    def col_moments(self, W: jnp.ndarray, WY: jnp.ndarray):
        """Per-SNP weighted moments of standardized columns.

        W, WY: (B, n_pad).  Returns Sx, Sxx, Sxy each (B, p):
          Sx = sum_i w_i x_ij,  Sxx = sum_i w_i x_ij^2,  Sxy = sum_i w_i y_i x_ij
        """
        g = self.geno
        R = jnp.stack([W, WY], axis=0).reshape(2 * W.shape[0], -1)  # (2B, n_pad)
        A, M, Sq = self._xt_dots(R.T, want_sq=True)
        B = W.shape[0]
        A = A.T.reshape(2, B, -1)
        Sq = Sq.T.reshape(2, B, -1)
        if g.has_missing:
            M = M.T.reshape(2, B, -1)
        else:
            M = jnp.zeros_like(A)
        mu, inv = g.mu[None, :], g.inv_sd[None, :]
        sumW = jnp.sum(W, axis=1)[:, None]
        sumWY = jnp.sum(WY, axis=1)[:, None]
        # Sx = inv*(A_w + mu*(M_w - sumW));  Sxy likewise with WY
        Sx = inv * (A[0] + mu * (M[0] - sumW))
        Sxy = inv * (A[1] + mu * (M[1] - sumWY))
        # Sxx = inv^2 * (Sq_w - 2 mu A_w - mu^2 M_w + mu^2 sumW)
        Sxx = inv * inv * (Sq[0] - 2.0 * mu * A[0] - mu * mu * M[0] + mu * mu * sumW)
        return Sx, Sxx, Sxy


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DenseOp:
    x: jnp.ndarray  # (n, p), used verbatim (caller standardizes)

    def tree_flatten(self):
        return (self.x,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def n(self):
        return self.x.shape[0]

    @property
    def p(self):
        return self.x.shape[1]

    @property
    def n_pad(self):
        return self.x.shape[0]

    @property
    def dtype(self):
        return self.x.dtype

    def xtr(self, R: jnp.ndarray) -> jnp.ndarray:
        return jnp.dot(R, self.x, precision=decode.DOT_PREC)

    def forward_sel(self, idx, coef, valid):
        cols = jnp.take(self.x.T, idx, axis=0)            # (B, S, n)
        return jnp.einsum("bjn,bj->bn", cols, coef * valid,
                          precision=decode.DOT_PREC)

    def forward_sel_multi(self, idx, coef, valid):
        cols = jnp.take(self.x.T, idx, axis=0)            # (B, S, n)
        return jnp.einsum("bsn,brs->brn", cols, coef * valid[:, None, :],
                          precision=decode.DOT_PREC)

    def gather_cols(self, idx, valid):
        cols = jnp.take(self.x.T, idx, axis=0)            # (B, S, n)
        return cols * valid[:, :, None]

    def col_moments(self, W, WY):
        Sx = jnp.dot(W, self.x, precision=decode.DOT_PREC)
        Sxx = jnp.dot(W, self.x * self.x, precision=decode.DOT_PREC)
        Sxy = jnp.dot(WY, self.x, precision=decode.DOT_PREC)
        return Sx, Sxx, Sxy


def make_operator(x, dtype=jnp.float32):
    """Dispatch an input design matrix to its operator."""
    if isinstance(x, (PackedOp, DenseOp)) or hasattr(x, "xtr"):
        return x  # already an operator (incl. parallel.ShardedPackedOp)
    if isinstance(x, PackedGenotypes):
        if (_use_pallas() and x.words_t is None
                and x.words.nbytes <= _dual_budget()):
            x = x.with_dual_layout()
        return PackedOp(x)
    from .streaming import HostStreamedGenotypes, StreamedPackedOp
    if isinstance(x, HostStreamedGenotypes):
        return StreamedPackedOp(x)
    if isinstance(x, (np.ndarray, jnp.ndarray)):
        return DenseOp(jnp.asarray(x, dtype=dtype))
    raise TypeError(f"unsupported design matrix type {type(x)}")
