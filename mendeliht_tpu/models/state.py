"""Functional solver state pytrees (the reference's preallocated IHTVariable /
mIHTVariable, reference src/data_structures.jl:4-43 / :140-180, redesigned as
immutable jax pytrees with a leading task-batch axis B).

The task axis carries cross-validation (fold, sparsity) combinations — the
reference's `Threads.@threads` work items (src/cross_validation.jl:100-121) —
so one jitted while_loop advances all tasks in lockstep with masked updates.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


def _register(cls, meta=()):
    fields = [f.name for f in dataclasses.fields(cls)]
    data = [f for f in fields if f not in meta]
    jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=list(meta))
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class IHTState:
    """Batched univariate IHT state. Shapes: B tasks, p SNPs, q covariates,
    n_pad padded samples, S support slots."""
    b: jnp.ndarray          # (B, p)   current genetic model
    c: jnp.ndarray          # (B, q)   current covariate model
    b0: jnp.ndarray         # (B, p)   previous iterate
    c0: jnp.ndarray         # (B, q)
    best_b: jnp.ndarray     # (B, p)   best-loglikelihood iterate
    best_c: jnp.ndarray     # (B, q)
    df: jnp.ndarray         # (B, p)   score (genetic)
    df2: jnp.ndarray        # (B, q)   score (covariates)
    sel_idx: jnp.ndarray    # (B, S)   SNP indices of current support
    sel_valid: jnp.ndarray  # (B, S)   bool: slot in support
    idc: jnp.ndarray        # (B, q)   bool: covariate support
    xb: jnp.ndarray         # (B, n_pad) genetic linear predictor
    zc: jnp.ndarray         # (B, n_pad) covariate linear predictor
    mu: jnp.ndarray         # (B, n_pad) mean
    nb_r: jnp.ndarray       # (B,)     negative-binomial nuisance r
    logl: jnp.ndarray       # (B,)     loglikelihood of current iterate
    best_logl: jnp.ndarray  # (B,)
    k: jnp.ndarray          # (B,)     per-task sparsity level
    cv_wts: jnp.ndarray     # (B, n_pad) 0/1 sample mask
    active: jnp.ndarray     # (B,)     still iterating
    failed: jnp.ndarray     # (B,)     non-finite loglikelihood encountered
    iters: jnp.ndarray      # (B,)     iteration of convergence
    eta: jnp.ndarray        # (B,)     last step size (diagnostic)
    backtracks: jnp.ndarray  # (B,)    last-step backtrack count
    iteration: jnp.ndarray  # ()       global loop counter


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """Static solver configuration (jit-hashable)."""
    dist: str = "normal"
    link: str = "identity"
    S: int = 16                 # support slot count (>= max k + zkeepn)
    zkeepn: int = 1
    max_iter: int = 200
    min_iter: int = 5
    max_step: int = 3
    tol: float = 1e-4
    est_r: str = "none"         # "none" | "mm" | "newton"
    debias: bool = False
    use_group: bool = False
    J: int = 1
    n_groups: int = 0
    group_k_is_vector: bool = False
    group_cand: int = 0         # static per-shard candidate budget for the
                                # sharded group projection (>= max survivors
                                # of a local per-group top-k; see
                                # parallel/sharded_ops.py)
    has_weight: bool = False
    dtype: str = "float32"
    log_iters: bool = False     # jax.debug.print per-iteration progress


@dataclasses.dataclass(frozen=True)
class FitData:
    """Per-problem constant data closed over by the jitted loop."""
    y: jnp.ndarray            # (n_pad,) zero-padded phenotypes
    z: jnp.ndarray            # (n_pad, q) zero-padded covariates
    zkeep: jnp.ndarray        # (q,) bool
    weight: jnp.ndarray       # (p + q,) selection weights (ones if unused)
    group: jnp.ndarray        # (p,) int32 1-based group ids (ones if unused)
    group_ks: jnp.ndarray     # (n_groups,) per-group k (group IHT)
    sample_mask: jnp.ndarray  # (n_pad,) 1.0 for true samples
    n_true: int               # static: true sample count


jax.tree_util.register_dataclass(
    FitData,
    data_fields=["y", "z", "zkeep", "weight", "group", "group_ks", "sample_mask"],
    meta_fields=["n_true"],
)
