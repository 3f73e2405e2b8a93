"""Host-stepped IHT driver for out-of-core (streamed) genotype operators.

The production solver is ONE jitted `lax.while_loop` (univariate.py) — it
cannot call host code from inside the trace, so an operator whose `X'R`
streams SNP blocks host->device (ops/streaming.py) needs the iteration
driven from the host.  This driver reuses the SAME step math
(`_save_prev` / `_take_step` / `_post_step` / `finalize_iht`) executed
eagerly, with the bounded backtracking line search as a host loop — the
algorithm is bit-for-bit the reference's (src/fit.jl:145-263), identical to
the fused path up to float reduction order.

Supports the full univariate feature set (all GLMs, NB nuisance, group /
doubly-sparse projection, weights, zkeep, debias) — those pieces are
op-free or use only the operator contract.  Multivariate traits are not
routed here (an out-of-HBM multivariate problem should shard across chips
instead, parallel/).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .state import FitConfig, FitData, IHTState
from . import univariate as U


def _iteration_host(op, data: FitData, cfg: FitConfig, st: IHTState) -> IHTState:
    """One IHT iteration with a host-level backtracking loop (mirrors
    univariate._iteration; the lax.while_loop becomes `while np.any(...)`)."""
    act = st.active
    st = U._save_prev(st)

    eta = U._stepsize(op, data, cfg, st)
    old_logl = st.logl

    cur = U._take_step(op, data, cfg, st, eta)
    n_bt = jnp.zeros_like(eta, dtype=jnp.int32)
    while True:
        need = U._bt_need(act, old_logl, cur, n_bt, cfg.max_step)
        if not bool(np.any(np.asarray(need))):
            break
        eta = jnp.where(need, eta / 2, eta)
        nxt = U._take_step(op, data, cfg, st, eta)
        cur = {k: U._where_b(need, nxt[k], cur[k]) for k in cur}
        n_bt = n_bt + need.astype(jnp.int32)

    return U._post_step(op, data, cfg, st, cur, eta, n_bt)


def run_iht_host(op, data: FitData, cfg: FitConfig, st: IHTState) -> IHTState:
    """Loop to completion then restore the best model (streamed analog of
    univariate.run_iht)."""
    while (bool(np.asarray(jnp.any(st.active)))
           and int(st.iteration) < cfg.max_iter - 1):
        st = _iteration_host(op, data, cfg, st)
    return U.finalize_iht.__wrapped__(op, data, cfg, st)


def fit_fused_sparse_host(op, data: FitData, cfg: FitConfig, ks, cv_wts,
                          init_beta: bool = False):
    """Streamed equivalent of univariate.fit_fused_sparse: init + solve +
    finalize + pve + sparse extraction, driven from the host."""
    from .initialize import init_state
    from .pve import pve as _pve

    st = init_state.__wrapped__(op, data, cfg, ks, cv_wts,
                                init_beta=init_beta)
    st = run_iht_host(op, data, cfg, st)
    sigma_g = jnp.stack([_pve(data.y, st.mu[b], data.sample_mask, data.n_true)
                         for b in range(st.mu.shape[0])])
    return U._sparse_extract(st, sigma_g)


def cv_fused_host(op, data: FitData, cfg: FitConfig, ks, train_wts, test_wts,
                  init_beta: bool = False):
    """Streamed equivalent of univariate.cv_fused: the whole (fold, k) grid
    still advances as ONE batch — every streamed X'R pass serves the full
    grid — with holdout deviance scoring at the end."""
    from .initialize import init_state

    st = init_state.__wrapped__(op, data, cfg, ks, train_wts,
                                init_beta=init_beta)
    st = run_iht_host(op, data, cfg, st)
    return U.predict_deviance.__wrapped__(op, data, cfg, st, test_wts)
