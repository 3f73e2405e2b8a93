"""Proportion of variance explained (chip heritability), reference src/pve.jl.

pve = Var(mu_hat) / Var(y) with mu_hat = g^-1(X beta) (genotype-only linear
predictor; intercept/covariates excluded — reference save_best_model! +
pve(v), src/utilities.jl:1004-1005, src/pve.jl:32-38). Sample variance with
n-1 divisor, computed over the true (unpadded) samples without cv masking."""

from __future__ import annotations

import jax.numpy as jnp


def masked_var(x, mask, n_true, axis=-1):
    xb = jnp.sum(x * mask, axis=axis, keepdims=True) / n_true
    ss = jnp.sum(((x - xb) ** 2) * mask, axis=axis)
    return ss / (n_true - 1)


def pve(y, mu, sample_mask, n_true):
    """y (n_pad,) or (r, n_pad); mu broadcastable with leading batch axis."""
    vy = masked_var(y, sample_mask, n_true)
    vm = masked_var(mu, sample_mask, n_true)
    return vm / vy


def pve_from_model(y, X, beta, l=None):
    """Public API mirroring reference `pve(y, X, β; l)` (src/pve.jl:12-20):
    Var(g^-1(X beta)) / Var(y). X may be a PackedGenotypes or dense array."""
    import numpy as np
    from ..ops import glm as _glm
    from ..genotype.snparray import PackedGenotypes

    link = _glm.link_name(l) if l is not None else "identity"
    if isinstance(X, PackedGenotypes):
        Xd = X.to_dense_standardized()
    else:
        Xd = np.asarray(X)
    y = np.asarray(y)
    mu = np.asarray(_glm.linkinv(link, jnp.asarray(Xd @ np.asarray(beta))))
    if y.ndim == 1:
        return float(np.var(mu, ddof=1) / np.var(y, ddof=1))
    return [float(np.var(mu[:, i], ddof=1) / np.var(y[:, i], ddof=1))
            for i in range(y.shape[1])]
