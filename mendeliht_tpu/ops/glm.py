"""GLM distributions and link functions as pure jnp elementwise kernels.

Mirrors the reference's GLM layer (reference: src/utilities.jl:30-43 loglik_obs,
:52-61 deviance, :68-82 linkinv, :126-135 score weights `mueta/glmvar`), but as
name-keyed pure functions so that distribution choice is a *static* jit
argument while the negative-binomial nuisance ``r`` stays a dynamic value.

Tiny distribution/link classes are provided for API familiarity; they are
immediately lowered to (name, params).  All ops are NaN-safe under 0-weight
masking (cross-validation holdout samples multiply by ``wt == 0``): any term
that could be ±inf is guarded with ``where`` before the multiply.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax.scipy.special import gammaln, xlogy, xlog1py, ndtr
from jax.scipy.stats import norm as _jnorm

# ---------------------------------------------------------------------------
# user-facing distribution / link objects (mirror Distributions.jl surface)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Distribution:
    name = "abstract"


@dataclasses.dataclass(frozen=True)
class Normal(Distribution):
    name = "normal"


@dataclasses.dataclass(frozen=True)
class Bernoulli(Distribution):
    name = "bernoulli"


@dataclasses.dataclass(frozen=True)
class Poisson(Distribution):
    name = "poisson"


@dataclasses.dataclass(frozen=True)
class NegativeBinomial(Distribution):
    name = "negativebinomial"
    r: float = 1.0
    p: float = 0.5


@dataclasses.dataclass(frozen=True)
class Gamma(Distribution):
    name = "gamma"


@dataclasses.dataclass(frozen=True)
class InverseGaussian(Distribution):
    name = "inversegaussian"


@dataclasses.dataclass(frozen=True)
class Binomial(Distribution):
    name = "binomial"


@dataclasses.dataclass(frozen=True)
class MvNormal(Distribution):
    """Marker for joint multivariate-Gaussian (multi-trait) analysis."""
    name = "mvnormal"


class Link:
    name = "abstract"


def _mk_link(nm):
    cls = type(f"{nm.capitalize()}Link", (Link,), {"name": nm})
    cls.__eq__ = lambda self, other: isinstance(other, Link) and other.name == self.name
    cls.__hash__ = lambda self: hash(self.name)
    cls.__repr__ = lambda self: f"{nm.capitalize()}Link()"
    return cls


IdentityLink = _mk_link("identity")
LogitLink = _mk_link("logit")
LogLink = _mk_link("log")
InverseLink = _mk_link("inverse")
SqrtLink = _mk_link("sqrt")
ProbitLink = _mk_link("probit")
CloglogLink = _mk_link("cloglog")
InverseSquareLink = _mk_link("inversesquare")

_CANONICAL = {
    "normal": "identity",
    "bernoulli": "logit",
    "binomial": "logit",
    "poisson": "log",
    "negativebinomial": "log",  # NB: reference recommends LogLink (wrapper.jl:87)
    "gamma": "inverse",
    "inversegaussian": "inversesquare",
    "mvnormal": "identity",
}

_LINKS = {
    "identity": IdentityLink, "logit": LogitLink, "log": LogLink,
    "inverse": InverseLink, "sqrt": SqrtLink, "probit": ProbitLink,
    "cloglog": CloglogLink, "inversesquare": InverseSquareLink,
}


def canonicallink(d) -> Link:
    return _LINKS[_CANONICAL[dist_name(d)]]()


def dist_name(d) -> str:
    if isinstance(d, str):
        return d.lower()
    if isinstance(d, Distribution):
        return d.name
    if isinstance(d, type) and issubclass(d, Distribution):
        return d.name
    raise TypeError(f"not a distribution: {d!r}")


def link_name(l) -> str:
    if l is None:
        return "identity"
    if isinstance(l, str):
        return l.lower()
    if isinstance(l, Link):
        return l.name
    if isinstance(l, type) and issubclass(l, Link):
        return l.name
    raise TypeError(f"not a link: {l!r}")


# ---------------------------------------------------------------------------
# elementwise kernels
# ---------------------------------------------------------------------------


def linkinv(link: str, eta):
    """mu = g^{-1}(eta)."""
    if link == "identity":
        return eta
    if link == "logit":
        return 1.0 / (1.0 + jnp.exp(-eta))
    if link == "log":
        return jnp.exp(eta)
    if link == "inverse":
        return 1.0 / eta
    if link == "sqrt":
        return eta * eta
    if link == "probit":
        return ndtr(eta)
    if link == "cloglog":
        return -jnp.expm1(-jnp.exp(eta))
    if link == "inversesquare":
        return 1.0 / jnp.sqrt(eta)
    raise ValueError(f"unknown link {link}")


def mueta(link: str, eta):
    """d mu / d eta."""
    if link == "identity":
        return jnp.ones_like(eta)
    if link == "logit":
        e = jnp.exp(-jnp.abs(eta))
        return e / (1.0 + e) ** 2
    if link == "log":
        return jnp.exp(eta)
    if link == "inverse":
        return -1.0 / (eta * eta)
    if link == "sqrt":
        return 2.0 * eta
    if link == "probit":
        return _jnorm.pdf(eta)
    if link == "cloglog":
        return jnp.exp(eta - jnp.exp(eta))
    if link == "inversesquare":
        return -0.5 * eta ** (-1.5)
    raise ValueError(f"unknown link {link}")


def glmvar(dist: str, mu, nb_r=None):
    """GLM variance function V(mu)."""
    if dist == "normal":
        return jnp.ones_like(mu)
    if dist in ("bernoulli", "binomial"):
        return mu * (1.0 - mu)
    if dist == "poisson":
        return mu
    if dist == "negativebinomial":
        return mu + mu * mu / nb_r
    if dist == "gamma":
        return mu * mu
    if dist == "inversegaussian":
        return mu * mu * mu
    raise ValueError(f"unknown distribution {dist}")


def devresid(dist: str, y, mu, nb_r=None):
    """Squared deviance residual per observation (GLM.jl's devresid)."""
    if dist == "normal":
        d = y - mu
        return d * d
    if dist == "bernoulli":
        # y in {0,1}: -2*(y log mu + (1-y) log(1-mu)), guarded for mu->0/1
        mu_c = jnp.clip(mu, 1e-10, 1.0 - 1e-10)
        return -2.0 * (xlogy(y, mu_c) + xlog1py(1.0 - y, -mu_c))
    if dist == "poisson":
        return 2.0 * (xlogy(y, y / jnp.maximum(mu, 1e-30)) - (y - mu))
    if dist == "negativebinomial":
        return 2.0 * (xlogy(y, y / jnp.maximum(mu, 1e-30))
                      - (y + nb_r) * jnp.log((y + nb_r) / (mu + nb_r)))
    if dist == "gamma":
        return -2.0 * (jnp.log(y / mu) - (y - mu) / mu)
    if dist == "inversegaussian":
        d = y - mu
        return d * d / (y * mu * mu)
    raise ValueError(f"unknown distribution {dist}")


def loglik_obs(dist: str, y, mu, wt, phi, nb_r=None):
    """Weighted per-observation loglikelihood (reference src/utilities.jl:30-43).

    `wt` is the 0/1 cross-validation mask weight; `phi` is the dispersion
    (deviance / n), used by normal / gamma / inverse-gaussian.
    """
    if dist == "normal":
        ll = -0.5 * (jnp.log(2.0 * jnp.pi * phi) + (y - mu) ** 2 / phi)
    elif dist == "bernoulli":
        mu_c = jnp.clip(mu, 1e-10, 1.0 - 1e-10)
        ll = xlogy(y, mu_c) + xlog1py(1.0 - y, -mu_c)
    elif dist == "poisson":
        ll = xlogy(y, mu) - mu - gammaln(y + 1.0)
    elif dist == "negativebinomial":
        # reference parameterization: p = r/(mu+r)   (src/utilities.jl:38-43)
        r = nb_r
        ll = (gammaln(y + r) - gammaln(r) - gammaln(y + 1.0)
              + r * jnp.log(r / (mu + r)) + xlogy(y, mu / (mu + r)))
    elif dist == "gamma":
        # Gamma(shape=1/phi, scale=mu*phi)
        a = 1.0 / phi
        theta = mu * phi
        ll = -gammaln(a) - a * jnp.log(theta) + xlogy(a - 1.0, y) - y / theta
    elif dist == "inversegaussian":
        lam = 1.0 / phi
        ll = 0.5 * (jnp.log(lam) - jnp.log(2.0 * jnp.pi) - 3.0 * jnp.log(y)) \
            - lam * (y - mu) ** 2 / (2.0 * mu * mu * y)
    elif dist == "binomial":
        # loglik_obs(::Binomial...) treats wt as the trial count (utilities.jl:33)
        n_tr = wt
        k = y * wt
        mu_c = jnp.clip(mu, 1e-10, 1.0 - 1e-10)
        return (gammaln(n_tr + 1) - gammaln(k + 1) - gammaln(n_tr - k + 1)
                + xlogy(k, mu_c) + xlog1py(n_tr - k, -mu_c))
    else:
        raise ValueError(f"unknown distribution {dist}")
    ll = jnp.where(wt > 0, ll, 0.0)
    return wt * ll


def deviance(dist: str, y, mu, wts, nb_r=None, axis=None):
    """Weighted sum of squared deviance residuals (src/utilities.jl:52-61)."""
    d = devresid(dist, y, mu, nb_r=nb_r)
    d = jnp.where(wts > 0, d, 0.0)
    return jnp.sum(wts * d, axis=axis)


def loglikelihood(dist: str, y, mu, wts, n_true, nb_r=None, axis=None):
    """Total weighted loglikelihood with phi = deviance/length(y)
    (reference src/utilities.jl:9-20 — note: divides by the FULL length,
    not the masked count)."""
    phi = deviance(dist, y, mu, wts, nb_r=nb_r, axis=axis) / n_true
    if axis is not None:
        phi = jnp.expand_dims(phi, axis)
    phi = jnp.maximum(phi, 1e-30)
    ll = loglik_obs(dist, y, mu, wts, phi, nb_r=nb_r)
    return jnp.sum(ll, axis=axis)


def score_residual(dist: str, link: str, y, mu, eta, wts, nb_r=None):
    """w * (y - mu) with w = mueta(eta)/glmvar(mu), masked by cv weights
    (reference score!, src/utilities.jl:126-135)."""
    w = mueta(link, eta) / jnp.maximum(glmvar(dist, mu, nb_r=nb_r), 1e-30)
    return w * (y - mu) * wts
