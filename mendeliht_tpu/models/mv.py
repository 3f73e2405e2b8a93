"""Multivariate (multi-trait) Gaussian IHT — implemented in a later milestone
this round (reference src/multivariate.jl)."""

from __future__ import annotations


def fit_mv_iht(*args, **kwargs):
    raise NotImplementedError("multivariate IHT: implementation in progress")


def cv_mv_iht(*args, **kwargs):
    raise NotImplementedError("multivariate IHT: implementation in progress")
