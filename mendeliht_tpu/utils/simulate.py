"""Simulation utilities (reference src/simulate_utilities.jl).

numpy-RNG based, vectorized; emits PackedGenotypes directly (and optionally a
PLINK .bed on disk, like the reference's mmap'd SnpArray files)."""

from __future__ import annotations

import numpy as np

from ..genotype.snparray import PackedGenotypes
from ..genotype.plink import write_plink_bed
from ..ops import glm


def _values_to_codes(vals: np.ndarray) -> np.ndarray:
    """{0,1,2} additive values -> PLINK codes {0,2,3} (no missing)."""
    codes = np.zeros(vals.shape, np.uint8)
    codes[vals == 1] = 2
    codes[vals == 2] = 3
    return codes


def simulate_random_snparray(s, n: int, p: int, mafs=None, min_ma: int = 5,
                             rng=None):
    """Random genotypes: SNP j ~ Binomial(2, maf_j), maf ~ U(0, 0.5) unless
    given; re-draws until each SNP has > min_ma minor alleles (reference
    src/simulate_utilities.jl:23-80).

    `s`: output .bed path or None. Returns (PackedGenotypes, mafs)."""
    rng = np.random.default_rng() if rng is None else rng
    fixed_mafs = mafs is not None and np.any(np.asarray(mafs) != 0)
    if fixed_mafs:
        mafs = np.asarray(mafs, np.float64)
        if not np.all((0.0 <= mafs) & (mafs <= 0.5)):
            raise ValueError("Minor allele frequencies not in (0, 0.5)")
    out_mafs = np.zeros(p)
    vals = np.zeros((n, p), np.uint8)
    todo = np.arange(p)
    maf_cur = mafs.copy() if fixed_mafs else rng.uniform(0, 0.5, size=p)
    for _ in range(10000):
        if todo.size == 0:
            break
        draw = (rng.random((n, todo.size)) < maf_cur[todo]).astype(np.uint8) \
            + (rng.random((n, todo.size)) < maf_cur[todo]).astype(np.uint8)
        vals[:, todo] = draw
        ok = draw.sum(axis=0) > min_ma
        out_mafs[todo[ok]] = maf_cur[todo[ok]]
        todo = todo[~ok]
        if not fixed_mafs:
            maf_cur[todo] = rng.uniform(0, 0.5, size=todo.size)
    if todo.size:
        raise RuntimeError("could not satisfy min_ma for some SNPs")
    codes = _values_to_codes(vals)
    if isinstance(s, str):
        write_plink_bed(s, codes)
    return PackedGenotypes.from_codes(codes), out_mafs


def simulate_correlated_snparray(s, n: int, p: int, block_length: int = 20,
                                 hap: int = 20, prob: float = 0.75, rng=None):
    """LD-block haplotype model (reference src/simulate_utilities.jl:119-186):
    SNPs in blocks of `block_length`; within a block each sample draws 2 of
    `hap` haplotypes; adjacent haplotype alleles repeat w.p. `prob`."""
    rng = np.random.default_rng() if rng is None else rng
    if p % block_length != 0:
        raise ValueError(f"block_length ({block_length}) does not divide p ({p})")
    if not (0 < prob < 1):
        raise ValueError(f"transition probability must be in (0,1), got {prob}")
    blocks = p // block_length
    vals = np.zeros((n, p), np.uint8)
    for b in range(blocks):
        # pool of haplotypes: first allele ~ Bernoulli(1/2), then sticky walk
        while True:
            h = np.zeros((hap, block_length), np.uint8)
            h[:, 0] = rng.integers(0, 2, size=hap)
            for j in range(1, block_length):
                stay = rng.random(hap) < prob
                h[:, j] = np.where(stay, h[:, j - 1], 1 - h[:, j - 1])
            if np.all(h.sum(axis=1) > 0):
                break
        r1 = rng.integers(0, hap, size=n)
        r2 = rng.integers(0, hap, size=n)
        vals[:, b * block_length:(b + 1) * block_length] = h[r1] + h[r2]
    codes = _values_to_codes(vals)
    if isinstance(s, str):
        write_plink_bed(s, codes)
    return PackedGenotypes.from_codes(codes)


def _standardized_dense(x):
    if isinstance(x, PackedGenotypes):
        return x.to_dense_standardized()
    return np.asarray(x, np.float64)


def simulate_random_response(x, k: int, d=None, l=None, r=10, alpha=1,
                             Zu=None, rng=None):
    """Simulate a univariate GLM response with k causal SNPs (reference
    src/simulate_utilities.jl:207-242). Returns (y, true_b, correct_position)."""
    rng = np.random.default_rng() if rng is None else rng
    d = d if d is not None else glm.Normal()
    dist = glm.dist_name(d)
    link = glm.link_name(l) if l is not None else glm._CANONICAL[dist]
    X = _standardized_dense(x)
    n, p = X.shape
    if dist in ("negativebinomial", "gamma") and link != "log":
        raise ValueError(f"Distribution {dist} must use LogLink!")
    Zu = np.zeros(n) if Zu is None else np.asarray(Zu).reshape(n)

    true_b = np.zeros(p)
    scale = 0.3 if dist in ("poisson", "gamma", "negativebinomial") else 1.0
    true_b[:k] = rng.normal(0, scale, size=k)
    rng.shuffle(true_b)
    correct_position = np.flatnonzero(true_b)

    eta = X @ true_b + Zu
    if dist in ("normal", "poisson", "bernoulli"):
        mu = np.asarray(glm.linkinv(link, np.clip(eta, -20, 20) if dist != "normal" else eta))
        mu = np.clip(mu, -1e20, 1e20) if dist == "normal" else mu
        if dist == "normal":
            y = rng.normal(mu, 1.0)
        elif dist == "poisson":
            y = rng.poisson(np.clip(mu, 0, 1e8)).astype(np.float64)
        else:
            y = rng.binomial(1, np.clip(mu, 0, 1)).astype(np.float64)
    elif dist == "negativebinomial":
        mu = np.exp(np.clip(eta, -20, 20))
        prob = 1.0 / (1.0 + mu / r)
        y = rng.negative_binomial(r, prob).astype(np.float64)
    elif dist == "gamma":
        mu = np.exp(eta)
        beta_rate = 1.0 / mu
        y = rng.gamma(alpha, 1.0 / beta_rate)
    elif dist == "inversegaussian":
        # experimental trait (reference docs/src/index.md:26-34); Wald
        # sampling with unit shape, mean = linkinv(eta)
        mu = np.asarray(glm.linkinv(link, np.clip(eta, -20, 20)))
        y = rng.wald(np.clip(mu, 1e-3, 1e6), 1.0)
    else:
        raise ValueError(f"cannot simulate distribution {dist}")
    return y.astype(np.float64), true_b, correct_position


def random_covariance_matrix(n: int, kappa: float = 10.0, rng=None):
    """Random SPD matrix with condition number <= kappa
    (reference src/simulate_utilities.jl:319-326)."""
    rng = np.random.default_rng() if rng is None else rng
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    sigma = rng.uniform(1, np.sqrt(kappa), size=n)
    A = Q @ np.diag(sigma) @ Q.T
    return A.T @ A


def simulate_random_multivariate_response(x, k: int, traits: int, Zu=None,
                                          overlap: int = 0, Sigma=None,
                                          rng=None):
    """Multi-trait Gaussian phenotypes with k causal SNPs total, `overlap`
    shared causal SNPs (reference src/simulate_utilities.jl:266-308).
    `Sigma` optionally fixes the trait covariance instead of sampling one.

    Returns (Y (n, traits), Sigma, true_b (p, traits), correct_position)."""
    rng = np.random.default_rng() if rng is None else rng
    X = _standardized_dense(x)
    n, p = X.shape
    if traits * overlap > k:
        raise ValueError("traits * overlap cannot exceed k!")
    Zu = np.zeros((n, traits)) if Zu is None else np.asarray(Zu)

    true_b = np.zeros((p, traits))
    if overlap == 0:
        causal = rng.choice(traits * p, size=k, replace=False)
        true_b.ravel(order="F")[causal] = rng.standard_normal(k)
        tmp = true_b.ravel(order="F")
        true_b = tmp.reshape(p, traits, order="F")
    else:
        shared = rng.choice(p, size=overlap, replace=False)
        for t in range(traits):
            true_b[shared, t] = rng.standard_normal(overlap)
        flat_ok = np.ones(traits * p, bool)
        for t in range(traits):
            flat_ok[t * p + shared] = False
        rest = rng.choice(np.flatnonzero(flat_ok), size=k - traits * overlap,
                          replace=False)
        tb = true_b.ravel(order="F")
        tb[rest] = rng.standard_normal(k - traits * overlap)
        true_b = tb.reshape(p, traits, order="F")
    correct_position = np.argwhere(true_b != 0)

    if Sigma is None:
        Sigma = random_covariance_matrix(traits, rng=rng)
    else:
        Sigma = np.asarray(Sigma, np.float64)
    mu = X @ true_b + Zu
    L = np.linalg.cholesky(Sigma)
    Y = mu + rng.standard_normal((n, traits)) @ L.T
    return Y, Sigma, true_b, correct_position


def adhoc_add_correlation(codes: np.ndarray, rho: float, pos: int, location,
                          rng=None):
    """Copy SNP `pos` into SNPs in `location` with probability rho per sample
    (reference src/simulate_utilities.jl:339-348). Operates on an (n, p) code
    matrix in place; 0-based indices."""
    rng = np.random.default_rng() if rng is None else rng
    if not (0 <= rho <= 1):
        raise ValueError(f"correlation coefficient must be in (0, 1), got {rho}")
    n = codes.shape[0]
    for loc in np.atleast_1d(location):
        mask = rng.random(n) < rho
        codes[mask, loc] = codes[mask, pos]
    return codes


def make_snparray(s, values) -> PackedGenotypes:
    """Pack an additive-value matrix {0,1,2} (np.nan = missing) into
    PackedGenotypes, optionally writing a PLINK .bed at path `s`
    (reference export `make_snparray`, src/MendelIHT.jl:31, backed by
    _make_snparray src/simulate_utilities.jl:85-101)."""
    vals = np.asarray(values)
    if np.issubdtype(vals.dtype, np.floating):
        miss = np.isnan(vals)
        codes = _values_to_codes(np.where(miss, 0, vals).astype(np.uint8))
        codes[miss] = 1
    else:
        codes = _values_to_codes(vals.astype(np.uint8))
    if isinstance(s, str):
        write_plink_bed(s, codes)
    return PackedGenotypes.from_codes(codes)


def make_bim_fam_files(x, y, name: str):
    """Write `.bim`/`.fam` companions for a simulated .bed
    (reference src/simulate_utilities.jl:360-383)."""
    if isinstance(x, PackedGenotypes):
        n, p = x.n, x.p
    else:
        n, p = np.asarray(x).shape
    y = np.asarray(y)
    if y.shape[0] != n:
        raise ValueError(f"phenotype has length {y.shape[0]} but genotypes "
                         f"have {n} samples")
    with open(name + ".bim", "w") as f:
        for i in range(1, p + 1):
            f.write(f"1\tsnp{i}\t0\t{100 * i}\t1\t2\n")
    traits = 1 if y.ndim == 1 else y.shape[1]
    ymat = y.reshape(n, traits)
    with open(name + ".fam", "w") as f:
        for i in range(1, n + 1):
            f.write(f"{i}\t1\t0\t0\t1")
            for j in range(traits):
                f.write(f"\t{ymat[i - 1, j]}")
            f.write("\n")
