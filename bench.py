"""Headline benchmark: Gaussian IHT fit, n=10,000 x p=1,000,000, k=10.

Reference baseline: 256 s on an Intel Xeon E5-2670 exclusive node
(BASELINE.md row 3; figures/benchmark/normal_results_nodebias/
10000_by_1000000_run1:2, 4 iterations).

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": ratio}
vs_baseline = our_seconds / 256 (< 1 means faster than the reference).

The genotype matrix (2.5 GB packed) is simulated once and cached in
.bench_cache/ (gitignored). Timing is the warm (second) fit — the reference's
numbers are likewise post-JIT Julia timings.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_SECONDS = 256.0
N, P, K = 10_000, 1_000_000, 10
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _gen_problem(rng, n=None, p=None):
    """Simulate packed genotypes directly in the TPU layout + stats + y.

    Chunked over SNP rows so peak host memory stays ~1 chunk of temporaries
    above the packed matrix itself (matters at n=50k x 1M: 12.5 GB packed)."""
    from mendeliht_tpu.genotype.snparray import _ceil_to, _LANE

    n = N if n is None else n
    p = P if p is None else p
    n4 = _ceil_to(-(-n // 4), _LANE)
    packed = np.empty((p, n4), dtype=np.uint8)
    n_het = np.zeros(p, np.int64)
    n_alt = np.zeros(p, np.int64)
    n_mis = np.zeros(p, np.int64)
    chunk = 8192
    for lo in range(0, p, chunk):
        hi = min(lo + chunk, p)
        blk = rng.integers(0, 256, size=(hi - lo, n4), dtype=np.uint8)
        # no-missing data, like the reference's benchmark simulations
        # (simulate_random_snparray generates none): remap code 01 -> 00
        for s in range(4):
            lo_bit = (blk >> (2 * s)) & 1
            hi_bit = (blk >> (2 * s + 1)) & 1
            miss = lo_bit & (1 - hi_bit)
            blk ^= (miss << (2 * s)).astype(np.uint8)
        # zero out padding crumbs (samples >= n) so stats are exact:
        # plane s covers samples s*n4 + b; require s*n4 + b < n
        for s in range(4):
            off = s * n4
            first_bad = max(0, min(n4, n - off))
            if first_bad < n4:
                mask = np.uint8(0xFF ^ (0x3 << (2 * s)))
                blk[:, first_bad:] &= mask
        for s in range(4):
            c = (blk >> (2 * s)) & 0x3
            n_het[lo:hi] += (c == 2).sum(axis=1)
            n_alt[lo:hi] += (c == 3).sum(axis=1)
            n_mis[lo:hi] += (c == 1).sum(axis=1)
        packed[lo:hi] = blk
    n_obs = n - n_mis
    mu = np.where(n_obs > 0, (n_het + 2.0 * n_alt) / np.maximum(n_obs, 1), 0.0)
    sd = np.sqrt(np.maximum(mu * (1.0 - mu / 2.0), 0.0))
    inv_sd = np.where(sd > 0, 1.0 / np.where(sd > 0, sd, 1.0), 0.0)

    causal = rng.choice(p, size=K, replace=False)
    beta = rng.standard_normal(K)
    return packed, mu, inv_sd, bool(n_mis.sum() > 0), causal, beta


def load_problem():
    import jax.numpy as jnp
    from mendeliht_tpu.genotype.snparray import PackedGenotypes

    from mendeliht_tpu.genotype.snparray import _ceil_to, _LANE

    os.makedirs(CACHE, exist_ok=True)
    # cache key includes the sample-axis alignment: a cache written under an
    # older _LANE would silently reintroduce the relayout copy on load
    f = os.path.join(CACHE, f"gauss_nm_{N}x{P}_L{_LANE}.npz")
    if os.path.isfile(f):
        log("loading cached benchmark problem...")
        d = np.load(f)
        packed, mu, inv_sd = d["packed"], d["mu"], d["inv_sd"]
        causal, beta, y = d["causal"], d["beta"], d["y"]
        has_missing = bool(d["has_missing"])
        assert packed.shape[1] == _ceil_to(-(-N // 4), _LANE), \
            "stale benchmark cache: delete .bench_cache and regenerate"
    else:
        log("simulating benchmark problem (one-time)...")
        rng = np.random.default_rng(2026)
        packed, mu, inv_sd, has_missing, causal, beta = _gen_problem(rng)
        g = PackedGenotypes.from_packed(
            packed, mu, inv_sd, n=N, p=P, has_missing=has_missing)
        from mendeliht_tpu.ops.linalg import make_operator
        op = make_operator(g)
        idx = jnp.asarray(causal[None, :])
        coef = jnp.asarray(beta[None, :], jnp.float32)
        xb = np.asarray(op.forward_sel(idx, coef, jnp.ones_like(coef)))[0][:N]
        y = xb + 1.0 + np.random.default_rng(7).standard_normal(N)
        np.savez(f, packed=packed, mu=mu, inv_sd=inv_sd, causal=causal,
                 beta=beta, y=y, has_missing=has_missing)
        del op, g
    g = PackedGenotypes.from_packed(
        packed, mu, inv_sd, n=N, p=P, has_missing=has_missing)
    return g, y, causal, beta


def _glm_response(g, dist_name, rng):
    """Simulate a response of the given family on the cached genotypes using
    K causal SNPs (mirrors the reference's benchmark scripts,
    figures/benchmark/normal_run.jl etc.)."""
    import jax.numpy as jnp
    import mendeliht_tpu as m
    from mendeliht_tpu.ops.linalg import make_operator

    causal = rng.choice(P, size=K, replace=False)
    beta = rng.standard_normal(K) * 0.3
    op = make_operator(g)
    idx = jnp.asarray(causal[None, :])
    coef = jnp.asarray(beta[None, :], jnp.float32)
    xb = np.asarray(op.forward_sel(idx, coef, jnp.ones_like(coef)))[0][:N]
    if dist_name == "logistic":
        mu = 1.0 / (1.0 + np.exp(-xb))
        return rng.binomial(1, mu).astype(np.float64), m.Bernoulli()
    if dist_name == "poisson":
        mu = np.exp(np.clip(xb * 0.3, -5, 5))
        return rng.poisson(mu).astype(np.float64), m.Poisson()
    if dist_name == "negativebinomial":
        r = 10.0
        mu = np.exp(np.clip(xb * 0.3, -5, 5))
        p_nb = r / (mu + r)
        return rng.negative_binomial(r, p_nb).astype(np.float64), \
            m.NegativeBinomial()
    raise ValueError(dist_name)


def run_suite(g, y, causal, beta):
    """Full benchmark table (VERDICT r1 #6): all four GLM families at
    n=10k x p=1M, cv_iht 5k x 50k path=1:20 q=5, multivariate fit.
    Writes BENCH_SUITE.json next to this file."""
    import mendeliht_tpu as m

    rows = []

    def add(metric, seconds, baseline_s, note="", baseline_kind="measured",
            **extra):
        row = {"metric": metric, "value": round(seconds, 3), "unit": "s",
               "vs_baseline": (round(seconds / baseline_s, 6)
                               if baseline_s else None),
               "baseline_s": baseline_s,
               "baseline_kind": baseline_kind if baseline_s else None}
        if note:
            row["note"] = note
        row.update(extra)
        rows.append(row)
        log(f"[suite] {metric}: {seconds:.3f}s"
            + (f" (ref {baseline_s}s)" if baseline_s else ""))

    # --- gaussian headline (BASELINE.md row 3: 256 s) --------------------
    def gauss():
        t0 = time.time()
        res = m.fit_iht(y, g, k=K, d=m.Normal(), verbose=False)
        return time.time() - t0, res

    gauss()
    t, res = gauss()
    add("gaussian_iht_fit_n10k_p1M", t, 256.0, iters=res.iter)

    # --- other GLM families on the same matrix ----------------------------
    # reference committed only n=120k x 1M for these (5460/30340/9717 s);
    # baseline extrapolated linearly in n (the cost is one X'R pass per
    # iteration) with the SAME iteration counts the reference reports
    rng = np.random.default_rng(7)
    for name, base120k, note in [
            ("logistic", 5460.0, "ref n=120k: 5460s/8it, scaled x10/12"),
            ("poisson", 30340.0, "ref n=120k: 30340s/49it, scaled x10/12"),
            ("negativebinomial", 9717.0, "ref n=120k: 9717s/15it, scaled x10/12")]:
        yy, d = _glm_response(g, name, rng)
        kw = dict(est_r="MM") if name == "negativebinomial" else {}
        m.fit_iht(yy, g, k=K, d=d, verbose=False, **kw)   # compile
        t0 = time.time()
        res = m.fit_iht(yy, g, k=K, d=d, verbose=False, **kw)
        add(f"{name}_iht_fit_n10k_p1M", time.time() - t0,
            round(base120k * 10_000 / 120_000, 1), note=note,
            baseline_kind="extrapolated", iters=res.iter)

    # --- cross-validation (BASELINE.md row 9: ~150 s) ----------------------
    rng = np.random.default_rng(11)
    xcv, _ = m.simulate_random_snparray(None, 5000, 50_000, rng=rng)
    ycv, _, _ = m.simulate_random_response(xcv, 10, m.Normal(), rng=rng)
    m.cv_iht(ycv, xcv, path=range(1, 21), q=5, verbose=False,
             rng=np.random.default_rng(3))                 # compile
    t0 = time.time()
    mses = m.cv_iht(ycv, xcv, path=range(1, 21), q=5, verbose=False,
                    rng=np.random.default_rng(3))
    add("cv_iht_gaussian_n5k_p50k_path20_q5", time.time() - t0, 150.0,
        best_k=int(np.argmin(mses)) + 1)

    # --- multivariate fit (reference example scale; BASELINE.md row 14) ---
    rng = np.random.default_rng(13)
    xmv, _ = m.simulate_random_snparray(None, 1000, 10_000, rng=rng)
    Sigma = m.random_covariance_matrix(2, rng=rng)
    Ymv, _, _, _ = m.simulate_random_multivariate_response(
        xmv, 10, 2, Sigma=Sigma, rng=rng)
    Yt = np.ascontiguousarray(Ymv.T)        # traits are rows for fit_iht
    m.fit_iht(Yt, xmv, k=10, d=m.MvNormal(), verbose=False)  # compile
    t0 = time.time()
    m.fit_iht(Yt, xmv, k=10, d=m.MvNormal(), verbose=False)
    add("mv_iht_fit_r2_n1k_p10k", time.time() - t0, None,
        note="reference commits only kernel micro-benchmarks for mIHT")

    suite = {"device": str(__import__("jax").devices()[0].device_kind),
             "rows": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_SUITE.json")
    with open(path, "w") as f:
        json.dump(suite, f, indent=2)
    log("wrote", path)
    return rows


def run_scale(n=50_000, p=1_000_000):
    """Reference-scale rows (VERDICT r2 #7): n=50k x 1M is the largest shape
    with a committed same-scale reference baseline that fits one v5e HBM
    (12.5 GB packed < 16 GB; the reference's 120k rows are 30 GB packed).

    Rows: Gaussian vs the committed 1266 s mean (BASELINE.md row 4,
    figures/benchmark/normal_results_nodebias/50000_by_1000000_run*), and
    logistic vs a flagged linear-in-n extrapolation of the committed 120k row
    (no committed 50k logistic run exists).  Writes BENCH_SCALE.json."""
    import jax
    import mendeliht_tpu as m
    from mendeliht_tpu.genotype.snparray import PackedGenotypes

    from mendeliht_tpu.genotype.snparray import _ceil_to, _LANE

    os.makedirs(CACHE, exist_ok=True)
    fpk = os.path.join(CACHE, f"scale_{n}x{p}_L{_LANE}_packed.npy")
    fst = os.path.join(CACHE, f"scale_{n}x{p}_L{_LANE}_stats.npz")
    if os.path.isfile(fpk):
        log("loading cached scale problem...")
        packed = np.load(fpk, mmap_mode="r")
        assert packed.shape[1] == _ceil_to(-(-n // 4), _LANE), \
            "stale benchmark cache: delete .bench_cache and regenerate"
        d = np.load(fst)
        mu, inv_sd, causal, beta = d["mu"], d["inv_sd"], d["causal"], d["beta"]
        has_missing = bool(d["has_missing"])
    else:
        log(f"simulating {n}x{p} problem (one-time, ~10 min)...")
        rng = np.random.default_rng(50_2026)
        packed, mu, inv_sd, has_missing, causal, beta = _gen_problem(
            rng, n=n, p=p)
        np.save(fpk, packed)
        np.savez(fst, mu=mu, inv_sd=inv_sd, causal=causal, beta=beta,
                 has_missing=has_missing)
    # xb for response simulation is computed on the HOST: an eager (op-by-op)
    # device gather of k rows makes XLA relayout-copy the ENTIRE words array
    # (11.9 GB at n=50k — with the 11.7 GB argument that exceeds v5e HBM).
    # Inside the jitted fit program the gather uses the native layout, so the
    # fit itself is unaffected.
    n4 = packed.shape[1]
    xb = np.zeros(n)
    for j, b in zip(causal, beta):
        row = np.asarray(packed[j])
        vals = np.empty(4 * n4, np.float32)
        for s in range(4):
            c = (row >> (2 * s)) & 3
            vals[s * n4:(s + 1) * n4] = np.where(c == 2, 1.0,
                                                 np.where(c == 3, 2.0, 0.0))
        xb += b * inv_sd[j] * (vals[:n] - mu[j])
    g = PackedGenotypes.from_packed(np.ascontiguousarray(packed), mu, inv_sd,
                                    n=n, p=p, has_missing=has_missing)
    rows = []

    def timed_fit(y, d, name, baseline_s, baseline_kind, note=""):
        kw = {}
        t0 = time.time()
        res = m.fit_iht(y, g, k=K, d=d, verbose=False, **kw)
        t_cold = time.time() - t0
        t0 = time.time()
        res = m.fit_iht(y, g, k=K, d=d, verbose=False, **kw)
        t = time.time() - t0
        row = {"metric": name, "value": round(t, 3), "unit": "s",
               "vs_baseline": round(t / baseline_s, 6),
               "baseline_s": baseline_s, "baseline_kind": baseline_kind,
               "cold_s": round(t_cold, 3), "iters": res.iter}
        if note:
            row["note"] = note
        rows.append(row)
        log(f"[scale] {name}: {t:.3f}s warm / {t_cold:.1f}s cold "
            f"(ref {baseline_s}s, {baseline_kind}) iters={res.iter}")
        return res

    y = xb + 1.0 + np.random.default_rng(7).standard_normal(n)
    timed_fit(y, m.Normal(), f"gaussian_iht_fit_n{n//1000}k_p1M", 1266.0,
              "measured",
              note="ref committed 50k x 1M mean of 5 runs (BASELINE.md row 4)")

    rng = np.random.default_rng(17)
    mu_l = 1.0 / (1.0 + np.exp(-xb))
    yl = rng.binomial(1, mu_l).astype(np.float64)
    timed_fit(yl, m.Bernoulli(), f"logistic_iht_fit_n{n//1000}k_p1M",
              round(5460.0 * n / 120_000, 1), "extrapolated",
              note="ref committed only n=120k (5460 s/8 it); scaled linearly "
                   "in n — one X'R pass per iteration is O(np)")

    out = {"device": str(jax.devices()[0].device_kind),
           "problem": {"n": n, "p": p,
                       "packed_gbytes": round(packed.nbytes / 1e9, 2)},
           "rows": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_SCALE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    log("wrote", path)
    print(json.dumps(rows[0]))


def _mv_response(g, r, rng, k_causal=10, scale=0.5):
    """Simulate an (r, n) multivariate Gaussian response on cached packed
    genotypes with k_causal shared causal SNPs and trait covariance Sigma."""
    import jax.numpy as jnp
    import mendeliht_tpu as m
    from mendeliht_tpu.ops.linalg import make_operator

    causal = rng.choice(P, size=k_causal, replace=False)
    Beff = rng.standard_normal((r, k_causal)) * scale
    op = make_operator(g)
    idx = jnp.asarray(causal[None, :])
    coef = jnp.asarray(Beff[None], jnp.float32)
    BX = np.asarray(op.forward_sel_multi(
        idx, coef, jnp.ones((1, k_causal), jnp.float32)))[0]     # (r, n_pad)
    Sigma = m.random_covariance_matrix(r, rng=rng)
    E = np.linalg.cholesky(Sigma) @ rng.standard_normal((r, g.n))
    return np.ascontiguousarray(BX[:, :g.n] + E), causal


def run_flagship(g, y):
    """Flagship BATCH workloads at reference scale (round-4 VERDICT #2):

    (a) cv_iht n=10k x 1M, path=1:20, q=5 — the m=100 multi-RHS regime the
        kernel was designed for (reference's own cv harness shape,
        src/cross_validation.jl:60-131, scaled to its 1M-SNP benchmarks);
    (b) multivariate 3-trait FIT at 10k x 1M;
    (c) multivariate 3-trait CV, path=100:100:1000, q=3 — the reference's
        UK-Biobank hypertension protocol verbatim (manuscript/
        UKBB_hyptertension/ukbb.jl: same path/q/init_beta/min_iter).

    Reference baselines: the cv row extrapolates the committed 5k x 50k
    ~150 s row by nnz (x40); the mv rows quote the committed UKBB wall
    times (12,290 s cv / 8,857 s fit) with an nnz-scaled extrapolation —
    the UKBB data itself is not in the repo (paper: ~185k x ~470k).
    Writes BENCH_FLAGSHIP.json."""
    import jax
    import mendeliht_tpu as m

    rows = []

    def add(metric, seconds, baseline_s, baseline_kind, note="", **extra):
        row = {"metric": metric, "value": round(seconds, 3), "unit": "s",
               "vs_baseline": (round(seconds / baseline_s, 6)
                               if baseline_s else None),
               "baseline_s": baseline_s, "baseline_kind": baseline_kind}
        if note:
            row["note"] = note
        row.update(extra)
        rows.append(row)
        log(f"[flagship] {metric}: {seconds:.3f}s (ref {baseline_s}s, "
            f"{baseline_kind})")

    # ---- (a) univariate cv at the kernel's m=100 design point ----------
    folds_rng = np.random.default_rng(3)
    kw = dict(path=range(1, 21), q=5, verbose=False,
              rng=np.random.default_rng(3))
    t0 = time.time()
    mses = m.cv_iht(y, g, **kw)
    t_cold = time.time() - t0
    # fresh same-seed rng: identical folds -> the warm run repeats the
    # cold run's exact work (cv runtime is convergence-dependent; a shared
    # rng object hands the second run different folds)
    kw["rng"] = np.random.default_rng(3)
    t0 = time.time()
    mses = m.cv_iht(y, g, **kw)
    add("cv_iht_gaussian_n10k_p1M_path20_q5", time.time() - t0,
        round(150.0 * (N * P) / (5000 * 50_000), 1), "extrapolated",
        note="ref committed 5k x 50k ~150 s (10 cores); scaled by nnz x40 "
             "— cv cost is one X'R pass per iteration over the grid",
        cold_s=round(t_cold, 3), best_k=int(np.argmin(mses)) + 1)

    # ---- (b) 3-trait multivariate fit ----------------------------------
    err = None
    try:
        rng = np.random.default_rng(31)
        Y3, causal = _mv_response(g, 3, rng)
        m.fit_iht(Y3, g, k=12, d=m.MvNormal(), verbose=False, min_iter=10,
                  init_beta=True)                                    # compile
        t0 = time.time()
        res = m.fit_iht(Y3, g, k=12, d=m.MvNormal(), verbose=False,
                        min_iter=10, init_beta=True)
        add("mv3_iht_fit_n10k_p1M_k12", time.time() - t0, 8857.0,
            "different-shape reference",
            note="ref committed UKBB 3-trait final fit wall time (k=197, "
                 "1500 iters, ~185k x ~470k per paper; data not in repo). "
                 "nnz-scaled equivalent ~1018 s; iteration counts differ",
            iters=res.iter)

        # ---- (c) 3-trait multivariate cv, UKBB protocol ----------------
        kw = dict(path=range(100, 1001, 100), q=3, d=m.MvNormal(),
                  verbose=False, init_beta=True, min_iter=10,
                  rng=np.random.default_rng(5))
        t0 = time.time()
        mses = m.cv_iht(Y3, g, **kw)
        t_cold = time.time() - t0
        kw["rng"] = np.random.default_rng(5)       # same folds as cold run
        t0 = time.time()
        mses = m.cv_iht(Y3, g, **kw)
        add("mv3_cv_iht_n10k_p1M_path100-1000_q3", time.time() - t0, 12290.0,
            "different-shape reference",
            note="reference UKBB hypertension protocol verbatim (path=100:"
                 "100:1000, q=3, init_beta, min_iter=10; manuscript joblog "
                 "12,290 s at ~185k x ~470k). nnz-scaled equivalent ~1413 s. "
                 "runs as 2 task-chunks of 15 (HBM bound, see models/mv.py)",
            cold_s=round(t_cold, 3),
            best_k=int(np.asarray(list(kw["path"]))[int(np.argmin(mses))]))

        # ---- (d) 18-trait multivariate cv, metabolomic protocol shape --
        # (round-4 VERDICT missing #3: r=18 multiplies the multi-RHS width
        # (T*r) and the (T, r, p) state exactly where trait-major
        # flattening and task-chunking operate; this runs them at their
        # design width)
        rng = np.random.default_rng(37)
        Y18, _ = _mv_response(g, 18, rng)
        kw = dict(path=range(4590, 4771, 10), q=3, d=m.MvNormal(),
                  verbose=False, min_iter=10, rng=np.random.default_rng(7))
        t0 = time.time()
        mses = m.cv_iht(Y18, g, **kw)
        t_cold = time.time() - t0
        kw["rng"] = np.random.default_rng(7)       # same folds as cold run
        t0 = time.time()
        mses = m.cv_iht(Y18, g, **kw)
        add("mv18_cv_iht_n10k_p1M_finegrid_q3", time.time() - t0, 56714.0,
            "different-shape reference",
            note="reference UKBB metabolomic final-stage protocol shape "
                 "(r=18 traits, fine grid path=4590:10:4770 around the "
                 "reference's best k=4678, q=3, min_iter=10; "
                 "manuscript/UKBB_metabolomic/iht.jl + "
                 "cviht.summary.final.txt: 56,714 s at ~100k x ~470k, "
                 "32 threads). 57 (fold, k) tasks, task-chunked (HBM "
                 "bound); data here is simulated 10k x 1M",
            cold_s=round(t_cold, 3),
            best_k=int(np.asarray(list(kw["path"]))[int(np.argmin(mses))]))
    except Exception as e:                       # write what succeeded
        import traceback
        err = f"{type(e).__name__}: {e}"
        log("[flagship] mv row failed:")
        traceback.print_exc(file=sys.stderr)

    out = {"device": str(jax.devices()[0].device_kind), "rows": rows}
    if err:
        out["incomplete"] = err.splitlines()[0][:500]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_FLAGSHIP.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    log("wrote", path)
    print(json.dumps(rows[0]))


def _dump_stream(out):
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "STREAM.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


def run_stream():
    """Out-of-core evidence (round-4 VERDICT #3), STREAM.json:

    (a) streamed fit of the 10k x 1M problem with exact parity (support +
        logl) against the HBM-resident fit;
    (b) a LARGER-THAN-HBM problem — 80k x 1M = 20.5 GB packed vs 16 GB v5e
        HBM — fit end-to-end from host RAM with per-pass transfer/compute
        accounting.  This is the capacity story that replaces the
        reference's mmap virtual memory (docs FAQ.md:31-33: 62 GB virtual
        at 500k x 500k)."""
    import jax
    import jax.numpy as jnp
    import mendeliht_tpu as m
    from mendeliht_tpu.genotype.snparray import (_bytes_to_words, _ceil_to,
                                                 _LANE)
    from mendeliht_tpu.ops.streaming import (HostStreamedGenotypes,
                                             StreamedPackedOp)

    out = {"device": str(jax.devices()[0].device_kind)}

    # measured host->device link rate (the denominator for streamed passes);
    # warm up first — the first device op pays init/backlog on this tunnel.
    # MUST be INCOMPRESSIBLE data: round 4 measured this with np.ones, which
    # the remote tunnel compresses — the resulting 71 MB/s "link rate" made
    # the genotype pass (high-entropy packed bytes, ~25-33 MB/s raw) read as
    # 47% overlap when it was in fact link-saturated (round-5
    # tools/stream_probe.py: streamed xtr runs 1.29x FASTER than
    # back-to-back sequential puts of the same bytes).
    rng_l = np.random.default_rng(123)
    warm = jnp.asarray(rng_l.integers(0, 256, (4, 1024, 1024), np.uint8))
    np.asarray(jnp.sum(warm[0, 0]))
    del warm
    t0 = time.time()
    buf = jnp.asarray(rng_l.integers(0, 256, (256, 1024, 1024), np.uint8))
    np.asarray(jnp.sum(buf[0, 0]))
    link_gbs = buf.nbytes / (time.time() - t0) / 1e9
    del buf
    out["h2d_link_gbytes_per_s"] = round(link_gbs, 3)
    log(f"[stream] h2d link (incompressible): {link_gbs:.2f} GB/s")

    # ---- (a) 10k x 1M streamed == resident parity -----------------------
    g, y, causal, beta = load_problem()
    res_r = m.fit_iht(y, g, k=K, d=m.Normal(), verbose=False)
    s = HostStreamedGenotypes(
        words_np=np.asarray(_bytes_to_words(
            np.load(os.path.join(CACHE, f"gauss_nm_{N}x{P}_L{_LANE}.npz")
                    )["packed"])),
        mu=g.mu, inv_sd=g.inv_sd, n=g.n, p=g.p, has_missing=g.has_missing)
    del g
    t0 = time.time()
    res_s = m.fit_iht(y, s, k=K, d=m.Normal(), verbose=False)
    t_stream = time.time() - t0
    assert (np.flatnonzero(res_s.beta).tolist()
            == np.flatnonzero(res_r.beta).tolist()), "support parity failed"
    out["parity_10k_x_1M"] = {
        "resident_s": round(res_r.time, 3),
        "streamed_s": round(t_stream, 3),
        "iters": res_s.iter,
        "support_identical": True,
        "logl_resident": res_r.logl, "logl_streamed": res_s.logl,
        "abs_logl_diff": abs(res_r.logl - res_s.logl),
        "packed_gbytes": round(s.words_np.nbytes / 1e9, 2),
    }
    _dump_stream(out)
    log(f"[stream] 10k x 1M: streamed {t_stream:.1f}s vs resident "
        f"{res_r.time:.3f}s, support identical, "
        f"dlogl={abs(res_r.logl - res_s.logl):.2e}")
    del s

    # ---- (b) larger-than-HBM: 80k x 1M = 20.5 GB packed -----------------
    n_big, p_big = 80_000, P
    words_np, mu, inv_sd, causal_b, beta_b, y_big = _load_80k()
    import jax.numpy as jnp
    sgeno = HostStreamedGenotypes(
        words_np=words_np, mu=jnp.asarray(mu.astype(np.float32)),
        inv_sd=jnp.asarray(inv_sd.astype(np.float32)),
        n=n_big, p=p_big, has_missing=False,
        resident_bytes=0)   # pure streaming: the accounting below measures
                            # the LINK-BOUND pass, not hybrid residency
    packed_gb = words_np.nbytes / 1e9
    log(f"[stream] 80k x 1M: {packed_gb:.1f} GB packed "
        f"(> 16 GB v5e HBM), streaming from host RAM")

    # one instrumented X'R pass: transfer/compute overlap accounting
    sop = StreamedPackedOp(sgeno)
    R = jnp.ones((1, sop.n_pad), jnp.float32)
    np.asarray(sop.xtr(R)[0, :8])                          # warm compile
    t0 = time.time()
    np.asarray(sop.xtr(R * 1.5)[0, :8])
    t_pass = time.time() - t0
    t_xfer_only = packed_gb / link_gbs
    _dump_stream(out)
    out["pass_80k_x_1M"] = {
        "packed_gbytes": round(packed_gb, 2),
        "xtr_pass_s": round(t_pass, 2),
        "pure_transfer_s_at_link": round(t_xfer_only, 2),
        "overlap_efficiency": round(t_xfer_only / t_pass, 3),
        "note": ("streamed X'R is link-bound: blocks are device_put while "
                 "the previous block's kernel runs (async dispatch), so "
                 "pass time ~ transfer time; overlap_efficiency = pure "
                 "transfer / measured pass"),
    }
    log(f"[stream] X'R pass: {t_pass:.1f}s vs pure transfer "
        f"{t_xfer_only:.1f}s ({t_xfer_only / t_pass:.0%} overlap)")
    _dump_stream(out)

    out["fit_80k_x_1M"] = {
        "deferred_to": "python bench.py --stream-fit80",
        "note": ("the end-to-end >HBM fit runs as its OWN process (the "
                 "remote axon client never reclaims host transfer staging "
                 "buffers — every streamed byte stays in RSS, "
                 "tools/stream_probe.py — so the fit needs a fresh leak "
                 "budget and hybrid HBM residency; see "
                 "ops/streaming.py resident_bytes)"),
    }
    _dump_stream(out)
    print(json.dumps({"metric": "stream_pass_80k_x_1M_seconds",
                      "value": out["pass_80k_x_1M"]["xtr_pass_s"],
                      "unit": "s", "vs_baseline": None}))


def _load_80k(mmap_words: bool = False):
    """Load (or simulate once) the 80k x 1M out-of-core problem.

    Returns (words_np, mu, inv_sd, causal, beta, y).  With
    ``mmap_words=True`` the quad words are cached to disk and memory-mapped
    — file-backed pages instead of 20.5 GB of anonymous RSS, which matters
    in the fit process where the axon client's transfer-buffer leak eats
    the RAM headroom."""
    from mendeliht_tpu.genotype.snparray import _bytes_to_words, _LANE
    n_big, p_big = 80_000, P
    fpk = os.path.join(CACHE, f"stream_{n_big}x{p_big}_L{_LANE}_packed.npy")
    fst = os.path.join(CACHE, f"stream_{n_big}x{p_big}_L{_LANE}_stats.npz")
    fwd = os.path.join(CACHE, f"stream_{n_big}x{p_big}_L{_LANE}_words.npy")
    if os.path.isfile(fpk):
        log("[stream] loading cached 80k x 1M problem...")
        packed = np.load(fpk, mmap_mode="r")
        d = np.load(fst)
        mu, inv_sd, causal_b, beta_b = (d["mu"], d["inv_sd"], d["causal"],
                                        d["beta"])
    else:
        log(f"[stream] simulating {n_big}x{p_big} (one-time, ~10 min)...")
        rng = np.random.default_rng(80_2026)
        packed, mu, inv_sd, _, causal_b, beta_b = _gen_problem(
            rng, n=n_big, p=p_big)
        np.save(fpk, packed)
        np.savez(fst, mu=mu, inv_sd=inv_sd, causal=causal_b, beta=beta_b)
    # response simulated on the HOST (device gathers of a >HBM matrix are
    # impossible by definition)
    n4 = packed.shape[1]
    xb = np.zeros(n_big)
    for j, b in zip(causal_b, beta_b):
        row = np.asarray(packed[j])
        vals = np.empty(4 * n4, np.float32)
        for sdx in range(4):
            c = (row >> (2 * sdx)) & 3
            vals[sdx * n4:(sdx + 1) * n4] = np.where(
                c == 2, 1.0, np.where(c == 3, 2.0, 0.0))
        xb += b * inv_sd[j] * (vals[:n_big] - mu[j])
    y_big = xb + 1.0 + np.random.default_rng(7).standard_normal(n_big)

    if mmap_words:
        if not os.path.isfile(fwd):
            log("[stream] caching quad words to disk (one-time)...")
            np.save(fwd, _bytes_to_words(np.ascontiguousarray(packed)))
        words_np = np.load(fwd, mmap_mode="r")
    else:
        words_np = _bytes_to_words(np.ascontiguousarray(packed))
    return words_np, mu, inv_sd, causal_b, beta_b, y_big


def run_stream_fit80():
    """End-to-end >HBM fit (80k x 1M = 20.5 GB packed vs 16 GB HBM) as its
    own process: hybrid residency (~10 GiB pinned in HBM, remainder
    streamed per pass) + mmap'd host words keep peak RSS inside the axon
    client's transfer-buffer leak budget.  Merges fit_80k_x_1M into
    STREAM.json."""
    import jax
    import jax.numpy as jnp
    import mendeliht_tpu as m
    from mendeliht_tpu.ops.streaming import HostStreamedGenotypes

    n_big, p_big = 80_000, P
    words_np, mu, inv_sd, causal_b, beta_b, y_big = _load_80k(
        mmap_words=True)
    sgeno = HostStreamedGenotypes(
        words_np=words_np, mu=jnp.asarray(mu.astype(np.float32)),
        inv_sd=jnp.asarray(inv_sd.astype(np.float32)),
        n=n_big, p=p_big, has_missing=False)     # default hybrid residency
    log(f"[stream-fit80] {words_np.nbytes/1e9:.1f} GB packed, hybrid "
        f"residency on")

    ckdir = os.path.join(CACHE, "fit80_ck")
    t0 = time.time()
    res_b = m.fit_iht(y_big, sgeno, k=K, d=m.Normal(), verbose=False,
                      checkpoint_dir=ckdir, checkpoint_every=1)
    t_fit = time.time() - t0
    found = set(np.flatnonzero(res_b.beta))
    big_eff = set(causal_b[np.abs(beta_b) > 0.3])
    from mendeliht_tpu.ops.streaming import StreamedPackedOp
    p_res = StreamedPackedOp(sgeno).p_res
    row = {
        "wall_s": round(t_fit, 1),
        "iters": res_b.iter,
        "logl": res_b.logl,
        "causal_recovered": len(found & set(causal_b)),
        "large_effect_recovered": f"{len(found & big_eff)}/{len(big_eff)}",
        "full_passes": 1 + res_b.iter,
        "s_per_pass": round(t_fit / (1 + res_b.iter), 1),
        "hybrid_resident_snps": int(p_res),
        "streamed_gbytes_per_pass": round(
            (words_np.nbytes - p_res // 4 * words_np.shape[1] * 4) / 1e9, 2),
        "note": ("reference comparison: its n=120k x 1M rows (30 GB packed) "
                 "ran 2428-30340 s on a 62 GB Xeon node via mmap "
                 "(BASELINE.md); this 20.5 GB problem exceeds the 16 GB v5e "
                 "HBM — ~10 GiB rides HBM (hybrid residency) and the rest "
                 "streams from host RAM per pass, with no capacity cliff. "
                 "On a real (non-tunneled) TPU host the link is PCIe/DMA "
                 "~10-50x faster than this remote tunnel"),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "STREAM.json")
    try:
        with open(path) as f:
            out = json.load(f)
    except Exception:
        out = {}
    out["fit_80k_x_1M"] = row
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    log(f"[stream-fit80] fit: {t_fit:.1f}s, {res_b.iter} iters, "
        f"recovered {len(found & set(causal_b))}/{K}; wrote {path}")
    print(json.dumps({"metric": "stream_fit_80k_x_1M_wall_seconds",
                      "value": row["wall_s"], "unit": "s",
                      "vs_baseline": None}))


def main():
    import jax
    cache_dir = os.path.join(CACHE, "xla")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    log("backend:", jax.default_backend(), jax.devices())

    if "--scale" in sys.argv:
        run_scale()
        return
    if "--stream-fit80" in sys.argv:
        run_stream_fit80()
        return

    if "--stream" in sys.argv:
        run_stream()
        return

    import jax.numpy as jnp
    import mendeliht_tpu as m
    g, y, causal, beta = load_problem()
    log(g)

    if "--suite" in sys.argv or "--flagship" in sys.argv:
        # both flags may be combined: the 2.5 GB problem transfers ONCE
        if "--suite" in sys.argv:
            rows = run_suite(g, y, causal, beta)
            print(json.dumps(rows[0]))
        if "--flagship" in sys.argv:
            run_flagship(g, y)
        return

    def run():
        t0 = time.time()
        res = m.fit_iht(y, g, k=K, d=m.Normal(), verbose=False)
        return time.time() - t0, res

    # split the cold cost into its real parts (VERDICT r2 #3: the 350 s
    # "cold compile" was never decomposed): the 2.5 GB host->device words
    # transfer (tunnel-bandwidth bound on remote TPUs), then XLA+Mosaic
    # compile + first execution
    t0 = time.time()
    # NOTE: on remote (axon-tunnel) backends jax.block_until_ready does NOT
    # wait for execution/transfers — only a host fetch synchronizes.  Fetch
    # a scalar computed FROM the words so the 2.5 GB transfer must finish.
    np.asarray(jnp.sum(g.words[0]))
    t_transfer = time.time() - t0
    log(f"words transfer flush ({g.words.nbytes/1e9:.1f} GB): {t_transfer:.2f}s")
    t_cold, res = run()
    log(f"cold fit (compile + first exec): {t_cold:.2f}s iters={res.iter} "
        f"logl={res.logl:.1f}")
    t_warm, res = run()
    log(f"warm fit: {t_warm:.2f}s iters={res.iter} logl={res.logl:.1f}")
    found = set(np.flatnonzero(res.beta))
    big = set(causal[np.abs(beta) > 0.3])
    log(f"recovered {len(found & set(causal))}/{K} causal "
        f"({len(found & big)}/{len(big)} large-effect)")

    print(json.dumps({
        "metric": "gaussian_iht_fit_n10k_p1M_wall_seconds",
        "value": round(t_warm, 3),
        "unit": "s",
        "vs_baseline": round(t_warm / BASELINE_SECONDS, 5),
        "cold_s": round(t_cold, 3),
        "transfer_s": round(t_transfer, 3),
    }))


if __name__ == "__main__":
    main()
