"""Where does the cold compile go? (VERDICT r2 #3: 350 s cold in round 2.)

Times trace+lower and backend-compile separately, per program, at the
headline shape (n=10k x 1M), with the persistent compilation cache DISABLED
so every number is a true cold compile. Uses ShapeDtypeStruct avatars — no
2.5 GB problem needs to exist on the device to measure compile times.

Usage: python tools/compile_profile.py [--programs a,b,...]
Programs: kernel, init, segment, finalize, fused (default: all).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["MENDELIHT_NO_COMPILE_CACHE"] = "1"

import jax
import jax.numpy as jnp

N, P, K = 10_000, 1_000_000, 10


def avatar(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree)


def t_lower_compile(name, jitted, *args, **kwargs):
    t0 = time.time()
    lowered = jitted.lower(*args, **kwargs)
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    print(f"{name:28s}: lower {t1-t0:7.2f}s   compile {t2-t1:7.2f}s",
          flush=True)
    return t2 - t1


def main():
    from mendeliht_tpu.genotype.snparray import PackedGenotypes, _ceil_to, _LANE
    from mendeliht_tpu.ops.linalg import PackedOp
    from mendeliht_tpu.models.fit import build_fit
    from mendeliht_tpu.models.initialize import init_state
    from mendeliht_tpu.models import univariate as U
    from mendeliht_tpu.ops import pallas_kernels as pk

    which = "kernel,init,segment,finalize,fused"
    for i, a in enumerate(sys.argv):
        if a == "--programs":
            which = sys.argv[i + 1]
    which = set(which.split(","))

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    n4 = _ceil_to(-(-N // 4), _LANE)
    nw = n4 // 4
    y = np.zeros(N)
    geno_av = PackedGenotypes(
        words=jax.ShapeDtypeStruct((P, nw), jnp.int32),
        mu=jax.ShapeDtypeStruct((P,), jnp.float32),
        inv_sd=jax.ShapeDtypeStruct((P,), jnp.float32),
        n=N, p=P, has_missing=False, maf_=None, n_missing=None)
    op = PackedOp(geno_av)

    # build FitData/cfg at the right shapes without a real matrix: use a
    # fake dense op for sizes, then avatar the data
    import mendeliht_tpu as m
    op_real, data, cfg, k_scalar = build_fit(y, _FakeX(), None, k=K,
                                             d=m.Normal())
    data = avatar(data)
    ks = jax.ShapeDtypeStruct((1,), jnp.int32)
    cv = jax.ShapeDtypeStruct((1, op.n_pad), jnp.float32)

    if "kernel" in which:
        t_lower_compile(
            "pallas kernel (xtr m=1)",
            jax.jit(lambda w, r: pk.xt_dots_words(w, r, want_missing=False)),
            jax.ShapeDtypeStruct((P, nw), jnp.int32),
            jax.ShapeDtypeStruct((16 * nw, 1), jnp.float32))
    st_av = None
    if {"init", "segment", "finalize", "fused"} & which:
        ji = jax.jit(init_state, static_argnames=("cfg", "init_beta"))
        st_av = jax.eval_shape(
            lambda o, d, k, c: init_state(o, d, cfg, k, c), op, data, ks, cv)
        if "init" in which:
            t_lower_compile("init_state", ji, op, data, cfg, ks, cv)
    if "segment" in which:
        t_lower_compile("run_segment (solve loop)", U.run_segment,
                        op, data, cfg, st_av, 199)
    if "finalize" in which:
        t_lower_compile("finalize_sparse", U.finalize_sparse,
                        op, data, cfg, st_av)
    if "fused" in which:
        t_lower_compile("fit_fused_sparse (whole)", U.fit_fused_sparse,
                        op, data, cfg, ks, cv, init_beta=False)


class _FakeX:
    """Dense-op stand-in that only reports shapes to build_fit (the
    `hasattr(x, "xtr")` check in make_operator passes it through)."""
    xtr = True
    n, p = N, P
    from mendeliht_tpu.genotype.snparray import _ceil_to as _c, _LANE as _L
    n_pad = 4 * _c(-(-N // 4), _L)
    dtype = jnp.float32


if __name__ == "__main__":
    main()
