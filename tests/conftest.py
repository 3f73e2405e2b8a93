import os

# Force CPU with an 8-device virtual mesh for sharding tests. NOTE: jax is
# preloaded in this environment's python processes, so env vars alone are too
# late — use jax.config (the backend is still uninitialized at conftest time).
# Tests run on the 8-device virtual CPU mesh by default; set
# MENDELIHT_TEST_PLATFORM=tpu (or axon) to run the real-chip suites.
_platform = os.environ.get("MENDELIHT_TEST_PLATFORM") or "cpu"
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", _platform)
# persistent compile cache makes repeated test runs cheap
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


REFDATA = "/root/reference/data"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(2026)


@pytest.fixture(scope="session", autouse=True)
def _xla_backend():
    from mendeliht_tpu.ops.linalg import set_kernel_backend
    set_kernel_backend("xla")


@pytest.fixture(scope="session")
def normal_data():
    """Reference example data: n=1000, p=10k Gaussian with 8 causal SNPs +
    intercept + sex."""
    import mendeliht_tpu as m
    from mendeliht_tpu.utils.standardize import standardize
    snp = m.read_plink(f"{REFDATA}/normal")
    y = np.loadtxt(f"{REFDATA}/phenotypes.txt")
    z = np.loadtxt(f"{REFDATA}/covariates.txt", delimiter=",")
    z[:, 1:] = standardize(z[:, 1:])
    return snp, y, z


@pytest.fixture(scope="session")
def small_sim(rng):
    """Small simulated problem shared across tests (one compile shape)."""
    import mendeliht_tpu as m
    x, mafs = m.simulate_random_snparray(None, 300, 600, rng=rng)
    y, true_b, pos = m.simulate_random_response(x, 5, m.Normal(), rng=rng)
    return x, y, true_b, pos
