"""Test harness config: force JAX onto CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh (SURVEY.md SS5, "multi-
node without a cluster"); the real-TPU path is exercised by bench.py and
__graft_entry__.py, not by unit tests.

NOTE: run the full suite in 2-3 module slices (see git history /
PERF_NOTES), not one process: after ~150 tests XLA:CPU's in-process
LLVM compile can segfault on this 1-core host (observed twice; each
slice passes green in isolation). Not a test bug -- a long-process
compiler flake.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS via
# jax.config at interpreter start; re-override at the config level.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Tests must be independent of any device-measured tuned.json, including
# when the shell exports NTRACE_TUNED (the device-session machine does):
# force-disable, unconditionally. Tests that exercise the tuning plumbing
# re-set it per-test via monkeypatch.
os.environ["NTRACE_TUNED"] = "0"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from ntrace_tpu.scenes import make_random_soup  # noqa: E402


@pytest.fixture(scope="session")
def soup_small():
    return make_random_soup(n_tris=500, seed=7)


@pytest.fixture(scope="session")
def soup_medium():
    return make_random_soup(n_tris=5000, seed=11)


@pytest.fixture()
def rng():
    # Function-scoped: every test sees the same ray stream regardless of
    # which other tests ran (order-independent determinism).
    return np.random.default_rng(1234)


def random_rays(rng, n, extent=12.0, toward_origin=True):
    """Rays from a shell around the scene pointing inward-ish."""
    orig = rng.uniform(-extent, extent, size=(n, 3)).astype(np.float32)
    if toward_origin:
        target = rng.uniform(-extent / 3, extent / 3, size=(n, 3))
        d = target - orig
    else:
        d = rng.normal(size=(n, 3))
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    tmin = np.zeros((n,), dtype=np.float32)
    tmax = np.full((n,), 1e9, dtype=np.float32)
    return orig.astype(np.float32), d.astype(np.float32), tmin, tmax
