"""Test config: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# The environment's sitecustomize pre-imports jax and pins the platform to
# the axon TPU tunnel; jax.config wins over the env var at backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Hard-disable the persistent compilation cache for the whole session:
# XLA:CPU AOT executables are machine-feature fragile (this VM migrates
# between hosts) and both observed suite segfaults were inside the
# persistent-cache compile path (utils/cache.py has the same gate for
# production CPU runs).
jax.config.update("jax_enable_compilation_cache", False)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_cache_growth():
    """Free compiled executables after each test module: one process
    compiles ~350 programs across the suite; unbounded accumulation has
    ended in an XLA:CPU segfault near the end of the run."""
    yield
    jax.clear_caches()

REFERENCE = Path("/root/reference")


def reference_path(rel: str) -> Path:
    p = REFERENCE / rel
    if not p.exists():
        pytest.skip(f"reference fixture {rel} not available")
    return p


@pytest.fixture(scope="session")
def ref_models():
    return reference_path("models")


@pytest.fixture(scope="session")
def jfk_wav():
    return reference_path("samples/jfk.wav")
