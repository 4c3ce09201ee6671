"""Test configuration: force an 8-device virtual CPU mesh before jax loads.

The reference has no tests at all (SURVEY.md §4); this suite is designed from
scratch. Multi-chip behavior is tested on a faked 8-device CPU topology, the
TPU analog of a fake backend.
"""

import os

# Must run before any backend initialization. The environment's
# sitecustomize programmatically sets jax_platforms="axon,cpu" (real TPU via
# a relay), so overriding the env var is not enough — update jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dpai_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synthetic_slide(tmp_path_factory, rng):
    """A small synthetic H&E-like pyramidal slide written with our writer.

    2048x1536 level-0, white background with two elliptical 'tissue' blobs,
    one of which contains a dark 'lesion' disc. Returns (path, meta dict).
    """
    from tests.fixtures import make_synthetic_slide

    path = tmp_path_factory.mktemp("slides") / "synthetic-slide.tiff"
    meta = make_synthetic_slide(str(path), width=2048, height=1536, seed=0)
    return str(path), meta
