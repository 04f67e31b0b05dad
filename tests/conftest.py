import json
import os
import pathlib

import pytest

# Tests run on the CPU backend with a virtual 8-device mesh so the
# multi-chip sharding paths compile and execute without TPU hardware.
# (JAX_PLATFORMS is pinned to the TPU plugin in the environment, so use
# jax.config, which takes precedence.)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

ROOT = pathlib.Path(__file__).resolve().parent

# The suite compiles hundreds of distinct XLA programs; in one long
# process the CPU compiler has been observed to segfault (flaky, inside
# backend_compile_and_load, not a decoder defect). Dropping compiled
# programs between modules keeps the process-wide compiler state small
# so one flaky crash can't eat the tail of a full run. Recompiles cost
# a few seconds per module; correctness is unaffected.
_seen_modules: set = set()


@pytest.fixture(autouse=True)
def _clear_jax_caches_per_module(request):
    mod = request.module.__name__
    if mod not in _seen_modules:
        _seen_modules.add(mod)
        if len(_seen_modules) > 1:
            jax.clear_caches()
    yield
FIXTURES = ROOT / "fixtures"
GOLDEN = ROOT / "golden"


@pytest.fixture(scope="session")
def manifest():
    return json.loads((FIXTURES / "manifest.json").read_text())


def fixture_path(name: str) -> pathlib.Path:
    return FIXTURES / f"{name}.opus"


def golden_pcm(name: str):
    import numpy as np
    return np.fromfile(GOLDEN / f"{name}.pcm", dtype=np.int16).reshape(-1, 2)


def golden_ranges(name: str):
    return json.loads((GOLDEN / f"{name}.ranges.json").read_text())
