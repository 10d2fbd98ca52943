"""Test bootstrap: force the CPU backend with 8 virtual devices.

Unit tests must not touch the (single, slow-to-compile) axon TPU chip, and
distributed tests need a multi-device mesh; XLA's host-platform device-count
flag gives us an 8-device CPU mesh in one process (SURVEY.md §4.3).

Note: the container's sitecustomize pre-imports jax for the axon PJRT
plugin, so env-var-only selection is unreliable — we set XLA_FLAGS (read at
first backend init, which has not happened yet) and switch the platform via
jax.config, which is honored post-import.
"""

import os
import sys

_FLAG = "--xla_force_host_platform_device_count=8"
if _FLAG not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _FLAG).strip()
# Keep test subprocesses off the axon TPU entirely: the relay admits one
# client at a time, so a "CPU" test that still registers the axon plugin
# blocks any real TPU job on the box.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compile cache across test runs (and across the two
# xdist workers) — same cache the CLIs/Registrar use. Measured effect
# on the suite is modest (the heavy tests are execution-bound on CPU,
# not compile-bound: warm fcgf rerun 96 s vs cold 93 s), but it is
# free and removes first-compile noise from timing-sensitive tests.
# Disable with MVREG_COMPILE_CACHE=0.
from mvreg.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", (
        "tests must run on the CPU backend; got " + jax.default_backend()
    )
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    yield
