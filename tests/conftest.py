import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware; the real-chip path is covered by bench.py.
# NOTE: this environment's sitecustomize imports jax and registers the
# axon TPU backend at interpreter start, so env vars alone are too late —
# we must flip the already-imported config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"
# real bugs must not hide behind the executor's launch-failure fallback
os.environ["PAGAN2_STRICT"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "e2e: CPU-scaled end-to-end bench secondaries (pileup, family, "
        "megabase) run as tests so kernel-key changes cannot land "
        "without driving the bench paths")
