import os

# Tests run on a virtual 8-device CPU mesh; the real TPU is exercised by
# bench.py / __graft_entry__.py instead (driver-run). NB the axon TPU
# plugin force-overrides JAX_PLATFORMS at import, so the env var alone is
# not enough — set the config explicitly after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

EXAMPLES = "/root/reference/examples"


@pytest.fixture(scope="session")
def examples_dir():
    return EXAMPLES
