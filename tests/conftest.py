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

# Oracle intermediates from the reference binary: a freshly generated run
# in .tmp/oracle takes precedence (full DBs); the committed fixture set
# (tests/fixtures/oracle, trimmed to what the parity tests read) makes
# the parity suite run by default on a clean checkout.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_FIXTURE_ORACLE = os.path.join(_REPO, "tests", "fixtures", "oracle")
_TMP_ORACLE = os.path.join(_REPO, ".tmp", "oracle")


def oracle_root() -> str:
    # a freshly generated reference run overrides the trimmed committed
    # fixtures (ADVICE r2) — but only when it is COMPLETE, so a partial
    # scratch run cannot shadow fixture resources it lacks
    need = ("profiles.index", os.path.join("nucl", "nuclres.index"),
            os.path.join("orfs", "uvig_orfs.index"),
            os.path.join("uvig", "genome.index"))
    if all(os.path.exists(os.path.join(_TMP_ORACLE, n)) for n in need):
        return _TMP_ORACLE
    return _FIXTURE_ORACLE


@pytest.fixture(scope="session")
def examples_dir():
    return EXAMPLES
