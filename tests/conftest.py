import os

# Run tests on a virtual 8-device CPU mesh: deterministic, fast, and it
# exercises the same sharding code paths the TPU uses.  NOTE: in this
# environment the axon TPU plugin ignores the JAX_PLATFORMS env var, so we
# must also force the platform via jax.config before any backend is used.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir():
    if not REFERENCE.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE


@pytest.fixture(scope="session")
def attention_result_dir(reference_dir):
    d = reference_dir / "egs" / "attention_aug" / "result"
    if not d.exists():
        pytest.skip("attention_aug result artifacts missing")
    return d
