"""Test configuration: force an 8-device virtual CPU mesh.

Tests run everywhere (CI, dev boxes) without TPU hardware; multi-chip sharding
tests use the virtual devices. Set HERDSMAN_TPU_TESTS=1 to run the suite on
real accelerators instead.
"""

import os

if not os.environ.get("HERDSMAN_TPU_TESTS"):
    # force-set: the dev shell may export JAX_PLATFORMS=axon (the TPU tunnel)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import pathlib  # noqa: E402
import subprocess  # noqa: E402

_ROOT = pathlib.Path(__file__).resolve().parent.parent
if not (_ROOT / "native" / "build" / "libherdsman_native.so").exists():
    # build artifacts are gitignored; build the native row codec on demand
    try:
        subprocess.run(
            ["cmake", "-S", str(_ROOT / "native"), "-B",
             str(_ROOT / "native" / "build"), "-G", "Ninja"],
            check=True, capture_output=True,
        )
        subprocess.run(
            ["cmake", "--build", str(_ROOT / "native" / "build")],
            check=True, capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        pass  # rowcodec falls back to Python; its test will flag this

import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not os.environ.get("HERDSMAN_TPU_TESTS"):
    # the axon TPU-tunnel plugin ignores the JAX_PLATFORMS env var; the
    # config flag is authoritative (must run before backend init)
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

from herdsman_tpu.core import TOY, TEST_SMALL  # noqa: E402
from herdsman_tpu.core import reference as ref  # noqa: E402


@pytest.fixture(scope="session")
def toy_keys():
    rng = np.random.default_rng(42)
    ck, sk = ref.keygen(TOY, rng)
    return ck, sk, rng


@pytest.fixture(scope="session")
def small_keys():
    rng = np.random.default_rng(1234)
    ck, sk = ref.keygen(TEST_SMALL, rng)
    return ck, sk, rng


@pytest.fixture(scope="session")
def pbs_keys():
    """Keys for PBS-heavy suites (shortint/radix): TEST_PBS's n=64 keeps the
    mod-switch noise ~5 sigma inside a 4-bit working-space slot."""
    from herdsman_tpu.core import TEST_PBS

    rng = np.random.default_rng(4321)
    ck, sk = ref.keygen(TEST_PBS, rng)
    return ck, sk, rng
