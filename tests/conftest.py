"""Test configuration: force an 8-device virtual CPU mesh before jax import.

This is the JAX-native way to exercise multi-device GSPMD sharding without TPU
hardware (SURVEY.md §4): XLA's CPU backend is split into 8 virtual devices.
"""

import os
import sys

# NOTE: on this machine the axon TPU plugin ignores JAX_PLATFORMS; the legacy
# JAX_PLATFORM_NAME is honoured, plus jax.config as a belt-and-braces measure.
# Hard-SET (not setdefault): the session env carries JAX_PLATFORMS=axon, and
# subprocesses spawned by tests inherit os.environ — a leaked 'axon' request
# crashes any child whose axon plugin isn't registered (e.g. under the
# tunnel-outage env that unsets PALLAS_AXON_POOL_IPS, STATUS.md).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
# Scrub the axon PJRT registration entirely: plugin *init* goes through the
# TPU tunnel even when the platform is forced to cpu, and hangs for every
# python process while another client holds a large remote compile
# (STATUS.md environment gotchas).  Tests are CPU-only by design, so dropping
# the registration makes the suite immune to tunnel contention/outages.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Path to the read-only PyTorch reference implementation; parity tests are
# skipped when it (or torch) is unavailable.
REFERENCE_PATH = os.environ.get("MUSE_REFERENCE_PATH", "/root/reference")


def has_reference():
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return os.path.isdir(os.path.join(REFERENCE_PATH, "muse"))


def import_reference_muse():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import muse  # noqa: F401

    return muse


# -- test tiering -------------------------------------------------------------
# fast  : <2-minute core gate (config/schema/sampling/masking/losses/
#         launcher-dry-run/data utils) -> `pytest -m fast`
# (none): default tier incl. torch parity + multidevice GSPMD
# slow  : long-haul learning/regression tests -> nightly
FAST_MODULES = {
    "test_configs", "test_sampling", "test_losses", "test_tpu_scripts",
    "test_utils_and_data",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.module.__name__ in FAST_MODULES \
                and "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
