"""Test harness: force an 8-device virtual CPU platform.

This is the TPU-native analogue of the reference's "single-GPU fake
distributed" mode (`/root/reference/lumina_next_t2i/demo.py:84-87`):
sharding/mesh tests run against 8 virtual CPU devices so multi-chip GSPMD
programs are validated without real hardware.

Note: the session may pre-import jax via sitecustomize with JAX_PLATFORMS
pinned to a TPU tunnel, so env vars are too late here — use jax.config
updates, which take effect any time before backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "concurrency_optimized_scheduler" not in _flags:
    # Sequential thunk order: stops virtual devices from reaching independent
    # collectives (FSDP all-gather vs DP all-reduce) in different orders,
    # which deadlocks XLA-CPU's in-process rendezvous on a 1-core host
    # (see __graft_entry__.dryrun_multichip).
    _flags = (_flags + " --xla_cpu_enable_concurrency_optimized_scheduler=false").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"


import pytest  # noqa: E402

# Modules whose tests take >~30s each on the 1-core 8-virtual-device CPU
# host (timings: VERDICT r1 + measured). Marked slow so the default run
# (`-m 'not slow'`, pyproject addopts) stays under the driver's budget;
# `make test-all` (or `pytest -m ''`) runs everything.
_SLOW_TEST_FILES = {
    "test_ops.py",
    "test_moe.py",
    "test_audio.py",
    "test_sharding.py",
    "test_sharding_hlo.py",
    "test_e2e.py",
    "test_apps2.py",
    "test_anagrams_compositional.py",
    "test_img2img.py",
    "test_demo_and_mini.py",
    "test_pipeline.py",
    "test_context_parallel.py",
    "test_torch_parity.py",
    "test_torch_parity_families.py",
    # r2 additions: integration-heavy (full train steps / whole-trajectory
    # determinism), each >30s on the 1-core host
    "test_determinism.py",
    "test_train_fused.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.path.name in _SLOW_TEST_FILES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True)
def _restore_model_registry():
    """Some app-level tests shrink registry entries in place; snapshot and
    restore so test order doesn't matter."""
    from lumina_t2x_tpu import models as m

    saved = dict(m.MODELS)
    yield
    m.MODELS.clear()
    m.MODELS.update(saved)
