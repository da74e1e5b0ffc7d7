"""Test harness: force CPU with 8 virtual devices so the full suite (including
multi-chip sharding tests) runs without TPU hardware; Pallas kernels run in
interpreter mode automatically (see `rasterize_tpu.splat_packed`).

Note: a pytest plugin imports jax before this conftest runs, so env vars are
too late — but backends initialize lazily, so `jax.config` still works here.
"""

import os

# SAV_TEST_TPU=1 runs the selected tests on the real TPU backend instead
# (kernel tests then exercise the actual Mosaic compiler rather than the
# Pallas interpreter — how the 2026-08-20 toolchain regression was
# localized); multi-device tests will skip on the single chip.
_USE_TPU = os.environ.get("SAV_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# Compile time dominates the suite (every fit/step test jits a full
# train-step graph); the persistent cache makes repeat runs — the common
# "full suite before committing" case — skip unchanged compiles. Keyed on
# the jaxpr, so any code change recompiles exactly what it touched.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running e2e/integration tests (full fits, multi-device "
        "steps); `pytest -m 'not slow'` is the fast development loop",
    )
    # third-party noise: imageio's vendored-tifffile deprecation fires when
    # the DAVIS pipeline test touches imageio; not actionable in this repo
    # (no pip installs available) and keeps the suite at zero repo warnings
    config.addinivalue_line(
        "filterwarnings",
        "ignore:ImageIO's vendored tifffile backend is deprecated"
        ":DeprecationWarning",
    )
