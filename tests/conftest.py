"""Test harness bootstrap.

Tests run on an 8-device virtual CPU mesh so multi-chip semantics are
exercised without TPU hardware (SURVEY.md section 4).  The container's
axon sitecustomize pins JAX_PLATFORMS=axon at interpreter start, so the
platform is overridden through jax.config before any backend
initializes.

Tiers (pyproject markers):
  * default        — fast CPU-mesh tests (CI gate)
  * slow           — heavy statistical / e2e CPU tests
                     (run with `-m slow` or no marker filter)
  * tpu            — real-chip tests; need MCS_TPU_TESTS=1, which
                     keeps the hardware backend instead of forcing the
                     virtual CPU mesh (run `MCS_TPU_TESTS=1 python -m
                     pytest tests -m tpu`)
"""

import os

import pytest

_TPU_TIER = os.environ.get("MCS_TPU_TESTS", "0") == "1"

if not _TPU_TIER:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser(
        os.environ.get("MCS_CACHE_DIR", "~/.cache/mcs_xla")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_enable_x64", True)


def pytest_collection_modifyitems(config, items):
    if _TPU_TIER:
        # chip runs execute ONLY the tpu tier
        skip = pytest.mark.skip(reason="MCS_TPU_TESTS=1 runs the tpu "
                                       "tier only")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(reason="needs a real TPU "
                                       "(MCS_TPU_TESTS=1)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


@pytest.fixture()
def low_cap(monkeypatch):
    """Cap the helix at 1024 steps for interpret-mode drain tests (the
    10k default makes a full chunked-vs-monolithic comparison take
    ~1 h of interpreted launches).  The cap is a trace-time constant,
    so every launch/segment cache and jit trace is cleared around the
    patch."""
    from montecarloscattering_jl_tpu.ops import pallas_step as ps
    from montecarloscattering_jl_tpu.ops import step as stp

    def clear():
        ps._LAUNCH_CACHE.clear()
        ps._HYBRID_CACHE.clear()
        ps._HYBRID_CHUNK_CACHE.clear()
        stp.run_segment_jit.clear_cache()
        stp.run_segment_hjit.clear_cache()

    monkeypatch.setattr(ps, "MAX_HELIX_STEPS", 1024)
    monkeypatch.setattr(stp, "MAX_HELIX_STEPS", 1024)
    clear()
    yield
    clear()
