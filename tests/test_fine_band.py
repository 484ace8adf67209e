"""Two-level tally band (per-chunk fine anchors) == block-level band.

The fine path only changes WHICH one-hot rows are materialized and the
order psd_out accumulates in — lane trajectories never touch the tally
path, so the final state must be BITWISE identical, flux rows (built
independently of the contraction) bitwise, and the PSD equal to f32
re-association tolerance.  A fine-path step can also RESCUE records
the block band would have dropped (chunks anchored far apart), so the
fine run's oob count is <= the coarse run's.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def _run(built, fine):
    from montecarloscattering_jl_tpu.ops import pallas_step as ps
    from montecarloscattering_jl_tpu.ops import state as stt

    setup, state, tal, grids, sc, ss = built
    state = jax.tree.map(
        lambda a: a if not hasattr(a, "dtype") else a, state)
    old = os.environ.get("MCS_MEGA_FINE_BAND")
    os.environ["MCS_MEGA_FINE_BAND"] = fine
    try:
        st, tl = ps.run_segment_mega(
            jax.tree.map(lambda a: a, state), tal, grids, sc, ss,
            interpret=True)
    finally:
        if old is None:
            os.environ.pop("MCS_MEGA_FINE_BAND", None)
        else:
            os.environ["MCS_MEGA_FINE_BAND"] = old
    return st, stt.finalize_tallies(tl)


@pytest.fixture(scope="module")
def built():
    import __graft_entry__ as ge
    return ge._build(batch=256, p_dtype=jnp.float32)


class TestFineBand:
    def test_fine_vs_coarse(self, built, low_cap):
        s0, f0 = _run(built, "0")      # block-level band only
        s1, f1 = _run(built, "512")    # two-level encoding
        # trajectories are bitwise untouched by the tally encoding
        for name in s0._fields:
            a, b = getattr(s0, name), getattr(s1, name)
            if name == "key":
                a = jax.random.key_data(a)
                b = jax.random.key_data(b)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)
        # flux channels accumulate outside the band contraction
        np.testing.assert_array_equal(np.asarray(f0.pxx_flux),
                                      np.asarray(f1.pxx_flux))
        np.testing.assert_array_equal(np.asarray(f0.energy_flux),
                                      np.asarray(f1.energy_flux))
        # PSD: same records, different f32 accumulation association
        a = np.asarray(f0.psd, np.float64)
        b = np.asarray(f1.psd, np.float64)
        np.testing.assert_allclose(a.sum(), b.sum(), rtol=1e-4)
        denom = np.abs(a) + np.abs(b) + 1e-6 * max(np.abs(a).max(), 1.0)
        assert (np.abs(a - b) / denom).max() < 1e-2
