"""Live-lane compaction ladder (ops/step.run_segment compact_levels).

Contract: per-lane trajectories are BITWISE identical to the
uncompacted drain (the counter RNG is keyed by lane key x nsteps, so a
lane's stream does not depend on where it sits in the batch), and the
shared tallies agree to summation-order rounding.  This also guards
the XLA:CPU fusion miscompile worked around with optimization_barrier
in the ladder (lane payloads and bookkeeping permuted inconsistently
without it).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from montecarloscattering_jl_tpu.ops import state as stt
from montecarloscattering_jl_tpu.ops import step as stp
from montecarloscattering_jl_tpu.utils.params import MAX_HELIX_STEPS

pytestmark = pytest.mark.slow

B = 2048
# seed the helix counters so CPU drains stay fast; the cap fires at
# MAX_HELIX_STEPS exactly as in production
STEP_BUDGET = 1200


def _build():
    setup, state, tal, grids, sc, ss = ge._build(batch=B)
    state = state._replace(
        nsteps=jnp.full(B, MAX_HELIX_STEPS - STEP_BUDGET, jnp.int32))
    return state, tal, grids, sc, ss


@pytest.fixture(scope="module")
def drains():
    state, tal, grids, sc, ss = _build()
    s0, t0 = stp.run_segment_jit(state, tal, grids, sc, ss, 0)
    out = {0: (s0, stt.finalize_tallies(t0))}
    for lv in (2, 3):
        state, tal, grids, sc, ss = _build()
        s, t = stp.run_segment_jit(state, tal, grids, sc, ss, lv)
        out[lv] = (s, stt.finalize_tallies(t))
    return out


class TestCompactionLadder:
    def test_lanes_bitwise_identical(self, drains):
        s0, _ = drains[0]
        for lv in (2, 3):
            s, _ = drains[lv]
            np.testing.assert_array_equal(np.asarray(s0.nsteps),
                                          np.asarray(s.nsteps))
            np.testing.assert_array_equal(np.asarray(s0.status),
                                          np.asarray(s.status))
            np.testing.assert_array_equal(np.asarray(s0.pb),
                                          np.asarray(s.pb))
            np.testing.assert_array_equal(np.asarray(s0.x),
                                          np.asarray(s.x))
            np.testing.assert_array_equal(np.asarray(s0.reason),
                                          np.asarray(s.reason))

    def test_tallies_match_to_rounding(self, drains):
        _, f0 = drains[0]
        for lv in (2, 3):
            _, f = drains[lv]
            pxx0 = np.asarray(f0.pxx_flux)
            en0 = np.asarray(f0.energy_flux)
            np.testing.assert_allclose(pxx0, np.asarray(f.pxx_flux),
                                       rtol=1e-12,
                                       atol=1e-15 * np.abs(pxx0).max())
            np.testing.assert_allclose(en0, np.asarray(f.energy_flux),
                                       rtol=1e-12,
                                       atol=1e-15 * np.abs(en0).max())
            np.testing.assert_array_equal(np.asarray(f0.num_crossings),
                                          np.asarray(f.num_crossings))
            psd0 = np.asarray(f0.psd)
            np.testing.assert_allclose(psd0, np.asarray(f.psd),
                                       rtol=2e-5,
                                       atol=1e-7 * np.abs(psd0).max())

    def test_small_batches_skip_the_ladder(self):
        """Windows below the 512-lane floor never form: levels on a
        tiny batch must be a no-op (same compiled path as levels=0)."""
        setup, state, tal, grids, sc, ss = ge._build(batch=256)
        state = state._replace(
            nsteps=jnp.full(256, MAX_HELIX_STEPS - 200, jnp.int32))
        s0, _ = stp.run_segment_jit(state, tal, grids, sc, ss, 4)
        assert np.all(np.asarray(s0.status) != stt.ACTIVE)


class TestBlockedFusedLadder:
    def test_blocked_matches_whole_batch_statistics(self):
        """run_ion_fused_blocked must conserve weight exactly per
        block layout and land on the same physics as the whole-batch
        ladder (different split multiplicities -> statistical, not
        bitwise, agreement)."""
        import os
        from montecarloscattering_jl_tpu.engine.run import TransportEngine
        from montecarloscattering_jl_tpu.engine.setup import build_setup
        from montecarloscattering_jl_tpu.utils import load_config

        def go(fused_max):
            cfg = load_config("tests/data/dsa_nonrel.toml")
            cfg.n_itrs = 1
            cfg.n_pts_inj = 48
            cfg.n_pts_pcut = 256
            cfg.n_pts_pcut_hi = 256
            cfg.pcuts = cfg.pcuts[:4]
            setup = build_setup(cfg)
            eng = TransportEngine(setup, compact_levels=0)
            os.environ["MCS_FUSED_MAX_BATCH"] = str(fused_max)
            try:
                it = eng.new_iteration_tallies()
                res = eng.run_ion(0, 0, setup.profile, it)
            finally:
                os.environ.pop("MCS_FUSED_MAX_BATCH")
            return res

        whole = go(1 << 20)
        blocked = go(128)     # forces >= 2 blocks at batch 320/384

        # same injected trajectories; clones differ by multiplicity
        assert blocked.n_trajectories > 0
        w_whole = whole.psd.sum()
        w_blocked = blocked.psd.sum()
        # PSD-integrated weight is tally-conserved; MC split noise only
        assert w_blocked == pytest.approx(w_whole, rel=0.2)
        # escape totals stay in the same MC ballpark (few escaping
        # lanes at this scale -> coarse Poisson noise)
        ratio = (float(blocked.esc.esc_flux)
                 / max(float(whole.esc.esc_flux), 1e-300))
        assert 0.3 < ratio < 3.0, ratio
