"""Fused pcut ladder with the megakernel segment
(ops/pallas_step.run_ion_fused_mega) vs the XLA fused ladder, in
interpret mode.

The megakernel uses its own threefry stream, so the comparison is
statistical (like tests/test_pallas_step.py): status mix and tally
totals within MC tolerance over a short ladder.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ladder_pair():
    import __graft_entry__ as ge
    from montecarloscattering_jl_tpu.ops import fused_ion as fi
    from montecarloscattering_jl_tpu.ops import pallas_step as ps
    from montecarloscattering_jl_tpu.ops import state as stt
    from montecarloscattering_jl_tpu.ops.finish import EscapeTallies

    B = 512
    setup, state, tal, grids, sc, ss = ge._build(batch=B,
                                                 p_dtype=jnp.float32)
    n_seg = 3
    pcut0 = float(sc.pcut)
    pcuts = jnp.asarray([pcut0, pcut0 * 3.0, pcut0 * 9.0], jnp.float32)
    prevs = jnp.asarray([0.0, pcut0, pcut0 * 3.0], jnp.float32)
    targets = jnp.full((n_seg,), B, jnp.int32)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        jax.random.key(7), jnp.arange(1, n_seg + 1, dtype=jnp.uint32))
    esc = EscapeTallies.zeros(setup.bins.n_mom, setup.bins.n_theta)

    s1, t1, e1, nnew1, nst1 = fi.run_ion_fused(
        state, tal, esc, grids, sc, ss, pcuts, prevs, targets, keys, 0)
    f1 = stt.finalize_tallies(t1)

    esc2 = EscapeTallies.zeros(setup.bins.n_mom, setup.bins.n_theta)
    s2, t2, e2, nnew2, nst2, oob = ps.run_ion_fused_mega(
        state, tal, esc2, grids, sc, ss, pcuts, prevs, targets, keys,
        n_steps=512, interpret=True)
    f2 = stt.finalize_tallies(t2)
    assert float(np.asarray(oob)[0]) == 0.0
    return (f1, nnew1, nst1), (f2, nnew2, nst2)


class TestFusedMegaLadder:
    def test_split_counts_same_order(self, ladder_pair):
        (_, n1, s1), (_, n2, s2) = ladder_pair
        n1, n2 = np.asarray(n1, np.float64), np.asarray(n2, np.float64)
        # splitting multiplicities depend on Poisson-ish saved counts
        assert (np.abs(n2 - n1) <= 6 * np.sqrt(n1 + 9)).all(), (n1, n2)

    def test_push_totals(self, ladder_pair):
        (_, _, s1), (_, _, s2) = ladder_pair
        a = float(np.asarray(s1, np.float64).sum())
        b = float(np.asarray(s2, np.float64).sum())
        assert abs(b / a - 1.0) < 0.2, (a, b)

    @pytest.mark.parametrize("field", ["therm_psd", "num_crossings"])
    def test_tallies(self, ladder_pair, field):
        (f1, _, _), (f2, _, _) = ladder_pair
        a = float(np.asarray(getattr(f1, field), np.float64).sum())
        b = float(np.asarray(getattr(f2, field), np.float64).sum())
        assert abs(b / a - 1.0) < 0.2, (field, a, b)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
