"""Megakernel under the mesh (parallel/shard.sharded_segment_mega),
interpret mode on the virtual CPU mesh.

Per-lane trajectories must be BITWISE identical to the unsharded
megakernel drive: the in-kernel threefry is keyed by per-lane key data
(derived from the global lane index before sharding) with the per-lane
step counter, so neither the shard boundary nor the in-drive
compaction sort can change a trajectory.  Tallies differ only at
stochastic-rounding order (the bf16 dither is keyed by shard-local
slot), so they are compared loosely.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pair():
    import __graft_entry__ as ge
    from montecarloscattering_jl_tpu.ops import pallas_step as ps
    from montecarloscattering_jl_tpu.ops import state as stt
    from montecarloscattering_jl_tpu.parallel.shard import (
        make_mesh, shard_state, sharded_segment_mega)

    B = 2 * ps._ROWS * ps.LANE   # one megakernel block per shard
    setup, state, tal, grids, sc, ss = ge._build(batch=B,
                                                 p_dtype=jnp.float32)
    n_cells = tal.psd_diff.shape[0]

    s1, t1 = ps.run_segment_mega(state, tal, grids, sc, ss,
                                 seed=1, interpret=True)
    f1 = stt.finalize_tallies(t1)

    mesh = make_mesh(2)
    seg = sharded_segment_mega(mesh, ss, n_cells, interpret=True)
    st_sh = shard_state(state, mesh)
    s2, t2, oob = seg(st_sh, tal, grids, sc, jnp.float32(1.0))
    assert float(np.asarray(oob)[0]) == 0.0
    f2 = stt.finalize_tallies(t2)
    return s1, f1, s2, f2


class TestMeshMega:
    def test_trajectories_bitwise(self, pair):
        s1, _, s2, _ = pair
        for name in ("pb", "pperp", "x", "status", "reason", "nsteps",
                     "weight", "acctime", "tcut"):
            a = np.asarray(getattr(s1, name))
            b = np.asarray(getattr(s2, name))
            np.testing.assert_array_equal(a, b, err_msg=name)

    def test_tallies_close(self, pair):
        _, f1, _, f2 = pair
        for name in ("therm_psd", "num_crossings", "pxx_flux"):
            a = float(np.asarray(getattr(f1, name), np.float64).sum())
            b = float(np.asarray(getattr(f2, name), np.float64).sum())
            assert a != 0
            assert abs(b / a - 1.0) < 2e-2, (name, a, b)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
