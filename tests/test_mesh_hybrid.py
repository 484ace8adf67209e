"""Megakernel hybrid ladder under the mesh
(parallel/shard.sharded_hybrid_seg + run_ion_mega_hybrid_sharded),
interpret mode on the virtual CPU mesh.

Cost control: lanes are seeded near the helix-step cap (the
dryrun_multichip trick) so every drain is one launch, and the ladder's
pcuts sit above pmax so the splits are the structural no-ops the
engine relies on after chain death.  What this pins:

* the stacked per-shard accumulators (stack/reduce_ion_accumulators)
  equal the single-device hybrid's tallies across a multi-segment
  ladder — per-lane trajectories BITWISE (global-lane-index RNG, same
  property as tests/test_mesh_mega.py), tallies to stochastic-rounding
  order;
* dead segments stay no-ops under the mesh (n_new == 0 tail);
* per-shard split targets spread the remainder exactly
  (TestShardSplitTargets) and fold the GLOBAL lane index into new
  keys (TestSplitLaneOffset) — the two mesh-only split behaviors.

The nontrivial-split statistics of the hybrid ladder itself are pinned
single-device in tests/test_fused_mega.py; the sharded wrapper adds
only the behaviors above.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ladder_pair():
    import __graft_entry__ as ge
    from montecarloscattering_jl_tpu.ops import pallas_step as ps
    from montecarloscattering_jl_tpu.ops import state as stt
    from montecarloscattering_jl_tpu.ops.finish import EscapeTallies
    from montecarloscattering_jl_tpu.parallel.shard import (
        make_mesh, run_ion_mega_hybrid_sharded, shard_state,
        sharded_hybrid_seg, stack_ion_accumulators)
    from montecarloscattering_jl_tpu.utils.params import MAX_HELIX_STEPS

    B = 2 * ps._ROWS * ps.LANE   # one megakernel block per shard
    setup, state, tal, grids, sc, ss = ge._build(batch=B,
                                                 p_dtype=jnp.float32)
    # short drains: every lane exits within ~24 steps (helix cap)
    state = state._replace(
        nsteps=jnp.full(B, MAX_HELIX_STEPS - 24, jnp.int32))
    n_cells = tal.psd_diff.shape[0]
    n_seg = 3
    # pcuts above pmax: nothing saves, segments 2-3 are dead no-ops
    ptop = float(np.asarray(state.ptot).max()) * 1e3
    pcuts = np.asarray([ptop, ptop * 3.0, ptop * 9.0])
    prevs = np.asarray([0.0, ptop, ptop * 3.0])
    targets = np.full(n_seg, B, np.int64)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        jax.random.key(7), jnp.arange(1, n_seg + 1, dtype=jnp.uint32))
    esc = EscapeTallies.zeros(setup.bins.n_mom, setup.bins.n_theta)

    s1, t1, e1, nnew1, nst1, oob1 = ps.run_ion_mega_hybrid(
        state, tal, esc, grids, sc, ss, pcuts, prevs, targets, keys,
        n_steps=64, interpret=True)
    f1 = stt.finalize_tallies(t1)
    assert float(np.asarray(oob1)[0]) == 0.0

    mesh = make_mesh(2)
    seg_fn = sharded_hybrid_seg(mesh, ss, n_cells, n_steps=64,
                                interpret=True)
    # the hybrid programs donate state/tallies/esc; rebuild for run 2
    # (ge._build is deterministic: same seed, same population)
    _, state, *_ = ge._build(batch=B, p_dtype=jnp.float32)
    state = state._replace(
        nsteps=jnp.full(B, MAX_HELIX_STEPS - 24, jnp.int32))
    esc2 = EscapeTallies.zeros(setup.bins.n_mom, setup.bins.n_theta)
    tal2 = stt.make_tallies(
        setup.nb, setup.bins.n_mom, setup.bins.n_theta, 0, 0,
        jnp.float32, batch=B, chunk=4, p_dtype=jnp.float32)
    tal_st, esc_st = stack_ion_accumulators(tal2, esc2, mesh.size)
    st_sh = shard_state(state, mesh)
    s2, t2, e2, nnew2, nst2, oob2 = run_ion_mega_hybrid_sharded(
        seg_fn, mesh, st_sh, tal_st, esc_st, grids, sc, ss,
        pcuts, prevs, targets, keys)
    f2 = stt.finalize_tallies(t2)
    assert float(np.asarray(oob2)[0]) == 0.0
    return (s1, f1, e1, nnew1, nst1), (s2, f2, e2, nnew2, nst2)


class TestMeshHybridLadder:
    def test_escape_psd_binwise(self, ladder_pair):
        """No split fires, so the mesh cannot change any trajectory:
        every lane's exit (p, theta, weight) lands in the same escape
        bin — per-bin equality to f64 summation-order rounding.  (The
        final lane payloads themselves are NOT compared: a dead no-op
        split replays lane 0 of its own scope into every invalid lane,
        so single-device and per-shard runs leave different garbage in
        zero-weight lanes.)"""
        (_, _, e1, _, _), (_, _, e2, _, _) = ladder_pair
        checked = 0
        for name in ("esc_psd_dw", "esc_psd_up", "esc_energy_eff",
                     "esc_num_eff"):
            a = np.asarray(getattr(e1, name), np.float64)
            b = np.asarray(getattr(e2, name), np.float64)
            np.testing.assert_allclose(b, a, rtol=1e-12, atol=0,
                                       err_msg=name)
            checked += int(a.sum() != 0)
        assert checked > 0   # at least one escape channel populated

    def test_push_totals_exact(self, ladder_pair):
        (*_, n1), (*_, n2) = ladder_pair
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))

    def test_dead_segments_noop(self, ladder_pair):
        (_, _, _, nn1, _), (_, _, _, nn2, _) = ladder_pair
        assert np.asarray(nn1).tolist() == [0, 0, 0]
        assert np.asarray(nn2).tolist() == [0, 0, 0]

    @pytest.mark.parametrize("field", ["therm_psd", "num_crossings",
                                       "pxx_flux"])
    def test_tallies(self, ladder_pair, field):
        """Stacked per-shard accumulation == single-device totals
        (stochastic-rounding order is the only difference)."""
        (_, f1, *_), (_, f2, *_) = ladder_pair
        a = float(np.asarray(getattr(f1, field), np.float64).sum())
        b = float(np.asarray(getattr(f2, field), np.float64).sum())
        assert a != 0
        assert abs(b / a - 1.0) < 2e-2, (field, a, b)

    def test_escape_tallies_close(self, ladder_pair):
        """finish_particles under the mesh bins the same escapes; f64
        sums differ only by reduction order."""
        (_, _, e1, _, _), (_, _, e2, _, _) = ladder_pair
        for name in ("esc_psd_dw", "esc_psd_up"):
            a = np.asarray(getattr(e1, name), np.float64).sum()
            b = np.asarray(getattr(e2, name), np.float64).sum()
            np.testing.assert_allclose(b, a, rtol=1e-9, err_msg=name)


class TestShardSplitTargets:
    def test_remainder_spread_exact(self):
        """Per-shard targets n//size + (d < n % size) preserve the
        global target for any (n, size)."""
        for size in (2, 3, 8):
            for n in (400, 401, 2000, 7, 0):
                parts = [n // size + (1 if d < n % size else 0)
                         for d in range(size)]
                assert sum(parts) == n
                assert max(parts) - min(parts) <= 1

    def test_split_multiplicity_per_shard(self):
        """split_on_device at a per-shard target replays each shard's
        own saved lanes; totals conserve weight exactly."""
        import __graft_entry__ as ge
        from montecarloscattering_jl_tpu.ops import state as stt
        from montecarloscattering_jl_tpu.ops.fused_ion import (
            split_on_device)

        B = 256
        _, state, *_ = ge._build(batch=B, p_dtype=jnp.float32)
        rng = np.random.default_rng(5)
        saved = rng.random(B) < 0.3
        state = state._replace(status=jnp.where(
            jnp.asarray(saved), stt.SAVED, stt.FINISHED).astype(
                jnp.int32))
        w_saved = float(np.asarray(state.weight)[saved].sum())
        key = jax.random.key(11)
        # two half-shards with remainder-spread targets (per-shard
        # target <= shard size, as the engine guarantees)
        n_target, size = 101, 2
        total_new, w_new = 0, 0.0
        for d in range(size):
            sl = slice(d * B // size, (d + 1) * B // size)
            st_d = jax.tree.map(lambda a: a[sl], state)
            nt = n_target // size + (1 if d < n_target % size else 0)
            out, n_new = split_on_device(st_d, jnp.int32(nt), key,
                                         lane_offset=d * (B // size))
            total_new += int(n_new)
            w_new += float(np.asarray(out.weight).sum())
        assert total_new > 0
        np.testing.assert_allclose(w_new, w_saved, rtol=1e-6)


def test_real_splits_statistical():
    """Mesh ladder vs single-device ladder with splits that actually
    FIRE, in a fresh subprocess where MCS_MEGA_ROWS=8 makes the
    natural-drain interpret ladder affordable (block=1024 lanes; the
    in-process block of 4096 puts the minimum 2-shard batch at 8192 —
    hours in interpret mode on one core).  See
    tests/mesh_hybrid_worker.py for the acceptance criteria."""
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "mesh_hybrid_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH",
                        "PALLAS_AXON_POOL_IPS", "MCS_MEGA_ROWS")}
    p = subprocess.run([sys.executable, worker], env=env,
                       stdout=subprocess.PIPE,
                       stderr=subprocess.STDOUT, timeout=3000)
    out = p.stdout.decode()
    assert p.returncode == 0, out
    assert "OK splits" in out, out


class TestSplitLaneOffset:
    def test_keys_disjoint_across_shards(self):
        """split_on_device(lane_offset) must give shard 1 different
        streams from shard 0 for the same local lane index."""
        import __graft_entry__ as ge
        from montecarloscattering_jl_tpu.ops import state as stt
        from montecarloscattering_jl_tpu.ops.fused_ion import (
            split_on_device)

        B = 256
        _, state, *_ = ge._build(batch=B, p_dtype=jnp.float32)
        # force every lane SAVED so the split replays them all
        state = state._replace(
            status=jnp.full(B, stt.SAVED, jnp.int32))
        key = jax.random.key(3)
        s0, _ = split_on_device(state, jnp.int32(B), key, lane_offset=0)
        s1, _ = split_on_device(state, jnp.int32(B), key, lane_offset=B)
        k0 = np.asarray(jax.random.key_data(s0.key))
        k1 = np.asarray(jax.random.key_data(s1.key))
        both = np.concatenate([k0, k1])
        assert len(np.unique(both, axis=0)) == 2 * B


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
