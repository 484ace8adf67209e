"""Worker for tests/test_mesh_hybrid.py::test_real_splits_statistical.

Runs in a FRESH process so MCS_MEGA_ROWS=8 (set below, before any
import of ops.pallas_step) shrinks the megakernel block to 1024 lanes
— a natural-drain interpret ladder with REAL splits at 4096 lanes is
then affordable, which the in-process suite (block 4096, min 8192
lanes for 2 shards) is not.

Compares the single-device megakernel hybrid ladder against the
2-shard mesh ladder on the same population with splits that actually
fire: per-shard splitting makes lane placement differ, so acceptance
is statistical (the same tolerances as tests/test_fused_mega.py) plus
the exact segment-0 push count (trajectories are bitwise mesh-
independent until the first split).
"""

import os
import sys

os.environ["MCS_MEGA_ROWS"] = "8"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    import __graft_entry__ as ge
    from montecarloscattering_jl_tpu.ops import pallas_step as ps
    from montecarloscattering_jl_tpu.ops import state as stt
    from montecarloscattering_jl_tpu.ops.finish import EscapeTallies
    from montecarloscattering_jl_tpu.parallel.shard import (
        make_mesh, run_ion_mega_hybrid_sharded, shard_state,
        sharded_hybrid_seg, stack_ion_accumulators)

    assert ps._ROWS == 8, ps._ROWS
    B = 4 * ps._ROWS * ps.LANE   # 4096 lanes, 2 blocks per shard
    setup, state, tal, grids, sc, ss = ge._build(batch=B,
                                                 p_dtype=jnp.float32)
    n_cells = tal.psd_diff.shape[0]
    n_seg = 3
    pcut0 = float(sc.pcut)
    pcuts = np.asarray([pcut0, pcut0 * 3.0, pcut0 * 9.0])
    prevs = np.asarray([0.0, pcut0, pcut0 * 3.0])
    targets = np.full(n_seg, B, np.int64)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        jax.random.key(7), jnp.arange(1, n_seg + 1, dtype=jnp.uint32))

    esc = EscapeTallies.zeros(setup.bins.n_mom, setup.bins.n_theta)
    s1, t1, e1, nnew1, nst1, oob1 = ps.run_ion_mega_hybrid(
        state, tal, esc, grids, sc, ss, pcuts, prevs, targets, keys,
        n_steps=256, interpret=True)
    f1 = stt.finalize_tallies(t1)
    assert float(np.asarray(oob1)[0]) == 0.0

    mesh = make_mesh(2)
    seg_fn = sharded_hybrid_seg(mesh, ss, n_cells, n_steps=256,
                                interpret=True)
    _, state, tal, *_ = ge._build(batch=B, p_dtype=jnp.float32)
    esc2 = EscapeTallies.zeros(setup.bins.n_mom, setup.bins.n_theta)
    tal_st, esc_st = stack_ion_accumulators(tal, esc2, mesh.size)
    s2, t2, e2, nnew2, nst2, oob2 = run_ion_mega_hybrid_sharded(
        seg_fn, mesh, shard_state(state, mesh), tal_st, esc_st,
        grids, sc, ss, pcuts, prevs, targets, keys)
    f2 = stt.finalize_tallies(t2)
    assert float(np.asarray(oob2)[0]) == 0.0

    n1 = np.asarray(nnew1, np.float64)
    n2 = np.asarray(nnew2, np.float64)
    s1v = np.asarray(nst1, np.float64)
    s2v = np.asarray(nst2, np.float64)

    # splits must actually fire, else this validates nothing
    assert n1[0] > 0 and n2[0] > 0, (n1, n2)
    # bitwise until the first split: segment-0 pushes exact
    assert int(s1v[0]) == int(s2v[0]), (s1v, s2v)
    # per-shard multiplicities quantize differently; Poisson-ish
    assert (np.abs(n2 - n1) <= 6 * np.sqrt(n1 + 9)).all(), (n1, n2)
    assert abs(s2v.sum() / s1v.sum() - 1.0) < 0.2, (s1v, s2v)
    for name in ("therm_psd", "num_crossings", "pxx_flux"):
        a = float(np.asarray(getattr(f1, name), np.float64).sum())
        b = float(np.asarray(getattr(f2, name), np.float64).sum())
        assert a != 0, name
        assert abs(b / a - 1.0) < 0.2, (name, a, b)
    a = float(np.asarray(e1.esc_psd_dw, np.float64).sum()
              + np.asarray(e1.esc_psd_up, np.float64).sum())
    b = float(np.asarray(e2.esc_psd_dw, np.float64).sum()
              + np.asarray(e2.esc_psd_up, np.float64).sum())
    assert a > 0 and abs(b / a - 1.0) < 0.2, (a, b)
    print(f"OK splits n1={n1.tolist()} n2={n2.tolist()} "
          f"pushes {s1v.sum():.0f} vs {s2v.sum():.0f}")
    os._exit(0)


if __name__ == "__main__":
    main()
