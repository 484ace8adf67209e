"""Worker process for the 2-process multi-host test.

Launched by tests/test_multihost.py with:
    python multihost_worker.py <coordinator> <num_procs> <proc_id> <out.npz>

Each process owns MCS_MH_DEVS (default 4) virtual CPU devices; the
global mesh spans num_procs x MCS_MH_DEVS.  Every process builds the
identical full population (deterministic seeds; lane keys derive from
GLOBAL lane indices) and contributes its local shards via
jax.make_array_from_callback.  The tally psum crosses the process
boundary — the DCN analogue.  Process 0 writes the finalized tallies
for the parent to compare against the single-process run (itself this
worker with num_procs=1, MCS_MH_DEVS=8: the hybrid stage needs the
MCS_MEGA_ROWS pin below, which only a fresh interpreter can apply).

Stage 1: the XLA sharded segment.  Stage 2: the megakernel hybrid
ladder (the DEFAULT multi-chip engine) — per-shard Pallas drive in
interpret mode, stacked accumulators globalized over the processes,
one cross-process reduction.
"""

import os
import sys

_DEVS = int(os.environ.get("MCS_MH_DEVS", "4"))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_DEVS}")
os.environ["JAX_PLATFORMS"] = "cpu"
# small megakernel blocks for the hybrid-ladder stage (must land
# before the process's first ops.pallas_step import)
os.environ["MCS_MEGA_ROWS"] = "8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def main(coordinator: str, num_procs: int, proc_id: int, out: str):
    from montecarloscattering_jl_tpu.parallel.multihost import (
        global_mesh, global_state, init_distributed)

    init_distributed(coordinator_address=coordinator,
                     num_processes=num_procs, process_id=proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.device_count() == _DEVS * num_procs, jax.device_count()

    import __graft_entry__ as ge
    from montecarloscattering_jl_tpu.ops import state as stt
    from montecarloscattering_jl_tpu.parallel.shard import (
        sharded_run_segment)

    mesh = global_mesh()
    assert mesh.size == _DEVS * num_procs

    batch = 256
    setup, state, tal, grids, sc, ss = ge._build(batch=batch)
    from montecarloscattering_jl_tpu.utils.params import MAX_HELIX_STEPS
    import jax.numpy as jnp
    state = state._replace(
        nsteps=jnp.full(batch, MAX_HELIX_STEPS - 64, jnp.int32))

    state_g = global_state(state, mesh)
    # uncommitted (numpy) inputs are assumed identical on every
    # process and are auto-placed by jit against the shard_map specs
    npify = lambda t: jax.tree.map(np.asarray, t)
    tal, grids, sc = npify(tal), npify(grids), npify(sc)
    seg = sharded_run_segment(mesh, ss)
    out_state, out_tal = seg(state_g, tal, grids, sc)
    jax.block_until_ready(out_tal)
    fin = stt.finalize_tallies(out_tal)

    # tallies are psum-replicated: every process can read them
    if proc_id == 0:
        np.savez(out,
                 pxx_flux=np.asarray(fin.pxx_flux),
                 energy_flux=np.asarray(fin.energy_flux),
                 psd=np.asarray(fin.psd),
                 num_crossings=np.asarray(fin.num_crossings))
    print(f"proc {proc_id} OK: {jax.process_count()} processes, "
          f"{jax.device_count()} devices, mesh {mesh.size}", flush=True)

    # ---- stage 2: the DEFAULT multi-chip engine (megakernel hybrid
    # ladder) across the process boundary -------------------------------
    hybrid_out = _run_hybrid_stage(mesh)
    if proc_id == 0:
        base = np.load(out)
        np.savez(out, **dict(base), **hybrid_out)
    print(f"proc {proc_id} hybrid OK", flush=True)


def _run_hybrid_stage(mesh):
    """One split-free hybrid-ladder segment over the global mesh
    (interpret-mode megakernel per shard, stacked per-shard
    accumulators globalized with parallel.multihost.globalize, one
    cross-process reduction per ion).  Returns replicated results as
    numpy."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from montecarloscattering_jl_tpu.ops import pallas_step as ps
    from montecarloscattering_jl_tpu.ops import state as stt
    from montecarloscattering_jl_tpu.ops.finish import EscapeTallies
    from montecarloscattering_jl_tpu.parallel.multihost import (
        global_state, globalize, replicated)
    from montecarloscattering_jl_tpu.parallel.shard import (
        DP_AXIS, _stacked_tally_spec, run_ion_mega_hybrid_sharded,
        sharded_hybrid_seg)
    from montecarloscattering_jl_tpu.utils.params import MAX_HELIX_STEPS

    assert ps._ROWS * ps.LANE == 1024, "MCS_MEGA_ROWS pin missed"
    batch = mesh.size * ps._ROWS * ps.LANE
    setup, state, tal, grids, sc, ss = ge._build(batch=batch,
                                                 p_dtype=jnp.float32)
    state = state._replace(
        nsteps=jnp.full(batch, MAX_HELIX_STEPS - 8, jnp.int32))
    esc = EscapeTallies.zeros(setup.bins.n_mom, setup.bins.n_theta)

    npify = lambda t: jax.tree.map(np.asarray, t)
    tal_h, esc_h = npify(tal), npify(esc)
    tal_st = stt.Tallies(**{
        k: (tal_h.rec if k == "rec"
            else np.zeros((mesh.size,) + getattr(tal_h, k).shape,
                          getattr(tal_h, k).dtype))
        for k in stt.Tallies._fields})
    esc_st = jax.tree.map(
        lambda x: np.zeros((mesh.size,) + x.shape, x.dtype), esc_h)
    tal_g = globalize(tal_st, _stacked_tally_spec(), mesh)
    esc_g = globalize(esc_st,
                      jax.tree.map(lambda _: P(DP_AXIS), esc_st), mesh)

    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        jax.random.key(5), jnp.arange(1, 2, dtype=jnp.uint32))
    keys_g = replicated(keys, mesh)

    seg = sharded_hybrid_seg(mesh, ss, tal_h.psd_diff.shape[0],
                             n_steps=16, interpret=True)
    out_state, out_tal, out_esc, n_new, nsteps, oob = (
        run_ion_mega_hybrid_sharded(
            seg, mesh, global_state(state, mesh), tal_g, esc_g,
            npify(grids), npify(sc), ss, np.asarray([1e10]),
            np.asarray([0.0]), np.asarray([batch]), keys_g))
    # force-replicate so every process can fetch
    rep = jax.jit(lambda t: t,
                  out_shardings=jax.tree.map(
                      lambda _: NamedSharding(mesh, P()), out_tal))
    fin = stt.finalize_tallies(rep(out_tal))
    return {
        "h_psd": np.asarray(fin.psd),
        "h_num_crossings": np.asarray(fin.num_crossings),
        "h_pxx_flux": np.asarray(fin.pxx_flux),
        "h_n_new": np.asarray(n_new),
        "h_nsteps": np.asarray(nsteps, np.uint64),
    }


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
