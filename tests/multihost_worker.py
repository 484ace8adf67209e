"""Worker process for the 2-process multi-host test.

Launched by tests/test_multihost.py with:
    python multihost_worker.py <coordinator> <num_procs> <proc_id> <out.npz>

Each process owns 4 virtual CPU devices; the global mesh spans 8.
Every process builds the identical full population (deterministic
seeds; lane keys derive from GLOBAL lane indices) and contributes its
local shards via jax.make_array_from_callback.  The tally psum crosses
the process boundary — the DCN analogue.  Process 0 writes the
finalized tallies for the parent to compare against the single-process
run.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"

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
    assert jax.device_count() == 4 * num_procs, jax.device_count()

    import __graft_entry__ as ge
    from montecarloscattering_jl_tpu.ops import state as stt
    from montecarloscattering_jl_tpu.parallel.shard import (
        sharded_run_segment)

    mesh = global_mesh()
    assert mesh.size == 4 * num_procs

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


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
