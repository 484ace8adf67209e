"""Multi-chip data parallelism over the particle batch.

The reference is serial with vestigial OpenMP comments
(main_loops.jl:227, all_flux.jl:154); SURVEY.md sections 2/5.8 define
the TPU-native equivalent: shard the particle batch over a 1-D device
mesh ('dp' axis), run each shard's helix while_loop independently (no
collectives in the hot loop — lanes are independent between tallies),
and psum the tally pytree once per segment over ICI.  TP/PP/SP/EP have
no counterpart in this workload (recorded N/A by design).

Determinism: lane RNG keys are derived from the GLOBAL lane index
before sharding, so results are bitwise independent of the mesh shape.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import state as stt
from ..ops import step as stp

DP_AXIS = "dp"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the available devices.

    With ``n_devices`` set, fewer available devices is an error — a
    silently truncated mesh would "validate" multi-chip semantics on a
    smaller (or single-device) mesh while claiming the requested size.
    """
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} device(s) are visible "
                f"({jax.default_backend()} backend); force a virtual "
                f"CPU mesh with JAX_PLATFORMS=cpu and "
                f"--xla_force_host_platform_device_count={n_devices}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DP_AXIS,))


def _state_spec() -> stt.ParticleState:
    """PartitionSpec pytree: every per-lane array sharded on axis 0."""
    return jax.tree.map(lambda _: P(DP_AXIS), stt.ParticleState(
        *([0] * len(stt.ParticleState._fields))))


def sharded_run_segment(mesh: Mesh, ss: stp.StepStatic,
                        compact_levels: int = 0):
    """Build the jitted sharded segment runner for a static config.

    Returns f(state, tallies, grids, sc) -> (state, tallies) with the
    state sharded over lanes and tallies psum-reduced (replicated).
    compact_levels applies the live-lane compaction ladder per shard
    (each shard drains its own lanes; no collectives in the ladder).
    """
    state_spec = _state_spec()
    # tally record buffers carry a lane axis and shard with the batch;
    # everything else is replicated (and psum-reduced on the way out)
    tally_spec = stt.Tallies(*[P() for _ in stt.Tallies._fields])._replace(
        rec=P(None, None, DP_AXIS))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(state_spec, tally_spec, P(), P()),
             out_specs=(state_spec, tally_spec),
             check_vma=False)
    def seg(state, tallies, grids, sc):
        s, t = stp.run_segment(state, tallies, grids, sc, ss,
                               compact_levels)
        # one ICI reduction per segment: the analogue of the
        # reference's "omp critical" tally sections
        t = jax.tree.map(lambda x: jax.lax.psum(x, DP_AXIS), t)
        return s, t

    return jax.jit(seg, donate_argnums=(0, 1))


def sharded_segment_mega(mesh: Mesh, ss: stp.StepStatic,
                         n_tallies_cells: int, n_steps: int = 0,
                         interpret: bool = False):
    """Megakernel segment under the mesh: each shard drains its own
    lane block with the Pallas drive (ops/pallas_step), tallies
    psum-reduced over ICI once per segment.

    Per-lane trajectories are bitwise independent of the mesh shape
    (the in-kernel threefry is keyed by per-lane key data derived from
    the GLOBAL lane index, counter = per-lane step count); only tally
    summation order differs.  Shard size must be a multiple of the
    megakernel block (ROWS*128 lanes).

    Returns f(state, tallies, grids, sc, seed) ->
    (state, tallies, oob)."""
    import os

    from ..ops import pallas_step as ps

    state_spec = _state_spec()
    tally_spec = stt.Tallies(*[P() for _ in stt.Tallies._fields])._replace(
        rec=P(None, None, DP_AXIS))
    band = min(int(os.environ.get("MCS_MEGA_BAND", 2048)),
               -(-n_tallies_cells // 128) * 128)
    n_cells_pad = -(-max(n_tallies_cells, band) // 128) * 128
    n_steps = n_steps or ps._STEPS

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(state_spec, tally_spec, P(), P(), P()),
             out_specs=(state_spec, tally_spec, P()),
             check_vma=False)
    def seg(state, tallies, grids, sc, seed_f):
        xg, zs, et, tail = ps._mega_prep(
            jnp.asarray(grids.x_grid), jnp.asarray(grids.ux),
            jnp.asarray(grids.gamma_sf), jnp.asarray(grids.gamma_ef),
            jnp.asarray(grids.btot), jnp.asarray(grids.eps_target),
            jnp.asarray(grids.recv_prefix), nb=int(ss.nb))
        tcv = jnp.asarray(grids.tcuts).astype(jnp.float32)
        s, t, oob = ps.mega_segment_traced(
            state, tallies, jnp.asarray(grids.x_grid), xg, zs, et,
            tail, tcv, seed_f, sc, ss, band, n_cells_pad, n_steps,
            interpret=interpret)
        t = jax.tree.map(lambda x: jax.lax.psum(x, DP_AXIS), t)
        return s, t, jax.lax.psum(oob, DP_AXIS)

    return jax.jit(seg, donate_argnums=(0, 1))


def shard_state(state: stt.ParticleState, mesh: Mesh) -> stt.ParticleState:
    """Place a host-built state onto the mesh, lanes sharded."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, _state_spec())


def pad_to_devices(n: int, n_devices: int, multiple: int = 128) -> int:
    """Batch size divisible by both the lane multiple and the mesh."""
    m = multiple * n_devices
    return ((n + m - 1) // m) * m
