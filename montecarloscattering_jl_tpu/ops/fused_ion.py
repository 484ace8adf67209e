"""Fused ion pass: all pcut segments of one species in ONE device
program.

The host-level pcut loop (cuts.jl:34-124 splitting between segments)
costs a device->host->device round trip per pcut (45 in the baseline).
Here the splitting runs on-device — compaction by stable sort on the
SAVED flag, replication by integer-divided lane indices — and a
lax.scan walks the pcut ladder, so one jit call transports a species
through every splitting level.  A pcut level with nothing saved leaves
an all-dead population and the remaining scan steps fall through in
O(1) while-loop iterations each (the reference's pcut_finalize break,
cuts.jl:115-119, without a host sync).

Used for single-device segments; the mesh path keeps host splitting so
lane placement (and therefore bitwise results) stay independent of the
mesh shape (tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .finish import EscapeTallies, finish_particles
from .state import ACTIVE, FINISHED, SAVED, ParticleState, Tallies
from .step import SegmentGrids, SegmentScalars, StepStatic, run_segment


def split_on_device(state: ParticleState, n_target, seg_key,
                    lane_offset=0) -> tuple[ParticleState, jnp.ndarray]:
    """Build the next pcut population from SAVED lanes without leaving
    the device (new_pcut, cuts.jl:34-98; host twin: ops/cuts.py).

    Lane j of the new population replays saved lane ``j // i_mult``
    with weight / i_mult — the same interleaved layout np.repeat
    produces in the host splitter.  Returns (new state, n_new) where
    n_new = n_saved * i_mult; with nothing saved every lane comes out
    FINISHED with zero weight (and subsequent segments no-op).

    ``lane_offset`` shifts the per-lane RNG fold-in index: under a
    device mesh each shard splits its own lanes, and keys must be
    derived from the GLOBAL lane index (offset = shard * shard_b) so
    no two shards reuse a stream (parallel/shard.sharded_hybrid_seg).
    """
    b = state.weight.shape[0]
    saved = state.status == SAVED
    n_saved = jnp.sum(saved)
    # stable partition: saved lanes first, original order preserved
    order = jnp.argsort(~saved, stable=True)
    i_mult = jnp.maximum(n_target // jnp.maximum(n_saved, 1), 1)
    j = jnp.arange(b)
    src = order[jnp.minimum(j // i_mult, b - 1)]
    valid = j < n_saved * i_mult

    g = lambda a: a[src]
    p_dtype = state.pb.dtype
    lane_keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        seg_key,
        jnp.arange(b, dtype=jnp.uint32) + jnp.uint32(lane_offset))

    new = ParticleState(
        weight=jnp.where(valid, g(state.weight) / i_mult,
                         0.0).astype(p_dtype),
        pb=g(state.pb), pperp=g(state.pperp), phi=g(state.phi),
        x=g(state.x), igrid=g(state.igrid), ux_prev=g(state.ux_prev),
        downstream=g(state.downstream), inj=g(state.inj),
        xn_per=g(state.xn_per),
        prp_x=g(state.prp_x),
        acctime=g(state.acctime), tcut=g(state.tcut),
        status=jnp.where(valid, ACTIVE, FINISHED).astype(jnp.int32),
        reason=jnp.zeros(b, jnp.int32),
        retro=jnp.zeros(b, bool),
        just_returned=jnp.zeros(b, bool),
        key=lane_keys,
        nsteps=jnp.zeros(b, jnp.int32),
        t_step=jnp.zeros(b, p_dtype),
    )
    return new, (n_saved * i_mult).astype(jnp.int32)


def run_ion_fused(state: ParticleState, tallies: Tallies,
                  esc: EscapeTallies, grids: SegmentGrids,
                  sc: SegmentScalars, ss: StepStatic,
                  pcuts, pcut_prevs, n_targets, seg_keys,
                  compact_levels: int = 0):
    """Transport one species through the whole pcut ladder.

    pcuts / pcut_prevs / n_targets / seg_keys are per-pcut arrays
    scanned over; tallies and escape tallies accumulate across segments
    (finalize_tallies' zone cumsum is linear, so summing difference
    arrays before the cumsum equals summing finalized tallies).

    Returns (state, tallies, esc, n_new[n_pcuts], nsteps[n_pcuts]).
    """

    def body(carry, xs):
        st, tl, es = carry
        pcut, pcut_prev, n_target, key = xs
        sci = sc._replace(pcut=pcut, pcut_prev=pcut_prev)
        st, tl = run_segment(st, tl, grids, sci, ss, compact_levels)
        es = finish_particles(st, es, grids, sci, ss)
        # uint64: per-lane caps are 1e4 and batches reach 1e6+ lanes,
        # so a segment's push count can exceed the uint32 range
        nsteps = jnp.sum(st.nsteps.astype(jnp.uint64))
        st, n_new = split_on_device(st, n_target, key)
        return (st, tl, es), (n_new, nsteps)

    (state, tallies, esc), (n_new, nsteps) = lax.scan(
        body, (state, tallies, esc),
        (pcuts, pcut_prevs, n_targets, seg_keys))
    return state, tallies, esc, n_new, nsteps


run_ion_fused_jit = jax.jit(run_ion_fused,
                            static_argnames=("ss", "compact_levels"),
                            donate_argnums=(0, 1, 2))


_XLA_HYBRID_CACHE = {}


def _get_xla_seg(ss, compact_levels: int):
    """One pcut segment as ONE jitted device program
    [run_segment -> finish -> split] — the XLA twin of the megakernel
    hybrid ladder (ops/pallas_step._get_hybrid_seg)."""
    key = (ss, compact_levels)
    if key in _XLA_HYBRID_CACHE:
        return _XLA_HYBRID_CACHE[key]

    def seg(st, tl, es, grids, sc, n_target, key):
        st, tl = run_segment(st, tl, grids, sc, ss, compact_levels)
        es = finish_particles(st, es, grids, sc, ss)
        nsteps = jnp.sum(st.nsteps.astype(jnp.uint64))
        st, n_new = split_on_device(st, n_target, key)
        return st, tl, es, n_new, nsteps

    f = jax.jit(seg, donate_argnums=(0, 1, 2))
    _XLA_HYBRID_CACHE[key] = f
    return f


def _get_xla_fin(ss):
    """[finish -> split] tail as its own program, for the
    host-chunked drain path (the drain runs via
    step.run_segment_chunked outside this program)."""
    key = ("fin", ss)
    if key in _XLA_HYBRID_CACHE:
        return _XLA_HYBRID_CACHE[key]

    def fin(st, es, grids, sc, n_target, key):
        es = finish_particles(st, es, grids, sc, ss)
        nsteps = jnp.sum(st.nsteps.astype(jnp.uint64))
        st, n_new = split_on_device(st, n_target, key)
        return st, es, n_new, nsteps

    f = jax.jit(fin, donate_argnums=(0, 1))
    _XLA_HYBRID_CACHE[key] = f
    return f


def run_ion_xla_hybrid(state, tallies, esc, grids, sc, ss,
                       pcuts, pcut_prevs, n_targets, seg_keys,
                       compact_levels: int = 0):
    """The whole pcut ladder as a host loop of per-segment device
    programs (one ~25 ms dispatch per pcut — negligible next to
    segment drain time).

    This REPLACES the round-2 "blocked ladder" workaround for the
    >= 128k fused-scan runtime fault: a single-segment program at
    262k lanes is solid (bench drain), only the 45-segment lax.scan
    program faulted, so the fix is to not build that program.  Also
    removes the block-divided split-target truncation the blocked
    path had.  Segments are async-dispatched through the shared
    ops/pallas_step.drive_ladder_async (chain-death break checked
    every MCS_HYBRID_SYNC_EVERY segments, dead segments are no-ops)
    so this path pays the same ~1 dispatch/pcut as the megakernel
    hybrid instead of a [sync -> dispatch -> drain] serialization.
    Returns (state, tallies, esc, n_new, nsteps)."""
    import numpy as np

    from ..utils.params import MAX_HELIX_STEPS
    from .pallas_step import drive_ladder_async
    from .step import run_segment_chunked, xla_steps_per_prog

    # deep helix caps: host-chunked drains (no single device program
    # may run for minutes — TPU worker crash, STATUS round 7)
    chunked = 0 < xla_steps_per_prog() < MAX_HELIX_STEPS
    if chunked:
        fin_fn = _get_xla_fin(ss)
    else:
        seg_fn = _get_xla_seg(ss, compact_levels)
    n_seg = len(pcuts)
    pcuts_h = np.asarray(pcuts, np.float64)
    prevs_h = np.asarray(pcut_prevs, np.float64)
    targets_h = np.asarray(n_targets, np.int64)
    p_dtype = state.pb.dtype

    def dispatch(i):
        nonlocal state, tallies, esc
        sci = sc._replace(
            pcut=jnp.asarray(pcuts_h[i], p_dtype),
            pcut_prev=jnp.asarray(prevs_h[i], p_dtype))
        if chunked:
            state, tallies = run_segment_chunked(
                state, tallies, grids, sci, ss, compact_levels)
            state, esc, n_new, nsteps = fin_fn(
                state, esc, grids, sci,
                jnp.asarray(targets_h[i], jnp.int32), seg_keys[i])
        else:
            state, tallies, esc, n_new, nsteps = seg_fn(
                state, tallies, esc, grids, sci,
                jnp.asarray(targets_h[i], jnp.int32), seg_keys[i])
        return n_new, nsteps

    n_new_out, nsteps_out = drive_ladder_async(dispatch, n_seg)
    return (state, tallies, esc, jnp.asarray(n_new_out),
            jnp.asarray(nsteps_out))
