"""Host-chunked drains == monolithic drains.

Deep helix caps cannot run as one device program (a program executing
for many minutes kills the TPU worker — STATUS round 7), so the drives
re-dispatch bounded programs until the population drains
(ops/pallas_step._get_launch chunking, ops/step.run_segment_chunked).
These tests pin the chunked paths to their monolithic twins:

* megakernel standalone + hybrid ladder: BITWISE (same launch
  sequence, same partition schedule, same accumulation order — the
  carry crosses the host boundary intact);
* XLA run_segment: state bitwise (counter RNG is per-lane step
  count), tallies to float tolerance (the record buffer flushes its
  partial chunk at each program exit).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def _state_tuple(st):
    return [np.asarray(x) for x in jax.tree.leaves(
        jax.tree.map(lambda a: a, st._replace(
            key=jax.random.key_data(st.key))))]


def _copy(tree):
    """Deep-copy a pytree so donation in one run cannot invalidate
    the shared fixture for the next."""
    def cp(a):
        if hasattr(a, "dtype") and jax.dtypes.issubdtype(
                a.dtype, jax.dtypes.prng_key):
            return jax.random.wrap_key_data(
                jnp.copy(jax.random.key_data(a)), impl="threefry2x32")
        return jnp.copy(a)
    return jax.tree.map(cp, tree)


@pytest.fixture(scope="module")
def built():
    import __graft_entry__ as ge
    return ge._build(batch=256, p_dtype=jnp.float32)


def _run_mega(built, monkeypatch_env):
    import os

    from montecarloscattering_jl_tpu.ops import pallas_step as ps
    from montecarloscattering_jl_tpu.ops import state as stt

    setup, state, tal, grids, sc, ss = built
    state, tal = _copy(state), _copy(tal)
    old = {}
    for k, v in monkeypatch_env.items():
        old[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        st, tl = ps.run_segment_mega(state, tal, grids, sc, ss,
                                     interpret=True)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return st, stt.finalize_tallies(tl)


class TestMegaChunked:
    def test_standalone_bitwise(self, built, low_cap):
        # 1024-step cap -> 6-launch bound; chunk of 2 forces ~3 host
        # re-dispatches, the monolithic control stays one program
        s1, f1 = _run_mega(built, {"MCS_MEGA_LAUNCHES_PER_PROG": "999"})
        s2, f2 = _run_mega(built, {"MCS_MEGA_LAUNCHES_PER_PROG": "2"})
        for a, b in zip(_state_tuple(s1), _state_tuple(s2)):
            np.testing.assert_array_equal(a, b)
        for name in f1._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(f1, name)),
                np.asarray(getattr(f2, name)), err_msg=name)


class TestHybridLadderChunked:
    def _ladder(self, built, chunk):
        import os

        from montecarloscattering_jl_tpu.ops import pallas_step as ps
        from montecarloscattering_jl_tpu.ops import state as stt
        from montecarloscattering_jl_tpu.ops.finish import EscapeTallies

        setup, state, tal, grids, sc, ss = built
        state, tal = _copy(state), _copy(tal)
        pcut0 = float(sc.pcut)
        pcuts = np.asarray([pcut0, pcut0 * 3.0, pcut0 * 9.0])
        prevs = np.asarray([0.0, pcut0, pcut0 * 3.0])
        targets = np.full(3, 256, np.int64)
        keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
            jax.random.key(7), jnp.arange(1, 4, dtype=jnp.uint32))
        esc = EscapeTallies.zeros(setup.bins.n_mom, setup.bins.n_theta)
        old = os.environ.get("MCS_MEGA_LAUNCHES_PER_PROG")
        os.environ["MCS_MEGA_LAUNCHES_PER_PROG"] = chunk
        try:
            out = ps.run_ion_mega_hybrid(
                state, tal, esc, grids, sc, ss, pcuts, prevs, targets,
                keys, interpret=True)
        finally:
            if old is None:
                os.environ.pop("MCS_MEGA_LAUNCHES_PER_PROG", None)
            else:
                os.environ["MCS_MEGA_LAUNCHES_PER_PROG"] = old
        st, tl, es, n_new, nsteps, oob = out
        return (st, stt.finalize_tallies(tl), es, np.asarray(n_new),
                np.asarray(nsteps), np.asarray(oob))

    def test_ladder_bitwise(self, built, low_cap):
        s1, f1, e1, n1, ns1, o1 = self._ladder(built, "999")
        s2, f2, e2, n2, ns2, o2 = self._ladder(built, "2")
        np.testing.assert_array_equal(n1, n2)
        np.testing.assert_array_equal(ns1, ns2)
        np.testing.assert_array_equal(o1, o2)
        for a, b in zip(_state_tuple(s1), _state_tuple(s2)):
            np.testing.assert_array_equal(a, b)
        for name in f1._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(f1, name)),
                np.asarray(getattr(f2, name)), err_msg=name)
        for a, b in zip(jax.tree.leaves(e1), jax.tree.leaves(e2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestXlaChunked:
    def test_state_bitwise_tallies_close(self, built, low_cap):
        from montecarloscattering_jl_tpu.ops import state as stt
        from montecarloscattering_jl_tpu.ops import step as stp

        setup, state, tal, grids, sc, ss = built
        s1, t1 = stp.run_segment_jit(_copy(state), _copy(tal), grids,
                                     sc, ss, 0)
        f1 = stt.finalize_tallies(t1)
        s2, t2 = stp.run_segment_chunked(_copy(state), _copy(tal),
                                         grids, sc, ss, 0, budget=100)
        f2 = stt.finalize_tallies(t2)
        for a, b in zip(_state_tuple(s1), _state_tuple(s2)):
            np.testing.assert_array_equal(a, b)
        # tally grouping differs at chunk boundaries (partial record
        # flushes): float-rounding-order differences only
        for name in f1._fields:
            a = np.asarray(getattr(f1, name), np.float64)
            b = np.asarray(getattr(f2, name), np.float64)
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-30,
                                       err_msg=name)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
