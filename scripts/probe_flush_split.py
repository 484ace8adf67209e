"""Attribution inside _flush_records at production scale: which part
of the 5.9 ns/lane-step flush cost (profile_pieces, post-SR) is the
Pallas band kernel vs the flux contraction vs plumbing.

Usage: python scripts/probe_flush_split.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser(
    os.environ.get("MCS_CACHE_DIR", "~/.cache/mcs_xla")))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import __graft_entry__ as ge  # noqa: E402
from montecarloscattering_jl_tpu.ops import pallas_hist as ph  # noqa: E402
from montecarloscattering_jl_tpu.ops import step as stp  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
REPS = 16
CHUNK = None


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    r = B * CHUNK * REPS  # records processed per call
    print(f"{name:36s} {best*1e3:8.1f} ms  {best/r*1e9:6.2f} ns/record",
          flush=True)
    return best


def main():
    setup, state, tal, grids, sc, ss = ge._build(batch=B,
                                                 p_dtype=jnp.float32)
    global CHUNK
    chunk = CHUNK = tal.rec.shape[0]
    rng = np.random.default_rng(0)
    n_cells = tal.psd_diff.shape[0]
    # realistic records: 17% crossing rate, band-clustered cells
    r = chunk * B
    cell = rng.integers(1200, 2300, r)
    lo = rng.integers(20, 90, r)
    hi = lo + rng.integers(0, 2, r)
    w = ((rng.random(r) + 0.1) * (rng.random(r) < 0.17)).astype(np.float32)
    rec = np.zeros((chunk, 8, B), np.float32)
    for j in range(4):
        rec[:, j, :] = rng.random((chunk, B), np.float32)
    rec[:, 4, :] = w.reshape(chunk, B)
    rec[:, 5, :] = lo.reshape(chunk, B)
    rec[:, 6, :] = hi.reshape(chunk, B)
    rec[:, 7, :] = cell.reshape(chunk, B)
    tal = tal._replace(rec=jnp.asarray(rec))

    def reps(fn):
        def run(t):
            def body(i, t):
                return fn(t)
            return jax.lax.fori_loop(0, REPS, body, t)
        return run

    timeit("full _flush_records", reps(lambda t: stp._flush_records(t, ss)),
           tal)

    import dataclasses
    ss_sc = dataclasses.replace(ss, hist_band=0)
    timeit("flush, scatter psd", reps(lambda t: stp._flush_records(t, ss_sc)),
           tal)

    cellj = jnp.asarray(cell, jnp.int32)
    loj = jnp.asarray(lo, jnp.int32)
    hij = jnp.asarray(hi, jnp.int32)
    wj = jnp.asarray(w)

    def band_only(c):
        def body(i, acc):
            d = ph._band_delta(cellj, loj, hij, wj, jnp.int32(1200),
                               ss.hist_band, jnp.int32(i), ph.ROUND_MODE)
            return acc + d
        return jax.lax.fori_loop(0, REPS, body, c)
    timeit("pallas _band_delta only",
           band_only, jnp.zeros((ss.hist_band, ph.ZPAD), jnp.float32))

    def psd_acc_only(p):
        def body(i, p):
            return ph.psd_accumulate(p, cellj, loj, hij, wj,
                                     ss.hist_band, seed=jnp.int32(i))
        return jax.lax.fori_loop(0, REPS, body, p)
    timeit("psd_accumulate (cond+slice+kernel)",
           psd_acc_only, jnp.zeros_like(tal.psd_diff))

    nzc = ss.nb + 1

    def flux_only(t):
        def body(i, t):
            lo = t.rec[:, 5, :].reshape(-1).astype(jnp.int32)
            hi = t.rec[:, 6, :].reshape(-1).astype(jnp.int32)
            dt_ = t.rec.dtype
            range_oh = (jax.nn.one_hot(lo, nzc, dtype=dt_)
                        - jax.nn.one_hot(hi + 1, nzc, dtype=dt_))
            vals = jnp.moveaxis(t.rec[:, :4, :], 1, 0).reshape(4, -1)
            delta = jnp.einsum("cr,rz->cz", vals, range_oh,
                               preferred_element_type=dt_)
            return t._replace(
                flux_diff=t.flux_diff + delta.astype(jnp.float64))
        return jax.lax.fori_loop(0, REPS, body, t)
    timeit("flux one-hot contraction only", flux_only, tal)

    def unpack_only(t):
        def body(i, t):
            lo = t.rec[:, 5, :].reshape(-1).astype(jnp.int32)
            hi = t.rec[:, 6, :].reshape(-1).astype(jnp.int32)
            cell = t.rec[:, 7, :].reshape(-1).astype(jnp.int32)
            w = t.rec[:, 4, :].reshape(-1)
            s = (lo.sum() + hi.sum() + cell.sum()).astype(jnp.float64)
            return t._replace(
                flux_diff=t.flux_diff + s + w.sum().astype(jnp.float64))
        return jax.lax.fori_loop(0, REPS, body, t)
    timeit("record unpack + reduce only", unpack_only, tal)


if __name__ == "__main__":
    main()
