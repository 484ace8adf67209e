"""Micro-benchmark candidate PSD-histogram implementations on the TPU.

The transport kernel's wall (docs/design.md round 2) is the per-record
scatter into psd_diff: XLA:TPU lax.scatter-add costs ~4-11 ns/row no
matter what.  Candidates measured here, on synthetic records shaped
like the bench workload (R rows, cells clustered in a band, crossing
rate ~25%):

  P0  point scatter, 2 rows/record (the production _flush_records)
  P1  point scatter with mode='promise_in_bounds'
  P2  wide-row scatter: 1 row/record of a zone-pattern [nzc] payload
  P3  Pallas band matmul: one-hot over a BAND-cell window (bf16, exact)
      x value*zone-pattern rows (bf16), MXU dot, VMEM accumulator
  P3c P3 with compensated bf16 values (hi+lo split, ~2^-16 rel err)
  P4  Pallas scalar fori_loop doing acc[cell, z] += v per row (rate
      check only, small R)

Usage: python scripts/probe_hist.py [R] [BAND]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = int(sys.argv[1]) if len(sys.argv) > 1 else 2 ** 21
BAND = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
N_CELLS = 4428          # bench config: 2*(n_mom+1)*(n_theta+1)
NZC = 102               # nb + 1
ZPAD = 128
CROSS_RATE = 0.25
TILE = 512


def synth(r, rng):
    """Synthetic records: cells in a band, zones near the shock."""
    cell = rng.integers(1200, 1200 + int(BAND * 0.9), r).astype(np.int32)
    lo = rng.integers(20, 60, r).astype(np.int32)
    hi = lo + rng.integers(0, 3, r).astype(np.int32)
    w = (rng.random(r, np.float32) + 0.1) * (
        rng.random(r) < CROSS_RATE).astype(np.float32)
    return (jnp.asarray(cell), jnp.asarray(lo), jnp.asarray(hi),
            jnp.asarray(w))


def timeit(fn, args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


# ---- P0: production-style point scatter --------------------------------
@jax.jit
def p0(cell, lo, hi, w):
    flat = jnp.zeros((N_CELLS * NZC,), jnp.float32)
    base = cell * NZC
    flat = flat.at[base + lo].add(w)
    flat = flat.at[base + hi + 1].add(-w)
    return flat


@jax.jit
def p1(cell, lo, hi, w):
    flat = jnp.zeros((N_CELLS * NZC,), jnp.float32)
    base = cell * NZC
    flat = flat.at[base + lo].add(w, mode="promise_in_bounds")
    flat = flat.at[base + hi + 1].add(-w, mode="promise_in_bounds")
    return flat


# ---- P2: wide-row scatter ----------------------------------------------
@jax.jit
def p2(cell, lo, hi, w):
    acc = jnp.zeros((N_CELLS, ZPAD), jnp.float32)
    z = jnp.arange(ZPAD, dtype=jnp.int32)
    rows = w[:, None] * ((z[None, :] == lo[:, None]).astype(jnp.float32)
                         - (z[None, :] == hi[:, None] + 1)
                         .astype(jnp.float32))
    return acc.at[cell].add(rows)


# ---- P3: Pallas band matmul --------------------------------------------
def _band_kernel(blo_ref, cell_ref, lo_ref, hi_ref, w_ref, out_ref,
                 *, band, compensated):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    c_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, band), 1)
    z_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, ZPAD), 1)
    acc = jnp.zeros_like(out_ref)
    for k in range(cell_ref.shape[0]):
        local = cell_ref[k, :] - blo_ref[0]                  # [T]
        a = (local[:, None] == c_iota).astype(jnp.bfloat16)  # [T, band]
        lo = lo_ref[k, :]
        hi = hi_ref[k, :]
        pat = ((z_iota == lo[:, None]).astype(jnp.float32)
               - (z_iota == hi[:, None] + 1).astype(jnp.float32))
        wv = w_ref[k, :][:, None]
        if compensated:
            w_hi = wv.astype(jnp.bfloat16)
            w_lo = (wv - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            b = jnp.concatenate(
                [w_hi * pat.astype(jnp.bfloat16),
                 w_lo * pat.astype(jnp.bfloat16)], axis=1)   # [T, 2*ZPAD]
        else:
            b = (wv * pat).astype(jnp.bfloat16)              # [T, ZPAD]
        acc = acc + jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:] += acc


def make_p3(band, compensated):
    zw = 2 * ZPAD if compensated else ZPAD

    @jax.jit
    def p3(cell, lo, hi, w):
        r = cell.shape[0]
        nt = r // TILE
        blo = jnp.min(jnp.where(w != 0, cell, np.int32(2 ** 30)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt // 8,),
            in_specs=[
                pl.BlockSpec((8, TILE), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TILE), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TILE), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TILE), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((band, zw), lambda i, s: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            functools.partial(_band_kernel, band=band,
                              compensated=compensated),
            out_shape=jax.ShapeDtypeStruct((band, zw), jnp.float32),
            grid_spec=grid_spec,
        )(blo[None], cell.reshape(nt, TILE), lo.reshape(nt, TILE),
          hi.reshape(nt, TILE), w.reshape(nt, TILE))
        if compensated:
            out = out[:, :ZPAD] + out[:, ZPAD:]
        # place the band back into the full histogram
        flat = jnp.zeros((N_CELLS, ZPAD), jnp.float32)
        blo_c = jnp.clip(blo, 0, N_CELLS - band)
        cur = jax.lax.dynamic_slice(flat, (blo_c, 0), (band, ZPAD))
        return jax.lax.dynamic_update_slice(flat, cur + out, (blo_c, 0))

    return p3


# ---- P4: Pallas scalar loop (rate check) -------------------------------
def _scalar_kernel(cell_ref, lo_ref, hi_ref, w_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    z_iota = jax.lax.broadcasted_iota(jnp.int32, (1, ZPAD), 1)

    def body(j, _):
        k, jj = j // TILE, j % TILE
        c = cell_ref[k, jj]
        v = w_ref[k, jj]
        zl = lo_ref[k, jj]
        zh = hi_ref[k, jj]
        row = v * ((z_iota == zl).astype(jnp.float32)
                   - (z_iota == zh + 1).astype(jnp.float32))
        out_ref[pl.ds(c, 1), :] += row
        return 0

    jax.lax.fori_loop(0, 8 * TILE, body, 0)


@jax.jit
def p4(cell, lo, hi, w):
    r = cell.shape[0]
    nt = r // TILE
    return pl.pallas_call(
        _scalar_kernel,
        grid=(nt // 8,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, TILE), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, TILE), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, TILE), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((N_CELLS, ZPAD), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_CELLS, ZPAD), jnp.float32),
    )(cell.reshape(nt, TILE), lo.reshape(nt, TILE), hi.reshape(nt, TILE),
      w.reshape(nt, TILE))


def ref_result(cell, lo, hi, w):
    flat = np.zeros((N_CELLS * NZC,), np.float64)
    base = np.asarray(cell, np.int64) * NZC
    np.add.at(flat, base + np.asarray(lo), np.asarray(w, np.float64))
    np.add.at(flat, base + np.asarray(hi) + 1, -np.asarray(w, np.float64))
    return flat.reshape(N_CELLS, NZC)


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(42)
    args = synth(R, rng)
    want = ref_result(*args)

    def check(got, name, pad=True):
        g = np.asarray(got, np.float64)
        if g.ndim == 1:
            g = g.reshape(N_CELLS, NZC)
        elif pad:
            g = g[:, :NZC]
        err = np.abs(g - want).max() / max(np.abs(want).max(), 1e-30)
        print(f"    {name}: max rel err vs f64 = {err:.2e}")

    for name, fn in [("P0 scatter", p0), ("P1 promise_in_bounds", p1),
                     ("P2 wide-row scatter", p2)]:
        try:
            dt, out = timeit(fn, args)
            print(f"{name:28s} {dt * 1e3:8.2f} ms   "
                  f"{dt / R * 1e9:6.2f} ns/row")
            check(out, name)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}")

    for band in (1024, 2048):
        for comp in (False, True):
            name = f"P3 band={band} comp={comp}"
            try:
                fn = make_p3(band, comp)
                dt, out = timeit(fn, args)
                print(f"{name:28s} {dt * 1e3:8.2f} ms   "
                      f"{dt / R * 1e9:6.2f} ns/row")
                check(out, name)
            except Exception as e:
                print(f"{name:28s} FAILED: {type(e).__name__}: {e}")

    r4 = 2 ** 16
    a4 = synth(r4, rng)
    try:
        dt, out = timeit(p4, a4)
        print(f"{'P4 scalar loop (64k rows)':28s} {dt * 1e3:8.2f} ms   "
              f"{dt / r4 * 1e9:6.2f} ns/row")
        w4 = ref_result(*a4)
        g = np.asarray(out, np.float64)[:, :NZC]
        err = np.abs(g - w4).max() / max(np.abs(w4).max(), 1e-30)
        print(f"    P4: max rel err vs f64 = {err:.2e}")
    except Exception as e:
        print(f"{'P4 scalar loop':28s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
