"""Pallas TPU kernel for the PSD crossing histogram.

The transport kernel's dominant cost (88% of step time, docs/design.md)
is scattering crossing records into the 3-D phase-space histogram —
the vectorized replacement for the reference's per-crossing
``psd[i_pt, jθ, i] += w·|1/vx|`` tally (all_flux.jl:234-236).
XLA:TPU lowers scatter-add to a serial per-row loop at a measured
4-16 ns/row that no XLA-level reformulation beats (the round-2
profile).  This kernel replaces the scatter with dense MXU work:

  * Records within one flush window cluster in a narrow band of the
    flat (ip, kind, jt) cell space — the momentum spread of one pcut
    segment is a decade or two, so with the ip-major cell layout the
    measured per-window span is ~1.0-1.2k cells (p90) of the 4.4k
    total (scripts/probe_band_stats.py).
  * Per tile of T records the kernel builds an EXACT bf16 one-hot
    A[T, band] over the band (out-of-band rows match no column and
    vanish), and a value-carrying zone-pattern
    B[T, z] = w·(1[z=lo] − 1[z=hi+1]) — the difference-array form of
    the crossed range (ops/state.py) — then accumulates
    A^T @ B on the MXU into a VMEM-resident [band, zones] f32 block.
  * bf16 values are COMPENSATED: w is split hi+lo into two bf16
    halves (both exactly representable), B carries both in stacked
    columns, and the halves are summed once at the end — over a full
    256-step transport window the tally lands as close to the f64
    ground truth as the f32 scatter does (max |Δ|/max 3.9e-6 vs
    5.0e-7, and it is the MORE accurate branch on significant cells;
    scripts/probe_hist_accuracy.py), far below MC statistical noise.
  * The band offset is dynamic (min over the window's real cells); a
    window whose span exceeds the static band falls back to the XLA
    scatter under lax.cond, so correctness never depends on the band
    estimate.

Measured on a v5e chip at 8M records/flush: 16.1 ns/record for the
production scatter, 11.0 for a wide-row scatter, 6.9-7.0 for this
kernel (compensated) — a 2.3x on the flush that dominated the step.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ZPAD = 128          # padded zone width; requires nb + 1 <= 128
_TILE = 512         # records per MXU contraction
_SUB = 8            # sub-tiles per grid program (block sublane dim)
_ROWS_UNIT = _SUB * _TILE

# Static band width (cells) — must cover the per-flush cell span or the
# flush falls back to the scatter.  1536 covers the measured p90 span
# (~1.2k) with margin at bench dims; override for exotic binnings.
DEFAULT_BAND = int(os.environ.get("MCS_PSD_BAND", 1536))


def hist_band_for(n_cells: int, nzc: int, psd_dtype) -> int:
    """The static band to compile for, or 0 when the Pallas path does
    not apply (non-TPU backend, zones wider than one lane tile, f64
    tallies, or explicitly disabled)."""
    if os.environ.get("MCS_PALLAS_HIST", "1") != "1":
        return 0
    if jax.default_backend() != "tpu":
        return 0
    if nzc > ZPAD or psd_dtype != jnp.float32:
        return 0
    n_cells_pad = -(-n_cells // 128) * 128
    return min(DEFAULT_BAND, n_cells_pad)


def _band_kernel(blo_ref, cell_ref, lo_ref, hi_ref, w_ref, out_ref, *,
                 band):
    """One grid program: _SUB sub-tiles of _TILE records, accumulated
    into the [band, 2*ZPAD] VMEM block (compensated halves stacked)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    c_iota = jax.lax.broadcasted_iota(jnp.int32, (_TILE, band), 1)
    z_iota = jax.lax.broadcasted_iota(jnp.int32, (_TILE, ZPAD), 1)
    acc = jnp.zeros_like(out_ref)
    for k in range(_SUB):
        local = cell_ref[k, :] - blo_ref[0]
        a = (local[:, None] == c_iota).astype(jnp.bfloat16)
        lo = lo_ref[k, :]
        hi = hi_ref[k, :]
        pat = ((z_iota == lo[:, None]).astype(jnp.float32)
               - (z_iota == hi[:, None] + 1).astype(jnp.float32))
        wv = w_ref[k, :][:, None]
        # compensated bf16 split.  NOT wv - bf16(wv).astype(f32): XLA's
        # allow-excess-precision rule elides the f32->bf16->f32
        # round-trip and the correction folds to zero.  Masking the low
        # mantissa bits is an exact truncation split XLA cannot elide.
        w_hi_f32 = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(wv, jnp.uint32)
            & jnp.uint32(0xFFFF0000), jnp.float32)
        w_hi = w_hi_f32.astype(jnp.bfloat16)        # exact: low bits are 0
        w_lo = (wv - w_hi_f32).astype(jnp.bfloat16)
        patb = pat.astype(jnp.bfloat16)
        b = jnp.concatenate([w_hi * patb, w_lo * patb], axis=1)
        acc = acc + jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:] += acc


def _band_delta(cell, lo, hi, w, blo, band, interpret=False):
    """Dense [band, ZPAD] f32 histogram delta for cells in
    [blo, blo+band); out-of-band rows contribute nothing."""
    r = cell.shape[0]
    pad = (-r) % _ROWS_UNIT
    if pad:
        zi = jnp.zeros((pad,), jnp.int32)
        cell = jnp.concatenate([cell, zi])
        lo = jnp.concatenate([lo, zi])
        hi = jnp.concatenate([hi, zi])
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
    nt = (r + pad) // _ROWS_UNIT
    rows = nt * _SUB
    # index maps must yield i32 even under jax_enable_x64 (a bare 0
    # traces as i64, which Mosaic refuses to legalize); `i - i` is a
    # zero of the grid index dtype without capturing a tracer
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[pl.BlockSpec((_SUB, _TILE), lambda i, s: (i, i - i),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((band, 2 * ZPAD),
                               lambda i, s: (i - i, i - i),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_band_kernel, band=band),
        out_shape=jax.ShapeDtypeStruct((band, 2 * ZPAD), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(blo[None].astype(jnp.int32), cell.reshape(rows, _TILE),
      lo.reshape(rows, _TILE), hi.reshape(rows, _TILE),
      w.reshape(rows, _TILE))
    return out[:, :ZPAD] + out[:, ZPAD:]


def psd_accumulate(psd2d, cell, lo, hi, w, band, interpret=False):
    """Add the flush window's crossing records into the 2-D histogram
    ``psd2d`` [n_cells, nzc] (rows are flat (ip, kind, jt) cells;
    columns are zone-boundary indices of the difference array).

    Uses the Pallas band kernel when the window's real cells fit a
    ``band``-wide window, else the exact XLA scatter — chosen at
    runtime under lax.cond so a pathological window costs speed, not
    correctness.
    """
    n_cells, nzc = psd2d.shape
    n_cells_pad = -(-max(n_cells, band) // 128) * 128
    real = w != 0
    big = jnp.int32(np.int32(2 ** 30))
    blo = jnp.min(jnp.where(real, cell, big))
    bhi = jnp.max(jnp.where(real, cell, -1))
    blo_c = jnp.clip(blo, 0, n_cells_pad - band)
    fits = (bhi - blo_c) < band

    def pallas_branch(p):
        delta = _band_delta(cell, lo, hi, w, blo_c, band,
                            interpret=interpret)
        pp = jnp.pad(p, ((0, n_cells_pad - n_cells), (0, ZPAD - nzc)))
        zero = jnp.zeros((), blo_c.dtype)
        cur = lax.dynamic_slice(pp, (blo_c, zero), (band, ZPAD))
        pp = lax.dynamic_update_slice(pp, cur + delta, (blo_c, zero))
        return pp[:n_cells, :nzc]

    def scatter_branch(p):
        flat = p.reshape(-1)
        base = cell * nzc
        flat = flat.at[base + lo].add(w)
        flat = flat.at[base + hi + 1].add(-w)
        return flat.reshape(p.shape)

    return lax.cond(fits, pallas_branch, scatter_branch, psd2d)
