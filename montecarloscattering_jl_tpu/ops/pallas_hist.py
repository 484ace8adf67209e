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
  * bf16 values lose 16 mantissa bits, handled by one of two modes
    (MCS_PSD_ROUND):
      - "sr" (default): STOCHASTIC ROUNDING — each record's w is
        rounded to bf16 by adding 16 uniform dither bits to its f32
        bit pattern and truncating (the canonical unbiased-SR trick;
        E[w_sr] = w), with the dither hashed in-kernel from the
        global record index + flush counter (a murmur3-style
        finalizer — no pltpu PRNG, so the same code runs in
        interpret mode).  The SAME rounded w feeds the +lo and
        −(hi+1) difference-array entries, so a record's range stays
        exactly cancelled beyond hi and the zone cumsum acquires no
        leaked noise.  For an MC tally SR is statistically exact:
        the rounding adds unbiased noise ~2⁻⁹·w per record, orders
        below the O(1/√N) MC noise of any cell.
      - "comp": COMPENSATED split — w is split hi+lo into two bf16
        halves (both exactly representable), B carries both in
        stacked columns (2× the MXU work), and the halves are summed
        once at the end.  Deterministic; used for A/B validation.
    Over a full 256-step transport window both modes land as close
    to the f64 ground truth as the f32 scatter does
    (scripts/probe_hist_accuracy.py), far below MC noise.
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
_TILE = int(os.environ.get("MCS_HIST_TILE", 512))   # records per MXU contraction
_SUB = int(os.environ.get("MCS_HIST_SUB", 8))  # sub-tiles per grid program (block sublane dim)
_ROWS_UNIT = _SUB * _TILE

# Static band width (cells) — must cover the per-flush cell span or the
# flush falls back to the scatter.  1536 covers the measured p90 span
# (~1.2k) with margin at bench dims; override for exotic binnings.
DEFAULT_BAND = int(os.environ.get("MCS_PSD_BAND", 1536))

# Rounding mode for the bf16 value matrix: "sr" stochastic rounding
# (unbiased, half the MXU work) or "comp" compensated hi+lo split
# (deterministic, 2x columns).  See the module docstring.
ROUND_MODE = os.environ.get("MCS_PSD_ROUND", "sr")


def _dither16(idx, seed):
    """16 uniform dither bits per record from a murmur3-style integer
    finalizer of (global record index, seed).  Pure i32/u32 bit ops —
    identical results in Mosaic and interpret mode."""
    # xor with the golden-ratio-multiplied seed (NOT `idx + seed`,
    # which only shifts the stream so block sums barely change)
    h = (idx.astype(jnp.uint32)
         ^ (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h & jnp.uint32(0xFFFF)


def _sr_bf16(w, idx, seed):
    """Stochastically round f32 w to the bf16 grid: add 16 dither bits
    to the bit pattern and truncate.  Unbiased (E[result] = w within a
    binade); w == 0 stays exactly 0, so padding rows stay no-ops.
    Returned as f32 (low mantissa bits zero, so any later bf16 cast is
    exact) — Mosaic only supports minor-dim insertion on 32-bit types,
    so the caller broadcasts in f32 and casts last."""
    u = jax.lax.bitcast_convert_type(w, jnp.uint32)
    u = (u + _dither16(idx, seed)) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


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


def _dot_t(a, b):
    """a^T @ b contracting the leading (row) axis, f32 accumulation."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _unpacked_tile(local, lo, hi, wcol, c_iota, z_iota):
    """One unpacked sub-tile's rank-_TILE contribution: bf16 one-hot
    over the band x value-carrying zone pattern.  All operands are
    [_TILE, 1] COLUMNS (records sublane-major), so the broadcasts
    against the lane-iotas are free — no lane->sublane transposes.
    ``wcol`` [_TILE, n] carries the bf16-safe value column(s)."""
    a = (local == c_iota).astype(jnp.bfloat16)
    pat = ((z_iota == lo).astype(jnp.float32)
           - (z_iota == hi + 1).astype(jnp.float32))
    patb = pat.astype(jnp.bfloat16)
    if wcol.shape[1] == 1:
        b = wcol.astype(jnp.bfloat16) * patb
    else:  # compensated halves stacked
        b = jnp.concatenate([wcol[:, 0:1].astype(jnp.bfloat16) * patb,
                             wcol[:, 1:2].astype(jnp.bfloat16) * patb],
                            axis=1)
    return _dot_t(a, b)


def _band_kernel(scalars_ref, cell_ref, lo_ref, hi_ref,
                 w_ref, out_ref, *, band, mode):
    """One grid program: _SUB sub-tiles of _TILE records, accumulated
    into the [band, ZPAD] ("sr") or [band, 2*ZPAD] ("comp", halves
    stacked) VMEM block.  scalars_ref = [band offset, dither seed].

    Record blocks arrive TRANSPOSED [1, _TILE, _SUB] (records
    sublane-major, sub-tile index in lanes): every per-sub-tile
    operand is then a [_TILE, 1] column whose broadcast against the
    lane-iotas is free.  The row-major layout needed a lane->sublane
    transpose per operand per sub-tile — the dominant VPU cost
    (measured 3.89 -> 3.07 ns/record from this change alone).

    Negative result, for the record: a 4:1 survivor-packing fast path
    (exact bf16 placement-one-hot matmuls compacting the ~17% real
    crossings before the band contraction) was built and validated
    BITWISE against this path on chip, but measured SLOWER (3.44 vs
    3.07 ns/record): the prefix-count matmul plus eight small
    [_TILE, _CAP] pack matmuls cost more than the saved band-matmul
    FLOPs — small MXU dispatches are not free.  Reverted; the kernel
    is at its structural roofline of band x ZPAD bf16 MACs/record."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    cellT = cell_ref[0]     # [_TILE, _SUB] i32
    loT = lo_ref[0]
    hiT = hi_ref[0]
    wT = w_ref[0]           # [_TILE, _SUB] f32
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (_TILE, band), 1)
    z_iota = jax.lax.broadcasted_iota(jnp.int32, (_TILE, ZPAD), 1)

    if mode == "sr":
        # stochastically round the whole program's w block once; the
        # rounded value feeds BOTH difference-array entries.  Global
        # record index in the transposed layout:
        # i*_ROWS_UNIT + k*_TILE + t
        idx = (jax.lax.broadcasted_iota(jnp.int32, (_TILE, _SUB), 1)
               * _TILE
               + jax.lax.broadcasted_iota(jnp.int32, (_TILE, _SUB), 0)
               + i * _ROWS_UNIT)
        w_srT = _sr_bf16(wT, idx, scalars_ref[1])

    acc = jnp.zeros_like(out_ref)
    for k in range(_SUB):
        local = cellT[:, k:k + 1] - scalars_ref[0]
        if mode == "sr":
            wcol = w_srT[:, k:k + 1]
        else:
            wv = wT[:, k:k + 1]
            # compensated bf16 split.  NOT wv - bf16(wv).astype(f32):
            # XLA's allow-excess-precision rule elides the
            # f32->bf16->f32 round-trip and the correction folds to
            # zero.  Masking the low mantissa bits is an exact
            # truncation split XLA cannot elide.
            w_hi_f32 = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(wv, jnp.uint32)
                & jnp.uint32(0xFFFF0000), jnp.float32)
            w_lo = wv - w_hi_f32       # w_hi exact: low bits are 0
            wcol = jnp.concatenate([w_hi_f32, w_lo], axis=1)
        acc = acc + _unpacked_tile(
            local, loT[:, k:k + 1], hiT[:, k:k + 1], wcol,
            c_iota, z_iota)
    out_ref[:] += acc


def _band_delta(cell, lo, hi, w, blo, band, seed, mode,
                interpret=False):
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
    ncol = ZPAD if mode == "sr" else 2 * ZPAD
    # index maps must yield i32 even under jax_enable_x64 (a bare 0
    # traces as i64, which Mosaic refuses to legalize); `i - i` is a
    # zero of the grid index dtype without capturing a tracer
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[pl.BlockSpec((1, _TILE, _SUB),
                               lambda i, s: (i, i - i, i - i),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((band, ncol),
                               lambda i, s: (i - i, i - i),
                               memory_space=pltpu.VMEM),
    )
    scalars = jnp.stack([blo.astype(jnp.int32),
                         seed.astype(jnp.int32)])

    def t(x):
        # records sublane-major per program block (see _band_kernel)
        return x.reshape(nt, _SUB, _TILE).transpose(0, 2, 1)

    out = pl.pallas_call(
        functools.partial(_band_kernel, band=band, mode=mode),
        out_shape=jax.ShapeDtypeStruct((band, ncol), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, t(cell), t(lo), t(hi), t(w))
    if mode == "sr":
        return out
    return out[:, :ZPAD] + out[:, ZPAD:]


def psd_accumulate(psd2d, cell, lo, hi, w, band, seed=None,
                   mode=None, interpret=False):
    """Add the flush window's crossing records into the 2-D histogram
    ``psd2d`` [n_cells, nzc] (rows are flat (ip, kind, jt) cells;
    columns are zone-boundary indices of the difference array).

    Uses the Pallas band kernel when the window's real cells fit a
    ``band``-wide window, else the exact XLA scatter — chosen at
    runtime under lax.cond so a pathological window costs speed, not
    correctness.  ``seed`` salts the "sr" mode's dither stream (the
    caller passes the flush counter so successive windows dither
    independently).
    """
    if mode is None:
        mode = ROUND_MODE
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    n_cells, nzc = psd2d.shape
    n_cells_pad = -(-max(n_cells, band) // 128) * 128
    real = w != 0
    big = jnp.int32(np.int32(2 ** 30))
    blo = jnp.min(jnp.where(real, cell, big))
    bhi = jnp.max(jnp.where(real, cell, -1))
    blo_c = jnp.clip(blo, 0, n_cells_pad - band)
    fits = (bhi - blo_c) < band

    def pallas_branch(p):
        delta = _band_delta(cell, lo, hi, w, blo_c, band, seed, mode,
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
