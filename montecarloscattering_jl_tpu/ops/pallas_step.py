"""Pallas TPU transport MEGAKERNEL: the whole helix step fused into
one Mosaic kernel, iterated S steps per launch with the particle block
resident in VMEM.

Why: the XLA step (ops/step.py helix_step) compiles to many separate
TPU kernels whose combined fixed launch cost is ~250 us per step —
irrelevant at 1M lanes (0.25 ns/lane-step) but catastrophic for the
drain tail, where the last few thousand long-lived lanes pay it at
~500 ns/lane-step (scripts/probe_drain_levels.py).  One Pallas kernel
advancing a lane block S steps per launch reduces the per-step fixed
cost to in-kernel loop overhead (~none) and removes the record-buffer
/ flush machinery entirely: tallies accumulate on-chip every step.

Design (same physics as ops/step.py, which remains the reference
implementation and the fallback for unsupported configs):

  * Lane-major layout: every per-lane field is a [R, 128] f32/i32
    block (R = _ROWS rows of 128 lanes); one grid program owns one
    block and loops S steps with the whole state in VMEM.
  * All one-hots put the VALUE AXIS IN SUBLANES and LANES IN LANES
    (sublane-iota vs broadcast row), contracted over lanes with
    dot_general — no lane->sublane transposes anywhere.
  * Zone fields: the boundary compare matrix cmp[z, lane] =
    (x >= x_grid[z]) gives BOTH the zone index (column sum) and the
    zone one-hot (cmp - shift(cmp)); fields are gathered by one
    matmul against a 3-way bf16 split of the field table (hi/mid/lo
    parts, each product exact, f32 accumulation -> full f32 fields).
  * Positions and acceleration time are DOUBLE-SINGLE (hi+lo f32
    pairs, ~48-bit mantissa): Mosaic has no f64.  Two-sum + renorm
    per update; comparisons use the hi word (boundary spacing is
    orders above f32 ulp at every grid scale).
  * RNG: full Threefry-2x32-20 keyed by the SAME per-lane key data as
    the XLA path, counter = (nsteps, word-pair) — counter-based,
    deterministic, and stable under the outer compaction permutes.
    The stream differs from jax.random's derivation, so megakernel
    runs are statistically (not bitwise) equivalent to the XLA path.
  * Tallies: per step, the crossing records feed the same band-one-hot
    MXU contraction as ops/pallas_hist.py, accumulated into a
    VMEM-resident difference-array PSD [n_cells_pad, 128] shared by
    all grid programs; the four flux channels ride a [4, 128]
    contraction into an aux block.  Values are stochastically rounded
    to bf16 with the hash dither of pallas_hist (unbiased; see there).
    Records whose cell falls outside the per-step band window are
    DROPPED AND COUNTED (aux row 9); the wrapper raises if any were —
    for supported configs the per-step cell span is far below the
    band (scripts/probe_band_stats.py).
  * Large PSDs (e.g. the reference-parity baseline: 55,040 cells =
    28 MB f32, over the ~16 MB VMEM budget) accumulate into a SLIDING
    MOMENTUM WINDOW of MCS_MEGA_WINDOW (16,384) cells: before every
    launch the drive re-anchors the window from the live population's
    shock-frame momentum bound (window_base in _get_launch) and
    scatters the launch's window into the full HBM-resident array
    with a dynamic-slice add.  Crossings whose shock-frame momentum
    nearly cancels (pt_sk -> 0) can fall below any finite window;
    their |weight| is tracked (aux rows 11/12) and accepted up to
    MCS_MEGA_OOB_TOL of the total — beyond that check_oob raises.

Supported configs (megakernel_ok): parallel shock, f32 momenta —
including the reference-parity baseline config: tcut tracking and
ion<->electron energy transfer run in-kernel (x_spec detectors and
f64 momenta stay XLA-only).  Radiation losses, retro walk, analytic
return, custom eps_B decay, custom f(r_g), no-scatter/no-DSA switches
are all supported as static flags.

Reference parity anchors are the same as ops/step.py
(particle_loop.jl:154-499, all_flux.jl:45-259, prob_return.jl:36-344).
"""

from __future__ import annotations

import collections
import functools
import logging
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.constants import C_CGS, RAD_LOSS_FAC
from ..utils.params import ALL_FLUX_SPIKE_AWAY, E_REL_PT, MAX_HELIX_STEPS
from . import state as st
from .state import ACTIVE, FINISHED, SAVED

LANE = 128
_ROWS = int(os.environ.get("MCS_MEGA_ROWS", 32))     # lanes/block = _ROWS*128
_STEPS = int(os.environ.get("MCS_MEGA_STEPS", 256))  # steps per launch
_NF = 12   # f32 state fields
_NI = 7    # i32 state fields
ZPAD = 128
# band-contraction tile rows: the [tile, K] one-hot intermediate and
# the [tile, ZPAD] scratch are the tally's VMEM footprint, so bands
# wider than this (relativistic configs, derive_mega_band) loop tiles
# instead of growing VMEM
_TILE = 2048

# f32 state stack rows
F_W, F_PB, F_PP, F_PHI, F_UXP, F_XNP, F_TST, F_PRP = range(8)
F_XHI, F_XLO, F_ATHI, F_ATLO = 8, 9, 10, 11
# i32 state stack rows
I_STATUS, I_REASON, I_NSTEPS, I_FLAGS, I_KEY0, I_KEY1, I_TCUT = range(7)
# flag bits
FL_DW, FL_INJ, FL_RETRO, FL_JRET = 1, 2, 4, 8

# aux output rows
A_FLUX0 = 0            # rows 0-3: flux_diff [4, nzc] difference form
A_PX_ESC, A_EN_ESC, A_SUM_P, A_SUM_KE = 4, 5, 6, 7
A_ACTIVE, A_OVERFLOW = 8, 9
A_POOL = 10            # ion->electron pool_diff [nb+1] difference form
A_OOBW, A_WTOT = 11, 12  # dropped vs total |psd weight| (window tol)
A_FINE = 13            # steps contracted on the fine per-chunk band
N_AUX = 16

# scf layout: [0:18] segment scalars, [18:22] downstream-zone tail,
# [22] SR seed, [23] tally-window base cell (0 = no window),
# [24:24+n_tcut_slots] tcut times
_SCF_BASE = 24

_N_REFLECT_TRIES = 2


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _u32(x):
    if getattr(x, "dtype", None) == jnp.uint32:
        return x
    if jnp.ndim(x) < 2:
        # pltpu.bitcast requires >= 2D; scalar/1D via lax
        return lax.bitcast_convert_type(x, jnp.uint32)
    return pltpu.bitcast(x, jnp.uint32)


def _rotl(x, r):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def _threefry2x32(k0, k1, c0, c1):
    """Threefry-2x32, 20 rounds (the jax.random core PRF)."""
    rots = ((13, 15, 26, 6), (17, 29, 16, 24))
    ks = (k0, k1, k0 ^ k1 ^ jnp.uint32(0x1BD11BDA))
    x0 = c0 + ks[0]
    x1 = c1 + ks[1]
    for d in range(5):
        for r in rots[d % 2]:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ks[(d + 1) % 3]
        x1 = x1 + ks[(d + 2) % 3] + jnp.uint32(d + 1)
    return x0, x1


def _uniforms(k0, k1, nsteps):
    """8 uniform [R,128] slots: 16-bit halves of 4 threefry words,
    (h + 0.5) / 2^16 — same resolution/discipline as ops/step.py."""
    ctr = _u32(nsteps)
    z = jnp.zeros_like(ctr)
    w0, w1 = _threefry2x32(k0, k1, ctr, z)
    w2, w3 = _threefry2x32(k0, k1, ctr, z + jnp.uint32(1))
    out = []
    for w in (w0, w1, w2, w3):
        lo = (w & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
        hi = (w >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
        out.append((lo + 0.5) * (1.0 / 65536.0))
        out.append((hi + 0.5) * (1.0 / 65536.0))
    return out                         # u[0..7]


def _ds_add(hi, lo, d):
    """(hi, lo) + d with two-sum + renormalize (double-single)."""
    s = hi + d
    bv = s - hi
    err = (hi - (s - bv)) + (d - bv)
    lo2 = lo + err
    hi2 = s + lo2
    lo3 = lo2 - (hi2 - s)
    return hi2, lo3


def _dither16(idx, seed):
    # seed is a SCALAR i32: Mosaic cannot bitcast scalars, so fold the
    # golden-ratio multiply in wrapping i32 (bit-identical to u32) and
    # broadcast to the vector shape before the bitcast
    sm = jnp.broadcast_to(seed * jnp.int32(-1640531527), idx.shape)
    h = _u32(idx) ^ _u32(sm)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h & jnp.uint32(0xFFFF)


def _sr_bf16_bits(w, idx, seed):
    """Stochastic-round f32 to the bf16 grid (kept f32; later bf16
    casts are exact).  Same construction as pallas_hist._sr_bf16."""
    u = pltpu.bitcast(w, jnp.uint32)
    u = (u + _dither16(idx, seed)) & jnp.uint32(0xFFFF0000)
    return pltpu.bitcast(u, jnp.float32)


def _dot_ll(a, b):
    """Contract the LANE (last) axis of both operands on the MXU with
    f32 accumulation: out[i, j] = sum_l a[i, l] b[j, l]."""
    return lax.dot_general(a, b, dimension_numbers=(((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _dot_ss(a, b):
    """Contract the SUBLANE (first) axis of both operands."""
    return lax.dot_general(a, b, dimension_numbers=(((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _mega_kernel(scf_ref, act_ref, fs_ref, is_ref, xg_ref, zs_ref,
                 et_ref, fs_out, is_out, psd_out, aux_out, tc_out,
                 psd_scr, *, band, n_cells_pad, n_steps, cfg, fine=0):
    """One grid program: advance one lane block `n_steps` steps.

    cfg is a dict of static flags/values (see megakernel_plan)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        psd_out[:] = jnp.zeros_like(psd_out)
        aux_out[:] = jnp.zeros_like(aux_out)
        tc_out[:] = jnp.zeros_like(tc_out)

    @pl.when(act_ref[i] == 0)
    def _():
        fs_out[:] = fs_ref[:]
        is_out[:] = is_ref[:]

    @pl.when(act_ref[i] != 0)
    def _():
        _mega_body(scf_ref, fs_ref, is_ref, xg_ref, zs_ref, et_ref,
                   fs_out, is_out, psd_out, aux_out, tc_out, psd_scr,
                   band=band, n_cells_pad=n_cells_pad,
                   n_steps=n_steps, cfg=cfg, prog=i, fine=fine)


def _mega_body(scf_ref, fs_ref, is_ref, xg_ref, zs_ref, et_ref,
               fs_out, is_out, psd_out, aux_out, tc_out, psd_scr, *,
               band, n_cells_pad, n_steps, cfg, prog, fine=0):
    R = _ROWS
    BL = R * LANE
    c = np.float32(C_CGS)

    def s(k):
        return scf_ref[k]

    m = s(0)
    mc = s(1)
    e0 = s(2)
    inv_q = s(3)
    pcut = s(4)
    pcut_prev = s(5)
    pmax_cutoff = s(6)
    u2 = s(7)
    bmag2 = s(8)
    b_cmbz = s(9)
    g0u0 = s(10)
    feb_up = s(11)
    feb_dw = s(12)
    x_stop = s(13)
    age_max = s(14)
    pe_crit = s(15)
    gamma_e_crit = s(16)
    inj_frac = s(17)
    b_dw = s(18)        # btot[nb-2]
    gsf_dw = s(19)
    gef_dw = s(20)
    ux_dw = s(21)
    seed = scf_ref[22].astype(jnp.int32)
    # tally-window base cell: the PSD accumulator holds cells
    # [cb, cb + n_cells_pad) of the full difference array (0 for
    # full-coverage configs); cells < 2^24 are exact in f32
    cb = scf_ref[23].astype(jnp.int32)

    w_lane = fs_ref[F_W]
    key0 = _u32(is_ref[I_KEY0])
    key1 = _u32(is_ref[I_KEY1])

    eta = np.float32(cfg["eta_mfp"])
    xn_coarse = np.float32(cfg["xn_per_coarse"])
    xn_fine = np.float32(cfg["xn_per_fine"])
    cmax_coarse = np.float32(np.cos(np.sqrt(
        12.0 * np.pi / (cfg["xn_per_coarse"] * cfg["eta_mfp"]))))
    cmax_fine = np.float32(np.cos(np.sqrt(
        12.0 * np.pi / (cfg["xn_per_fine"] * cfg["eta_mfp"]))))
    is_el = cfg["is_electron"]
    two_pi = np.float32(2.0 * np.pi)

    # record index base for the SR dither (unique per program)
    idx0 = (lax.broadcasted_iota(jnp.int32, (R, LANE), 0)
            * jnp.int32(LANE)
            + lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
            + prog * jnp.int32(BL))

    xg_col = xg_ref[:, 0:1]                     # [128, 1] boundaries

    def zone_of(x_row):
        """cmp [128, BL] f32, ig [1, BL] from a position row."""
        cmp = (x_row >= xg_col).astype(jnp.float32)    # [128, BL]
        ig = jnp.sum(cmp, axis=0, keepdims=True) - 1.0
        return cmp, ig

    def step(sv, _):
        (pb, pperp, phi, uxp, xnp, tstep, prp, xhi, xlo, athi, atlo,
         status, reason, nsteps, flags, tcut_idx) = sv

        act = status == ACTIVE
        retro = (flags & jnp.int32(FL_RETRO)) != 0
        jret = (flags & jnp.int32(FL_JRET)) != 0
        dwf = (flags & jnp.int32(FL_DW)) != 0
        injf = (flags & jnp.int32(FL_INJ)) != 0
        norm = act & ~retro
        do_b3 = norm & ~jret

        u = _uniforms(key0, key1, nsteps)

        # ---- zone fields from position ---------------------------------
        x_row = xhi.reshape(1, BL)
        if "zone" in cfg["prof_kill"]:
            ig_row = jnp.zeros((1, BL), jnp.float32) + 3.0
            oh = jnp.where(
                lax.broadcasted_iota(jnp.int32, (128, BL), 0) == 3,
                np.float32(1.0), np.float32(0.0))
        else:
            cmp, ig_row = zone_of(x_row)
        # zone one-hot: in zone z iff x >= xg[z] and x < xg[z+1]
            # shift rows up by one via static slices (dynamic_rotate
            # wants an i32 shift and x64 tracing hands it i64)
            shifted = jnp.concatenate([cmp[1:, :],
                                       jnp.zeros_like(cmp[:1, :])],
                                      axis=0)
            oh = cmp - shifted
        oh = oh * (lax.broadcasted_iota(jnp.int32, (128, 1), 0)
                   < jnp.int32(cfg["nb"])).astype(jnp.float32)
        zf = _dot_ss(zs_ref[:], oh.astype(jnp.bfloat16))  # [32, BL]
        gath = zf[0:4] + zf[8:12] + zf[16:20]   # [4, BL] hi+mid+lo
        ux = gath[0:1].reshape(R, LANE)
        gsf = gath[1:2].reshape(R, LANE)
        gef = gath[2:3].reshape(R, LANE)
        bmag = gath[3:4].reshape(R, LANE)
        ig = ig_row.astype(jnp.int32).reshape(R, LANE)

        if cfg["use_custom_eps_b"]:
            beyond = xhi > x_stop
            b_far = b_dw * jnp.sqrt(x_stop / jnp.maximum(xhi, x_stop))
            bmag = jnp.where(beyond, b_far, bmag)
        gden = inv_q / bmag

        ptot = jnp.hypot(pb, pperp)
        gamma_pf = jnp.hypot(ptot / mc, 1.0)

        # ---- Code Block 3 ----------------------------------------------
        changed = do_b3 & (ux != uxp)
        beta_old = uxp / c
        gsf_old = 1.0 / jnp.sqrt(jnp.maximum(1.0 - beta_old * beta_old,
                                             np.float32(1e-30)))
        px_sk_t = gsf_old * (pb + gamma_pf * m * uxp)
        pt_sk_t = jnp.hypot(px_sk_t, pperp)
        g_sk_t = jnp.hypot(pt_sk_t / mc, 1.0)
        pb_tr = gsf * (px_sk_t - g_sk_t * m * ux)
        pb = jnp.where(changed, pb_tr, pb)
        ptot = jnp.hypot(pb, pperp)
        gamma_pf = jnp.hypot(ptot / mc, 1.0)
        uxp = jnp.where(do_b3, ux, uxp)

        r_g_perp = pperp * c * gden
        if cfg["dont_scatter"]:
            esc_ns = do_b3 & (xhi > 10.0 * r_g_perp)
            status = jnp.where(esc_ns, jnp.int32(FINISHED), status)
            reason = jnp.where(esc_ns, jnp.int32(st.R_DOWNSTREAM), reason)
            do_b3 = do_b3 & ~esc_ns

        # pmax escape (both frames)
        px_sk0 = gsf * (pb + gamma_pf * m * ux)
        pt_sk0 = jnp.hypot(px_sk0, pperp)
        esc_pmax = do_b3 & (ptot > pmax_cutoff) & (pt_sk0 > pmax_cutoff)
        status = jnp.where(esc_pmax, jnp.int32(FINISHED), status)
        reason = jnp.where(esc_pmax, jnp.int32(st.R_UPSTREAM_PMAX), reason)
        do_b3 = do_b3 & ~esc_pmax

        # upstream FEB escape
        esc_feb = do_b3 & injf & (xhi < feb_up)
        status = jnp.where(esc_feb, jnp.int32(FINISHED), status)
        reason = jnp.where(esc_feb, jnp.int32(st.R_UPSTREAM_PMAX), reason)
        do_b3 = do_b3 & ~esc_feb

        # age escape
        if cfg["has_age_max"]:
            esc_age = do_b3 & (athi > age_max)
            status = jnp.where(esc_age, jnp.int32(FINISHED), status)
            reason = jnp.where(esc_age, jnp.int32(st.R_AGE), reason)
            do_b3 = do_b3 & ~esc_age

        # radiative losses
        if cfg["do_rad_losses"] and is_el:
            b_cmb_loc = b_cmbz * gef
            bsq = bmag * bmag + b_cmb_loc * b_cmb_loc
            dlnp = np.float32(RAD_LOSS_FAC) * bsq * ptot * tstep
            p_lost = jnp.where(dlnp > 1e-2, ptot / (1.0 + dlnp),
                               ptot * (1.0 - dlnp))
            dead = do_b3 & (p_lost <= 0.0)
            scale = jnp.where(do_b3,
                              p_lost / jnp.maximum(ptot,
                                                   np.float32(1e-30)),
                              1.0)
            pb = pb * scale
            pperp = pperp * scale
            ptot = jnp.hypot(pb, pperp)
            gamma_pf = jnp.hypot(ptot / mc, 1.0)
            status = jnp.where(dead, jnp.int32(FINISHED), status)
            reason = jnp.where(dead, jnp.int32(st.R_RADIATED), reason)
            do_b3 = do_b3 & ~dead

        # pitch-angle scattering (parallel: no phase adjustment)
        if not cfg["dont_scatter"]:
            cos_max = jnp.where(xnp == xn_coarse, cmax_coarse, cmax_fine)
            if cfg["frg_rg0_cm"] > 0.0:
                # custom MFP law lambda = eta*r_g*(r_g/r_ref)^(alpha-1)
                if is_el:
                    p_scat = jnp.where(ptot < pe_crit, pe_crit, ptot)
                else:
                    p_scat = ptot
                lg = jnp.log(jnp.maximum(
                    p_scat * c * gden / np.float32(cfg["frg_rg0_cm"]),
                    np.float32(1e-30)))
                f_frg = jnp.exp(lg * np.float32(cfg["frg_alpha"] - 1.0))
                cos_max = jnp.cos(jnp.sqrt(
                    np.float32(12.0 * np.pi) / (xnp * eta)
                    / jnp.maximum(f_frg, np.float32(1e-30))))
            safe_pt = jnp.maximum(ptot, np.float32(1e-30))
            cos_old = pb / safe_pt
            sin_old = pperp / safe_pt
            cos_dt = 1.0 - u[0] * (1.0 - cos_max)
            sin_dt = jnp.sqrt(jnp.maximum(1.0 - cos_dt * cos_dt, 0.0))
            phi_sc = u[1] * two_pi - np.float32(np.pi)
            cos_new = jnp.clip(cos_old * cos_dt
                               + sin_old * sin_dt * jnp.cos(phi_sc),
                               -1.0, 1.0)
            sin_new = jnp.sqrt(jnp.maximum(1.0 - cos_new * cos_new, 0.0))
            pb = jnp.where(do_b3, ptot * cos_new, pb)
            pperp = jnp.where(do_b3, ptot * sin_new, pperp)

        # gyro period / t_step
        if is_el:
            g_eff = jnp.where(ptot < pe_crit, gamma_e_crit, gamma_pf)
        else:
            g_eff = gamma_pf
        gyro_period = two_pi * g_eff * mc * gden

        # acctime (+ downstream only), pcut save-out
        adding = do_b3 & dwf
        athi, atlo = _ds_add(athi, atlo,
                             jnp.where(adding, tstep * gef, 0.0))

        # tcut tracking (tcut_track!, cuts.jl:149-162): coupled weight
        # and spectra at each acceleration-time threshold.  The fire
        # check runs here for the normal path and again after the
        # retro block (the retro walk keeps adding time,
        # prob_return.jl:297-304); the MXU contraction for the spectra
        # happens once per step on the combined fire mask.
        if cfg["do_tcuts"]:
            n_slots = cfg["n_tcut_slots"]

            def tcut_val_of(idx):
                v = jnp.full_like(athi, np.float32(np.inf))
                for s_i in range(n_slots):
                    v = jnp.where(idx == jnp.int32(s_i),
                                  scf_ref[_SCF_BASE + s_i], v)
                return v

            fire = adding & (athi >= tcut_val_of(tcut_idx))
            fire_slot = jnp.clip(tcut_idx, jnp.int32(0),
                                 jnp.int32(n_slots - 1))
            tcut_idx = jnp.where(fire, tcut_idx + jnp.int32(1),
                                 tcut_idx)
        else:
            fire = jnp.zeros_like(adding)
            fire_slot = jnp.zeros_like(tcut_idx)

        save = adding & (ptot > pcut)
        status = jnp.where(save, jnp.int32(SAVED), status)
        prp = jnp.where(save & (xhi >= prp), xhi * 1.1, prp)
        do_b3 = do_b3 & ~save

        r_g_tot = ptot * c * gden
        xnp = jnp.where(norm & (status == ACTIVE),
                        jnp.where(xhi > r_g_tot, xn_coarse, xn_fine),
                        xnp)

        # ---- movement ---------------------------------------------------
        moving = (status == ACTIVE) & ~retro
        tstep_new = gyro_period / xnp
        tstep = jnp.where(moving, tstep_new, tstep)

        x_old_hi, x_old_lo = xhi, xlo
        done = ~moving
        pb_m = pb
        phi_m = phi
        dx_acc = jnp.zeros_like(pb)
        phi_fin = phi
        u_inj = (u[5], u[6])
        u_phi = (u[7], u[3])
        for k in range(_N_REFLECT_TRIES):
            phi_try = jnp.mod(phi_m + two_pi / xnp, two_pi)
            dx = gsf * (pb_m * tstep / (gamma_pf * m) + ux * tstep)
            x_try_hi = x_old_hi + dx          # hi-word probe only
            cross_up = ((x_try_hi <= 0.0) & (x_old_hi > 0.0) & ~injf
                        & (cfg["dont_dsa"] | (inj_frac < 1.0)))
            fail = cfg["dont_dsa"] | (u_inj[k] > inj_frac)
            refl = ~done & cross_up & fail
            accept = ~done & ~refl
            dx_acc = jnp.where(accept, dx, dx_acc)
            phi_fin = jnp.where(accept, phi_try, phi_fin)
            done = done | accept
            neg = pb_m < 0.0
            pb_m = jnp.where(refl & neg, -pb_m, pb_m)
            phi_m = jnp.where(refl & ~neg, u_phi[k] * two_pi, phi_m)
        phi_try = jnp.mod(phi_m + two_pi / xnp, two_pi)
        dx = gsf * (pb_m * tstep / (gamma_pf * m) + ux * tstep)
        dx_acc = jnp.where(done, dx_acc, dx)
        phi_fin = jnp.where(done, phi_fin, phi_try)
        pb = jnp.where(moving, pb_m, pb)
        phi = jnp.where(moving, phi_fin, phi)
        xhi, xlo = _ds_add(xhi, xlo, jnp.where(moving, dx_acc, 0.0))

        first_dw = moving & (x_old_hi < 0.0) & (xhi >= 0.0)
        dwf = dwf | first_dw
        l_diff0 = eta / 3.0 * r_g_tot * ptot / (m * gamma_pf * u2)
        prp = jnp.where(first_dw, jnp.maximum(prp, l_diff0), prp)
        injf = injf | (moving & dwf & (xhi < 0.0))

        # ---- tallies (all_flux) -----------------------------------------
        x_row2 = xhi.reshape(1, BL)
        if "zone" in cfg["prof_kill"]:
            ig2_row = jnp.zeros((1, BL), jnp.float32) + 3.0
        else:
            _, ig2_row = zone_of(x_row2)
        ig_new = jnp.clip(ig2_row.astype(jnp.int32).reshape(R, LANE),
                          jnp.int32(0), jnp.int32(cfg["nb"] - 2))
        ig_new = jnp.where(moving, ig_new, ig)

        px_sk = gsf * (pb + gamma_pf * m * ux)
        pt_sk = jnp.hypot(px_sk, pperp)
        g_sk = jnp.hypot(pt_sk / mc, 1.0)
        pz_sk = -pperp * jnp.sin(phi)
        spike = pt_sk > jnp.abs(px_sk) * np.float32(ALL_FLUX_SPIKE_AWAY)
        inv_vx = jnp.where(
            spike,
            jnp.abs(np.float32(ALL_FLUX_SPIKE_AWAY) / ux),
            jnp.abs(g_sk * m / jnp.where(px_sk == 0.0,
                                         np.float32(1e-30), px_sk)))
        rel = (g_sk - 1.0) > np.float32(E_REL_PT)
        e_add = jnp.where(rel, (g_sk - 1.0) * e0 * w_lane,
                          pt_sk * pt_sk / (2.0 * m) * w_lane)

        moved_down = xhi > x_old_hi
        one = jnp.int32(1)
        lo_z = jnp.where(moved_down, ig + one, ig_new + one)
        hi_z = jnp.where(moved_down, ig_new, ig)
        lo_z = jnp.where(~moved_down & injf,
                         jnp.maximum(lo_z, jnp.int32(cfg["i_grid_feb"] + 1)),
                         lo_z)
        crossed = moving & (hi_z >= lo_z)
        lo_c = jnp.clip(lo_z, jnp.int32(0), jnp.int32(cfg["nb"] - 1))
        hi_c = jnp.clip(hi_z, jnp.int32(0), jnp.int32(cfg["nb"] - 1))

        sign = jnp.where(moved_down, np.float32(1.0), np.float32(-1.0))
        on = crossed.astype(jnp.float32)
        v_pxx = sign * px_sk * w_lane * g0u0 * on
        v_pxz = jnp.abs(pz_sk) * w_lane * g0u0 * on
        v_en = sign * e_add * g0u0 * on
        v_n = (crossed & ~injf).astype(jnp.float32)

        # psd bins: faithful port of models/psd_bins.psd_bin_momentum
        # / psd_bin_angle (get_psd_bins.jl:16-39, 73-97)
        inv_ln10 = np.float32(1.0 / np.log(10.0))
        lp = (jnp.log(jnp.maximum(pt_sk, np.float32(1e-37))) * inv_ln10
              - np.float32(np.log10(cfg["psd_mom_min"])))
        ipb = (jnp.floor(lp * np.float32(cfg["bins_per_dec_mom"]))
               .astype(jnp.int32) + jnp.int32(1))
        ipb = jnp.where(pt_sk < np.float32(cfg["psd_mom_min"]),
                        jnp.int32(0), ipb)
        ipb = jnp.clip(ipb, jnp.int32(0), jnp.int32(cfg["n_mom"]))

        p_cos = jnp.clip(-px_sk / jnp.maximum(pt_sk, np.float32(1e-37)),
                         -1.0, 1.0)
        jlin = jnp.int32(cfg["n_theta"]) - jnp.floor(
            (p_cos + 1.0) / np.float32(cfg["dcos"])).astype(jnp.int32)
        # arccos via the small-angle series (the log-theta branch is
        # selected only for p_cos >= cos_fine, i.e. theta <~ 0.25 rad,
        # where the 3-term series is accurate to ~1e-6 rad — far below
        # a bin width; Mosaic has no acos primitive)
        q = jnp.maximum(1.0 - p_cos, 0.0)
        theta = jnp.sqrt(2.0 * q) * (1.0 + q * np.float32(1.0 / 12.0)
                                     + q * q * np.float32(3.0 / 160.0))
        lt = (jnp.log(jnp.maximum(theta, np.float32(1e-37))) * inv_ln10
              - np.float32(np.log10(cfg["theta_min"])))
        jlog = (jnp.floor(lt * np.float32(cfg["bins_per_dec_theta"]))
                .astype(jnp.int32) + jnp.int32(1))
        jlog = jnp.where(theta < np.float32(cfg["theta_min"]),
                         jnp.int32(0), jlog)
        jt = jnp.where(p_cos < np.float32(cfg["cos_fine"]), jlin, jlog)
        jt = jnp.where(pt_sk <= 0.0, jnp.int32(0), jt)
        jt = jnp.clip(jt, jnp.int32(0), jnp.int32(cfg["n_theta"]))

        kind = (~injf).astype(jnp.int32)
        cell = ((ipb * jnp.int32(2) + kind) * jnp.int32(cfg["n_theta"] + 1)
                + jt - cb)
        psd_w = w_lane * inv_vx * on

        # scalar min in f32 (cells < 2^24 are exact; Mosaic's i32
        # scalar reductions recurse in the lowering's convert helper).
        # Records already outside the sliding window (cell < 0 or
        # >= n_cells_pad) are dropped-and-counted regardless, so they
        # must NOT drag the band anchor: one below-window straggler
        # would otherwise pull blo_c to the window bottom and shed the
        # whole step's in-window bulk (the --dsa 5%/segment oob bug).
        cellf = cell.astype(jnp.float32)
        in_win = (crossed & (cell >= 0)
                  & (cell < jnp.int32(n_cells_pad)))
        blo = jnp.min(jnp.where(in_win, cellf,
                                np.float32(1e9))).astype(jnp.int32)
        blo_c = jnp.clip(blo, jnp.int32(0), jnp.int32(n_cells_pad - band))
        oob = crossed & ((cell < blo_c)
                         | (cell >= blo_c + jnp.int32(band)))

        # Two-level band encoding (fine > 0): each 1024-lane chunk
        # gets its OWN anchor, and when every chunk's in-window spread
        # fits the `fine` band this step, the contraction below runs
        # [fine, K] per chunk instead of [band, K] — the partition
        # sort keeps blocks momentum-coherent, so per-chunk spreads
        # are far narrower than the block's.  Steps where any chunk
        # overflows `fine` (population freshly mixed, relativistic
        # angular fan) fall back to the block-level band — so this is
        # a pure fast path, never a new drop source.
        n_ch_a = BL // (8 * LANE)
        use_fine = 0 < fine < band
        if use_fine:
            # all reshapes in f32/i32: Mosaic cannot reshape i1
            # vectors ("tpu.reshape (32x128xi1) -> (4x1024xi1)" fails
            # to lower), and a bool jnp.all reduction trips the
            # scalar-squeeze lowering — so masks ride as f32 and the
            # predicate is an f32 max-compare
            cellf4 = cellf.reshape(n_ch_a, 8 * LANE)
            in4 = (in_win.astype(jnp.float32)
                   .reshape(n_ch_a, 8 * LANE)) > 0.0
            blo4 = jnp.min(jnp.where(in4, cellf4, np.float32(1e9)),
                           axis=1, keepdims=True)
            bhi4 = jnp.max(jnp.where(in4, cellf4, np.float32(-1.0)),
                           axis=1, keepdims=True)
            blo4_c = jnp.clip(blo4.astype(jnp.int32), jnp.int32(0),
                              jnp.int32(n_cells_pad - fine))
            blo4f = blo4_c.astype(jnp.float32)
            worst = jnp.max(bhi4 - blo4f)
            fine_ok = worst < np.float32(fine)
            # cell < 0 is < blo4_c and cell >= n_cells_pad is
            # >= blo4_c + fine (blo4_c <= n_cells_pad - fine), so the
            # two comparisons also cover the out-of-window cases
            oob_f4 = jnp.where(
                (cellf4 < blo4f)
                | (cellf4 >= blo4f + np.float32(fine)),
                crossed.astype(jnp.float32).reshape(n_ch_a, 8 * LANE),
                np.float32(0.0))
            # select between f32 masks (Mosaic cannot arith.select
            # on i1 vectors with a broadcast scalar condition)
            oob_f = jnp.where(fine_ok, oob_f4.reshape(R, LANE),
                              oob.astype(jnp.float32))
        else:
            oob_f = oob.astype(jnp.float32)
        aux_out[A_OVERFLOW:A_OVERFLOW + 1, :] += jnp.sum(
            oob_f, axis=0, keepdims=True)
        aw = jnp.abs(w_lane * inv_vx) * on
        aux_out[A_OOBW:A_OOBW + 1, :] += jnp.sum(
            jnp.where(oob_f > 0.0, aw, 0.0), axis=0, keepdims=True)
        aux_out[A_WTOT:A_WTOT + 1, :] += jnp.sum(aw, axis=0,
                                                 keepdims=True)

        # stochastic rounding to the bf16 grid (unbiased; dither keyed
        # by lane slot x per-lane step count so successive steps and
        # lanes decorrelate)
        dkey = idx0 ^ (nsteps << jnp.int32(12))
        w_sr = _sr_bf16_bits(psd_w, dkey, seed)
        vx_sr = _sr_bf16_bits(v_pxx, dkey, seed + jnp.int32(101))
        vz_sr = _sr_bf16_bits(v_pxz, dkey, seed + jnp.int32(202))
        ve_sr = _sr_bf16_bits(v_en, dkey, seed + jnp.int32(303))

        K = 8 * LANE        # 1024-lane tally chunks
        n_ch = BL // K
        if "tally" not in cfg["prof_kill"]:
            cell4 = cell.reshape(n_ch, K)
            lo4 = lo_c.reshape(n_ch, K)
            hi4 = hi_c.reshape(n_ch, K)
            wsr4 = w_sr.reshape(n_ch, K)
            vx4 = vx_sr.reshape(n_ch, K)
            vz4 = vz_sr.reshape(n_ch, K)
            ve4 = ve_sr.reshape(n_ch, K)
            vn4 = v_n.reshape(n_ch, K)
            z_iota2 = lax.broadcasted_iota(jnp.int32, (ZPAD, K), 0)
            # zone patterns + flux tallies once per chunk; the per-chunk
            # b matrices are reused by every band tile below
            bs = []
            for ch in range(n_ch):
                lr = lo4[ch:ch + 1, :]
                hr = hi4[ch:ch + 1, :]
                pat = ((z_iota2 == lr).astype(jnp.float32)
                       - (z_iota2 == hr + jnp.int32(1))
                       .astype(jnp.float32))
                patb = pat.astype(jnp.bfloat16)
                bs.append(patb * wsr4[ch:ch + 1, :].astype(jnp.bfloat16))
                vals = jnp.concatenate(
                    [vx4[ch:ch + 1], vz4[ch:ch + 1], ve4[ch:ch + 1],
                     vn4[ch:ch + 1]], axis=0).astype(jnp.bfloat16)
                aux_out[A_FLUX0:A_FLUX0 + 4, :] += _dot_ll(vals, patb)
            # band contraction in TILE-row tiles: the [tile, K] one-hot
            # is the VMEM-dominant intermediate (a monolithic
            # [band, K] bf16 one-hot is 17 MB at the derived
            # relativistic band of 8448 cells — it OOMed the 16 MB
            # scoped-VMEM limit), so wide bands pay more MXU passes of
            # the same proven [<=2048, K] shape instead of more VMEM.
            # Per-cell accumulation order is unchanged (each cell lives
            # in exactly one tile and still sums chunks in order), so
            # band <= 2048 configs are bit-identical to the untiled
            # code.
            def _coarse_contract():
                for t0 in range(0, band, _TILE):
                    tw = min(_TILE, band - t0)
                    c_iota = (lax.broadcasted_iota(jnp.int32, (tw, K),
                                                   0)
                              + (blo_c + jnp.int32(t0)))
                    for ch in range(n_ch):
                        cr = cell4[ch:ch + 1, :]
                        a = (cr == c_iota).astype(jnp.bfloat16)
                        d = _dot_ll(a, bs[ch])               # [tw, ZPAD]
                        if ch == 0:
                            psd_scr[pl.ds(0, tw), :] = d
                        else:
                            psd_scr[pl.ds(0, tw), :] += d
                    psd_out[pl.ds(blo_c + jnp.int32(t0), tw), :] += \
                        psd_scr[pl.ds(0, tw), :]

            if use_fine:
                # fine path: [fine, K] one-hot per chunk at its own
                # anchor — band/fine x fewer MACs than the block band
                # +1 per fine step after the lane-sum (house style:
                # full-lane rows, summed by the consumer)
                aux_out[A_FINE:A_FINE + 1, :] += jnp.where(
                    fine_ok, np.float32(1.0 / LANE),
                    np.float32(0.0)) * jnp.ones((1, LANE), jnp.float32)

                @pl.when(fine_ok)
                def _():
                    for ch in range(n_ch):
                        base = blo4_c[ch, 0]
                        c_iota = (lax.broadcasted_iota(
                            jnp.int32, (fine, K), 0) + base)
                        a = (cell4[ch:ch + 1, :]
                             == c_iota).astype(jnp.bfloat16)
                        d = _dot_ll(a, bs[ch])               # [fine, ZPAD]
                        psd_out[pl.ds(base, fine), :] += d

                @pl.when(jnp.logical_not(fine_ok))
                def _():
                    _coarse_contract()
            else:
                _coarse_contract()

        # escaping flux at the upstream FEB
        esc_cross = (moving & injf & (xhi < feb_up)
                     & (x_old_hi >= feb_up))
        aux_out[A_EN_ESC:A_EN_ESC + 1, :] += jnp.sum(
            jnp.where(esc_cross, e_add * g0u0, 0.0), axis=0,
            keepdims=True)
        aux_out[A_PX_ESC:A_PX_ESC + 1, :] += jnp.sum(
            jnp.where(esc_cross, -px_sk * w_lane * g0u0, 0.0), axis=0,
            keepdims=True)

        # ---- ion <-> electron energy transfer ---------------------------
        # (do_energy_transfer, particle_loop.jl:652-723; XLA twin in
        # ops/step.py).  Table gathers ride [128, BL] one-hot matmuls
        # against the 3-way bf16 split of eps_target / recv_prefix in
        # et_ref; the ion pool donation scatters into aux row A_POOL
        # as a (lo, hi+1) difference pattern, exactly like the flux
        # channels.
        if cfg["do_energy_transfer"]:
            z_iota_bl = lax.broadcasted_iota(jnp.int32, (128, BL), 0)
            hi_t = jnp.minimum(hi_c, jnp.int32(cfg["i_shock"]))
            xfer = (crossed & ~injf & (x_old_hi <= 0.0)
                    & (hi_t >= lo_c))
            hi_row = hi_t.reshape(1, BL)
            lo_row = lo_c.reshape(1, BL)
            if cfg["is_electron"]:
                pat_recv = ((z_iota_bl == hi_row + 1)
                            .astype(jnp.float32)
                            - (z_iota_bl == lo_row).astype(jnp.float32))
                gp = _dot_ss(et_ref[:], pat_recv.astype(jnp.bfloat16))
                gain = ((gp[3:4] + gp[4:5] + gp[5:6]).reshape(R, LANE)
                        * np.float32(cfg["electron_weight_fac"]))
                g_f = jnp.where(xfer & (gain > 0.0),
                                gamma_pf + gain / e0, gamma_pf)
            else:
                oh_hi = (z_iota_bl == hi_row).astype(jnp.bfloat16)
                ep = _dot_ss(et_ref[:], oh_hi)
                eps_stop = (ep[0:1] + ep[1:2] + ep[2:3]).reshape(R, LANE)
                es0 = _dot_ss(et_ref[:], oh.astype(jnp.bfloat16))
                eps_start = (es0[0:1] + es0[1:2]
                             + es0[2:3]).reshape(R, LANE)
                g_f = 1.0 + (gamma_pf - 1.0) * (1.0 - eps_stop) \
                    / jnp.maximum(1.0 - eps_start, np.float32(1e-30))
                donate = xfer & (eps_stop > 0.0)
                g_f = jnp.where(donate, jnp.maximum(g_f, 1.0), gamma_pf)
                n_range = (hi_t - lo_c + 1).astype(jnp.float32)
                inc = jnp.where(
                    donate, (gamma_pf - g_f) * e0 * w_lane
                    / jnp.maximum(n_range, 1.0), 0.0)
                pat_pool = ((z_iota_bl == lo_row).astype(jnp.float32)
                            - (z_iota_bl == hi_row + 1)
                            .astype(jnp.float32)).astype(jnp.bfloat16)
                dkey_et = idx0 ^ (nsteps << jnp.int32(12))
                inc_sr = _sr_bf16_bits(inc, dkey_et,
                                       seed + jnp.int32(505))
                aux_out[A_POOL:A_POOL + 1, :] += _dot_ll(
                    inc_sr.reshape(1, BL).astype(jnp.bfloat16), pat_pool)
            scale = (jnp.sqrt(jnp.maximum(g_f * g_f - 1.0, 0.0))
                     / jnp.maximum(
                         jnp.sqrt(jnp.maximum(
                             gamma_pf * gamma_pf - 1.0, 0.0)),
                         np.float32(1e-30)))
            chg = xfer & (g_f != gamma_pf)
            scale = jnp.where(chg, scale, 1.0)
            pb = pb * scale
            pperp = pperp * scale
            ptot = jnp.hypot(pb, pperp)
            gamma_pf = jnp.hypot(ptot / mc, 1.0)

        # ---- downstream logic -------------------------------------------
        jret = jnp.zeros_like(jret)
        if is_el:
            low_e = ptot < pe_crit
            v_fac = jnp.where(
                low_e,
                (pe_crit * c * gden) * pe_crit / (m * gamma_e_crit * u2),
                (ptot * c * gden) * ptot / (m * gamma_pf * u2))
        else:
            v_fac = (ptot * c * gden) * ptot / (m * gamma_pf * u2)
        l_diff = eta / 3.0 * v_fac

        esc_feb_dw = moving & (feb_dw > 0.0) & (xhi > feb_dw)
        esc_far = (moving & ~esc_feb_dw & (xhi > 1.1 * prp)
                   & (xhi > 6.91 * l_diff))
        do_ret = moving & ~esc_feb_dw & ~esc_far

        past_end = do_ret & (xhi >= x_stop)
        just_end = past_end & (x_old_hi < x_stop)
        gyro_tmp = jnp.ones_like(ptot)
        if cfg["use_custom_eps_b"]:
            gyro_tmp = jnp.sqrt(x_stop / jnp.maximum(xhi, x_stop))
        r_g2 = ptot * c * gyro_tmp * inv_q / bmag2
        l_diff2 = eta / 3.0 * r_g2 * ptot / (m * gamma_pf * u2)
        prp = jnp.where(just_end, xhi + 3.0 * l_diff2, prp)

        crossed_prp = (past_end & ~just_end & (x_old_hi < prp)
                       & (xhi >= prp))
        vt = ptot / (gamma_pf * m)
        p_ret = ((vt - u2) / (vt + u2)) ** 2
        no_ret = crossed_prp & ((vt < u2) | (u[2] > p_ret))
        status = jnp.where(no_ret, jnp.int32(FINISHED), status)
        reason = jnp.where(no_ret, jnp.int32(st.R_DOWNSTREAM), reason)
        returns = crossed_prp & ~no_ret
        if cfg["do_retro"]:
            retro = retro | returns
            xhi = jnp.where(returns, prp, xhi)
            xlo = jnp.where(returns, 0.0, xlo)
            phi = jnp.where(returns, u[4] * two_pi, phi)
        else:
            vmu_min = -vt
            span = u2 - vmu_min
            vmu = u2 - span * jnp.sqrt(u[3])
            mu = jnp.clip(vmu / jnp.maximum(vt, np.float32(1e-30)),
                          -1.0, 1.0)
            pb_ret = ptot * mu
            pperp_ret = jnp.sqrt(jnp.maximum(ptot * ptot
                                             - pb_ret * pb_ret, 0.0))
            pb = jnp.where(returns, pb_ret, pb)
            pperp = jnp.where(returns, pperp_ret, pperp)
            phi = jnp.where(returns, u[4] * two_pi, phi)
            xhi = jnp.where(returns, prp, xhi)
            xlo = jnp.where(returns, 0.0, xlo)
            jret = jret | returns

        if is_el:
            idle = past_end & ~just_end & ~crossed_prp
            check = (idle & (ptot < pcut_prev)
                     & (nsteps % jnp.int32(1000) == jnp.int32(0)))
            r_g = ptot * c * gden
            l_d = eta / 3.0 * r_g * ptot / (m * gamma_pf * u2)
            far = xhi > 2.0e3 * l_d
            shrink = jnp.where(
                far, 0.8 * xhi,
                jnp.minimum(prp, x_stop + l_d
                            * (pcut_prev
                               / jnp.maximum(ptot, np.float32(1e-30)))
                            ** 5))
            prp = jnp.where(check, shrink, prp)

        esc = esc_feb_dw | esc_far
        status = jnp.where(esc, jnp.int32(FINISHED), status)
        reason = jnp.where(esc, jnp.int32(st.R_DOWNSTREAM), reason)

        # downstream-escape pressure/KE sums
        esc_dw = moving & (status == FINISHED) & (reason == st.R_DOWNSTREAM)
        vel = ptot / m
        vel = jnp.where((gamma_pf - 1.0) >= np.float32(E_REL_PT),
                        vel / gamma_pf, vel)
        aux_out[A_SUM_P:A_SUM_P + 1, :] += jnp.sum(
            jnp.where(esc_dw, ptot / 3.0 * vel * w_lane, 0.0),
            axis=0, keepdims=True)
        aux_out[A_SUM_KE:A_SUM_KE + 1, :] += jnp.sum(
            jnp.where(esc_dw, (gamma_pf - 1.0) * e0 * w_lane, 0.0),
            axis=0, keepdims=True)

        # ---- retro walk --------------------------------------------------
        if cfg["do_retro"]:
            in_retro = act & retro
            xn_retro = np.float32(10.0)
            b2 = b_dw
            if cfg["use_custom_eps_b"]:
                b2 = b2 * jnp.sqrt(x_stop / jnp.maximum(xhi, x_stop))
            gden_r = inv_q / b2
            u_back = -ux_dw
            ptot_r = jnp.hypot(pb, pperp)
            gamma_r = jnp.hypot(ptot_r / mc, 1.0)
            t_fac = two_pi * mc * gden_r / xn_retro
            t_step_r = t_fac * gamma_r
            dx_r = gsf_dw * (pb * t_fac / m + u_back * t_step_r)
            x_try_hi = xhi + dx_r
            at_d = jnp.where(in_retro, t_step_r * gef_dw, 0.0)
            athi, atlo = _ds_add(athi, atlo, at_d)
            # tcut tracking continues during the replay
            # (prob_return.jl:297-304)
            if cfg["do_tcuts"]:
                fire_r = in_retro & (athi >= tcut_val_of(tcut_idx))
                fire_slot = jnp.where(
                    fire_r,
                    jnp.clip(tcut_idx, jnp.int32(0),
                             jnp.int32(cfg["n_tcut_slots"] - 1)),
                    fire_slot)
                fire = fire | fire_r
                tcut_idx = jnp.where(fire_r, tcut_idx + jnp.int32(1),
                                     tcut_idx)
            phi_las = two_pi * u[0]
            mu_las = 2.0 * u[1] - 1.0
            p_new = ptot_r
            if cfg["do_rad_losses"] and is_el:
                b_cmb_loc = b_cmbz * gef_dw
                bsq = b2 * b2 + b_cmb_loc * b_cmb_loc
                dlnp = np.float32(RAD_LOSS_FAC) * bsq * ptot_r * t_step_r
                p_new = jnp.where(dlnp > 1e-2, ptot_r / (1.0 + dlnp),
                                  ptot_r * (1.0 - dlnp))
            dead_r = in_retro & (p_new <= 0.0)
            pb_n = p_new * mu_las
            pperp_n = jnp.sqrt(jnp.maximum(p_new * p_new - pb_n * pb_n,
                                           0.0))
            returned = in_retro & ~dead_r & (x_try_hi < prp)
            xhi = jnp.where(in_retro,
                            jnp.where(returned, prp, x_try_hi), xhi)
            xlo = jnp.where(in_retro, 0.0, xlo)
            pb = jnp.where(in_retro, pb_n, pb)
            pperp = jnp.where(in_retro, pperp_n, pperp)
            phi = jnp.where(in_retro, phi_las, phi)
            status = jnp.where(dead_r, jnp.int32(FINISHED), status)
            reason = jnp.where(dead_r, jnp.int32(st.R_RADIATED), reason)
            retro = retro & ~(returned | dead_r)
            jret = jret | returned

        # tcut coupled-weight/spectra contraction: tc_out[ip, slot] +=
        # fired weight, one [TC_pad, BL] x [ZPAD, BL] one-hot matmul
        # per step (~6% of the psd band contraction's MACs).  The
        # coupled weight totals are the ip-marginal, recovered by the
        # wrapper (tcut_track!, cuts.jl:160-162 adds the same weight
        # to both arrays).
        if cfg["do_tcuts"]:
            ptot_fin = jnp.hypot(pb, pperp)
            lp_pf = (jnp.log(jnp.maximum(ptot_fin, np.float32(1e-37)))
                     * inv_ln10
                     - np.float32(np.log10(cfg["psd_mom_min"])))
            ip_pf = (jnp.floor(lp_pf
                               * np.float32(cfg["bins_per_dec_mom"]))
                     .astype(jnp.int32) + jnp.int32(1))
            ip_pf = jnp.where(ptot_fin < np.float32(cfg["psd_mom_min"]),
                              jnp.int32(0), ip_pf)
            ip_pf = jnp.clip(ip_pf, jnp.int32(0),
                             jnp.int32(cfg["n_mom"]))
            wv = jnp.where(fire, w_lane, 0.0)
            dkey_tc = idx0 ^ (nsteps << jnp.int32(12))
            wv_sr = _sr_bf16_bits(wv, dkey_tc, seed + jnp.int32(404))
            tc_pad = cfg["tc_pad"]
            ip_row = ip_pf.reshape(1, BL)
            sl_row = fire_slot.reshape(1, BL)
            a_tc = (lax.broadcasted_iota(jnp.int32, (tc_pad, BL), 0)
                    == ip_row).astype(jnp.bfloat16)
            b_tc = ((lax.broadcasted_iota(jnp.int32, (ZPAD, BL), 0)
                     == sl_row).astype(jnp.float32)
                    * wv_sr.reshape(1, BL)).astype(jnp.bfloat16)
            tc_out[:] += _dot_ll(a_tc, b_tc)

        # helix cap
        nsteps = nsteps + (act).astype(jnp.int32)
        capped = ((status == ACTIVE)
                  & (nsteps >= jnp.int32(MAX_HELIX_STEPS)))
        status = jnp.where(capped, jnp.int32(FINISHED), status)
        reason = jnp.where(capped, jnp.int32(st.R_DOWNSTREAM), reason)

        flags = ((dwf.astype(jnp.int32) * jnp.int32(FL_DW))
                 | (injf.astype(jnp.int32) * jnp.int32(FL_INJ))
                 | (retro.astype(jnp.int32) * jnp.int32(FL_RETRO))
                 | (jret.astype(jnp.int32) * jnp.int32(FL_JRET)))
        return ((pb, pperp, phi, uxp, xnp, tstep, prp, xhi, xlo,
                 athi, atlo, status, reason, nsteps, flags, tcut_idx),
                None)

    init = (fs_ref[F_PB], fs_ref[F_PP], fs_ref[F_PHI],
            fs_ref[F_UXP], fs_ref[F_XNP], fs_ref[F_TST],
            fs_ref[F_PRP], fs_ref[F_XHI], fs_ref[F_XLO],
            fs_ref[F_ATHI], fs_ref[F_ATLO],
            is_ref[I_STATUS], is_ref[I_REASON],
            is_ref[I_NSTEPS], is_ref[I_FLAGS], is_ref[I_TCUT])

    def body(si, sv):
        out, _ = step(sv, None)
        return out

    # i32 bounds: an i64 loop counter aborts the Mosaic layout pass
    fin = lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), body, init)
    (pb, pperp, phi, uxp, xnp, tstep, prp, xhi, xlo, athi, atlo,
     status, reason, nsteps, flags, tcut_idx) = fin

    fs_out[F_W] = w_lane
    fs_out[F_PB] = pb
    fs_out[F_PP] = pperp
    fs_out[F_PHI] = phi
    fs_out[F_UXP] = uxp
    fs_out[F_XNP] = xnp
    fs_out[F_TST] = tstep
    fs_out[F_PRP] = prp
    fs_out[F_XHI] = xhi
    fs_out[F_XLO] = xlo
    fs_out[F_ATHI] = athi
    fs_out[F_ATLO] = atlo
    is_out[I_STATUS] = status
    is_out[I_REASON] = reason
    is_out[I_NSTEPS] = nsteps
    is_out[I_FLAGS] = flags
    is_out[I_KEY0] = is_ref[I_KEY0]
    is_out[I_KEY1] = is_ref[I_KEY1]
    is_out[I_TCUT] = tcut_idx
    aux_out[A_ACTIVE:A_ACTIVE + 1, :] += jnp.sum(
        (status == ACTIVE).astype(jnp.float32), axis=0, keepdims=True)

# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def _win_cap_rows() -> int:
    """VMEM cap on the PSD accumulator rows (cells), 128-aligned."""
    cap = int(os.environ.get("MCS_MEGA_WINDOW", "16384"))
    return -(-cap // 128) * 128


def _win_margin() -> int:
    """ip-bin headroom the sliding window keeps above the live
    population's shock-frame momentum bound (covers within-launch
    acceleration: a lane gains at most ~a first-Fermi-cycle factor
    between window re-anchors)."""
    return int(os.environ.get("MCS_MEGA_WIN_MARGIN", "12"))


def _oob_tol() -> float:
    """Accepted dropped-|weight| fraction for WINDOWED configs.

    A sliding momentum window cannot cover the measure-zero tail of
    crossings whose shock-frame momentum nearly cancels (pt_sk -> 0
    needs |px_pf| ~ gamma_pf*m*ux to f32 cancellation); the reference
    tallies those into otherwise-empty low bins with negligible
    weight.  Records dropped beyond this fraction raise loudly.
    Full-coverage configs keep the strict any-record-raises check."""
    return float(os.environ.get("MCS_MEGA_OOB_TOL", "1e-5"))


def _tally_rows_budget() -> int:
    """Combined VMEM row budget for the window accumulator + the
    per-step band-tile scratch ([rows, ZPAD] f32 each; 20,480 rows =
    10.5 MB).  The band contraction is tiled at _TILE rows (the
    [tile, K] one-hot is the dominant transient: a monolithic
    [8448, 1024] bf16 one-hot OOMed the 16 MB scoped-VMEM limit on
    the first gamma0=5 compile), so the budget constrains
    acc_rows + min(band, _TILE) — nearly band-independent."""
    return int(os.environ.get("MCS_MEGA_TALLY_ROWS", 20480))


def _tally_geom(n_cells: int, band: int = 0):
    """(band, acc_rows, full_pad): per-step band size, VMEM
    accumulator rows (a sliding momentum WINDOW of the difference
    array when the full array exceeds the VMEM cap), and the padded
    full-array rows carried in HBM.  A derived `band` (see
    derive_mega_band) wider than the 2048 default shrinks the window
    to stay inside the combined VMEM row budget."""
    band = band or min(int(os.environ.get("MCS_MEGA_BAND", 2048)),
                       -(-n_cells // 128) * 128)
    full_pad = -(-max(n_cells, band) // 128) * 128
    acc_rows = min(full_pad, max(_win_cap_rows(), band))
    tile = min(band, _TILE)
    if acc_rows < full_pad and acc_rows + tile > _tally_rows_budget():
        acc_rows = max(band, _tally_rows_budget() - tile)
    return band, acc_rows, full_pad


def derive_mega_band(beta0: float, dont_scatter: bool,
                     bins_per_dec_mom: int, n_theta: int,
                     n_cells: int) -> int:
    """Per-step tally-band width derived from the config's physics.

    The band must cover one step's crossing records of one
    momentum-sorted lane block.  Two spread sources:

      * block momentum incoherence (lanes diverge between re-sorts) —
        covered by the 2048-cell base, empirically sufficient for
        every nonrelativistic config (0.64 decades at baseline
        binning);
      * the pitch-angle spread of SHOCK-frame momentum at fixed plasma
        momentum once scattering isotropizes the population: an
        ultra-relativistic particle's pt_sk spans a factor
        (1+beta0)/(1-beta0) across mu (transformers.jl:440-476) — a
        factor 98 ~ two decades at the reference's gamma0 = 5
        (mc_in.toml:19), which is what overflowed the fixed band on
        the --dsa science run (STATUS.md round 6).

    The angular term is zero with scattering off (crossing pitches
    stay coherent) and is absorbed by the base when it is sub-bin, so
    nonrelativistic and no-scatter configs keep the 2048-cell band
    (and its measured throughput) bit-for-bit.

    An explicit MCS_MEGA_BAND env setting overrides the derivation
    (experiments only)."""
    env = os.environ.get("MCS_MEGA_BAND")
    if env is not None:
        return min(int(env), -(-n_cells // 128) * 128)
    base = min(2048, -(-n_cells // 128) * 128)
    if dont_scatter or beta0 <= 0.0:
        return base
    ang_dec = math.log10((1.0 + beta0) / max(1.0 - beta0, 1e-12))
    extra_bins = math.ceil(max(ang_dec * bins_per_dec_mom - 0.5, 0.0))
    if extra_bins == 0:
        return base
    slab = 2 * (n_theta + 1)
    band = base + -(-(extra_bins * slab) // 128) * 128
    return min(band, -(-n_cells // 128) * 128)


def check_oob(oob, n_cells: int, band: int = 0, seg=None) -> None:
    """Raise on dropped crossing records.  `oob` is the accumulated
    [count, dropped |weight|, total |weight|] vector.  Full-coverage
    configs: ANY drop raises (band overflow is a band-size problem).
    Windowed configs: drops below MCS_MEGA_OOB_TOL of the total
    tallied |weight| are the accepted near-cancellation tail (see
    _oob_tol); more raises.  `seg` (when given) marks an in-flight
    ladder check: the raise names the segment instead of burning the
    rest of the run (the round-6 --dsa run spent its full wall clock
    before the post-ladder check fired)."""
    oob = np.asarray(oob)
    n_count, oobw, wtot = float(oob[0]), float(oob[1]), float(oob[2])
    if n_count == 0:
        return
    band, acc_rows, full_pad = _tally_geom(n_cells, band)
    at = f" by segment {seg}" if seg is not None else ""
    if acc_rows < full_pad:
        if oobw <= _oob_tol() * max(wtot, 1e-300):
            return
        raise RuntimeError(
            f"megakernel tally window overflow{at}: {n_count:.0f} "
            f"records ({oobw:.3e} of {wtot:.3e} |weight| = "
            f"{oobw / max(wtot, 1e-300):.2e}) fell outside the "
            f"{band}-cell band / {acc_rows}-cell sliding momentum "
            f"window; raise MCS_MEGA_WINDOW / MCS_MEGA_WIN_MARGIN / "
            f"MCS_MEGA_OOB_TOL, or rerun with MCS_MEGAKERNEL=0")
    raise RuntimeError(
        f"megakernel tally band overflow{at}: {n_count:.0f} crossing "
        f"records fell outside the {band}-cell window; rerun with "
        f"MCS_MEGA_BAND larger or MCS_MEGAKERNEL=0")


def megakernel_supported(ss, p_dtype, psd_dtype) -> bool:
    """Backend-independent static gate: configs the megakernel
    supports (others take the XLA helix_step path).  tcuts and
    ion<->electron energy transfer run in-kernel; x_spec detectors and
    f64 momenta stay XLA-only.  The PSD difference array either fits
    the VMEM accumulator ([acc_rows, 128] f32 <= ~8 MB of the
    ~16 MB/core budget) whole, or rides a sliding momentum-bin window
    re-anchored every launch from the live population (the
    reference-parity baseline: 55,040 cells, 51-ip-bin window = 5.1
    decades of shock-frame momentum per launch)."""
    n_cells = (ss.n_mom + 1) * 2 * (ss.n_theta + 1)
    slab = 2 * (ss.n_theta + 1)
    band, acc_rows, full_pad = _tally_geom(n_cells, ss.mega_band)
    if acc_rows < full_pad:
        # windowed: the (budget-shrunk) window must still cover the
        # re-anchor margin + a usable momentum span, and window +
        # band-tile scratch must fit the combined VMEM row budget (a
        # derived band too wide for VMEM falls back to the XLA
        # engine, which tallies the full array and cannot overflow)
        fits = (acc_rows // slab >= _win_margin() + 20
                and acc_rows >= band
                and acc_rows + min(band, _TILE)
                <= _tally_rows_budget())
        if not fits:
            logging.getLogger(__name__).warning(
                "megakernel unsupported here: derived tally band "
                "(%d cells) + sliding window (%d rows) exceed the "
                "VMEM row budget (%d) or the window coverage floor — "
                "falling back to the XLA engine", band, acc_rows,
                _tally_rows_budget())
            return False
    return (ss.parallel and ss.n_xspec == 0
            and p_dtype == jnp.float32 and psd_dtype == jnp.float32
            and ss.nb + 1 <= ZPAD)


def megakernel_ok(ss, p_dtype, psd_dtype) -> bool:
    """megakernel_supported AND the megakernel can actually run here
    (TPU backend, not opted out via MCS_MEGAKERNEL=0)."""
    if os.environ.get("MCS_MEGAKERNEL", "1") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    return megakernel_supported(ss, p_dtype, psd_dtype)


def _static_cfg(ss, n_tcut_slots: int = 1):
    return dict(
        eta_mfp=float(ss.eta_mfp),
        xn_per_coarse=float(ss.xn_per_coarse),
        xn_per_fine=float(ss.xn_per_fine),
        dont_scatter=bool(ss.dont_scatter),
        dont_dsa=bool(ss.dont_dsa),
        do_rad_losses=bool(ss.do_rad_losses),
        do_retro=bool(ss.do_retro),
        do_tcuts=bool(ss.do_tcuts),
        do_energy_transfer=bool(ss.do_energy_transfer),
        n_tcut_slots=int(n_tcut_slots),
        i_shock=int(ss.i_shock),
        electron_weight_fac=float(ss.electron_weight_fac),
        use_custom_eps_b=bool(ss.use_custom_eps_b),
        is_electron=bool(ss.is_electron),
        frg_alpha=float(ss.frg_alpha),
        frg_rg0_cm=float(ss.frg_rg0_cm),
        has_age_max=True,    # age test gated by age_max <= 0 sentinel
        nb=int(ss.nb),
        i_grid_feb=int(ss.i_grid_feb),
        psd_mom_min=float(ss.psd_mom_min),
        bins_per_dec_mom=int(ss.bins_per_dec_mom),
        n_mom=int(ss.n_mom),
        tc_pad=-(-(int(ss.n_mom) + 1) // 8) * 8,
        cos_fine=float(ss.cos_fine),
        dcos=float(ss.dcos),
        theta_min=float(ss.theta_min),
        bins_per_dec_theta=int(ss.bins_per_dec_theta),
        n_theta=int(ss.n_theta),
        # cost-attribution kills (scripts/probe_mega_cost.py); empty in
        # production
        prof_kill=os.environ.get("MCS_MEGA_KILL", ""),
    )


def _split3(v):
    """3-way bf16 split of an f32 vector: v = hi + mid + lo exactly to
    f32 precision, each part exactly representable in bf16."""
    v = v.astype(jnp.float32)
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    r2 = r1 - mid.astype(jnp.float32)
    lo = r2.astype(jnp.bfloat16)
    return hi, mid, lo


@functools.partial(jax.jit, static_argnames=("nb",))
def _mega_prep(x_grid, ux, gamma_sf, gamma_ef, btot, eps_target,
               recv_prefix, nb: int):
    """Device-side prep of (xg [128,1] f32, zs [128,32] bf16,
    et [128,8] bf16 energy-transfer tables, tail [4] f32
    downstream-zone scalars) — every host float()/np.asarray on a
    device value is a full round trip through the remote-device tunnel
    (~25 ms each; profiled at 630 ms/segment before this)."""
    # grid sentinels are +-1e30 rg0 = ~1e40 cm: clamp into f32 range
    # (positions never approach either value)
    xgv = jnp.clip(x_grid[:nb], -3.0e38, 3.0e38).astype(jnp.float32)
    xg = jnp.concatenate([xgv, jnp.full((128 - nb,), 3.0e38,
                                        jnp.float32)])[:, None]
    cols = []
    parts = [_split3(f[:nb].astype(jnp.float32))
             for f in (ux, gamma_sf, gamma_ef, btot)]
    zpad = jnp.zeros((128 - nb,), jnp.bfloat16)
    zcol = jnp.zeros((128,), jnp.bfloat16)
    for p in range(3):
        for f in range(4):
            cols.append(jnp.concatenate([parts[f][p], zpad]))
        cols.extend([zcol] * 4)
    cols.extend([zcol] * 8)
    zs = jnp.stack(cols, axis=1)                  # [128, 32]
    # energy-transfer tables: eps_target [nb] and recv_prefix [nb+1],
    # each 3-way bf16 split (cols 0-2 eps, 3-5 recv, 6-7 zero)
    ep = _split3(jnp.pad(eps_target.astype(jnp.float32),
                         (0, 128 - eps_target.shape[0])))
    rp = _split3(jnp.pad(recv_prefix.astype(jnp.float32),
                         (0, 128 - recv_prefix.shape[0])))
    et = jnp.stack([ep[0], ep[1], ep[2], rp[0], rp[1], rp[2],
                    zcol, zcol], axis=1)          # [128, 8]
    tail = jnp.concatenate([
        btot[nb - 2:nb - 1].astype(jnp.float32),
        gamma_sf[nb - 2:nb - 1].astype(jnp.float32),
        gamma_ef[nb - 2:nb - 1].astype(jnp.float32),
        ux[nb - 2:nb - 1].astype(jnp.float32),
    ])
    return xg, zs, et, tail


def _scvec(sc):
    """[18] f32 of the per-segment scalars (all traced jnp — no host
    sync)."""
    age = jnp.where(sc.age_max > 0, sc.age_max, 3.0e38)
    return jnp.stack([
        sc.m, sc.m * C_CGS, sc.m * C_CGS**2, 1.0 / sc.abs_charge,
        sc.pcut, sc.pcut_prev, sc.pmax_cutoff, sc.u2, sc.bmag2,
        sc.b_cmbz, sc.gamma0_u0, sc.feb_up, sc.feb_dw, sc.x_grid_stop,
        age, sc.pe_crit, sc.gamma_e_crit, sc.inj_frac,
    ]).astype(jnp.float32)


def _mega_scf(sc, grids, ss, seed: int):
    """scf [_SCF_BASE + n_tcut_slots] f32 + xg + zs + et with NO
    host-device sync.  Slot 23 (the sliding-window base cell) starts 0
    and is overwritten per launch by the drive for windowed configs."""
    xg, zs, et, tail = _mega_prep(jnp.asarray(grids.x_grid),
                                  jnp.asarray(grids.ux),
                                  jnp.asarray(grids.gamma_sf),
                                  jnp.asarray(grids.gamma_ef),
                                  jnp.asarray(grids.btot),
                                  jnp.asarray(grids.eps_target),
                                  jnp.asarray(grids.recv_prefix),
                                  nb=int(ss.nb))
    scf = jnp.concatenate([
        _scvec(sc), tail,
        jnp.asarray([float(seed), 0.0], jnp.float32),
        jnp.asarray(grids.tcuts).astype(jnp.float32)])
    return scf, xg, zs, et


def pack_state(state):
    """ParticleState -> (fs [NF, RT, 128] f32, is [NI, RT, 128] i32,
    n_lanes).  Pads to a block multiple with FINISHED zero-weight
    lanes."""
    fs, is_ = _pack_core(state)
    return fs, is_, state.weight.shape[0]


@jax.jit
def _pack_core(state):
    b = state.weight.shape[0]
    bl = _ROWS * LANE
    pad = (-b) % bl
    bt = b + pad

    def pf(a, fill=0.0):
        a = jnp.asarray(a, jnp.float32)
        return jnp.pad(a, (0, pad), constant_values=fill)

    x64 = state.x.astype(jnp.float64)
    xhi = x64.astype(jnp.float32)
    xlo = (x64 - xhi.astype(jnp.float64)).astype(jnp.float32)
    at64 = state.acctime.astype(jnp.float64)
    athi = at64.astype(jnp.float32)
    atlo = (at64 - athi.astype(jnp.float64)).astype(jnp.float32)

    fs = jnp.stack([
        pf(state.weight), pf(state.pb), pf(state.pperp), pf(state.phi),
        pf(state.ux_prev), pf(state.xn_per), pf(state.t_step),
        pf(state.prp_x.astype(jnp.float32)), pf(xhi), pf(xlo),
        pf(athi), pf(atlo),
    ]).reshape(_NF, bt // LANE, LANE)

    kd = jax.random.key_data(state.key).astype(jnp.uint32)
    flags = (state.downstream.astype(jnp.int32) * FL_DW
             | state.inj.astype(jnp.int32) * FL_INJ
             | state.retro.astype(jnp.int32) * FL_RETRO
             | state.just_returned.astype(jnp.int32) * FL_JRET)

    def pi(a, fill=0):
        a = jnp.asarray(a, jnp.int32)
        return jnp.pad(a, (0, pad), constant_values=fill)

    is_ = jnp.stack([
        pi(state.status, FINISHED), pi(state.reason, st.R_DOWNSTREAM),
        pi(state.nsteps), pi(flags),
        pi(kd[:, 0].astype(jnp.int32)), pi(kd[:, 1].astype(jnp.int32)),
        pi(state.tcut),
    ]).reshape(_NI, bt // LANE, LANE)
    return fs, is_


@functools.partial(jax.jit, static_argnums=(2,))
def unpack_state(fs, is_, b, template):
    """Inverse of pack_state (restores the ParticleState pytree)."""
    def gf(k):
        return fs[k].reshape(-1)[:b]

    def gi(k):
        return is_[k].reshape(-1)[:b]

    x = gf(F_XHI).astype(jnp.float64) + gf(F_XLO).astype(jnp.float64)
    at = gf(F_ATHI).astype(jnp.float64) + gf(F_ATLO).astype(jnp.float64)
    flags = gi(I_FLAGS)
    kd = jnp.stack([gi(I_KEY0), gi(I_KEY1)], axis=1).astype(jnp.uint32)
    key = jax.random.wrap_key_data(kd, impl="threefry2x32")
    xdt = template.x.dtype
    # zone index from position (the kernel derives it each step)
    return template._replace(
        weight=gf(F_W), pb=gf(F_PB), pperp=gf(F_PP), phi=gf(F_PHI),
        x=x.astype(xdt), ux_prev=gf(F_UXP), xn_per=gf(F_XNP),
        t_step=gf(F_TST), prp_x=gf(F_PRP).astype(xdt),
        acctime=at.astype(template.acctime.dtype),
        tcut=gi(I_TCUT),
        status=gi(I_STATUS), reason=gi(I_REASON), nsteps=gi(I_NSTEPS),
        downstream=(flags & FL_DW) != 0, inj=(flags & FL_INJ) != 0,
        retro=(flags & FL_RETRO) != 0,
        just_returned=(flags & FL_JRET) != 0,
        key=key,
    )


def _partition_active(fs, is_, orig):
    """Stable-partition lanes with status == ACTIVE to the front of
    the flat lane axis (fs [NF, RT, 128], is_ [NI, RT, 128]), actives
    ordered by total momentum.

    Uses ONE multi-operand lax.sort carrying all state planes — a
    column gather of [NF+NI, RT*128] lowers to a serial per-row loop
    on TPU (~20 ms at 64k lanes), the bitonic sort is ~ms.

    The momentum sub-order makes each kernel BLOCK momentum-coherent,
    which the per-step tally band (2048 cells ~ 0.6 decades at the
    parity baseline's 320-cell ip slab) relies on once a DSA
    population spreads over decades within one pcut segment: per-lane
    trajectories are permutation-invariant (lane-keyed counter RNG),
    so this only changes f32 tally accumulation order.  Positive-f32
    bitcast is order-preserving, so the composite key is one i32."""
    p = jnp.hypot(fs[F_PB].reshape(-1), fs[F_PP].reshape(-1))
    pkey = lax.bitcast_convert_type(p.astype(jnp.float32), jnp.int32)
    key = jnp.where(is_[I_STATUS].reshape(-1) != ACTIVE,
                    jnp.int32(np.int32(2**31 - 1)), pkey)
    ops = ([key]
           + [fs[k].reshape(-1) for k in range(_NF)]
           + [is_[k].reshape(-1) for k in range(_NI)]
           + [orig])
    out = lax.sort(ops, num_keys=1, is_stable=True)
    fs2 = jnp.stack(out[1:1 + _NF]).reshape(fs.shape)
    is2 = jnp.stack(out[1 + _NF:1 + _NF + _NI]).reshape(is_.shape)
    return fs2, is2, out[-1]


_LAUNCH_CACHE = {}

# drive entry points for one static megakernel config: `launch`
# (jitted whole drain), `drive` (same, traceable into larger
# programs), and the host-chunked triple `init_acc` / `chunk` /
# `unsort` (see the chunking note inside _get_launch)
_LaunchHandles = collections.namedtuple(
    "_LaunchHandles",
    ["launch", "drive", "chunk", "init_acc", "unsort", "unsort_traced",
     "max_launches", "use_chunked"])


def _get_launch(cfg_key, cfg, band, n_cells_pad, n_blocks, n_steps,
                interpret=False):
    """Compiled [launch-loop] drive for one static config.

    `n_cells_pad` is the FULL padded difference-array row count.  When
    it exceeds the VMEM cap, the kernel accumulates into a sliding
    momentum-bin WINDOW of `acc_rows` cells re-anchored before every
    launch from the live population's shock-frame momentum bound, and
    the drive scatters each launch's window into the full HBM-resident
    array with a dynamic-slice add (~8 MB r/w per launch — microseconds
    against a 256-step launch)."""
    margin = _win_margin()
    acc_rows = min(n_cells_pad, max(_win_cap_rows(), band))
    tile = min(band, _TILE)
    if acc_rows < n_cells_pad and acc_rows + tile > _tally_rows_budget():
        acc_rows = max(band, _tally_rows_budget() - tile)
    windowed = acc_rows < n_cells_pad
    # momentum re-sort cadence (launches): block momentum coherence
    # (which the per-step tally band relies on) decays as lanes
    # diverge; windowed configs re-sort every 4th launch by default
    # (their batches are small enough that the sort is ~ms).
    # Full-coverage configs default to halving-triggered partitions
    # only.  The knob exists so equivalence tests can pin BOTH paths
    # to one schedule (the SR dither is slot-keyed).
    resort_every = int(os.environ.get("MCS_MEGA_RESORT_EVERY",
                                      "4" if windowed else "0"))
    # two-level fine band (per-1024-lane-chunk anchors): 0 disables.
    # 8-row aligned; capped below the block band (no win otherwise)
    fine = int(os.environ.get("MCS_MEGA_FINE_BAND", "512"))
    fine = min(max(fine, 0) // 8 * 8, _TILE)
    if fine >= band:
        fine = 0
    entry_sort = os.environ.get("MCS_MEGA_ENTRY_SORT", "1") == "1"
    key = (cfg_key, band, n_cells_pad, acc_rows, n_blocks, n_steps,
           margin, os.environ.get("MCS_MEGA_TAIL_MULT", "4"),
           resort_every, interpret, fine,
           os.environ.get("MCS_MEGA_ENTRY_SORT", "1"),
           os.environ.get("MCS_MEGA_LAUNCHES_PER_PROG", "48"))
    if key in _LAUNCH_CACHE:
        return _LAUNCH_CACHE[key]
    rt = n_blocks * _ROWS
    tc_pad = cfg["tc_pad"]
    slab = 2 * (cfg["n_theta"] + 1)
    # Drain-tail amortization: once the live population has shrunk to
    # a fraction of the batch, per-launch FIXED costs (kernel
    # prologue, drive-body overhead, act reduction, partition cond)
    # dominate the few active blocks' compute, so the drive switches
    # to MCS_MEGA_TAIL_MULT-x longer launches.  The in-kernel RNG
    # counter is the per-lane step count (_uniforms), so launch length
    # does not perturb any lane's random stream, and the 10k helix cap
    # is enforced in-kernel; only the f32 tally accumulation grouping
    # changes.  Windowed configs keep fixed launches — the sliding
    # window's re-anchor margin is calibrated to a single-launch
    # acceleration horizon.
    tail_mult = int(os.environ.get("MCS_MEGA_TAIL_MULT", "4"))
    adaptive = tail_mult > 1 and not windowed

    def window_base(scf, fs, is_):
        """Window base cell from the live lanes: top-anchored at the
        max reachable shock-frame momentum bin (pt_sk <=
        gamma0*(p_pf + gamma_pf*m*c*beta0)) plus headroom.  The bulk
        of crossing weight sits within ~2 decades of that bound; the
        near-cancellation tail below the window is dropped-and-counted
        against MCS_MEGA_OOB_TOL."""
        c = np.float32(C_CGS)
        m = scf[0]
        mc = scf[1]
        g0b0 = scf[10] / c                     # gamma0 * beta0
        g0 = jnp.hypot(g0b0, 1.0)
        p = jnp.hypot(fs[F_PB], fs[F_PP])
        gpf = jnp.hypot(p / mc, 1.0)
        psk_hi = g0 * p + g0b0 * gpf * mc
        act = is_[I_STATUS] == ACTIVE
        pmax = jnp.max(jnp.where(act, psk_hi, 0.0))
        lp = (jnp.log(jnp.maximum(pmax, np.float32(1e-37)))
              * np.float32(1.0 / np.log(10.0))
              - np.float32(np.log10(cfg["psd_mom_min"])))
        ip_hi = (jnp.floor(lp * np.float32(cfg["bins_per_dec_mom"]))
                 .astype(jnp.int32) + jnp.int32(1))
        ip_hi = jnp.clip(ip_hi + jnp.int32(margin), jnp.int32(0),
                         jnp.int32(cfg["n_mom"]))
        win_ip = acc_rows // slab
        cb = jnp.maximum(ip_hi - jnp.int32(win_ip - 1),
                         jnp.int32(0)) * jnp.int32(slab)
        return jnp.minimum(cb, jnp.int32(n_cells_pad - acc_rows))

    def make_launch(n_steps_l):
        kern = functools.partial(_mega_kernel, band=band,
                                 n_cells_pad=acc_rows,
                                 n_steps=n_steps_l, cfg=cfg,
                                 fine=fine)
        return functools.partial(_launch_impl, kern)

    def _launch_impl(kern, scf, fs, is_, xg, zs, et):
        act = (jnp.max((is_[I_STATUS] == ACTIVE).astype(jnp.int32)
                       .reshape(n_blocks, -1), axis=1))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((_NF, _ROWS, LANE),
                             lambda i, s, a: (i - i, i, i - i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_NI, _ROWS, LANE),
                             lambda i, s, a: (i - i, i, i - i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 1), lambda i, s, a: (i - i, i - i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 32), lambda i, s, a: (i - i, i - i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 8), lambda i, s, a: (i - i, i - i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((_NF, _ROWS, LANE),
                             lambda i, s, a: (i - i, i, i - i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_NI, _ROWS, LANE),
                             lambda i, s, a: (i - i, i, i - i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((acc_rows, ZPAD),
                             lambda i, s, a: (i - i, i - i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_AUX, LANE),
                             lambda i, s, a: (i - i, i - i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tc_pad, ZPAD),
                             lambda i, s, a: (i - i, i - i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((min(band, _TILE), ZPAD),
                                       jnp.float32)],
        )
        fs2, is2, psd_d, aux, tc_d = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((_NF, rt, LANE), jnp.float32),
                jax.ShapeDtypeStruct((_NI, rt, LANE), jnp.int32),
                jax.ShapeDtypeStruct((acc_rows, ZPAD), jnp.float32),
                jax.ShapeDtypeStruct((N_AUX, LANE), jnp.float32),
                jax.ShapeDtypeStruct((tc_pad, ZPAD), jnp.float32),
            ],
            interpret=interpret,
        )(scf, act, fs, is_, xg, zs, et)
        n_active = jnp.sum(aux[A_ACTIVE]).astype(jnp.int32)
        n_oob = jnp.sum(aux[A_OVERFLOW])
        return fs2, is2, psd_d, aux, tc_d, n_active, n_oob

    launch = make_launch(n_steps)
    launch_tail = make_launch(n_steps * tail_mult) if adaptive else None
    # active-lane count below which the longer tail launches kick in
    tail_below = max((rt * LANE) // 8, _ROWS * LANE)

    max_launches = MAX_HELIX_STEPS // n_steps + 2
    # Host-chunked drains: one device program EXECUTING for many
    # minutes kills the TPU worker (round-7 finding: the 16x-lane
    # 200k-step science ladder and the 200k XLA while_loop both died
    # with UNAVAILABLE "kernel fault"), so deep helix caps cannot ride
    # a single while_loop drive.  When the launch bound exceeds
    # MCS_MEGA_LAUNCHES_PER_PROG, the drive's carry (including the
    # accumulators and the partition bookkeeping) crosses back to the
    # host every `chunk_launches` launches and the drain is
    # RE-DISPATCHED until empty.  The launch sequence — cond order,
    # partition schedule, accumulation order — is identical to the
    # monolithic drive, and the in-kernel RNG counter is the per-lane
    # step count, so chunked == monolithic BITWISE (state and tallies;
    # pinned by tests/test_chunked_drain.py).  Default 48 keeps the
    # 10k-cap bench/flagship drains (41 launches) single-program.
    chunk_launches = int(os.environ.get("MCS_MEGA_LAUNCHES_PER_PROG",
                                        "48"))
    use_chunked = max_launches > chunk_launches

    def cond_full(c):
        _, _, _, _, _, _, k, n_act, _ = c
        return (n_act > 0) & (k < max_launches)

    def make_body(scf, xg, zs, et):
        def body(c):
            fs, is_, psd, aux, tc, orig, k, n_prev, packed = c
            if windowed:
                cb = window_base(scf, fs, is_)
                scf_l = scf.at[23].set(cb.astype(jnp.float32))
            else:
                cb = jnp.int32(0)
                scf_l = scf
            if adaptive:
                fs, is_, psd_d, aux_d, tc_d, n_act, _ = lax.cond(
                    n_prev <= jnp.int32(tail_below), launch_tail,
                    launch, scf_l, fs, is_, xg, zs, et)
            else:
                fs, is_, psd_d, aux_d, tc_d, n_act, _ = launch(
                    scf_l, fs, is_, xg, zs, et)
            if windowed:
                cur = lax.dynamic_slice(psd, (cb, jnp.int32(0)),
                                        (acc_rows, ZPAD))
                psd = lax.dynamic_update_slice(
                    psd, cur + psd_d, (cb, jnp.int32(0)))
            else:
                psd = psd + psd_d
            # partition active lanes to the front only when they have
            # halved since the last partition: the multi-operand sort
            # costs ~10 ms at 64k lanes, and between partitions the
            # active set only shrinks IN PLACE (the per-block activity
            # skip already ignores fully-drained blocks).  Plus the
            # periodic momentum re-sort (resort_every, see above).
            do_part = (n_act * 2 <= packed) & (n_act > 0)
            if resort_every:
                do_part |= (n_act > 0) & (
                    k % jnp.int32(resort_every)
                    == jnp.int32(resort_every - 1))
            fs, is_, orig = lax.cond(
                do_part, _partition_active, lambda a, b, o: (a, b, o),
                fs, is_, orig)
            packed = jnp.where(do_part, n_act, packed)
            return (fs, is_, psd,
                    aux + aux_d.astype(jnp.float64), tc + tc_d, orig,
                    k + 1, n_act, packed)
        return body

    def init_acc(fs, is_):
        """Fresh drive accumulators + bookkeeping: (psd, aux, tc, k,
        n_act, packed).  Exact live count at entry so a
        weakly-populated state (e.g. after a thin pcut split) rides
        tail launches immediately.  packed = n0 because every drive
        entry-partitions (see drive/drive_chunk): actives are at the
        front, momentum-sorted, from launch 0 — which is also what
        lets the two-level fine band engage on fresh populations
        instead of only after the first halving."""
        psd0 = jnp.zeros((n_cells_pad, ZPAD), jnp.float32)
        aux0 = jnp.zeros((N_AUX, LANE), jnp.float64)
        tc0 = jnp.zeros((tc_pad, ZPAD), jnp.float32)
        n0 = jnp.sum((is_[I_STATUS] == ACTIVE).astype(jnp.int32),
                     dtype=jnp.int32)
        return (psd0, aux0, tc0, jnp.int32(0), n0,
                n0 if entry_sort
                else jnp.int32(n_blocks * _ROWS * LANE))

    def unsort(fs, is_, orig):
        """Restore original lane order by sorting on the carried slot
        index (gathers are serial on TPU; sort is vectorized)."""
        ops = ([orig]
               + [fs[j].reshape(-1) for j in range(_NF)]
               + [is_[j].reshape(-1) for j in range(_NI)])
        out = lax.sort(ops, num_keys=1, is_stable=True)
        return (jnp.stack(out[1:1 + _NF]).reshape(fs.shape),
                jnp.stack(out[1 + _NF:]).reshape(is_.shape))

    def drive(scf, fs, is_, xg, zs, et, orig):
        """The whole drain in ONE device program: the per-dispatch
        round trip through the remote device tunnel is ~25 ms, which
        dominated a python-level launch loop."""
        if entry_sort:
            fs, is_, orig = _partition_active(fs, is_, orig)
        psd0, aux0, tc0, k0, n0, packed0 = init_acc(fs, is_)
        fs, is_, psd, aux, tc, orig, k, _, _ = lax.while_loop(
            cond_full, make_body(scf, xg, zs, et),
            (fs, is_, psd0, aux0, tc0, orig, k0, n0, packed0))
        fs, is_ = unsort(fs, is_, orig)
        return fs, is_, psd, aux, tc, k

    def drive_chunk(scf, fs, is_, xg, zs, et, orig, acc):
        """At most `chunk_launches` more launches of the SAME launch
        sequence as `drive`; the caller re-dispatches while acc's
        n_act > 0 and k < max_launches, then calls `unsort` once.
        The lane order stays partitioned between dispatches (unlike
        drive, which unsorts at its end) — the partition schedule is
        carried in (k, n_act, packed), so re-entry continues it
        exactly."""
        psd, aux, tc, k, n_act, packed = acc
        # the monolithic drive entry-partitions; the first chunk must
        # reproduce that exactly (bitwise contract)
        if entry_sort:
            fs, is_, orig = lax.cond(
                k == jnp.int32(0), _partition_active,
                lambda a, b, o: (a, b, o), fs, is_, orig)
        k_end = k + jnp.int32(chunk_launches)

        def cond(c):
            _, _, _, _, _, _, kk, na, _ = c
            return (na > 0) & (kk < max_launches) & (kk < k_end)

        fs, is_, psd, aux, tc, orig, k, n_act, packed = lax.while_loop(
            cond, make_body(scf, xg, zs, et),
            (fs, is_, psd, aux, tc, orig, k, n_act, packed))
        return fs, is_, orig, (psd, aux, tc, k, n_act, packed)

    lh = _LaunchHandles(
        launch=jax.jit(drive, donate_argnums=(1, 2)),
        drive=drive,
        chunk=jax.jit(drive_chunk, donate_argnums=(1, 2, 6, 7)),
        init_acc=jax.jit(init_acc),
        unsort=jax.jit(unsort, donate_argnums=(0, 1)),
        unsort_traced=unsort,
        max_launches=max_launches,
        use_chunked=use_chunked)
    _LAUNCH_CACHE[key] = lh
    return lh


def run_segment_mega(state, tallies, grids, sc, ss,
                     steps_per_launch: int = 0, seed: int = 0,
                     interpret: bool = False):
    """Drop-in replacement for ops.step.run_segment on supported
    configs: advances all lanes to SAVED/FINISHED with the Pallas
    megakernel, accumulating into `tallies`.

    The launch loop runs at Python level (one device sync per
    `steps_per_launch` steps) so overflow of the tally band can raise
    loudly instead of silently dropping records."""
    from .state import Tallies  # noqa: F401  (doc reference)

    n_steps = steps_per_launch or _STEPS
    cfg = _static_cfg(ss, n_tcut_slots=int(grids.tcuts.shape[0]))
    cfg_key = tuple(sorted(cfg.items()))
    fs, is_, b = pack_state(state)
    rt = fs.shape[1]
    n_blocks = rt // _ROWS

    n_cells = tallies.psd_diff.shape[0]
    nzc = tallies.psd_diff.shape[1]
    band, _acc, n_cells_pad = _tally_geom(n_cells, ss.mega_band)

    lh = _get_launch(cfg_key, cfg, band, n_cells_pad, n_blocks,
                     n_steps, interpret=interpret)

    # all prep stays on device: a host float()/np.asarray of a device
    # value costs a ~25 ms tunnel round trip (profiled)
    scf, xg, zs, et = _mega_scf(sc, grids, ss, seed)
    orig = jnp.arange(rt * LANE, dtype=jnp.int32)

    if lh.use_chunked:
        # host-chunked drain (deep helix caps): re-dispatch bounded
        # programs until empty — bitwise identical to the monolithic
        # drive (see _get_launch)
        acc = lh.init_acc(fs, is_)
        while True:
            fs, is_, orig, acc = lh.chunk(scf, fs, is_, xg, zs, et,
                                          orig, acc)
            if int(acc[4]) == 0 or int(acc[3]) >= lh.max_launches:
                break
        fs, is_ = lh.unsort(fs, is_, orig)
        psd_acc, aux_acc, tc_acc = acc[0], acc[1], acc[2]
    else:
        fs, is_, psd_acc, aux_acc, tc_acc, _k = lh.launch(
            scf, fs, is_, xg, zs, et, orig)
    check_oob(np.asarray(jnp.stack([
        jnp.sum(aux_acc[A_OVERFLOW]), jnp.sum(aux_acc[A_OOBW]),
        jnp.sum(aux_acc[A_WTOT])])), n_cells, band=band)

    state_out = unpack_state(fs, is_, b, state)
    # zone index is derived from position in-kernel; restore it for
    # downstream consumers of the state pytree
    ig = (jnp.searchsorted(jnp.asarray(grids.x_grid),
                           state_out.x, side="right") - 1)
    state_out = state_out._replace(
        igrid=jnp.clip(ig, 0, ss.nb - 2).astype(jnp.int32))
    aux_np = aux_acc
    flux = aux_np[A_FLUX0:A_FLUX0 + 4, :nzc]
    tallies = tallies._replace(
        psd_diff=tallies.psd_diff
        + psd_acc[:n_cells, :nzc].astype(tallies.psd_diff.dtype),
        flux_diff=tallies.flux_diff + flux,
        px_esc_up=tallies.px_esc_up + jnp.sum(aux_np[A_PX_ESC]),
        en_esc_up=tallies.en_esc_up + jnp.sum(aux_np[A_EN_ESC]),
        sum_p_dw=tallies.sum_p_dw + jnp.sum(aux_np[A_SUM_P]),
        sum_ke_dw=tallies.sum_ke_dw + jnp.sum(aux_np[A_SUM_KE]),
    )
    tallies = _fold_tc_pool(tallies, tc_acc, aux_np, ss)
    return state_out, tallies


def _fold_tc_pool(tl, tc_acc, aux, ss):
    """Fold the in-kernel tcut contraction and pool row into the tally
    pytree.  weight_coupled is the ip-marginal of spectra_coupled
    (tcut_track! adds the same weight to both, cuts.jl:160-162)."""
    upd = {}
    if ss.do_tcuts:
        nmp1 = tl.spectra_coupled.shape[0]
        nts = tl.spectra_coupled.shape[1]
        tc = tc_acc[:nmp1, :nts].astype(tl.spectra_coupled.dtype)
        upd["spectra_coupled"] = tl.spectra_coupled + tc
        upd["weight_coupled"] = (tl.weight_coupled
                                 + jnp.sum(tc, axis=0))
    if ss.do_energy_transfer and not ss.is_electron:
        nzc = tl.pool_diff.shape[0]
        upd["pool_diff"] = (tl.pool_diff
                            + aux[A_POOL, :nzc].astype(jnp.float64))
    return tl._replace(**upd) if upd else tl

# ---------------------------------------------------------------------------
# fused ion ladder with the megakernel segment (trace-level API)
# ---------------------------------------------------------------------------

def mega_segment_traced(st, tl, x_grid, xg, zs, et, tail, tcv, seed_f,
                        sc, ss, band: int, n_cells_pad: int,
                        n_steps: int, interpret: bool = False):
    """One pcut segment with the megakernel, as a PURE traced function
    (usable inside lax.scan — no jit boundary, no host sync).

    Returns (state', tallies', oob [count, dropped |w|, total |w|]).
    The caller must hand the accumulated oob vector to check_oob after
    the enclosing jit returns."""
    cfg = _static_cfg(ss, n_tcut_slots=int(tcv.shape[0]))
    cfg_key = tuple(sorted(cfg.items()))
    fs, is_ = _pack_core(st)
    b = st.weight.shape[0]
    rt = fs.shape[1]
    n_blocks = rt // _ROWS
    drive = _get_launch(cfg_key, cfg, band, n_cells_pad, n_blocks,
                        n_steps, interpret=interpret).drive
    scf = jnp.concatenate([_scvec(sc), tail,
                           jnp.stack([seed_f,
                                      jnp.float32(0.0)]),
                           tcv.astype(jnp.float32)])
    orig = jnp.arange(rt * LANE, dtype=jnp.int32)
    fs, is_, psd_acc, aux_acc, tc_acc, _k = drive(scf, fs, is_, xg,
                                                  zs, et, orig)

    st2 = unpack_state(fs, is_, b, st)
    ig = (jnp.searchsorted(x_grid, st2.x, side="right") - 1)
    st2 = st2._replace(
        igrid=jnp.clip(ig, 0, ss.nb - 2).astype(jnp.int32))

    n_cells = tl.psd_diff.shape[0]
    nzc = tl.psd_diff.shape[1]
    aux64 = aux_acc.astype(jnp.float64)
    tl = tl._replace(
        psd_diff=tl.psd_diff
        + psd_acc[:n_cells, :nzc].astype(tl.psd_diff.dtype),
        flux_diff=tl.flux_diff + aux64[A_FLUX0:A_FLUX0 + 4, :nzc],
        px_esc_up=tl.px_esc_up + jnp.sum(aux64[A_PX_ESC]),
        en_esc_up=tl.en_esc_up + jnp.sum(aux64[A_EN_ESC]),
        sum_p_dw=tl.sum_p_dw + jnp.sum(aux64[A_SUM_P]),
        sum_ke_dw=tl.sum_ke_dw + jnp.sum(aux64[A_SUM_KE]),
    )
    tl = _fold_tc_pool(tl, tc_acc, aux64, ss)
    oob = jnp.stack([jnp.sum(aux64[A_OVERFLOW]),
                     jnp.sum(aux64[A_OOBW]),
                     jnp.sum(aux64[A_WTOT])])
    return st2, tl, oob


_HYBRID_CACHE = {}


def _get_hybrid_seg(cfg_key, ss, band, n_cells_pad, n_blocks, n_steps,
                    interpret=False):
    """One pcut segment as ONE jitted device program:
    megakernel drain -> escape binning -> on-device split.

    This is the production ladder driver: a python loop of these
    programs costs one ~25 ms dispatch per pcut (45 per species —
    ~1 s, negligible), while each drain runs the exact same program
    shape as the standalone bench drive.  The previous design (the
    whole 45-segment ladder inside one lax.scan) built a giant
    Mosaic-embedded program that recompiled through the remote relay
    and ran its in-scan drive well below the standalone rate."""
    key = (cfg_key, band, n_cells_pad, _win_cap_rows(), _win_margin(),
           os.environ.get("MCS_MEGA_TAIL_MULT", "4"),
           n_blocks, n_steps, interpret)
    if key in _HYBRID_CACHE:
        return _HYBRID_CACHE[key]

    from .finish import finish_particles
    from .fused_ion import split_on_device

    def seg(st, tl, es, grids, sc, xg, zs, et, tail, seed_f, n_target,
            key):
        x_grid = jnp.asarray(grids.x_grid)
        tcv = jnp.asarray(grids.tcuts).astype(jnp.float32)
        st, tl, oob = mega_segment_traced(
            st, tl, x_grid, xg, zs, et, tail, tcv, seed_f, sc, ss,
            band, n_cells_pad, n_steps, interpret=interpret)
        es = finish_particles(st, es, grids, sc, ss)
        nsteps = jnp.sum(st.nsteps.astype(jnp.uint64))
        st, n_new = split_on_device(st, n_target, key)
        return st, tl, es, n_new, nsteps, oob

    f = jax.jit(seg, donate_argnums=(0, 1, 2))
    _HYBRID_CACHE[key] = f
    return f


_HYBRID_CHUNK_CACHE = {}


def _get_hybrid_seg_chunked(cfg_key, cfg, ss, band, n_cells_pad,
                            n_blocks, n_steps, interpret=False):
    """The hybrid pcut segment split into host-redispatchable pieces
    for deep helix caps (host-chunked drains — see the note in
    _get_launch): `start` packs the state and runs the first bounded
    chunk, `cont` continues the drain, `fin` restores lane order and
    runs the [tally-fold -> finish -> split] tail.  The concatenation
    start; cont*; fin computes exactly what _get_hybrid_seg's fused
    program computes (bitwise: same launch sequence, same accumulation
    order), but no single device program runs longer than
    MCS_MEGA_LAUNCHES_PER_PROG launches."""
    key = (cfg_key, band, n_cells_pad, _win_cap_rows(), _win_margin(),
           os.environ.get("MCS_MEGA_TAIL_MULT", "4"),
           os.environ.get("MCS_MEGA_LAUNCHES_PER_PROG", "48"),
           n_blocks, n_steps, interpret)
    if key in _HYBRID_CHUNK_CACHE:
        return _HYBRID_CHUNK_CACHE[key]

    from .finish import finish_particles
    from .fused_ion import split_on_device

    lh = _get_launch(cfg_key, cfg, band, n_cells_pad, n_blocks,
                     n_steps, interpret=interpret)

    def start(st, xg, zs, et, tail, tcv, seed_f, sc):
        scf = jnp.concatenate([_scvec(sc), tail,
                               jnp.stack([seed_f, jnp.float32(0.0)]),
                               tcv.astype(jnp.float32)])
        fs, is_ = _pack_core(st)
        orig = jnp.arange(fs.shape[1] * LANE, dtype=jnp.int32)
        acc = lh.init_acc(fs, is_)
        fs, is_, orig, acc = lh.chunk(scf, fs, is_, xg, zs, et, orig,
                                      acc)
        return scf, fs, is_, orig, acc

    def fin(st, tl, es, grids, sc, fs, is_, orig, acc, n_target, key):
        fs, is_ = lh.unsort_traced(fs, is_, orig)
        b = st.weight.shape[0]
        st2 = unpack_state(fs, is_, b, st)
        x_grid = jnp.asarray(grids.x_grid)
        ig = (jnp.searchsorted(x_grid, st2.x, side="right") - 1)
        st2 = st2._replace(
            igrid=jnp.clip(ig, 0, ss.nb - 2).astype(jnp.int32))

        psd_acc, aux_acc, tc_acc = acc[0], acc[1], acc[2]
        n_cells = tl.psd_diff.shape[0]
        nzc = tl.psd_diff.shape[1]
        aux64 = aux_acc.astype(jnp.float64)
        tl = tl._replace(
            psd_diff=tl.psd_diff
            + psd_acc[:n_cells, :nzc].astype(tl.psd_diff.dtype),
            flux_diff=tl.flux_diff + aux64[A_FLUX0:A_FLUX0 + 4, :nzc],
            px_esc_up=tl.px_esc_up + jnp.sum(aux64[A_PX_ESC]),
            en_esc_up=tl.en_esc_up + jnp.sum(aux64[A_EN_ESC]),
            sum_p_dw=tl.sum_p_dw + jnp.sum(aux64[A_SUM_P]),
            sum_ke_dw=tl.sum_ke_dw + jnp.sum(aux64[A_SUM_KE]),
        )
        tl = _fold_tc_pool(tl, tc_acc, aux64, ss)
        oob = jnp.stack([jnp.sum(aux64[A_OVERFLOW]),
                         jnp.sum(aux64[A_OOBW]),
                         jnp.sum(aux64[A_WTOT])])
        es = finish_particles(st2, es, grids, sc, ss)
        nsteps = jnp.sum(st2.nsteps.astype(jnp.uint64))
        st3, n_new = split_on_device(st2, n_target, key)
        return st3, tl, es, n_new, nsteps, oob

    handles = (jax.jit(start),
               lh.chunk,
               jax.jit(fin, donate_argnums=(0, 1, 2, 5, 6, 7, 8)),
               lh.max_launches)
    _HYBRID_CHUNK_CACHE[key] = handles
    return handles


def drive_ladder_async(dispatch, n_seg: int, check=None, capture=None,
                       start: int = 0):
    """Host loop over pcut segments WITHOUT a per-segment host sync:
    under the remote relay every blocking fetch costs a ~25 ms round
    trip AND drains the dispatch pipeline, so the former
    int(n_new)-per-pcut loop serialized [sync -> dispatch -> drain]
    45x per species.  The reference's pcut_finalize early break
    (cuts.jl:115-119) is instead checked every MCS_HYBRID_SYNC_EVERY
    segments (0 = never): a segment dispatched after the chain died is
    a cheap no-op — the split leaves every lane FINISHED with zero
    weight, the drive's per-block activity skip drops the whole first
    launch, and finish_particles masks weight > 0 — so over-dispatching
    a few dead segments is cheaper than syncing on every live one.

    ``dispatch(i)`` runs segment i and returns (n_new, nsteps) device
    scalars (any integer/float dtype; pushes < 2^53 so the uint64
    conversion is exact).  Shared by the single-device ladder below
    and the mesh ladder (parallel/shard.run_ion_mega_hybrid_sharded)
    so the break policy and dead-tail reporting cannot diverge.

    ``check(i)`` (optional) runs at the same sync points, after the
    pipeline has drained on int(n_new): the in-flight oob tolerance
    check (check_oob with seg=i) lives here so a tally overflow raises
    within MCS_HYBRID_SYNC_EVERY segments of appearing instead of
    after the whole ladder.

    ``capture(i, n_new_arr, nsteps_arr)`` (optional) also runs at sync
    points, after check: the mid-iteration checkpoint hook
    (parallel/checkpoint.MidCheckpointer).  It receives the
    host-fetched per-segment counters for segments [start, i] so a
    resume can reconstruct the push accounting.  ``start`` begins the
    ladder at a later segment (resume): segments below it are reported
    as zeros for the caller to overwrite from its checkpoint.

    Returns (n_new[n_seg] int64, nsteps[n_seg] uint64) with segments
    past the first die-out reported as the zeros they were."""
    sync_every = int(os.environ.get("MCS_HYBRID_SYNC_EVERY", "8"))
    n_new_d: list = []
    nsteps_d: list = []
    n_done = start
    for i in range(start, n_seg):
        n_new, nsteps = dispatch(i)
        n_new_d.append(n_new)
        nsteps_d.append(nsteps)
        n_done = i + 1
        if sync_every and n_done % sync_every == 0:
            dead = int(n_new) == 0
            if check is not None:
                check(i)
            if capture is not None:
                capture(i, np.asarray(jnp.stack(n_new_d), np.int64),
                        np.asarray(jnp.stack(nsteps_d)).astype(
                            np.uint64))
            if dead:
                break

    n_new_out = np.zeros(n_seg, np.int64)
    nsteps_out = np.zeros(n_seg, np.uint64)
    if n_new_d:
        n_new_out[start:n_done] = np.asarray(jnp.stack(n_new_d),
                                             np.int64)
        nsteps_out[start:n_done] = np.asarray(
            jnp.stack(nsteps_d)).astype(np.uint64)
    # report the same tail as the host splitter: segments past the
    # first die-out ran as no-ops and stay zero (scan only the
    # segments this call ran — [0, start) are the caller's)
    dead = np.flatnonzero(n_new_out[start:n_done] == 0)
    if dead.size:
        n_new_out[start + dead[0] + 1:] = 0
        nsteps_out[start + dead[0] + 1:] = 0
    return n_new_out, nsteps_out


def run_ion_mega_hybrid(state, tallies, esc, grids, sc, ss,
                        pcuts, pcut_prevs, n_targets, seg_keys,
                        band: int = 0, n_steps: int = 0,
                        interpret: bool = False, start_seg: int = 0,
                        init_oob=None, capture=None):
    """Transport one species through the whole pcut ladder with the
    megakernel, one jitted [drain -> finish -> split] program per
    segment (see _get_hybrid_seg).  Host-level loop over pcuts with an
    early break when the chain dies (pcut_finalize, cuts.jl:115-119).

    pcuts / pcut_prevs / n_targets are host sequences; seg_keys is a
    [n_seg] key array.  Returns the same tuple as run_ion_fused_mega:
    (state, tallies, esc, n_new[n_seg], nsteps[n_seg], oob).

    Mid-iteration checkpointing (parallel/checkpoint.py): ``capture``
    is called at the ladder's sync points as
    ``capture(i, state, tallies, esc, oob, n_new_arr, nsteps_arr)``
    with the pipeline drained, so the device trees it fetches are the
    exact post-segment-i values.  ``start_seg``/``init_oob`` resume a
    checkpointed ladder: the caller passes the restored state /
    tallies / esc and the saved cumulative oob vector, and segments
    below start_seg are reported as zeros to be overwritten from its
    checkpoint."""
    cfg = _static_cfg(ss, n_tcut_slots=int(grids.tcuts.shape[0]))
    cfg_key = tuple(sorted(cfg.items()))
    n_cells = tallies.psd_diff.shape[0]
    band, _acc, n_cells_pad = _tally_geom(n_cells, band or ss.mega_band)
    n_steps = n_steps or _STEPS
    b = state.weight.shape[0]
    n_blocks = (-(-b // LANE) + _ROWS - 1) // _ROWS

    # deep helix caps run host-chunked (see _get_launch): no single
    # device program may execute for minutes, or the TPU worker dies
    chunked = _get_launch(cfg_key, cfg, band, n_cells_pad, n_blocks,
                          n_steps, interpret=interpret).use_chunked
    if chunked:
        seg_start, seg_cont, seg_fin, max_l = _get_hybrid_seg_chunked(
            cfg_key, cfg, ss, band, n_cells_pad, n_blocks, n_steps,
            interpret=interpret)
        tcv = jnp.asarray(grids.tcuts).astype(jnp.float32)
    else:
        seg_fn = _get_hybrid_seg(cfg_key, ss, band, n_cells_pad,
                                 n_blocks, n_steps,
                                 interpret=interpret)
    xg, zs, et, tail = _mega_prep(jnp.asarray(grids.x_grid),
                                  jnp.asarray(grids.ux),
                                  jnp.asarray(grids.gamma_sf),
                                  jnp.asarray(grids.gamma_ef),
                                  jnp.asarray(grids.btot),
                                  jnp.asarray(grids.eps_target),
                                  jnp.asarray(grids.recv_prefix),
                                  nb=int(ss.nb))

    n_seg = len(pcuts)
    pcuts_h = np.asarray(pcuts, np.float64)
    prevs_h = np.asarray(pcut_prevs, np.float64)
    targets_h = np.asarray(n_targets, np.int64)
    oob_acc = (jnp.zeros((3,), jnp.float64) if init_oob is None
               else jnp.asarray(init_oob, jnp.float64))
    p_dtype = state.pb.dtype

    oob_log: list = [] if os.environ.get("MCS_OOB_LOG") else None

    def dispatch(i):
        nonlocal state, tallies, esc, oob_acc
        sci = sc._replace(
            pcut=jnp.asarray(pcuts_h[i], p_dtype),
            pcut_prev=jnp.asarray(prevs_h[i], p_dtype))
        if chunked:
            # [start; cont*; fin]: the per-chunk n_act fetch is a host
            # sync, which is fine here — chunk-engaged segments run
            # seconds per chunk, and drained segments exit after one
            scf, fs, is_, origv, acc = seg_start(
                state, xg, zs, et, tail, tcv, jnp.float32(i + 1), sci)
            while int(acc[4]) > 0 and int(acc[3]) < max_l:
                fs, is_, origv, acc = seg_cont(scf, fs, is_, xg, zs,
                                               et, origv, acc)
            state, tallies, esc, n_new, nsteps, oob = seg_fin(
                state, tallies, esc, grids, sci, fs, is_, origv, acc,
                jnp.asarray(targets_h[i], jnp.int32), seg_keys[i])
        else:
            state, tallies, esc, n_new, nsteps, oob = seg_fn(
                state, tallies, esc, grids, sci, xg, zs, et, tail,
                jnp.float32(i + 1),
                jnp.asarray(targets_h[i], jnp.int32), seg_keys[i])
        oob_acc = oob_acc + oob
        if oob_log is not None:
            oob_log.append(oob)
        return n_new, nsteps

    def oob_check(i):
        # fail fast: cumulative oob tolerance at every ladder sync
        # point (adds one 3-scalar fetch per MCS_HYBRID_SYNC_EVERY
        # segments to an already-drained pipeline)
        check_oob(np.asarray(oob_acc), n_cells, band=band, seg=i)

    cap = None
    if capture is not None:
        def cap(i, n_new_arr, nsteps_arr):
            capture(i, state, tallies, esc, oob_acc, n_new_arr,
                    nsteps_arr)

    n_new_out, nsteps_out = drive_ladder_async(dispatch, n_seg,
                                               check=oob_check,
                                               capture=cap,
                                               start=start_seg)
    if oob_log:
        # diagnostic only (MCS_OOB_LOG=1): per-segment [count,
        # dropped |w|, total |w|] so a window overflow is attributable
        ol = np.asarray(jnp.stack(oob_log))
        for i, (cnt, ow, wt) in enumerate(ol):
            if cnt:
                logging.getLogger(__name__).warning(
                    "oob seg %d (pcut %.3e): n=%.0f w=%.3e/%.3e "
                    "(%.2e)", i, pcuts_h[i], cnt, ow, wt,
                    ow / max(wt, 1e-300))
    return (state, tallies, esc, jnp.asarray(n_new_out),
            jnp.asarray(nsteps_out), oob_acc)


def run_ion_fused_mega(state, tallies, esc, grids, sc, ss,
                       pcuts, pcut_prevs, n_targets, seg_keys,
                       band: int = 0, n_steps: int = 0,
                       interpret: bool = False):
    """The fused pcut ladder (ops/fused_ion.run_ion_fused) with the
    megakernel as the transport segment: one device program transports
    a species through every splitting level, each segment running the
    Pallas drive.  Returns (state, tallies, esc, n_new, nsteps, oob)."""
    from .finish import finish_particles
    from .fused_ion import split_on_device

    n_cells = tallies.psd_diff.shape[0]
    band, _acc, n_cells_pad = _tally_geom(n_cells, band or ss.mega_band)
    n_steps = n_steps or _STEPS

    xg, zs, et, tail = _mega_prep(jnp.asarray(grids.x_grid),
                                  jnp.asarray(grids.ux),
                                  jnp.asarray(grids.gamma_sf),
                                  jnp.asarray(grids.gamma_ef),
                                  jnp.asarray(grids.btot),
                                  jnp.asarray(grids.eps_target),
                                  jnp.asarray(grids.recv_prefix),
                                  nb=int(ss.nb))
    x_grid = jnp.asarray(grids.x_grid)
    tcv = jnp.asarray(grids.tcuts).astype(jnp.float32)

    def body(carry, xs):
        st, tl, es, oob = carry
        pcut, pcut_prev, n_target, key, iseg = xs
        sci = sc._replace(pcut=pcut, pcut_prev=pcut_prev)
        st, tl, oob_d = mega_segment_traced(
            st, tl, x_grid, xg, zs, et, tail, tcv,
            iseg.astype(jnp.float32),
            sci, ss, band, n_cells_pad, n_steps, interpret=interpret)
        es = finish_particles(st, es, grids, sci, ss)
        nsteps = jnp.sum(st.nsteps.astype(jnp.uint64))
        st, n_new = split_on_device(st, n_target, key)
        return (st, tl, es, oob + oob_d), (n_new, nsteps)

    n_seg = pcuts.shape[0]
    (state, tallies, esc, oob), (n_new, nsteps) = lax.scan(
        body, (state, tallies, esc, jnp.zeros((3,), jnp.float64)),
        (pcuts, pcut_prevs, n_targets, seg_keys,
         jnp.arange(1, n_seg + 1, dtype=jnp.int32)))
    return state, tallies, esc, n_new, nsteps, oob


run_ion_fused_mega_jit = jax.jit(
    run_ion_fused_mega,
    static_argnames=("ss", "band", "n_steps", "interpret"),
    donate_argnums=(0, 1, 2))
