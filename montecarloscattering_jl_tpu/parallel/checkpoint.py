"""Checkpoint / resume of a run's nonlinear state.

The reference designed but never implemented profile restart
(read-old-profile reaches an error, MonteCarloScattering.jl:462;
SURVEY.md section 5.4).  Here the full fixed-point state — profile
grids, adiabatic-index grid, q_esc / escape histories, iteration
index, and RNG base seed — serializes to a single NPZ so a run can
resume mid-iteration-loop, including on a different mesh shape
(tallies are per-iteration and rebuilt, so only O(n_grid) state is
stored).
"""

from __future__ import annotations

import json

import numpy as np

from ..models.profile import ShockProfile


def save_checkpoint(path: str, *, i_iter: int, profile: ShockProfile,
                    gamma_grid: np.ndarray, q_px_hist: np.ndarray,
                    q_en_hist: np.ndarray, px_esc_hist: np.ndarray,
                    en_esc_hist: np.ndarray, gamma_dw_hist: np.ndarray,
                    prof_weight_fac: float, random_seed: int,
                    meta: dict | None = None) -> None:
    np.savez_compressed(
        path,
        i_iter=np.asarray(i_iter),
        ux_sk=profile.ux_sk, uz_sk=profile.uz_sk, utot=profile.utot,
        gamma_sf=profile.gamma_sf, beta_ef=profile.beta_ef,
        gamma_ef=profile.gamma_ef, btot=profile.btot,
        theta=profile.theta, eps_b=profile.eps_b,
        bmag2=np.asarray(profile.bmag2),
        gamma_grid=gamma_grid,
        q_px_hist=q_px_hist, q_en_hist=q_en_hist,
        px_esc_hist=px_esc_hist, en_esc_hist=en_esc_hist,
        gamma_dw_hist=gamma_dw_hist,
        prof_weight_fac=np.asarray(prof_weight_fac),
        random_seed=np.asarray(random_seed),
        meta=np.frombuffer(
            json.dumps(meta or {}).encode(), dtype=np.uint8),
    )


def load_checkpoint(path: str) -> dict:
    """Load a checkpoint; returns a dict with a reconstructed
    ShockProfile under 'profile'."""
    z = np.load(path)
    prof = ShockProfile(
        ux_sk=z["ux_sk"], uz_sk=z["uz_sk"], utot=z["utot"],
        gamma_sf=z["gamma_sf"], beta_ef=z["beta_ef"],
        gamma_ef=z["gamma_ef"], btot=z["btot"], theta=z["theta"],
        eps_b=z["eps_b"], bmag2=float(z["bmag2"]))
    meta = json.loads(bytes(z["meta"]).decode() or "{}")
    return {
        "i_iter": int(z["i_iter"]), "profile": prof,
        "gamma_grid": z["gamma_grid"],
        "q_px_hist": z["q_px_hist"], "q_en_hist": z["q_en_hist"],
        "px_esc_hist": z["px_esc_hist"], "en_esc_hist": z["en_esc_hist"],
        "gamma_dw_hist": z["gamma_dw_hist"],
        "prof_weight_fac": float(z["prof_weight_fac"]),
        "random_seed": int(z["random_seed"]), "meta": meta,
    }
