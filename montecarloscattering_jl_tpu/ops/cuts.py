"""Particle splitting between pcut segments.

Replaces new_pcut / pcut_finalize (cuts.jl:34-124): lanes that reached
the splitting momentum (status == SAVED) are compacted on the host,
replicated x multiplicity with weight / multiplicity, and re-padded to
a fixed batch size — the only host-sync point per pcut (SURVEY.md
section 7).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .state import SAVED, ParticleState


@dataclass
class SplitPopulation:
    """Host-side arrays for the next pcut segment."""

    weight: np.ndarray
    pb: np.ndarray
    pperp: np.ndarray
    phi: np.ndarray
    x: np.ndarray
    igrid: np.ndarray
    ux_prev: np.ndarray
    downstream: np.ndarray
    inj: np.ndarray
    xn_per: np.ndarray
    prp_x: np.ndarray
    acctime: np.ndarray
    tcut: np.ndarray
    n: int                 # live lanes (rest is padding)
    multiplicity: int


def pcut_split(state: ParticleState, n_pts_target: int,
               batch_size: int | None = None) -> SplitPopulation | None:
    """Build the next pcut's population from the saved lanes.

    Returns None when nothing was saved (pcut_finalize's break,
    cuts.jl:115-119).  Multiplicity = max(target // n_saved, 1)
    (cuts.jl:42); weights divide by it.
    """
    saved = np.asarray(state.status) == SAVED
    n_saved = int(saved.sum())
    if n_saved == 0:
        return None
    i_mult = max(n_pts_target // n_saved, 1)
    n_new = n_saved * i_mult
    if batch_size is None:
        batch_size = n_new

    def rep(arr, fill=0):
        a = np.repeat(np.asarray(arr)[saved], i_mult, axis=0)
        if len(a) < batch_size:
            pad = np.full(batch_size - len(a), fill, a.dtype)
            a = np.concatenate([a, pad])
        return a

    return SplitPopulation(
        weight=rep(state.weight) / i_mult,
        pb=rep(state.pb), pperp=rep(state.pperp), phi=rep(state.phi),
        x=rep(state.x), igrid=rep(state.igrid),
        ux_prev=rep(state.ux_prev),
        downstream=rep(state.downstream), inj=rep(state.inj),
        xn_per=rep(state.xn_per), prp_x=rep(state.prp_x),
        acctime=rep(state.acctime), tcut=rep(state.tcut),
        n=n_new, multiplicity=i_mult,
    )
