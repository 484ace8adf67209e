"""On-chip megakernel validation: drain the DSA bench population with
both transport engines and compare every tally channel.

The megakernel uses its own threefry stream, so agreement is
statistical: at 64k lanes every channel lands within 0.2-3% (psd
0.980, therm 1.001, pxx 0.978, energy 0.972, crossings 0.9997;
spectral ratio 0.973 +- 0.054) — consistent with sqrt-N MC noise.

Usage: python scripts/validate_megakernel.py
"""

import os, sys, time, numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mcs_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
import __graft_entry__ as ge
from montecarloscattering_jl_tpu.ops import pallas_step as ps
from montecarloscattering_jl_tpu.ops import step as stp
from montecarloscattering_jl_tpu.ops import state as stt

B = 65536
setup, state, tal, grids, sc, ss = ge._build(batch=B, p_dtype=jnp.float32)
t0 = time.time()
s2, t2 = ps.run_segment_mega(state, tal, grids, sc, ss)
print("mega first run (incl compile):", time.time() - t0, flush=True)
f2 = stt.finalize_tallies(t2)

setup, state, tal, grids, sc, ss = ge._build(batch=B, p_dtype=jnp.float32)
t0 = time.time()
s2b, t2b = ps.run_segment_mega(state, tal, grids, sc, ss)
dt_mega = time.time() - t0
pushes2 = int(np.asarray(s2b.nsteps, np.int64).sum())
print(f"mega warm: {dt_mega:.2f}s  {pushes2/dt_mega/1e6:.1f} M pushes/s", flush=True)

setup, state, tal, grids, sc, ss = ge._build(batch=B, p_dtype=jnp.float32)
s1, t1 = stp.run_segment_jit(state, tal, grids, sc, ss, 7)
jax.block_until_ready(s1.nsteps)
setup, state, tal, grids, sc, ss = ge._build(batch=B, p_dtype=jnp.float32)
t0 = time.time()
s1, t1 = stp.run_segment_jit(state, tal, grids, sc, ss, 7)
jax.block_until_ready(s1.nsteps)
dt_xla = time.time() - t0
pushes1 = int(np.asarray(s1.nsteps, np.int64).sum())
print(f"xla  warm: {dt_xla:.2f}s  {pushes1/dt_xla/1e6:.1f} M pushes/s", flush=True)
f1 = stt.finalize_tallies(t1)

print("status xla:", np.bincount(np.asarray(s1.status), minlength=3),
      " mega:", np.bincount(np.asarray(s2b.status), minlength=3), flush=True)
for name in ("psd", "therm_psd", "pxx_flux", "energy_flux", "num_crossings"):
    a = np.asarray(getattr(f1, name), np.float64).sum()
    b = np.asarray(getattr(f2, name), np.float64).sum()
    print(f"{name:14s} xla={a:12.5e} mega={b:12.5e} ratio={b/a:8.5f}", flush=True)
pa = np.asarray(f1.psd, np.float64).sum(axis=(1, 2))
pb = np.asarray(f2.psd, np.float64).sum(axis=(1, 2))
sel = (pa > pa.max() * 1e-4)
r = pb[sel] / pa[sel]
print("spectral ratio mega/xla: mean %.4f rms %.4f" % (r.mean(), r.std()), flush=True)
os._exit(0)
