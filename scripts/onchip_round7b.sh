#!/bin/bash
# Round-7 follow-on sequence (after onchip_round7.sh), in priority
# order for the remaining wall clock:
#  I:  the gamma0=5 science run re-run with healthy statistics
#      (--n-pts-mult 16) and the degenerate-smoothing guard: the
#      first sequence proved the band fix (zero oob over 10
#      iterations) but the shipped 100/400/2000 particle counts
#      starved the nonlinear fixed point after the subshock weakened
#      (STATUS.md round 7).
#  B2: the XLA-engine --dsa correctness baseline on the per-segment
#      hybrid (the whole-ladder scan program crashed the TPU worker
#      at 51 segments x 200k-step cap — now gated off on TPU); 1
#      iteration at 1x counts for the megakernel-vs-XLA spectral
#      cross-check against stage A's first iteration.
#  G:  band-width throughput sweep (VERDICT r3 item 3).
#  C2: Keshet-Waxman at doubled N_g + 2x particles — convergence
#      check toward the pitch-diffusion limit (stage C's s_fit =
#      4.458 sat 0.255 above s_KW = 4.202, just outside tol 0.25).
#  H:  endurance run (HBM stability + sustained rate).
set -x
LOG=/tmp/onchip_r7b.log
cd /root/repo

echo "=== stage I: --dsa science run, 16x particles, 5 iters ===" >> $LOG
MCS_OVERLAP_REDUCE=0 MCS_SUBTIMERS=1 timeout 4000 \
    python scripts/flagship_baseline.py --dsa \
    --pcuts-per-decade 4 --iters 5 --max-helix-steps 200000 \
    --n-pts-mult 16 -o flagship_dsa16_out >> $LOG 2>&1

echo "=== stage B2: XLA-engine --dsa baseline (1 iter, per-seg hybrid) ===" >> $LOG
MCS_MEGAKERNEL=0 MCS_SUBTIMERS=1 timeout 5400 \
    python scripts/flagship_baseline.py --dsa \
    --pcuts-per-decade 4 --iters 1 --max-helix-steps 200000 \
    -o flagship_dsa_xla_out >> $LOG 2>&1

echo "=== stage G: band-width sweep ===" >> $LOG
timeout 3600 python scripts/probe_band_width.py \
    --bands 1024,2048,4096,8448 >> $LOG 2>&1

echo "=== stage C2: Keshet-Waxman, N_g=16000, 16k/pcut ===" >> $LOG
timeout 2400 python scripts/flagship_keshet_waxman.py \
    --ng 16000 --per-pcut 16384 >> $LOG 2>&1

echo "=== stage H: endurance (1e7 trajectories) ===" >> $LOG
timeout 2400 python scripts/flagship_endurance.py \
    --trajectories 1e7 >> $LOG 2>&1

echo "=== done ===" >> $LOG
