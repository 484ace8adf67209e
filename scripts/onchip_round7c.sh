#!/bin/bash
# Round-7c: retries after the long-program worker crashes in 7b.
# Finding: single device programs that EXECUTE for many minutes kill
# the axon TPU worker ("kernel fault" / UNAVAILABLE) — the hybrid
# seg program runs the whole drain (MAX_HELIX_STEPS/256 launches) in
# one program, so a 200k-step cap at 16x lanes (8 blocks/launch) or
# the XLA engine's 200k-step while_loop both exceed it.  A 50k cap
# keeps the worst program ~1 min and still clears the ~20k
# fine-scattering steps a gamma0=5 DSA cycle needs.
set -x
LOG=/tmp/onchip_r7c.log
cd /root/repo

echo "=== stage A50: mega --dsa 1 iter, cap 50k (cross-check ref) ===" >> $LOG
MCS_OVERLAP_REDUCE=0 timeout 3000 \
    python scripts/flagship_baseline.py --dsa \
    --pcuts-per-decade 4 --iters 1 --max-helix-steps 50000 \
    -o flagship_dsa_mega50_out >> $LOG 2>&1

echo "=== stage B50: XLA --dsa 1 iter, cap 50k (same config) ===" >> $LOG
MCS_MEGAKERNEL=0 MCS_OVERLAP_REDUCE=0 timeout 6000 \
    python scripts/flagship_baseline.py --dsa \
    --pcuts-per-decade 4 --iters 1 --max-helix-steps 50000 \
    -o flagship_dsa_xla50_out >> $LOG 2>&1

echo "=== stage I50: mega --dsa 5 iters, 16x particles, cap 50k ===" >> $LOG
MCS_OVERLAP_REDUCE=0 MCS_SUBTIMERS=1 timeout 6000 \
    python scripts/flagship_baseline.py --dsa \
    --pcuts-per-decade 4 --iters 5 --max-helix-steps 50000 \
    --n-pts-mult 16 -o flagship_dsa16_out >> $LOG 2>&1

echo "=== done ===" >> $LOG
