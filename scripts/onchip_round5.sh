#!/bin/bash
# Round-5 on-chip validation + measurement sequence (run when the TPU
# tunnel is live).  Each stage appends to /tmp/onchip_r5.log.
set -x
LOG=/tmp/onchip_r5.log
cd /root/repo

echo "=== tpu tier ===" >> $LOG
MCS_TPU_TESTS=1 timeout 3000 python -m pytest tests -m tpu -x -q >> $LOG 2>&1

echo "=== bench ===" >> $LOG
timeout 3000 python bench.py >> $LOG 2>&1

echo "=== probe_launch_steps 65536 ===" >> $LOG
timeout 2000 python scripts/probe_launch_steps.py --batch 65536 >> $LOG 2>&1

echo "=== probe_mega_hybrid 65536 (hybrid only) ===" >> $LOG
timeout 2000 python scripts/probe_mega_hybrid.py --batch 65536 --skip A,B >> $LOG 2>&1

echo "=== flagship nonlinear 10 iters ===" >> $LOG
timeout 3000 python scripts/flagship_nonlinear.py >> $LOG 2>&1

echo "=== flagship baseline (as-shipped) ===" >> $LOG
timeout 3000 python scripts/flagship_baseline.py >> $LOG 2>&1

echo "=== flagship baseline --dsa science run (auto pcut ladder) ===" >> $LOG
# the shipped 45-pcut ladder cannot climb at gamma0=5 (factor-60 first
# gap vs P_ret ~ 0.25); the dense geometric ladder can — this is the
# first full nonlinear relativistic science run of the framework.
# MCS_MAX_HELIX_STEPS: the reference's 10k helix cap (its own FIXME,
# particle_loop.jl:162) kills lanes after ~5 fine gyroperiods — a DSA
# cycle ladder needs ~43 doubling cycles, so the cap must be raised
# for the science run (CPU smoke: at 10k the chain dies by step-cap
# with ~5k mean pushes/lane; the cap-raised run climbs).
timeout 6000 python scripts/flagship_baseline.py --dsa \
    --pcuts-per-decade 4 --iters 10 --max-helix-steps 200000 \
    -o flagship_dsa_out >> $LOG 2>&1

echo "=== done ===" >> $LOG
