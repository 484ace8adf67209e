#!/bin/bash
# Round-6 on-chip sequence: validate the window-anchor fix + momentum
# re-sort, confirm no perf regression, then the --dsa science run that
# round 5 could not complete (check_oob at 1.33e-3 dropped |weight|).
# Each stage appends to /tmp/onchip_r6.log.
set -x
LOG=/tmp/onchip_r6.log
cd /root/repo

echo "=== tpu tier ===" >> $LOG
MCS_TPU_TESTS=1 timeout 3000 python -m pytest tests -m tpu -x -q >> $LOG 2>&1

echo "=== bench ===" >> $LOG
timeout 3000 python bench.py >> $LOG 2>&1

echo "=== flagship nonlinear 10 iters (perf-regression check) ===" >> $LOG
timeout 3000 python scripts/flagship_nonlinear.py >> $LOG 2>&1

echo "=== flagship baseline (as-shipped) ===" >> $LOG
timeout 3000 python scripts/flagship_baseline.py >> $LOG 2>&1

echo "=== flagship baseline --dsa science run (auto pcut ladder) ===" >> $LOG
# Round 5 failed here: below-window stragglers dragged the per-step
# band anchor and shed in-window bulk (1.33e-3 of |weight| vs tol
# 1e-5).  Fixed by in-window-only anchoring + momentum-coherent
# blocks; MCS_OOB_LOG attributes any residual drops per segment.
MCS_OOB_LOG=1 timeout 6000 python scripts/flagship_baseline.py --dsa \
    --pcuts-per-decade 4 --iters 10 --max-helix-steps 200000 \
    -o flagship_dsa_out >> $LOG 2>&1

echo "=== done ===" >> $LOG
