#!/bin/bash
# Round-7 on-chip sequence: the gamma0=5 --dsa science run with the
# DERIVED tally band (ops/pallas_step.derive_mega_band — 8448 cells at
# beta0=0.98 vs the fixed 2048 that overflowed in rounds 5-6), plus
# the Keshet-Waxman relativistic spectral-index acceptance run that
# earlier sequences omitted (VERDICT r3 items 1 and 4).
# Ordered to fail fast: a 2-iteration --dsa validation (the derived
# band either survives the ladder or raises at a sync point within
# minutes) before committing wall clock to the 10-iteration science
# run.  Each stage appends to /tmp/onchip_r7.log.
set -x
LOG=/tmp/onchip_r7.log
cd /root/repo

echo "=== stage A: --dsa megakernel validation (2 iters) ===" >> $LOG
# Fail-fast: oob tolerance now checked at every ladder sync point
# (MCS_HYBRID_SYNC_EVERY segments), so a band miss raises in minutes.
# Overlapped reductions off: keep the science run decoupled from the
# (separately validated) reduction-overlap change.
MCS_OOB_LOG=1 MCS_OVERLAP_REDUCE=0 MCS_SUBTIMERS=1 timeout 6000 \
    python scripts/flagship_baseline.py --dsa \
    --pcuts-per-decade 4 --iters 2 --max-helix-steps 200000 \
    -o flagship_dsa2_out >> $LOG 2>&1 || exit 1

echo "=== stage B: XLA-engine --dsa correctness baseline (2 iters) ===" >> $LOG
# No tally window on the XLA path: cannot oob; megakernel-vs-XLA
# spectral agreement is the correctness evidence for item 1.
MCS_MEGAKERNEL=0 timeout 12000 python scripts/flagship_baseline.py --dsa \
    --pcuts-per-decade 4 --iters 2 --max-helix-steps 200000 \
    -o flagship_dsa_xla_out >> $LOG 2>&1

echo "=== stage C: Keshet-Waxman relativistic spectral index ===" >> $LOG
timeout 6000 python scripts/flagship_keshet_waxman.py >> $LOG 2>&1

echo "=== stage D: --dsa science run (10 iters) ===" >> $LOG
MCS_OVERLAP_REDUCE=0 MCS_SUBTIMERS=1 timeout 12000 \
    python scripts/flagship_baseline.py --dsa \
    --pcuts-per-decade 4 --iters 10 --max-helix-steps 200000 \
    -o flagship_dsa_out >> $LOG 2>&1

echo "=== stage E: parity baseline with overlapped reductions ===" >> $LOG
MCS_SUBTIMERS=1 timeout 3000 python scripts/flagship_baseline.py \
    -o flagship_parity_out >> $LOG 2>&1

echo "=== stage F: bench ===" >> $LOG
timeout 2400 python bench.py >> $LOG 2>&1

echo "=== done ===" >> $LOG
