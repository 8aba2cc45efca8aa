#!/bin/bash
# Round-4: compose the FULL-schedule flagship parity (50k Adam + 500 L-BFGS
# evals — the reference's actual product schedule) from the ref_50k.npz cache
# produced by launch_ref_50k.sh (round 3b, ~9-10 h torch CPU). Live TPU,
# idle chip. Expect ~25-35 min (2x the 25k compose).
cd /tmp
python -m pinn_depthestimation_tpu.parity \
  --iters 50000 --lbfgs 500 --hidden-layers 100 --width 20 \
  --nx 81 --ny 261 --nan-fraction 0.408 \
  --ref-cache /root/repo/.soak/ref_50k.npz \
  --out /root/repo/PARITY_FLAGSHIP_50K.md
# then: cite in STATUS.md + README.md; this supersedes the 5k/25k reports as
# the headline flagship-parity evidence (full reference schedule, wall-clock
# head-to-head vs the cached 16h-class torch run)
