#!/bin/bash
# Round-4 queue item 1: compose PARITY_FLAGSHIP_25K.md on a LIVE TPU from the
# recovered 25k reference cache (~10-15 min; ref wall in cache = 16,011 s).
# Run from /tmp so the parity driver's sandbox stays off the repo. Needs an
# idle chip (no concurrent TPU process — verify-skill hygiene).
cd /tmp
python -m pinn_depthestimation_tpu.parity \
  --iters 25000 --lbfgs 500 --hidden-layers 100 --width 20 \
  --nx 81 --ny 261 --nan-fraction 0.408 \
  --ref-cache /root/repo/.soak/ref_25k.npz \
  --out /root/repo/PARITY_FLAGSHIP_25K.md
# then: cite the report in STATUS.md + README.md ("Proven parity" section)
