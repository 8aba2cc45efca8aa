#!/bin/bash
# Recompose the three CMB parity reports with the round-5 generator (the
# chaotic-pipeline tracking note replaces the inapplicable prefix>=20
# boilerplate — VERDICT r4 item 7b), cache the framework h-field for the
# spread CI guard (tests/test_cmb_spread_attribution.py), and append the
# measured reference-vs-reference intrinsic-spread section to PARITY_CMB.md.
# ONE TPU process at a time: run this alone.
set -x
cd /root/repo
COMMON="--pipeline cmb --iters 50000 --lbfgs 3000 --tol-grad 1e-9 \
  --tol-change 1e-12 --hidden-layers 10 --width 10 --nx 81 --ny 261 \
  --nan-fraction 0.05"
python -m pinn_depthestimation_tpu.parity $COMMON \
  --ref-cache .soak/ref_50k_cmb_tight.npz --fw-cache .soak/fw_cmb_tight.npz \
  --out PARITY_CMB.md || true   # base recipe: field criterion CHECK is expected
python .soak/cmb_seed_spread.py --compose PARITY_CMB.md
python -m pinn_depthestimation_tpu.parity $COMMON --training-points 500 \
  --ref-cache .soak/ref_50k_cmb_t500.npz --out PARITY_CMB_T500.md
python -m pinn_depthestimation_tpu.parity $COMMON --training-points 200 \
  --ref-cache .soak/ref_50k_cmb_t200.npz --out PARITY_CMB_T200.md || true
