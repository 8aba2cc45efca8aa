#!/bin/bash
# Launch the FULL 50k-schedule torch reference run at flagship shape as a
# nice-19 background job, caching to .soak/ref_50k.npz (round-4 compose).
cd /tmp
nohup nice -n 19 python -m pinn_depthestimation_tpu.parity \
  --iters 50000 --lbfgs 500 --hidden-layers 100 --width 20 \
  --nx 81 --ny 261 --nan-fraction 0.408 \
  --ref-cache /root/repo/.soak/ref_50k.npz --ref-only \
  --out /tmp/unused_50k.md > /tmp/parity_50k_ref.log 2>&1 &
echo $! > /tmp/parity_50k.pid
echo "launched pid $(cat /tmp/parity_50k.pid)"
