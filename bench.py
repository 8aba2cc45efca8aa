"""Driver benchmark entry point — prints ONE JSON line (see BASELINE.md).

Delegates to ``pinn_depthestimation_tpu.benchmarks`` so the same measurement
is available as ``pinn-tpu bench`` from the installed package.
"""

from pinn_depthestimation_tpu.benchmarks import main

if __name__ == "__main__":
    main()
