"""CI guard for the CMB base-recipe parity attribution (round-5 VERDICT item 1).

PARITY_CMB.md's field criterion misses at the reference's own
``config_CMB.json`` recipe (training_points=12 — reference train.py:237-240):
framework-vs-reference h-field RMSE 2.12% of truth scale vs the <=1% bar.
The attribution — h is underdetermined at 12 observation rows — is MEASURED
by ``.soak/cmb_seed_spread.py``: three executed-reference runs at the exact
recipe with different np/torch seeds (different 12-row fidelity subsamples +
initial weights) disagree pairwise by 7.6-10.2% of the truth depth scale.
The run caches are git-tracked (`.soak/ref_50k_cmb_tight.npz` seed 1234,
`.soak/ref_cmb_seed{4321,777}.npz`); this guard recomputes the pairwise
spread from them and asserts the framework's same-seed gap sits strictly
inside the reference's own intrinsic spread — i.e. the attribution stays a
measurement, not an assertion, and any future cache/recipe drift that would
invalidate it fails CI.
"""

import os

import numpy as np
import pytest

SOAK = os.path.join(os.path.dirname(__file__), os.pardir, ".soak")

# PARITY_CMB.md "Recovered h" section: framework vs same-seed (1234)
# reference, RMSE over the shared collocation rows / truth depth scale.
FRAMEWORK_GAP = 0.0212

CACHES = {
    1234: "ref_50k_cmb_tight.npz",
    4321: "ref_cmb_seed4321.npz",
    777: "ref_cmb_seed777.npz",
}


@pytest.fixture(scope="module")
def runs():
    loaded = {}
    for seed, name in CACHES.items():
        path = os.path.join(SOAK, name)
        if not os.path.exists(path):
            pytest.skip(f"reference cache {name} not present")
        loaded[seed] = np.load(path)
    return loaded


def test_caches_are_the_same_problem(runs):
    """All three runs predict h on the identical collocation rows (the data
    seed stays 21 across runs; only np/torch seeds differ)."""
    shapes = {seed: z["h"].shape for seed, z in runs.items()}
    assert len(set(shapes.values())) == 1, shapes
    # and they are genuinely different solutions, not copies
    for a in runs:
        for b in runs:
            if a < b:
                assert not np.allclose(runs[a]["h"], runs[b]["h"])


def test_framework_gap_inside_reference_intrinsic_spread(runs):
    # truth depth scale over the masked collocation rows, recomputed from
    # the same deterministic synthetic dataset the runs trained on
    import sys

    sys.path.insert(0, SOAK)
    from cmb_seed_spread import build_problem, truth_scale  # noqa: E402

    import tempfile

    tmp = tempfile.mkdtemp()
    cfg_raw, mat = build_problem(tmp)
    scale = truth_scale(cfg_raw, mat)
    assert 0.1 < scale < 0.3  # beach_fields plane recipe: 0.16 m

    seeds = sorted(runs)
    spreads = [
        float(np.sqrt(np.mean((runs[a]["h"] - runs[b]["h"]) ** 2))) / scale
        for i, a in enumerate(seeds)
        for b in seeds[i + 1 :]
    ]
    assert len(spreads) == 3

    # when the framework-phase cache exists (written by the report
    # recompose, parity --fw-cache), recompute the framework-vs-reference
    # gap live instead of trusting the recorded 2.12%
    fw_cache = os.path.join(SOAK, "fw_cmb_tight.npz")
    framework_gap = FRAMEWORK_GAP
    if os.path.exists(fw_cache):
        fw_h = np.load(fw_cache)["h"]
        assert fw_h.shape == runs[1234]["h"].shape
        framework_gap = (
            float(np.sqrt(np.mean((fw_h - runs[1234]["h"]) ** 2))) / scale
        )
        # the recorded number stays accurate (chaotic mid-schedule, but the
        # terminal field is stable across recomposes at the same seed)
        assert framework_gap < 0.05, framework_gap
    # the measured attribution: every ref-vs-ref pair disagrees by MORE than
    # the framework-vs-reference gap (7.64-10.15% vs 2.12% as recorded)
    assert min(spreads) > 2 * framework_gap, (
        f"reference intrinsic spread {min(spreads):.2%} no longer dominates "
        f"the framework gap {framework_gap:.2%} — the underdeterminacy "
        f"attribution in PARITY_CMB.md is invalidated"
    )
    # and the recorded numbers stay what PARITY_CMB.md quotes (cache drift)
    assert 0.07 < min(spreads) < 0.09
    assert 0.09 < max(spreads) < 0.12
