"""FULL-MODEL train-step parity vs the torch reference (VERDICT item 2).

One identical batch + identical converted weights, TWO complete reference
train steps (poly LR via `adjust_learning_rate`, two-group SGD via
`create_optimizers`/`group_weight`, NLL ignore -1 + 0.4 deep supervision,
SyncBN parallel-mode statistics) vs two of our jitted `train_step`s —
comparing every updated parameter and BN running statistic.

Both sides run in FLOAT64 inside a subprocess (``JAX_ENABLE_X64`` is a
process-global flag), which collapses cross-framework f32 accumulation
noise to ~1e-12 so the 1e-7 tolerance catches semantic mismatches —
gradients through resize/adaptive-pool/BN, optimizer masks and update
order, schedule indexing, running-stat rules — with zero flakiness.
See tests/train_parity_driver.py for the driver.
"""

import json
import os
import subprocess
import sys

import pytest

from train_parity_driver import CASES

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


@pytest.mark.slow
@pytest.mark.parametrize(
    "case_idx", range(len(CASES)), ids=[f"{c[0]}-{c[1]}" for c in CASES]
)
def test_train_step_parity_f64(case_idx):
    env = dict(os.environ)
    env.update(
        JAX_ENABLE_X64="1",
        JAX_PLATFORMS="cpu",
        SEMSEG_PLATFORM="cpu",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(TESTS_DIR, "train_parity_driver.py"),
         str(case_idx)],
        env=env,
        cwd=TESTS_DIR,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT_JSON:")]
    assert line, proc.stdout[-4000:]
    result = json.loads(line[0][len("RESULT_JSON:"):])
    print(
        f"\n[train-parity {result['case']}] loss_err={result['loss_err']:.2e} "
        f"max_leaf_err={result['max_leaf_err']:.2e} over {result['n_leaves']} "
        f"leaves (worst: {result['worst_leaf']})"
    )
    # Measured: loss_err 4e-10..7e-8; max leaf err 8e-9 (c1_deepsup) /
    # 1.5e-7 (upernet) / 2.9e-7 (mobilenet depthwise) / 2.7e-6 (hrnet —
    # always a BN `var` leaf: the ssum-based variance formula shared with
    # the reference amplifies f64 accumulation-order differences by
    # ~ssum/var, and hrnet's 720-channel fused stage maximizes ssum). Any
    # semantic mismatch (wrong eps/momentum/decay/LR indexing) measures
    # >=1e-4 on these leaves — e.g. an hrnet momentum-0.1-vs-0.001 error
    # is O(0.1) — so the gates keep >=2 orders of margin.
    assert result["loss_err"] <= 1e-7, result
    assert result["max_leaf_err"] <= 1e-5, result
