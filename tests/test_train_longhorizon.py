"""Long-horizon (30-step, f32) training-equivalence vs the torch reference.

VERDICT r2 item 4: the 2-step f64 oracle proves step semantics; this test
proves the *trajectory* — 30 float32 steps on a learnable batch stream
(labels are a function of the images, so the loss genuinely descends
7.67 -> 3.88), reference loop vs our jitted train_step, with momentum,
poly LR and BN running stats compounding, ending in a held-out eval.

Every band is JUSTIFIED by a measured control, not assumed: the driver
also runs the reference against itself with a 1-ULP initial perturbation
(the "twin"), which measures the intrinsic f32 chaos of the system. Key
calibration findings (tests/train_longhorizon_driver.py, --bug modes):

* f32 momentum-SGD here is chaotic — the twin decorrelates to a weight
  distance ~= the run's total weight movement within the horizon, and
  deliberately seeded *optimizer* bugs (beta1=0.85, lr_pow=1.0) measure
  INSIDE the twin envelope. No trajectory test at this scale can detect
  them — which is precisely the f64 2-step oracle's job (lr_pow=1.0
  rings there at 1e-4 against a 1e-7-scale noise floor).
* What the trajectory CAN gate — and this test does — is everything
  gross or systematic beyond the chaos envelope: wrong loss scaling,
  wrong LR magnitude or group assignment, broken BN stat updates,
  mis-converted weights (drift at step 0/1, before chaos onset at step
  ~3, is gated at 1e-4/1e-2), and any cumulative divergence that pushes
  loss, weights, BN stats, or the held-out eval distribution a constant
  factor outside the twin's measured band.

Measured (clean run): step-0 drift 2.4e-6, step-1 9.7e-4; max loss drift
0.201 vs twin 0.123; mean/final loss rel gap 1.3%/3.1%; eval softmax L1
0.0089 vs twin 0.0093 (ours is as close to the reference as the
reference is to its own ULP-twin); weight distance 0.0838 vs twin
0.0830; BN-stat distance 0.0840 vs twin 0.0886. Gates keep 2-3x margin.
"""

import json
import os
import subprocess
import sys

import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


@pytest.mark.slow
def test_longhorizon_f32_trajectory():
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", SEMSEG_PLATFORM="cpu")
    env.pop("JAX_ENABLE_X64", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(TESTS_DIR, "train_longhorizon_driver.py")],
        env=env,
        cwd=TESTS_DIR,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT_JSON:")]
    assert line, proc.stdout[-4000:]
    r = json.loads(line[0][len("RESULT_JSON:"):])
    print(
        f"\n[longhorizon {r['case']} {r['steps']} steps] "
        f"loss {r['ref_losses'][0]:.3f}->{r['ref_losses'][-1]:.3f} (ref) vs "
        f"->{r['our_losses'][-1]:.3f} (ours); "
        f"max_drift ours {r['max_drift_ours']:.3f} / twin {r['max_drift_twin']:.3f}; "
        f"wdist ours {r['wdist_params_ours']:.4f} / twin {r['wdist_params_twin']:.4f}; "
        f"eval L1 ours {r['eval_l1_ours']:.4f} / twin {r['eval_l1_twin']:.4f}"
    )

    # The task must actually train — otherwise every gate below is vacuous.
    assert r["ref_losses"][-1] < r["ref_losses"][0] - 2.0
    assert r["our_losses"][-1] < r["our_losses"][0] - 2.0

    # Pre-chaos gates (identical weights; chaos onset measured at step ~3):
    # step 0 is a pure converted-forward check, step 1 includes one update.
    assert r["drift_ours"][0] <= 1e-4, r["drift_ours"][:3]
    assert r["drift_ours"][1] <= 1e-2, r["drift_ours"][:3]

    # Trajectory inside a constant factor of the twin's chaos envelope.
    assert r["max_drift_ours"] <= 3.0 * max(r["max_drift_twin"], 0.05), r
    assert r["mean_loss_rel_gap"] <= 0.05, r
    assert r["final_loss_rel_gap"] <= 0.10, r

    # Cumulative state: weights, BN running stats, held-out eval softmax.
    assert r["wdist_params_ours"] <= 1.5 * r["wdist_params_twin"], r
    assert r["wdist_bnstats_ours"] <= 1.5 * r["wdist_bnstats_twin"], r
    assert r["eval_l1_ours"] <= 2.0 * max(r["eval_l1_twin"], 5e-3), r
