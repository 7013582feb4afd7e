"""Shard-combinable eval metrics (eval.py --metrics-out + combiner tool)."""

import numpy as np

from tools.combine_eval_shards import main as combine_main


def test_combined_equals_global(tmp_path, capsys):
    """Summing shard npz files must reproduce the single-run metrics."""
    rng = np.random.RandomState(0)
    C = 5
    inter = rng.randint(0, 100, (2, C)).astype(np.float64)
    union = inter + rng.randint(1, 100, (2, C))
    acc = rng.randint(0, 1000, 2).astype(np.float64)
    pix = acc + rng.randint(1, 1000, 2)

    paths = []
    for s in range(2):
        p = tmp_path / f"shard{s}.npz"
        np.savez(p, acc_sum=acc[s], pix_count=pix[s],
                 inter=inter[s], union=union[s])
        paths.append(str(p))

    combine_main(paths)
    out = capsys.readouterr().out
    want_miou = (inter.sum(0) / (union.sum(0) + 1e-10)).mean()
    want_acc = 100 * acc.sum() / (pix.sum() + 1e-10)
    assert f"Mean IoU: {want_miou:.4f}" in out
    assert f"Accuracy: {want_acc:.2f}%" in out
