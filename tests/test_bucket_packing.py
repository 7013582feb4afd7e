"""Cost-model bucket packing: fold under-filled batches into larger
buckets only when the padded-batch-area model says it wins, without
changing results for padding-insensitive models (same exactness argument
as the denylist routing — every path masks the pad region)."""

import numpy as np

from semseg_tpu.engine import BatchedInferenceEngine

from test_bucket_denylist import _make


def _groups_of(engine, shape_counts):
    """Build a raw {bucket: [tasks]} dict from (shape, n_tasks) pairs."""
    groups = {}
    for (h, w), n in shape_counts:
        groups[(h, w)] = [
            (i, np.zeros((1, h, w, 3), np.uint8), h, w) for i in range(n)
        ]
    return groups


class TestPackCostModel:
    def test_folds_single_leftover_into_spare_slot(self):
        # 1 task at 96x128 + 3 tasks at 304x400, batch 4: running the
        # small group costs an extra 96*128 area-batch; folding it into
        # the large group's spare slot costs nothing extra.
        eng = _make(BatchedInferenceEngine, ())
        eng.pack_buckets, eng.batch_size = True, 4
        eng.pack_max_area_ratio = float("inf")  # caps tested separately
        eng.pack_max_pad_px = 1 << 30
        groups = eng._pack_groups(
            _groups_of(eng, [((96, 128), 1), ((304, 400), 3)])
        )
        assert set(groups) == {(304, 400)}
        assert len(groups[(304, 400)]) == 4

    def test_keeps_full_batches_separate(self):
        # Both groups already fill exact batches — folding the small one
        # would ADD a padded batch at the large area. Must not merge.
        eng = _make(BatchedInferenceEngine, ())
        eng.pack_buckets, eng.batch_size = True, 4
        eng.pack_max_area_ratio = float("inf")  # caps tested separately
        eng.pack_max_pad_px = 1 << 30
        groups = eng._pack_groups(
            _groups_of(eng, [((96, 128), 4), ((304, 400), 4)])
        )
        assert set(groups) == {(96, 128), (304, 400)}

    def test_never_folds_into_non_covering_bucket(self):
        # (96, 416) does not fit inside (304, 400) in both dims — even a
        # spare slot must not attract it.
        eng = _make(BatchedInferenceEngine, ())
        eng.pack_buckets, eng.batch_size = True, 4
        eng.pack_max_area_ratio = float("inf")  # caps tested separately
        eng.pack_max_pad_px = 1 << 30
        groups = eng._pack_groups(
            _groups_of(eng, [((96, 416), 1), ((304, 400), 3)])
        )
        assert set(groups) == {(96, 416), (304, 400)}

    def test_off_by_default(self):
        eng = _make(BatchedInferenceEngine, ())
        assert eng.pack_buckets is False
        groups = _groups_of(eng, [((96, 128), 1), ((304, 400), 3)])
        assert eng._pack_groups(dict(groups)).keys() == groups.keys()

    def test_transitive_fold_chain(self):
        # Smallest-first greedy: 64x64 folds upward, then the combined
        # group can still fold into the largest covering bucket when that
        # lowers total cost.
        eng = _make(BatchedInferenceEngine, ())
        eng.pack_buckets, eng.batch_size = True, 4
        eng.pack_max_area_ratio = float("inf")  # caps tested separately
        eng.pack_max_pad_px = 1 << 30
        groups = eng._pack_groups(
            _groups_of(
                eng, [((64, 64), 1), ((96, 128), 1), ((304, 400), 2)]
            )
        )
        assert set(groups) == {(304, 400)}
        assert len(groups[(304, 400)]) == 4


class TestPackCap:
    def test_cap_blocks_distant_folds(self):
        # Default cap 1.3: a 96x128 task must NOT fold into a bucket ~10x
        # its area even with spare slots (pad cost is invisible to the
        # FLOP model — the uncapped fold measured 0.4 per-class IoU
        # swings, PARITY.md).
        eng = _make(BatchedInferenceEngine, ())
        eng.pack_buckets, eng.batch_size = True, 4
        groups = eng._pack_groups(
            _groups_of(eng, [((96, 128), 1), ((304, 400), 3)])
        )
        assert set(groups) == {(96, 128), (304, 400)}

    def test_cap_allows_adjacent_folds(self):
        # (288, 384) -> (304, 400) is a 1.10x area fold: allowed.
        eng = _make(BatchedInferenceEngine, ())
        eng.pack_buckets, eng.batch_size = True, 4
        groups = eng._pack_groups(
            _groups_of(eng, [((288, 384), 1), ((304, 400), 3)])
        )
        assert set(groups) == {(304, 400)}
        assert len(groups[(304, 400)]) == 4


class TestPackedResultsExact:
    def test_batched_metrics_unchanged_by_packing(self):
        rng = np.random.RandomState(0)
        # Shapes chosen so packing triggers UNDER the default area cap:
        # the single (288, 384) level (1.10x) folds into (304, 400).
        pyrs = [
            [
                rng.randint(0, 255, (1, 304, 400, 3)).astype(np.uint8),
                rng.randint(0, 255, (1, 288, 384, 3)).astype(np.uint8),
            ],
            [rng.randint(0, 255, (1, 300, 396, 3)).astype(np.uint8)],
        ]
        labels = [
            rng.randint(-1, 150, (304, 400)).astype(np.int32),
            rng.randint(-1, 150, (300, 396)).astype(np.int32),
        ]
        plain = _make(BatchedInferenceEngine, ())
        packed = _make(BatchedInferenceEngine, ())
        packed.pack_buckets = True
        m0 = plain.batched_metrics(pyrs, labels)
        m1 = packed.batched_metrics(pyrs, labels)
        for (a, b) in zip(m0, m1):
            for (x, y) in zip(a, b):
                np.testing.assert_allclose(x, y, atol=1e-5)


def test_eval_cli_packs_by_default():
    """Packing is the cli/eval.py DEFAULT protocol since round 4 (PARITY.md
    packed rows: step-8 drift below the --exact noise floor); the engine
    constructor keeps pack_buckets=False so programmatic users opt in.
    --no-pack-buckets must exist as the opt-out."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "eval.py"), "--help"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr
    assert "--no-pack-buckets" in proc.stdout


def test_uploader_thread_unblocks_when_consumer_dies():
    """Upload pipelining is ON by default: when the consumer loop raises
    (e.g. a device-worker crash in forward_chunk), the chunk-uploader
    thread must exit — not stay blocked in queue.put() pinning staged
    device buffers (round-4 review finding)."""
    import threading
    import time

    import pytest

    eng = _make(BatchedInferenceEngine, ())
    tasks = [(i, np.zeros((1, 16, 16, 3), np.uint8), 16, 16) for i in range(8)]

    def stage_chunk(key, padded):
        return object()  # stand-in for staged device arrays

    def forward_chunk(key, padded, staged=None):
        raise RuntimeError("device worker crashed")

    with pytest.raises(RuntimeError, match="device worker crashed"):
        eng._accumulate_on_device(
            {i: (16, 16) for i in range(8)},
            {(16, 16): tasks},
            {i: 1 for i in range(8)},
            forward_chunk,
            lambda i, acc: None,
            stage_chunk=stage_chunk,
        )
    deadline = time.time() + 10
    while time.time() < deadline:
        if not any(
            t.name == "chunk-uploader" and t.is_alive()
            for t in threading.enumerate()
        ):
            break
        time.sleep(0.05)
    else:
        raise AssertionError("chunk-uploader thread still alive")
