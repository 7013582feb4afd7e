"""Runtime fault learning: persistent registry, engine crash attribution,
and the eval CLI's heal-and-restart driver (all CPU; the subprocess
prober itself is exercised against the real backend by
tools/fault_probe.py runs, not in-suite)."""

import logging
import types

import numpy as np
import pytest

from semseg_tpu.engine import BatchedInferenceEngine, default_bucket_denylist
from semseg_tpu.utils import fault_registry

from test_bucket_denylist import _make


class TestRegistry:
    def test_record_load_roundtrip(self, tmp_path):
        base = str(tmp_path)
        assert fault_registry.known_buckets("axon", base) == frozenset()
        p = fault_registry.record(
            [(304, 400), (312, 400)], "axon", {"batch": 4}, base
        )
        assert p.endswith("axon.json")
        assert fault_registry.known_buckets("axon", base) == frozenset(
            {(304, 400), (312, 400)}
        )
        # merge keeps prior entries; per-shape meta is first-writer-wins
        fault_registry.record([(304, 408)], "axon", None, base)
        assert (304, 400) in fault_registry.known_buckets("axon", base)
        assert (304, 408) in fault_registry.known_buckets("axon", base)
        # other platforms are namespaced apart
        assert fault_registry.known_buckets("cpu", base) == frozenset()

    def test_corrupt_file_reads_empty(self, tmp_path):
        base = str(tmp_path)
        path = fault_registry.registry_path("axon", base)
        import os

        os.makedirs(os.path.dirname(path), exist_ok=True)
        open(path, "w").write("{not json")
        assert fault_registry.load("axon", base) == {}
        # and record still works over the corrupt file
        fault_registry.record([(8, 8)], "axon", None, base)
        assert fault_registry.known_buckets("axon", base) == frozenset(
            {(8, 8)}
        )

    def test_is_worker_crash(self):
        yes = [
            RuntimeError(
                "UNAVAILABLE: TPU worker process crashed or restarted."
            ),
            RuntimeError("INTERNAL: TPU backend error (Internal)."),
            RuntimeError("a kernel fault happened"),
        ]
        no = [ValueError("bad shape"), RuntimeError("out of memory")]
        assert all(fault_registry.is_worker_crash(e) for e in yes)
        assert not any(fault_registry.is_worker_crash(e) for e in no)

    def test_auto_denylist_merges_registry(self, tmp_path, monkeypatch):
        # On the CPU suite platform the static set is empty, so whatever
        # the registry has learned for "cpu" must surface via "auto".
        monkeypatch.setattr(fault_registry, "DEFAULT_DIR", str(tmp_path))
        assert default_bucket_denylist() == frozenset()
        fault_registry.record([(96, 128)], "cpu")
        assert default_bucket_denylist() == frozenset({(96, 128)})
        eng = _make(BatchedInferenceEngine, "auto")
        assert eng._bucket_key(96, 128) == (96, 136)


class TestSuspectTracking:
    def _pyr(self, rng, h, w):
        return [rng.randint(0, 255, (1, h, w, 3)).astype(np.uint8)]

    def test_verified_buckets_clear_suspects(self):
        rng = np.random.RandomState(0)
        eng = _make(BatchedInferenceEngine, ())
        pyrs = [self._pyr(rng, 96, 120), self._pyr(rng, 64, 80)]
        labels = [
            rng.randint(-1, 150, (96, 120)).astype(np.int32),
            rng.randint(-1, 150, (64, 80)).astype(np.int32),
        ]
        eng.batched_metrics(pyrs, labels)
        assert eng.suspect_buckets() == []
        assert (96, 120) in eng._verified_buckets

    def test_crash_leaves_suspects(self, monkeypatch):
        rng = np.random.RandomState(0)
        eng = _make(BatchedInferenceEngine, ())

        def boom(out, n):
            raise RuntimeError("TPU worker process crashed or restarted")

        monkeypatch.setattr(eng, "_fetch_packed_metrics", boom)
        pyrs = [self._pyr(rng, 96, 120)]
        labels = [rng.randint(-1, 150, (96, 120)).astype(np.int32)]
        with pytest.raises(RuntimeError):
            eng.batched_metrics(pyrs, labels)
        assert eng.suspect_buckets() == [(96, 120)]
        # previously-verified buckets are excluded from suspicion
        eng._verified_buckets.add((96, 120))
        assert eng.suspect_buckets() == []


class TestHealDriver:
    def _args(self, max_heal=2):
        return types.SimpleNamespace(max_heal=max_heal)

    def _engine_stub(self, suspects):
        return types.SimpleNamespace(
            suspect_buckets=lambda: suspects, device=None
        )

    def test_non_crash_reraises(self):
        from semseg_tpu.cli.eval import _heal_or_raise

        with pytest.raises(ValueError):
            _heal_or_raise(
                ValueError("nope"), [self._engine_stub([])], 4,
                self._args(), logging.getLogger("t"),
            )

    def test_exhausted_attempts_reraise(self, monkeypatch):
        from semseg_tpu.cli.eval import _heal_or_raise

        monkeypatch.setenv("SEMSEG_HEAL_ATTEMPT", "2")
        with pytest.raises(RuntimeError):
            _heal_or_raise(
                RuntimeError("TPU worker process crashed"),
                [self._engine_stub([(304, 400)])], 4, self._args(2),
                logging.getLogger("t"),
            )

    def test_heal_records_and_restarts(self, tmp_path, monkeypatch):
        import os

        from semseg_tpu import probing
        from semseg_tpu.cli import eval as eval_cli

        monkeypatch.setattr(
            fault_registry, "DEFAULT_DIR", str(tmp_path)
        )
        # seed via monkeypatch so the code's own mutation is restored at
        # teardown (it sets the var to "1" before exec'ing)
        monkeypatch.setenv("SEMSEG_HEAL_ATTEMPT", "0")
        probed = {}

        def fake_probe(shapes, spec, **kw):
            probed["shapes"] = list(shapes)
            probed["spec"] = spec
            return [shapes[0]], list(shapes[1:])

        execd = {}

        def fake_execv(exe, argv):
            execd["argv"] = argv
            raise SystemExit(0)  # stand-in for the process replacement

        monkeypatch.setattr(probing, "probe_shapes", fake_probe)
        monkeypatch.setattr(os, "execv", fake_execv)
        with pytest.raises(SystemExit):
            eval_cli._heal_or_raise(
                RuntimeError("TPU worker process crashed or restarted"),
                [self._engine_stub([(304, 400), (96, 128)])], 4,
                self._args(2), logging.getLogger("t"),
                argv=["--cfg", "x.yaml"],
            )
        assert probed["shapes"] == [(304, 400), (96, 128)]
        assert probed["spec"]["batch"] == 4
        # only the probe-confirmed fault is persisted
        assert fault_registry.known_buckets("cpu") == frozenset({(304, 400)})
        assert os.environ["SEMSEG_HEAL_ATTEMPT"] == "1"
        assert execd["argv"][-2:] == ["--cfg", "x.yaml"]
