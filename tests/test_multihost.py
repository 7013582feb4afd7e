"""Multi-host (2-process) integration test — VERDICT item 7.

Launches tests/multihost_driver.py twice with a localhost coordinator
(Gloo CPU collectives, 2 virtual devices per process → 4-device global
mesh) and checks both processes complete the full multi-host path:
env-var ``initialize()``, ``shard_local_batch`` global-array assembly,
jitted cross-process reduction, the prefetch-thread multi-host branch,
and primary-only checkpointing behind a global barrier.

Also covers ``initialize()``'s failure modes in-process: explicit args
must raise on a bad handshake instead of silently degrading.
"""

import os
import socket
import subprocess
import sys

import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_training_path(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_PLATFORMS="cpu",
            SEMSEG_COORDINATOR=f"localhost:{port}",
            SEMSEG_NUM_PROCESSES="2",
            SEMSEG_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable,
                 os.path.join(TESTS_DIR, "multihost_driver.py"),
                 str(tmp_path)],
                env=env,
                cwd=TESTS_DIR,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {pid} failed:\n{err[-4000:]}"
        assert f"MULTIHOST_OK process={pid}" in out, out


def test_explicit_bad_handshake_raises():
    """Explicit coordinator args must NOT silently fall back to 1 process."""
    env = dict(os.environ)
    env.update(
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_PLATFORMS="cpu",
    )
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from semseg_tpu.parallel import distributed\n"
        "try:\n"
        "    distributed.initialize('localhost:1', num_processes=2,"
        " process_id=0, initialization_timeout=5)\n"
        "except Exception:\n"
        "    print('RAISED'); raise SystemExit(0)\n"
        "raise SystemExit(1)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=300,
    )
    # jax surfaces handshake failure either as a catchable exception or as
    # an absl FATAL process abort — both are LOUD failures; what must never
    # happen is a clean exit that silently continues single-process.
    raised = proc.returncode == 0 and "RAISED" in proc.stdout
    aborted = proc.returncode != 0 and (
        "DEADLINE" in proc.stderr or "Terminating process" in proc.stderr
    )
    assert raised or aborted, (proc.returncode, proc.stdout, proc.stderr[-2000:])


def test_kv_get_outwaits_peer_compiles(monkeypatch):
    """The canvas handshake must survive DEADLINE_EXCEEDED slices while a
    peer sits in a cold-cache compile, but still raise on a wedged peer."""
    from semseg_tpu.parallel import distributed as D

    class FlakyClient:
        def __init__(self, deadline_misses):
            self.misses = deadline_misses
            self.calls = 0

        def blocking_key_value_get(self, key, timeout_ms):
            self.calls += 1
            if self.calls <= self.misses:
                raise RuntimeError("DEADLINE_EXCEEDED: key not found")
            return "7,9"

    # Two expired slices, then the peer posts: returns the value.
    c = FlakyClient(2)
    assert D._kv_get_patient(c, "semseg/canvas_dims/0/1") == "7,9"
    assert c.calls == 3

    # A peer that never posts raises TimeoutError once the total budget
    # is exhausted (shrink the budget so the test is instant).
    monkeypatch.setattr(D, "_KV_TOTAL_MS", D._KV_SLICE_MS * 2)
    with pytest.raises(TimeoutError, match="never posted"):
        D._kv_get_patient(FlakyClient(10**9), "semseg/canvas_dims/1/0")

    # Non-deadline errors propagate immediately.
    class Broken:
        def blocking_key_value_get(self, key, timeout_ms):
            raise RuntimeError("connection reset by peer")

    with pytest.raises(RuntimeError, match="connection reset"):
        D._kv_get_patient(Broken(), "semseg/canvas_dims/2/0")
