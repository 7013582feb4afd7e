"""Driver for the 2-process multi-host integration test (run as subprocess).

Launched twice (process_id 0/1) by tests/test_multihost.py with the
SEMSEG_COORDINATOR / SEMSEG_NUM_PROCESSES / SEMSEG_PROCESS_ID environment
variables, each process with 2 virtual CPU devices → a 4-device global
mesh over Gloo. Exercises the REAL multi-host code path end-to-end:

* ``distributed.initialize()`` env-var handshake (mandatory — failures raise);
* ``shard_local_batch``: per-process local slices → one global sharded array;
* a jitted cross-process reduction over the global mesh;
* ``device_prefetch(..., put=shard_local_batch)`` — the train CLI's
  multi-host prefetch branch;
* primary-only checkpointing + a global barrier.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from semseg_tpu.parallel import distributed, mesh as mesh_mod  # noqa: E402


def main(out_dir):
    distributed.initialize()  # env-var path: SEMSEG_COORDINATOR etc.
    distributed.initialize()  # idempotent: second call must detect the client
    pid = jax.process_index()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    mesh = mesh_mod.make_mesh()
    assert mesh.devices.size == 4

    # Per-process local batches -> global sharded arrays, via the prefetch
    # thread exactly as cli/train.py's multi-host branch does — safe
    # because shard_local_batch launches no device collectives (the canvas
    # dims exchange is a KV-store RPC, see distributed._exchange_dims).
    # The two processes deliberately produce DIFFERENT (H, W) canvases —
    # the real TrainDataset streams are independent per host, so at any
    # step the padded batch shapes diverge; shard_local_batch must resolve
    # a common canvas (images zero-padded, labels ignore(-1)-padded) or the
    # global array assembly deadlocks/corrupts.
    h = 8 + 4 * pid  # process 0: 8 rows; process 1: 12 rows
    def local_batches():
        for step in range(3):
            yield {
                "img_data": np.full((2, h, 8, 3), pid + step, np.float32),
                "seg_label": np.full((2, 1 + pid, 1), pid, np.int32),
            }

    it = mesh_mod.device_prefetch(
        local_batches(), mesh, depth=2,
        put=lambda local: distributed.shard_local_batch(mesh, local),
    )

    reduce_fn = jax.jit(
        lambda b: (
            b["img_data"].sum(),
            b["seg_label"].sum(),
            (b["seg_label"] == -1).sum(),
        )
    )
    for step, batch in enumerate(it):
        # global canvas = max over processes: (12, 8); labels (2, 1)
        assert batch["img_data"].shape == (4, 12, 8, 3)
        assert batch["seg_label"].shape == (4, 2, 1)
        s_img, s_lab, n_ignore = reduce_fn(batch)
        # process 0 contributes 2*8*8*3 valid pixels of `step` (rest
        # zero-pad); process 1 contributes 2*12*8*3 of `step + 1`.
        expect = step * 2 * 8 * 8 * 3 + (step + 1) * 2 * 12 * 8 * 3
        np.testing.assert_allclose(float(s_img), expect)
        assert int(n_ignore) == 2  # process 0's padded label rows
        assert int(s_lab) == 2 * 2 * 1 - 2  # pid1 ones minus the pad -1s

    # Microbatched (grad-accum) assembly: leading K axis replicated, batch
    # dim 1 sharded, canvas sync on dims [2:4] — the train CLI's multi-host
    # branch with TPU.grad_accum > 1.
    from jax.sharding import PartitionSpec as P

    from semseg_tpu.parallel.train_step import stack_microbatches

    local = {
        "img_data": np.full((4, 8 + 2 * pid, 8, 3), pid + 1, np.float32),
        "seg_label": np.full((4, 2, 2), pid, np.int32),
    }
    g = distributed.shard_local_batch(
        mesh, stack_microbatches(local, 2), microbatched=True
    )
    assert g["img_data"].shape == (2, 4, 10, 8, 3), g["img_data"].shape
    assert g["seg_label"].shape == (2, 4, 2, 2)
    assert g["img_data"].sharding.spec == P(None, "data")
    s = float(jax.jit(lambda b: b["img_data"].sum())(g))
    np.testing.assert_allclose(s, 1 * 4 * 8 * 8 * 3 + 2 * 4 * 10 * 8 * 3)

    # Async checkpointing across processes: every process runs the fused
    # SPMD snapshot AND the orbax save (orbax coordinates the distributed
    # commit — a primary-only save would hang on its barrier); history
    # JSON lands only on the primary.
    from semseg_tpu.checkpoint import AsyncSaver, restore_tree
    from semseg_tpu.parallel.train_step import TrainState

    rep = mesh_mod.replicated(mesh)
    tiny = TrainState(
        step=jax.device_put(np.zeros((), np.int32) + 3, rep),
        params={"w": jax.device_put(np.arange(8, dtype=np.float32), rep)},
        batch_stats={},
        opt_state={},
        tx=None,
        model=None,
    )
    with AsyncSaver() as saver:
        saver.save(out_dir, 9, tiny, {"train": {"loss": [0.5]}})
    restored = restore_tree(os.path.join(out_dir, "epoch_9"))
    assert int(np.asarray(restored["step"])) == 3
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(8, dtype=np.float32)
    )
    if pid == 0:
        assert os.path.exists(os.path.join(out_dir, "history_epoch_9.json"))

    # Primary-only HOST-side artifacts (history JSON, markers, logs) behind
    # a global barrier — the division of labor save_train_state/AsyncSaver
    # use for everything that is not an orbax array write (orbax array
    # commits themselves are all-process coordinated, exercised above).
    marker = os.path.join(out_dir, "ckpt_marker")
    if distributed.is_primary():
        with open(marker, "w") as f:
            f.write("ok")
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ckpt_written")
    assert os.path.exists(marker)
    print(f"MULTIHOST_OK process={pid}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
