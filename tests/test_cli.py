"""End-to-end CLI smoke tests (subprocess, CPU, synthetic mini-dataset).

The de-facto equivalent of the reference's demo_test.sh operational test:
train 2 epochs → checkpoint → resume → eval with the native checkpoint →
test.py on a raw image.
"""

import json
import os
import subprocess
import sys

import numpy as np

import jax
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini")
    rng = np.random.RandomState(0)
    recs = []
    os.makedirs(root / "img")
    os.makedirs(root / "ann")
    for i, (h, w) in enumerate([(60, 80), (90, 70), (64, 96), (80, 60)]):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(
            root / "img" / f"{i}.jpg"
        )
        Image.fromarray(rng.randint(0, 151, (h, w)).astype(np.uint8), "L").save(
            root / "ann" / f"{i}.png"
        )
        recs.append(
            {"fpath_img": f"img/{i}.jpg", "fpath_segm": f"ann/{i}.png",
             "width": w, "height": h}
        )
    (root / "train.odgt").write_text("\n".join(json.dumps(r) for r in recs[:3]))
    (root / "val.odgt").write_text(json.dumps(recs[3]))
    return root


def run_cli(script, *args, timeout=900):
    env = dict(os.environ, SEMSEG_PLATFORM="cpu")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"{script} failed:\n{proc.stdout}\n{proc.stderr}"
    return proc.stdout + proc.stderr


COMMON = [
    "--cfg", "config/ade20k-mobilenetv2dilated-c1_deepsup.yaml",
    "DATASET.imgSizes", "(48,64)",
    "DATASET.imgMaxSize", "100",
    "TPU.compute_dtype", "float32",
    # No ImageNet-backbone download attempts from the test sandbox (each
    # train launch would pay the 30 s offline-socket timeout).
    "MODEL.pretrained_encoder", "False",
]


@pytest.mark.slow
def test_train_eval_test_cycle(mini, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    data_opts = [
        "DIR", ckpt,
        "DATASET.root_dataset", str(mini),
        "DATASET.list_train", str(mini / "train.odgt"),
        "DATASET.list_val", str(mini / "val.odgt"),
    ]
    train_opts = [
        "TRAIN.num_epoch", "1", "TRAIN.epoch_iters", "2",
        "TRAIN.disp_iter", "1", "TRAIN.batch_size_per_gpu", "1",
        "TRAIN.workers", "1",
    ]

    out = run_cli("train.py", "--devices", "1", *COMMON, *data_opts, *train_opts)
    assert "Training Done!" in out
    assert os.path.isdir(os.path.join(ckpt, "epoch_1"))
    assert os.path.exists(os.path.join(ckpt, "config.yaml"))

    # resume for one more epoch from the saved state
    out = run_cli(
        "train.py", "--devices", "1", *COMMON, *data_opts, *train_opts,
        "TRAIN.start_epoch", "1", "TRAIN.num_epoch", "2",
    )
    assert "Resumed from epoch 1" in out
    assert os.path.isdir(os.path.join(ckpt, "epoch_2"))

    trace_dir = str(tmp_path_factory.mktemp("trace"))
    out = run_cli(
        "eval.py", "--profile", trace_dir, *COMMON, *data_opts,
        "VAL.checkpoint", "epoch_2.pth",
    )
    assert "Mean IoU" in out and "Evaluation Done!" in out
    # --profile wrote a JAX profiler trace (plugins/profile/<ts>/*)
    assert "Wrote profiler trace" in out
    assert any(
        files for _, _, files in os.walk(trace_dir)
    ), f"empty profiler trace dir {trace_dir}"

    # multi-device eval: round-robin over 2 virtual devices
    out = run_cli(
        "eval.py", "--devices", "2", *COMMON, *data_opts,
        "VAL.checkpoint", "epoch_2.pth",
    )
    assert "Evaluation Done!" in out

    result_dir = str(tmp_path_factory.mktemp("result"))
    out = run_cli(
        "test.py", "--imgs", str(mini / "img" / "0.jpg"), *COMMON,
        "DIR", ckpt, "TEST.checkpoint", "epoch_2.pth",
        "TEST.result", result_dir,
    )
    assert "Inference done!" in out
    assert os.path.exists(os.path.join(result_dir, "0.png"))


def test_build_train_mesh_selection():
    """Mesh-selection logic behind the TPU.spatial knob (fast, no compile)."""
    from semseg_tpu.cli.train import build_train_mesh
    from semseg_tpu.config import cfg

    c = cfg.clone()
    c.TPU.data_parallel = 4
    assert dict(build_train_mesh(c).shape) == {"data": 4}

    # data_parallel counts DATA GROUPS (devices = data x spatial, per the
    # config doc) — setting it must never silently shrink the global batch.
    c.TPU.spatial = 2
    mesh = build_train_mesh(c)
    assert dict(mesh.shape) == {"data": 4, "spatial": 2}

    c.TPU.data_parallel = 0
    mesh = build_train_mesh(c, devices_arg=2)
    assert dict(mesh.shape) == {"data": 2, "spatial": 2}

    # All-devices default: the total is divided down by spatial.
    c.TPU.spatial = 2
    mesh = build_train_mesh(c)
    assert dict(mesh.shape) == {"data": len(jax.devices()) // 2, "spatial": 2}

    c.TPU.spatial = 3
    with pytest.raises(ValueError, match="must divide"):
        build_train_mesh(c)


@pytest.mark.slow
def test_train_hybrid_spatial_mesh(mini, tmp_path_factory):
    """End-to-end train CLI over a 2-way-data x 2-way-spatial mesh."""
    ckpt = str(tmp_path_factory.mktemp("ckpt_spatial"))
    out = run_cli(
        "train.py", *COMMON,
        "DIR", ckpt,
        "DATASET.root_dataset", str(mini),
        "DATASET.list_train", str(mini / "train.odgt"),
        "TRAIN.num_epoch", "1", "TRAIN.epoch_iters", "2",
        "TRAIN.disp_iter", "1", "TRAIN.batch_size_per_gpu", "1",
        "TRAIN.workers", "1",
        "TPU.spatial", "2",
    )
    assert "2-way data x 2-way spatial" in out
    assert "Training Done!" in out
    assert os.path.isdir(os.path.join(ckpt, "epoch_1"))


def test_train_loop_raises_on_nonfinite_loss():
    """A NaN loss must abort the epoch loop with context, not poison
    every later step silently (cli/train.py disp-time guard)."""
    import logging

    import jax
    import pytest as _pytest

    from semseg_tpu.config import cfg as _cfg
    from semseg_tpu.cli.train import train_one_epoch

    c = _cfg.clone()
    c.TRAIN.epoch_iters = 1
    c.TRAIN.disp_iter = 1

    def step_fn(state, batch, rng):
        return state, {"loss": float("nan"), "acc": 0.0}

    history = {"train": {"epoch": [], "loss": [], "acc": []}}
    with _pytest.raises(FloatingPointError, match="non-finite loss"):
        train_one_epoch(
            step_fn, object(), iter([{}]), None, c, 0, history,
            logging.getLogger("Logger"),
        )


def test_eval_multipro_gpus_flag_translates(mini, tmp_path_factory):
    """Reference CLI form `eval_multipro.py --gpus 0-1` must map the device
    LIST to a device count (the list only sized the worker pool there too)."""
    out = run_cli(
        "eval_multipro.py", "--gpus", "0-1", *COMMON,
        "DIR", str(tmp_path_factory.mktemp("nockpt")),
        "DATASET.root_dataset", str(mini),
        "DATASET.list_val", str(mini / "val.odgt"),
        "MODEL.weights_encoder", "", "MODEL.weights_decoder", "",
        "VAL.checkpoint", "",
    )
    assert "Evaluation Done!" in out


def test_train_gpus_flag_sizes_data_axis(mini, tmp_path_factory):
    """`train.py --gpus 0-1` must give 2-way data parallelism like the
    reference, not silently use every visible device."""
    ckpt = str(tmp_path_factory.mktemp("ckpt_gpus"))
    out = run_cli(
        "train.py", "--gpus", "0-1", *COMMON,
        "DIR", ckpt,
        "DATASET.root_dataset", str(mini),
        "DATASET.list_train", str(mini / "train.odgt"),
        "TRAIN.num_epoch", "1", "TRAIN.epoch_iters", "1",
        "TRAIN.disp_iter", "1", "TRAIN.batch_size_per_gpu", "1",
        "TRAIN.workers", "1",
    )
    assert "Mesh: 2 device(s)" in out, out[-2000:]
    assert "Training Done!" in out
