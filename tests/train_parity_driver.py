"""Driver for the full-model train-step parity oracle (run in a subprocess).

Executed with ``JAX_ENABLE_X64=1`` by tests/test_train_parity.py: both the
torch reference and our train step run in FLOAT64, which collapses
cross-framework f32 accumulation noise (which measures at ~1e-4 per leaf
and amplifies chaotically across steps) to ~1e-12 — so the comparison
tolerance of 1e-7 catches any *semantic* mismatch in gradients, optimizer
groups/order, LR schedule, or BN statistics rules, with zero flakiness.

Reference semantics exercised verbatim (/root/reference/train.py):
``create_optimizers``/``group_weight`` (two-group SGD, decay on conv/linear
weights only), ``adjust_learning_rate`` (poly LR), NLL ignore -1 (+0.4 deep
supervision), and the SyncBN parallel-mode statistics rules
(batchnorm.py:98-139) — forced on CPU by registering each BN as a
single-replica sync master with identity-passthrough collective stubs.
"""

import importlib.util
import json
import sys
import types
from unittest import mock

import numpy as np
import torch

import jax

# The axon TPU plugin force-sets jax_platforms="axon,cpu" via sitecustomize;
# the JAX_PLATFORMS env var alone does NOT stick. This oracle must run on
# CPU (f64, torch comparison), so override explicitly before first use.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from ref_eval_harness import (  # noqa: E402
    REF_ROOT,
    _build_reference_modules,
    _install_shims,
)

_install_shims()
if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

from mit_semseg.models import models as ref_models  # noqa: E402
from mit_semseg.lib.nn.modules import batchnorm as ref_bn  # noqa: E402

from semseg_tpu.config import cfg  # noqa: E402
from semseg_tpu.models import ModelBuilder  # noqa: E402
from semseg_tpu.models.builder import init_variables  # noqa: E402
from semseg_tpu.models.convert import convert_checkpoints  # noqa: E402
from semseg_tpu.parallel.train_step import (  # noqa: E402
    create_train_state,
    train_step,
)


def _import_ref_train():
    spec = importlib.util.spec_from_file_location(
        "ref_train", f"{REF_ROOT}/train.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _CpuReduceAddCoalesced:
    """CPU stand-in for torch.nn.parallel._functions.ReduceAddCoalesced:
    sums per-replica (sum, ssum) groups with differentiable torch ops;
    with a single replica it is an identity passthrough."""

    @staticmethod
    def apply(device, num, *tensors):
        return tuple(
            sum(tensors[i::num][1:], tensors[i::num][0]) for i in range(num)
        )


class _CpuBroadcast:
    """CPU stand-in for Broadcast: replicate tensors per target device."""

    @staticmethod
    def apply(target_gpus, *tensors):
        return tuple(t for _ in target_gpus for t in tensors)


def _force_syncbn_parallel(module):
    """Register every SyncBN as a single-replica master so its forward takes
    the parallel-mode path — the custom statistics rules the published
    multi-GPU checkpoints were trained with."""
    for m in module.modules():
        if isinstance(m, ref_bn._SynchronizedBatchNorm):
            m.__data_parallel_replicate__(types.SimpleNamespace(), 0)


CASES = [
    # (enc_arch, dec_arch, fc_dim, deep_sup, segm_downsampling_rate)
    # — one per gradient-path family (reference train.py:20-71 semantics):
    ("resnet18dilated", "c1_deepsup", 512, 0.4, 8),      # dilated resnet
    ("resnet18", "upernet_lite", 512, None, 4),          # FPN fusion
    # depthwise + ReLU6 grads (reference mobilenet.py:38-76)
    ("mobilenetv2dilated", "c1_deepsup", 320, 0.4, 8),
    # multi-branch fusion grads + BN momentum 0.1 (reference hrnet.py:105-250)
    ("hrnetv2", "c1", 720, None, 4),
]


def run_case(case_idx: int, steps: int = 2):
    assert jax.config.jax_enable_x64, "run with JAX_ENABLE_X64=1"
    enc_arch, dec_arch, fc_dim, deep_sup, ds_rate = CASES[case_idx]
    torch.manual_seed(0)
    ref_train = _import_ref_train()
    from mit_semseg.config import cfg as ref_cfg_global

    # ---- reference model (double precision) -------------------------------
    enc, dec = _build_reference_modules(enc_arch, dec_arch, fc_dim, 150)
    enc = enc.double()
    dec = dec.double()
    crit = torch.nn.NLLLoss(ignore_index=-1)
    module = ref_models.SegmentationModule(
        enc, dec, crit, deep_sup_scale=deep_sup
    ).train()
    _force_syncbn_parallel(module)

    enc_state0 = {k: v.numpy().copy() for k, v in enc.state_dict().items()}
    dec_state0 = {k: v.numpy().copy() for k, v in dec.state_dict().items()}

    # ---- shared config -----------------------------------------------------
    c = cfg.clone()
    c.MODEL.arch_encoder = enc_arch
    c.MODEL.arch_decoder = dec_arch
    c.MODEL.fc_dim = fc_dim
    c.DATASET.segm_downsampling_rate = ds_rate
    c.TRAIN.lr_encoder = 0.02
    c.TRAIN.lr_decoder = 0.01  # distinct: catches group mix-ups
    c.TRAIN.num_epoch = 1
    c.TRAIN.epoch_iters = 50  # small max_iters -> visible poly decay
    c.TRAIN.weight_decay = 1e-4
    c.TRAIN.beta1 = 0.9
    c.TRAIN.lr_pow = 0.9
    c.TRAIN.deep_sup_scale = 0.4
    c.TPU.compute_dtype = "float64"

    rc = ref_cfg_global.clone()
    rc.TRAIN.lr_encoder = c.TRAIN.lr_encoder
    rc.TRAIN.lr_decoder = c.TRAIN.lr_decoder
    rc.TRAIN.lr_pow = c.TRAIN.lr_pow
    rc.TRAIN.beta1 = c.TRAIN.beta1
    rc.TRAIN.weight_decay = c.TRAIN.weight_decay
    rc.TRAIN.max_iters = c.TRAIN.num_epoch * c.TRAIN.epoch_iters
    rc.TRAIN.running_lr_encoder = c.TRAIN.lr_encoder
    rc.TRAIN.running_lr_decoder = c.TRAIN.lr_decoder

    # ---- identical batch -----------------------------------------------------
    rng = np.random.RandomState(7)
    img = rng.randn(2, 96, 128, 3).astype(np.float64)
    lab = rng.randint(-1, 150, (2, 96 // ds_rate, 128 // ds_rate)).astype(np.int64)
    lab[:, :2, :] = -1  # ignore band

    # ---- reference: N steps ---------------------------------------------------
    optimizers = ref_train.create_optimizers((enc, dec, crit), rc)
    torch_losses = []
    with mock.patch.object(ref_bn, "ReduceAddCoalesced", _CpuReduceAddCoalesced), \
         mock.patch.object(ref_bn, "Broadcast", _CpuBroadcast):
        for step in range(steps):
            ref_train.adjust_learning_rate(optimizers, step, rc)
            module.zero_grad()
            loss, acc = module(
                {
                    "img_data": torch.from_numpy(
                        np.ascontiguousarray(np.transpose(img, (0, 3, 1, 2)))
                    ),
                    "seg_label": torch.from_numpy(lab),
                }
            )
            loss.mean().backward()
            for opt in optimizers:
                opt.step()
            torch_losses.append(float(loss.mean().detach()))

    enc_stateN = {k: v.numpy().copy() for k, v in enc.state_dict().items()}
    dec_stateN = {k: v.numpy().copy() for k, v in dec.state_dict().items()}

    # ---- ours: identical N steps -----------------------------------------------
    model = ModelBuilder.build_model(c, dtype=jnp.float64)
    variables = init_variables(model, image_size=(96, 128))
    variables = convert_checkpoints(
        dict(variables),
        arch_encoder=enc_arch,
        arch_decoder=dec_arch,
        encoder_state=enc_state0,
        decoder_state=dec_state0,
    )
    state = create_train_state(c, model, variables)
    batch = {
        "img_data": jnp.asarray(img),
        "seg_label": jnp.asarray(lab.astype(np.int32)),
    }
    step_fn = jax.jit(train_step)
    our_losses = []
    key = jax.random.PRNGKey(0)
    for _ in range(steps):
        state, metrics = step_fn(state, batch, key)
        our_losses.append(float(metrics["loss"]))

    loss_err = float(np.abs(np.array(our_losses) - np.array(torch_losses)).max())

    # Convert the post-update torch state onto our post-update tree and
    # compare leaf-by-leaf.
    expected = convert_checkpoints(
        {"params": state.params, "batch_stats": state.batch_stats},
        arch_encoder=enc_arch,
        arch_decoder=dec_arch,
        encoder_state=enc_stateN,
        decoder_state=dec_stateN,
    )
    ours_flat = jax.tree_util.tree_flatten_with_path(
        {"params": state.params, "batch_stats": state.batch_stats}
    )[0]
    exp_flat = jax.tree_util.tree_flatten_with_path(expected)[0]
    assert len(ours_flat) == len(exp_flat)
    max_err, worst = 0.0, None
    for (path_a, ours_leaf), (path_b, exp_leaf) in zip(ours_flat, exp_flat):
        assert path_a == path_b
        err = float(np.max(np.abs(np.asarray(ours_leaf) - np.asarray(exp_leaf))))
        if err > max_err:
            max_err, worst = err, jax.tree_util.keystr(path_a)
    return {
        "case": f"{enc_arch}-{dec_arch}",
        "steps": steps,
        "loss_err": loss_err,
        "max_leaf_err": max_err,
        "worst_leaf": worst,
        "torch_losses": torch_losses,
        "our_losses": our_losses,
        "n_leaves": len(ours_flat),
    }


if __name__ == "__main__":
    result = run_case(int(sys.argv[1]))
    print("RESULT_JSON:" + json.dumps(result))
