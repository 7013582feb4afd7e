"""End-to-end numerical parity vs the reference PyTorch implementation.

Builds each reference encoder/decoder pair (torch, CPU, eval mode) with
random weights, converts the state_dicts through
``semseg_tpu.models.convert``, and checks that our NHWC/flax forward
reproduces the reference's softmax score maps. This validates architecture,
layout conversion, BN inference semantics, adaptive pooling, and the bilinear
resize epilogue in one shot.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from mit_semseg.models import models as ref_models  # noqa: E402
from mit_semseg.models import (  # noqa: E402
    hrnet as ref_hrnet,
    mobilenet as ref_mobilenet,
    resnet as ref_resnet,
    resnext as ref_resnext,
)

from semseg_tpu.models import ModelBuilder, SegmentationModel  # noqa: E402
from semseg_tpu.models.convert import convert_checkpoints  # noqa: E402
from semseg_tpu.config import cfg  # noqa: E402


def build_reference(enc_arch, dec_arch, fc_dim):
    torch.manual_seed(0)
    if enc_arch == "mobilenetv2dilated":
        enc = ref_models.MobileNetV2Dilated(
            ref_mobilenet.mobilenetv2(pretrained=False), dilate_scale=8
        )
    elif enc_arch == "hrnetv2":
        enc = ref_hrnet.hrnetv2(pretrained=False)
    elif enc_arch == "resnext101":
        enc = ref_models.Resnet(ref_resnext.resnext101(pretrained=False))
    else:
        base = enc_arch.replace("dilated", "")
        orig = getattr(ref_resnet, base)(pretrained=False)
        if enc_arch.endswith("dilated"):
            enc = ref_models.ResnetDilated(orig, dilate_scale=8)
        else:
            enc = ref_models.Resnet(orig)

    dec_cls = {
        "c1": ref_models.C1,
        "c1_deepsup": ref_models.C1DeepSup,
        "ppm": ref_models.PPM,
        "ppm_deepsup": ref_models.PPMDeepsup,
        "upernet": lambda **kw: ref_models.UPerNet(fpn_dim=512, **kw),
        "upernet_lite": lambda **kw: ref_models.UPerNet(
            fpn_dim=256, fpn_inplanes=(64, 128, 256, 512), **kw),
    }[dec_arch]
    dec = dec_cls(num_class=150, fc_dim=fc_dim, use_softmax=True)
    dec.apply(ref_models.ModelBuilder.weights_init)
    return enc.eval(), dec.eval()


def build_ours(enc_arch, dec_arch, fc_dim):
    c = cfg.clone()
    c.MODEL.arch_encoder = enc_arch
    c.MODEL.arch_decoder = dec_arch
    c.MODEL.fc_dim = fc_dim
    model = ModelBuilder.build_model(c, dtype=jnp.float32)
    img = jnp.zeros((1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, img, seg_size=(64, 64), train=False
    )
    return model, variables


CASES = [
    ("mobilenetv2dilated", "c1_deepsup", 320),
    ("resnet18dilated", "ppm_deepsup", 512),
    ("resnet50dilated", "ppm_deepsup", 2048),
    ("resnet50", "upernet", 2048),
    ("resnet18", "upernet_lite", 512),
    ("resnet101dilated", "ppm", 2048),
    ("resnext101", "c1", 2048),
    ("hrnetv2", "c1", 720),
]


@pytest.mark.parametrize(
    "enc_arch,dec_arch,fc_dim", CASES, ids=[f"{e}-{d}" for e, d, _ in CASES]
)
def test_inference_parity(enc_arch, dec_arch, fc_dim):
    enc, dec = build_reference(enc_arch, dec_arch, fc_dim)
    model, variables = build_ours(enc_arch, dec_arch, fc_dim)

    enc_state = {k: v.numpy() for k, v in enc.state_dict().items()}
    dec_state = {k: v.numpy() for k, v in dec.state_dict().items()}
    variables = convert_checkpoints(
        variables,
        arch_encoder=enc_arch,
        arch_decoder=dec_arch,
        encoder_state=enc_state,
        decoder_state=dec_state,
    )

    rng = np.random.RandomState(42)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)

    with torch.no_grad():
        ref = dec(
            enc(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
                return_feature_maps=True),
            segSize=(64, 64),
        ).numpy()

    ours = model.apply(variables, jnp.asarray(img), seg_size=(64, 64), train=False)
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))

    # Deep nets with random (uncalibrated) weights accumulate f32 drift;
    # allow tiny probability deviations but require argmax agreement.
    np.testing.assert_allclose(ours, ref, atol=2e-2, rtol=0)
    agree = (ours.argmax(1) == ref.argmax(1)).mean()
    assert agree > 0.999, f"argmax agreement {agree}"
    max_err = np.abs(ours - ref).max()
    assert max_err < 2e-2, max_err
