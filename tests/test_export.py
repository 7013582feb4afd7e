"""Round-trip tests for the flax → PyTorch checkpoint exporter.

The reference ecosystem exchanges models as ``encoder_epoch_N.pth`` /
``decoder_epoch_N.pth`` state_dict pairs (/root/reference/train.py:74-89);
``semseg_tpu.models.export`` must produce files the reference builders
(mit_semseg/models/models.py:106-109) load completely — no missing and no
unexpected keys — and that reproduce our forward exactly.

Three layers of proof:

1. convert → export returns the ORIGINAL torch state_dict bit-for-bit
   (every transform is lossless), for one geometry per encoder family and
   per decoder wiring family;
2. exported dicts load into fresh reference modules with zero
   missing/unexpected keys (strict-complete, including the SyncBN
   accumulator buffers and ``num_batches_tracked``);
3. a randomly-initialized flax model exported and loaded into the
   reference reproduces our softmax scores (the export-only path, no
   prior convert).
"""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from test_model_parity import build_reference  # noqa: E402

from semseg_tpu.config import cfg  # noqa: E402
from semseg_tpu.models import ModelBuilder, init_variables  # noqa: E402

from semseg_tpu.models.convert import (  # noqa: E402
    convert_checkpoints,
    load_torch_checkpoint,
)
from semseg_tpu.models.export import (  # noqa: E402
    export_state_dicts,
    save_reference_checkpoints,
)

# One case per encoder family (resnet deep-stem, resnext grouped,
# mobilenet inverted-residual, hrnet multi-branch) and per decoder
# key-wiring family (c1_deepsup, ppm_deepsup, c1, upernet).
CASES = [
    ("mobilenetv2dilated", "c1_deepsup", 320),
    ("resnet50dilated", "ppm_deepsup", 2048),
    ("resnext101", "c1", 2048),
    ("hrnetv2", "c1", 720),
    ("resnet50", "upernet", 2048),
]


def _to_torch(sd):
    return {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}


def build_ours_full(enc_arch, dec_arch, fc_dim):
    """Model + variables via the production init (train=True), so the
    deep-supervision branch params exist — test_model_parity.build_ours
    inits with train=False, which skips them (flax lazily creates only
    executed modules) and would export an incomplete decoder."""
    c = cfg.clone()
    c.MODEL.arch_encoder = enc_arch
    c.MODEL.arch_decoder = dec_arch
    c.MODEL.fc_dim = fc_dim
    model = ModelBuilder.build_model(c, dtype=jnp.float32)
    return model, init_variables(model)


@pytest.mark.parametrize(
    "enc_arch,dec_arch,fc_dim", CASES, ids=[f"{e}-{d}" for e, d, _ in CASES]
)
def test_roundtrip_bitexact_and_strict_complete(enc_arch, dec_arch, fc_dim):
    enc, dec = build_reference(enc_arch, dec_arch, fc_dim)
    model, variables = build_ours_full(enc_arch, dec_arch, fc_dim)

    enc_state = {k: v.numpy() for k, v in enc.state_dict().items()}
    dec_state = {k: v.numpy() for k, v in dec.state_dict().items()}
    variables = convert_checkpoints(
        variables,
        arch_encoder=enc_arch,
        arch_decoder=dec_arch,
        encoder_state=enc_state,
        decoder_state=dec_state,
    )
    enc_out, dec_out = export_state_dicts(
        variables, arch_encoder=enc_arch, arch_decoder=dec_arch
    )

    for orig, exported, module, name in (
        (enc_state, enc_out, enc, "encoder"),
        (dec_state, dec_out, dec, "decoder"),
    ):
        missing = sorted(set(orig) - set(exported))
        extra = sorted(set(exported) - set(orig))
        assert not missing and not extra, (name, missing, extra)
        for k in orig:
            # Bit-exact: HWIO<->OIHW transposes and the tmp = running * iter
            # accumulator reconstruction are lossless in f32 at iter == 1
            # (fresh modules; the trained-iter invariant running == tmp/iter
            # is the reference's own recomputation, batchnorm.py:136-137).
            np.testing.assert_array_equal(
                np.asarray(exported[k]), orig[k], err_msg=f"{name}:{k}"
            )
        out = module.load_state_dict(_to_torch(exported), strict=False)
        assert not out.missing_keys and not out.unexpected_keys, (name, out)


def test_export_cli_from_native_checkpoint(tmp_path):
    """tools/export_torch.py: orbax variables dir → strict-complete .pth."""
    import os
    import subprocess

    from semseg_tpu.checkpoint import save_variables

    enc_arch, dec_arch, fc_dim = "mobilenetv2dilated", "c1_deepsup", 320
    _, variables = build_ours_full(enc_arch, dec_arch, fc_dim)
    ckpt_dir = tmp_path / "ckpt"
    out_dir = tmp_path / "out"
    save_variables(str(ckpt_dir / "epoch_3"), dict(variables))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            sys.executable, os.path.join(repo, "tools", "export_torch.py"),
            "--cfg", "config/ade20k-mobilenetv2dilated-c1_deepsup.yaml",
            "--checkpoint", "epoch_3",
            "--out", str(out_dir),
            "DIR", str(ckpt_dir),
        ],
        # 1-core container: model build + orbax restore + torch save take
        # ~5 min alone and 10+ under a concurrently-running suite.
        capture_output=True, text=True, timeout=1800, cwd=repo,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    enc, dec = build_reference(enc_arch, dec_arch, fc_dim)
    for module, name in ((enc, "encoder"), (dec, "decoder")):
        sd = torch.load(
            str(out_dir / f"{name}_epoch_3.pth"),
            map_location="cpu", weights_only=True,
        )
        out = module.load_state_dict(sd, strict=False)
        assert not out.missing_keys and not out.unexpected_keys, (name, out)


def test_export_only_forward_parity(tmp_path):
    """Random flax init → .pth files → reference forward == our forward."""
    enc_arch, dec_arch, fc_dim = "resnet18dilated", "c1_deepsup", 512
    model, variables = build_ours_full(enc_arch, dec_arch, fc_dim)

    enc_path, dec_path = save_reference_checkpoints(
        variables,
        str(tmp_path),
        arch_encoder=enc_arch,
        arch_decoder=dec_arch,
        epoch=7,
    )
    assert enc_path.endswith("encoder_epoch_7.pth")
    # The files are plain state_dicts — our own torch-ingestion path must
    # accept them too (migration can round-trip through disk).
    assert "layer1.0.conv1.weight" in load_torch_checkpoint(enc_path)

    enc, dec = build_reference(enc_arch, dec_arch, fc_dim)
    for module, path in ((enc, enc_path), (dec, dec_path)):
        out = module.load_state_dict(
            torch.load(path, map_location="cpu", weights_only=True),
            strict=False,
        )
        assert not out.missing_keys and not out.unexpected_keys, out

    rng = np.random.RandomState(3)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = dec(
            enc(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
                return_feature_maps=True),
            segSize=(64, 64),
        ).numpy()
    ours = model.apply(
        variables, jnp.asarray(img), seg_size=(64, 64), train=False
    )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, atol=2e-2, rtol=0)
    agree = (ours.argmax(1) == ref.argmax(1)).mean()
    assert agree > 0.999, f"argmax agreement {agree}"
