"""Torch checkpoint ingestion: wrapped formats + ImageNet-style extras.

The published zoo and ImageNet backbone checkpoints come in several shapes:
raw ``state_dict`` files (what the reference's ``checkpoint()`` saves,
/root/reference/train.py:74-89), ``{'state_dict': ...}`` training-dict
wrappers, ``module.``-prefixed ``nn.DataParallel`` saves, and base-module
dicts carrying classifier extras (``fc.*`` / ``classifier.*``) that the
encoder wrappers drop via ``load_state_dict(strict=False)``
(/root/reference/mit_semseg/models/models.py:106-109, resnet.py:164-205).

These tests construct such checkpoints in-test from the reference modules
(no downloads), push them through ``load_torch_checkpoint`` →
``convert_checkpoints``, and assert end-to-end forward parity — proving the
ImageNet-init ingestion path for every encoder family.
"""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from mit_semseg.models import models as ref_models  # noqa: E402
from mit_semseg.models import (  # noqa: E402
    hrnet as ref_hrnet,
    mobilenet as ref_mobilenet,
    resnet as ref_resnet,
)

from semseg_tpu.models.convert import (  # noqa: E402
    convert_checkpoints,
    load_torch_checkpoint,
    normalize_state_dict,
)

from test_model_parity import build_ours  # noqa: E402


# ---------------------------------------------------------------------------
# Format handling (load_torch_checkpoint / normalize_state_dict)
# ---------------------------------------------------------------------------


def _small_module():
    torch.manual_seed(7)
    return torch.nn.Sequential(
        torch.nn.Conv2d(3, 4, 3), torch.nn.BatchNorm2d(4)
    )


def test_load_raw_state_dict(tmp_path):
    mod = _small_module()
    p = tmp_path / "raw.pth"
    torch.save(mod.state_dict(), p)
    out = load_torch_checkpoint(str(p))
    assert set(out) == set(mod.state_dict())
    np.testing.assert_array_equal(out["0.weight"], mod[0].weight.detach().numpy())


def test_load_wrapped_state_dict(tmp_path):
    """{'state_dict': ..., 'epoch': N, 'optimizer': ...} training-dict save."""
    mod = _small_module()
    p = tmp_path / "wrapped.pth.tar"
    torch.save(
        {"state_dict": mod.state_dict(), "epoch": 3, "arch": "toy"}, p
    )
    out = load_torch_checkpoint(str(p))
    assert set(out) == set(mod.state_dict())
    np.testing.assert_array_equal(out["0.weight"], mod[0].weight.detach().numpy())


def test_load_dataparallel_prefixed(tmp_path):
    """nn.DataParallel-saved checkpoints carry 'module.' key prefixes."""
    mod = _small_module()
    prefixed = {f"module.{k}": v for k, v in mod.state_dict().items()}
    p = tmp_path / "dp.pth"
    torch.save({"state_dict": prefixed}, p)
    out = load_torch_checkpoint(str(p))
    assert set(out) == set(mod.state_dict())


def test_load_full_module_object(tmp_path):
    """torch.save(model) — a pickled nn.Module (needs weights_only=False)."""
    mod = _small_module()
    p = tmp_path / "module.pth"
    torch.save(mod, p)
    out = load_torch_checkpoint(str(p))
    assert set(out) == set(mod.state_dict())


def test_non_tensor_metadata_dropped():
    mod = _small_module()
    sd = dict(mod.state_dict())
    sd_with_meta = dict(sd)
    sd_with_meta["step"] = 5  # plain int alongside tensors
    # Not a pure tensor dict → wrapper-key search fails with a clear error.
    with pytest.raises(KeyError):
        normalize_state_dict({"weights": sd_with_meta})
    # Under a recognized wrapper key the metadata is tolerated:
    out = normalize_state_dict({"state_dict": sd, "step": 5})
    assert "step" not in out
    # FLAT state_dict with metadata mixed in (torch.save({'epoch': 3,
    # **model.state_dict()})): metadata entries are dropped, tensors kept.
    out = normalize_state_dict(sd_with_meta)
    assert "step" not in out
    assert set(out) == set(sd)
    # WRAPPED state_dict whose inner dict itself carries metadata
    # (torch.save({'state_dict': {**sd, 'epoch': 3}})):
    out = normalize_state_dict({"state_dict": sd_with_meta})
    assert "step" not in out
    assert set(out) == set(sd)


def test_unrecognized_wrapper_raises():
    with pytest.raises(KeyError, match="wrapper key"):
        normalize_state_dict({"not_weights": {"a": 1}})
    with pytest.raises(TypeError):
        normalize_state_dict([1, 2, 3])


# ---------------------------------------------------------------------------
# ImageNet-style ingestion per encoder family
# ---------------------------------------------------------------------------
#
# Each case builds the *base* reference module exactly as the reference's
# pretrained loaders would populate it — classifier head included — saves it
# in a wrapped format, and checks our converted model matches the reference
# encoder-wrapper + decoder forward. This is the "build_encoder(pretrained
# ImageNet weights)" path (models.py:63-110) without network access.

INGEST_CASES = [
    # (family id, encoder arch, decoder arch, fc_dim)
    ("resnet", "resnet18dilated", "ppm_deepsup", 512),
    ("mobilenet", "mobilenetv2dilated", "c1_deepsup", 320),
    ("hrnet", "hrnetv2", "c1", 720),
]


def _build_base_and_wrapper(enc_arch):
    torch.manual_seed(0)
    if enc_arch == "mobilenetv2dilated":
        base = ref_mobilenet.mobilenetv2(pretrained=False)
        # Full ImageNet MobileNetV2 state includes features.18 + classifier,
        # which MobileNetV2Dilated drops (models.py:273-276).
        assert any(k.startswith("classifier.") for k in base.state_dict())
        wrapper = ref_models.MobileNetV2Dilated(base, dilate_scale=8)
    elif enc_arch == "hrnetv2":
        base = ref_hrnet.hrnetv2(pretrained=False)
        wrapper = base
    else:
        base = getattr(ref_resnet, enc_arch.replace("dilated", ""))(
            pretrained=False
        )
        # Deep-stem reference ResNet keeps its ImageNet fc head (resnet.py).
        assert any(k.startswith("fc.") for k in base.state_dict())
        wrapper = ref_models.ResnetDilated(base, dilate_scale=8)
    return base, wrapper


@pytest.mark.parametrize(
    "family,enc_arch,dec_arch,fc_dim",
    INGEST_CASES,
    ids=[c[0] for c in INGEST_CASES],
)
def test_imagenet_style_ingestion(tmp_path, family, enc_arch, dec_arch, fc_dim):
    base, wrapper = _build_base_and_wrapper(enc_arch)

    # Save the base module's state in an adversarial-but-common format:
    # DataParallel 'module.' prefixes inside a {'state_dict': ...} wrapper,
    # with classifier extras present (hrnet gets synthetic extras).
    sd = {f"module.{k}": v for k, v in base.state_dict().items()}
    if family == "hrnet":
        sd["module.classifier.weight"] = torch.zeros(1000, 720)
        sd["module.classifier.bias"] = torch.zeros(1000)
    p = tmp_path / f"{enc_arch}_imagenet.pth.tar"
    torch.save({"state_dict": sd, "epoch": 0}, p)
    enc_state = load_torch_checkpoint(str(p))

    dec_cls = {
        "c1": ref_models.C1,
        "c1_deepsup": ref_models.C1DeepSup,
        "ppm_deepsup": ref_models.PPMDeepsup,
    }[dec_arch]
    dec = dec_cls(num_class=150, fc_dim=fc_dim, use_softmax=True)
    dec.apply(ref_models.ModelBuilder.weights_init)
    dec = dec.eval()
    wrapper = wrapper.eval()

    model, variables = build_ours(enc_arch, dec_arch, fc_dim)
    variables = convert_checkpoints(
        variables,
        arch_encoder=enc_arch,
        arch_decoder=dec_arch,
        encoder_state=enc_state,
        decoder_state={k: v.numpy() for k, v in dec.state_dict().items()},
    )

    rng = np.random.RandomState(3)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = dec(
            wrapper(
                torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
                return_feature_maps=True,
            ),
            segSize=(64, 64),
        ).numpy()
    ours = model.apply(variables, jnp.asarray(img), seg_size=(64, 64), train=False)
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))

    np.testing.assert_allclose(ours, ref, atol=2e-2, rtol=0)
    agree = (ours.argmax(1) == ref.argmax(1)).mean()
    assert agree > 0.999, f"argmax agreement {agree}"


# ---------------------------------------------------------------------------
# pretrained_encoder auto-init (cfg.MODEL.pretrained_encoder)
# ---------------------------------------------------------------------------
#
# The reference's train path downloads ImageNet backbone weights whenever no
# explicit encoder checkpoint is given (models.py:65 `pretrained =
# len(weights) == 0`). load_weights(pretrained_encoder=True) mirrors that
# via models.utils.imagenet_backbone; these tests stub the download (no
# network in-suite) and pin the fallback semantics.


def test_arch_url_key_mapping():
    from semseg_tpu.models.utils import PRETRAINED_URLS, arch_url_key

    assert arch_url_key("resnet50dilated") == "resnet50"
    assert arch_url_key("resnet18") == "resnet18"
    assert arch_url_key("ResNet101Dilated") == "resnet101"
    assert arch_url_key("resnext101") == "resnext101"
    assert arch_url_key("mobilenetv2dilated") == "mobilenetv2"
    assert arch_url_key("hrnetv2") == "hrnetv2"
    # No published backbone for resnet34 (build_encoder raises there too).
    assert arch_url_key("resnet34dilated") is None
    for key in map(arch_url_key, ("resnet50dilated", "hrnetv2")):
        assert key in PRETRAINED_URLS


def test_load_weights_pretrained_encoder_stubbed(tmp_path, monkeypatch):
    """pretrained_encoder=True converts the (stub-downloaded) ImageNet
    backbone into the encoder params and leaves the decoder random."""
    from semseg_tpu import checkpoint as ckpt_mod
    from semseg_tpu.models import utils as murl

    base, _ = _build_base_and_wrapper("resnet18dilated")
    p = tmp_path / "resnet18-imagenet.pth"
    torch.save(base.state_dict(), p)
    monkeypatch.setattr(
        murl, "load_url", lambda url, model_dir="./pretrained": str(p)
    )

    model, variables = build_ours("resnet18dilated", "ppm_deepsup", 512)
    dec_before = jnp.asarray(
        variables["params"]["decoder"]["conv_last"]["kernel"]
    )
    out = ckpt_mod.load_weights(
        dict(variables),
        arch_encoder="resnet18dilated",
        arch_decoder="ppm_deepsup",
        pretrained_encoder=True,
    )
    got = np.asarray(out["params"]["encoder"]["stem1"]["conv"]["kernel"])
    want = np.transpose(base.state_dict()["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["decoder"]["conv_last"]["kernel"]),
        np.asarray(dec_before),
    )


def test_load_weights_pretrained_encoder_offline_fallback(monkeypatch, capsys):
    """Download failure (offline host) warns and keeps random init."""

    from semseg_tpu import checkpoint as ckpt_mod
    from semseg_tpu.models import utils as murl

    def boom(url, model_dir="./pretrained"):
        raise OSError("no route to host")

    monkeypatch.setattr(murl, "load_url", boom)
    model, variables = build_ours("resnet18dilated", "ppm_deepsup", 512)
    before = np.asarray(variables["params"]["encoder"]["stem1"]["conv"]["kernel"])
    out = ckpt_mod.load_weights(
        dict(variables),
        arch_encoder="resnet18dilated",
        arch_decoder="ppm_deepsup",
        pretrained_encoder=True,
    )
    np.testing.assert_array_equal(
        np.asarray(out["params"]["encoder"]["stem1"]["conv"]["kernel"]), before
    )
    assert "could not fetch ImageNet weights" in capsys.readouterr().err


def test_load_weights_explicit_weights_beat_pretrained(tmp_path, monkeypatch):
    """An explicit weights_encoder wins; no download attempt happens."""
    from semseg_tpu import checkpoint as ckpt_mod
    from semseg_tpu.models import utils as murl

    def boom(url, model_dir="./pretrained"):
        raise AssertionError("must not download when weights are explicit")

    monkeypatch.setattr(murl, "load_url", boom)
    base, _ = _build_base_and_wrapper("resnet18dilated")
    p = tmp_path / "enc.pth"
    torch.save(base.state_dict(), p)
    model, variables = build_ours("resnet18dilated", "ppm_deepsup", 512)
    out = ckpt_mod.load_weights(
        dict(variables),
        arch_encoder="resnet18dilated",
        arch_decoder="ppm_deepsup",
        weights_encoder=str(p),
        pretrained_encoder=True,
    )
    got = np.asarray(out["params"]["encoder"]["stem1"]["conv"]["kernel"])
    want = np.transpose(base.state_dict()["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_array_equal(got, want)
