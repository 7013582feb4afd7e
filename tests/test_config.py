"""Config system tests: the seven shipped YAMLs must load verbatim and CLI
opts-override semantics must match yacs."""

import glob
import os

import pytest

from semseg_tpu.config import cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "config", "*.yaml")))


def test_found_all_seven_configs():
    assert len(CONFIGS) == 7


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_yaml_loads(path):
    c = cfg.clone()
    c.merge_from_file(path)
    assert c.DATASET.num_class == 150
    assert isinstance(c.DATASET.imgSizes, tuple)
    assert c.MODEL.arch_encoder
    assert c.MODEL.arch_decoder


def test_canonical_default_values():
    c = cfg.clone()
    c.merge_from_file(os.path.join(REPO, "config", "ade20k-resnet50dilated-ppm_deepsup.yaml"))
    assert c.MODEL.arch_encoder == "resnet50dilated"
    assert c.MODEL.arch_decoder == "ppm_deepsup"
    assert c.MODEL.fc_dim == 2048
    assert c.DATASET.imgSizes == (300, 375, 450, 525, 600)
    assert c.DATASET.imgMaxSize == 1000
    assert c.DATASET.padding_constant == 8
    assert c.TRAIN.lr_encoder == 0.02
    assert c.TRAIN.weight_decay == 1e-4
    assert c.TRAIN.deep_sup_scale == 0.4
    assert c.TRAIN.seed == 304


def test_hrnet_deltas():
    c = cfg.clone()
    c.merge_from_file(os.path.join(REPO, "config", "ade20k-hrnetv2.yaml"))
    assert c.MODEL.arch_encoder == "hrnetv2"
    assert c.MODEL.fc_dim == 720
    assert c.DATASET.padding_constant == 32
    assert c.DATASET.segm_downsampling_rate == 4
    assert c.TRAIN.num_epoch == 30


def test_merge_from_list_and_literal_decode():
    c = cfg.clone()
    c.merge_from_list(
        ["TRAIN.lr_encoder", "0.5", "DATASET.imgSizes", "(200, 250)", "TRAIN.num_epoch", "3"]
    )
    assert c.TRAIN.lr_encoder == 0.5
    assert c.DATASET.imgSizes == (200, 250)
    assert c.TRAIN.num_epoch == 3


def test_merge_rejects_unknown_key():
    c = cfg.clone()
    with pytest.raises(AssertionError):
        c.merge_from_list(["TRAIN.nope", "1"])


def test_dump_roundtrip(tmp_path):
    c = cfg.clone()
    c.TRAIN.num_epoch = 7
    p = tmp_path / "dump.yaml"
    p.write_text(c.dump())
    c2 = cfg.clone()
    c2.merge_from_file(str(p))
    assert c2.TRAIN.num_epoch == 7
