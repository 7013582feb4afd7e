"""In-container dry run of the published-zoo acceptance harness.

``tools/validate_zoo.py`` is the one-command real-world gate (download →
convert → full-val eval → assert vs /root/reference/README.md:69-158); it
needs egress + ADE20K, neither of which exists here. These tests exercise
every part of it EXCEPT the network: the downloader is stubbed with
locally-saved reference ``.pth`` pairs (real converter path), the val set
is the synthetic ADE20K-layout set, and the expected numbers come from the
reference's own ``evaluate()`` run on the same weights+data — so on real
contact only ``urlretrieve`` is untested.
"""

import json
import os

import numpy as np
import pytest
import torch

from ref_eval_harness import make_synthetic_valset, run_reference_eval, train_reference_model

import tools.validate_zoo as vz

CFG_YAML = """\
MODEL:
  arch_encoder: resnet18dilated
  arch_decoder: ppm_deepsup
  fc_dim: 512
DATASET:
  imgSizes: (144, 208)
  imgMaxSize: 320
  padding_constant: 8
  segm_downsampling_rate: 8
TEST:
  checkpoint: "epoch_20.pth"
TPU:
  compute_dtype: float32
"""


@pytest.fixture(scope="module")
def zoo_fixture(tmp_path_factory):
    """Synthetic val set + trained reference weights + their eval numbers."""
    root = str(tmp_path_factory.mktemp("zoo_accept"))
    odgt = make_synthetic_valset(root, sizes=[(197, 263), (224, 224)], per_size=2)
    enc, dec, train_acc = train_reference_model(
        "resnet18dilated", "ppm_deepsup", 512, root=root, n_images=4,
        steps=120, downsample=8,
    )
    assert train_acc > 0.5

    # Fake zoo layout: <dir>/<model_name>/{encoder,decoder}_epoch_20.pth.
    zoo_dir = os.path.join(root, "zoo", "ade20k-resnet18dilated-ppm_deepsup")
    os.makedirs(zoo_dir)
    enc_path = os.path.join(zoo_dir, "encoder_epoch_20.pth")
    dec_path = os.path.join(zoo_dir, "decoder_epoch_20.pth")
    torch.save(enc.state_dict(), enc_path)
    torch.save(dec.state_dict(), dec_path)

    ref_miou, ref_acc, _ = run_reference_eval(
        enc, dec, root_dataset=root, odgt=odgt, imgSizes=(144, 208),
        imgMaxSize=320, padding_constant=8,
    )
    assert 0.25 < ref_acc < 0.995

    cfg_path = os.path.join(root, "ade20k-resnet18dilated-ppm_deepsup.yaml")
    with open(cfg_path, "w") as f:
        f.write(CFG_YAML)
    return dict(
        root=root, odgt=odgt, cfg_path=cfg_path,
        enc_path=enc_path, dec_path=dec_path,
        expected=(ref_miou * 100.0, ref_acc * 100.0),
    )


def _stub_downloader(fx):
    def downloader(model_name, checkpoint, download_dir):
        assert model_name == "ade20k-resnet18dilated-ppm_deepsup"
        assert checkpoint == "epoch_20.pth"
        return fx["enc_path"], fx["dec_path"]

    return downloader


@pytest.mark.slow
def test_harness_passes_against_reference_numbers(zoo_fixture):
    """download(stub) → convert → parity-lattice eval → PASS verdict."""
    fx = zoo_fixture
    r = vz.validate_config(
        fx["cfg_path"], root_dataset=fx["root"], list_val=fx["odgt"],
        downloader=_stub_downloader(fx), tolerance=0.1,
        expected=fx["expected"],
    )
    assert r["ok"] is True, r
    assert abs(r["miou"] - fx["expected"][0]) <= 0.1
    assert abs(r["acc"] - fx["expected"][1]) <= 0.1


@pytest.mark.slow
def test_harness_fails_outside_tolerance(zoo_fixture):
    """A table mismatch must produce a FAIL verdict, not a silent pass."""
    fx = zoo_fixture
    exp = (fx["expected"][0] + 1.0, fx["expected"][1])
    r = vz.validate_config(
        fx["cfg_path"], root_dataset=fx["root"], list_val=fx["odgt"],
        downloader=_stub_downloader(fx), tolerance=0.1, expected=exp,
    )
    assert r["ok"] is False
    assert r["d_miou"] == pytest.approx(-1.0, abs=0.1)


@pytest.mark.slow
def test_cli_main_wiring(zoo_fixture, monkeypatch, capsys, tmp_path):
    """main(): config resolution, table rendering, JSON out, exit code."""
    fx = zoo_fixture
    monkeypatch.setattr(vz, "download_pair", _stub_downloader(fx))
    # The synthetic set isn't the real val set, so inject its numbers as
    # the table expectation for this config.
    monkeypatch.setitem(
        vz.EXPECTED, "ade20k-resnet18dilated-ppm_deepsup",
        {"ms": tuple(round(v, 4) for v in fx["expected"])},
    )
    out_json = str(tmp_path / "report.json")
    rc = vz.main([
        "--root", fx["root"], "--list-val", fx["odgt"],
        "--configs", fx["cfg_path"], "--out", out_json,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "PASS" in out and "FAIL" not in out
    report = json.load(open(out_json))
    assert report["results"][0]["ok"] is True


def test_download_pair_url_construction(monkeypatch, tmp_path):
    """The zoo URL layout must match the reference's demo_test.sh:9-10."""
    seen = []

    def fake_load_url(url, model_dir):
        seen.append((url, model_dir))
        return os.path.join(model_dir, os.path.basename(url))

    import semseg_tpu.models.utils as mu

    monkeypatch.setattr(mu, "load_url", fake_load_url)
    enc, dec = vz.download_pair(
        "ade20k-resnet50dilated-ppm_deepsup", "epoch_20.pth", str(tmp_path)
    )
    base = "http://sceneparsing.csail.mit.edu/model/pytorch/ade20k-resnet50dilated-ppm_deepsup"
    assert seen[0][0] == f"{base}/encoder_epoch_20.pth"
    assert seen[1][0] == f"{base}/decoder_epoch_20.pth"
    assert enc.endswith("encoder_epoch_20.pth")
    assert dec.endswith("decoder_epoch_20.pth")


def test_expected_table_covers_all_shipped_configs():
    """Every shipped config has an asserted multi-scale row."""
    import glob

    shipped = {
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(os.path.dirname(vz.__file__), "..", "config", "*.yaml"))
    }
    assert shipped == set(vz.EXPECTED)
    for name, rows in vz.EXPECTED.items():
        assert "ms" in rows and "ss" in rows, name
