"""Native C++ preprocessing library: Pillow bit-parity and pipeline equality."""

import numpy as np
import pytest
from PIL import Image

from semseg_tpu import native
from semseg_tpu.data.transforms import MEAN, STD

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


class TestBilinearParity:
    @pytest.mark.parametrize(
        "src_hw,dst_hw",
        [
            ((123, 87), (60, 45)),    # downscale (antialiased path)
            ((60, 80), (120, 157)),   # upscale
            ((300, 400), (97, 131)),  # heavy downscale
            ((50, 50), (50, 50)),     # identity
            ((7, 9), (300, 200)),     # extreme upscale
        ],
    )
    def test_bit_exact_vs_pillow(self, rng, src_hw, dst_hw):
        src = rng.randint(0, 256, (*src_hw, 3)).astype(np.uint8)
        th, tw = dst_hw
        pil = np.asarray(Image.fromarray(src).resize((tw, th), Image.BILINEAR))
        ours = native.resize_bilinear_u8(src, (th, tw))
        np.testing.assert_array_equal(ours, pil)

    def test_nearest_bit_exact(self, rng):
        src = rng.randint(0, 256, (123, 87)).astype(np.uint8)
        pil = np.asarray(Image.fromarray(src, "L").resize((45, 60), Image.NEAREST))
        ours = native.resize_nearest_u8(src, (60, 45))
        np.testing.assert_array_equal(ours, pil)


class TestNormalizePad:
    def test_matches_numpy(self, rng):
        src = rng.randint(0, 256, (50, 60, 3)).astype(np.uint8)
        out = native.normalize_pad(src, (64, 72), MEAN, STD)
        ref = np.zeros((64, 72, 3), np.float32)
        ref[:50, :60] = (src / 255.0 - MEAN) / STD
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_fused_preprocess(self, rng):
        src = rng.randint(0, 256, (100, 130, 3)).astype(np.uint8)
        out = native.preprocess(src, (64, 96), (64, 128), MEAN, STD)
        pil = Image.fromarray(src).resize((96, 64), Image.BILINEAR)
        ref = np.zeros((64, 128, 3), np.float32)
        ref[:, :96] = (np.asarray(pil) / 255.0 - MEAN) / STD
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestTrainDatasetNativePath:
    def test_native_batch_equals_pil_batch(self, tmp_path, rng):
        """The C++ fast path must produce bit-identical training batches."""
        import json
        import os

        from semseg_tpu.config import cfg
        from semseg_tpu.data import TrainDataset

        root = tmp_path
        os.makedirs(root / "img")
        os.makedirs(root / "ann")
        recs = []
        for i, (h, w) in enumerate([(90, 120), (130, 100), (75, 75), (110, 140)]):
            img = Image.fromarray(rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
            lab = Image.fromarray(rng.randint(0, 151, (h, w)).astype(np.uint8), "L")
            img.save(root / "img" / f"{i}.png")   # png: lossless, both paths
            lab.save(root / "ann" / f"{i}.png")
            recs.append(
                {"fpath_img": f"img/{i}.png", "fpath_segm": f"ann/{i}.png",
                 "width": w, "height": h}
            )
        odgt = root / "l.odgt"
        odgt.write_text("\n".join(json.dumps(r) for r in recs))

        opt = cfg.clone().DATASET
        a = TrainDataset(str(root), str(odgt), opt, batch_per_gpu=2, seed=11)
        os.environ["SEMSEG_NO_NATIVE"] = "1"
        try:
            b = TrainDataset(str(root), str(odgt), opt, batch_per_gpu=2, seed=11)
            batch_pil = b.next_batch()
        finally:
            del os.environ["SEMSEG_NO_NATIVE"]
        batch_native = a.next_batch()

        np.testing.assert_array_equal(
            batch_native["seg_label"], batch_pil["seg_label"]
        )
        np.testing.assert_allclose(
            batch_native["img_data"], batch_pil["img_data"], atol=1e-6
        )
