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

    def test_nearest_bit_exact_randomized(self, rng):
        """Regression: Pillow computes NEAREST source indices by ITERATIVE
        accumulation (xo += scale), not (x+0.5)*scale — the two round
        differently on exact-integer boundaries for ~1/3 of random size
        pairs. Includes a shape pair the old formula got wrong."""
        shapes = [((312, 217), (148, 517))]
        shapes += [
            (tuple(rng.randint(8, 900, 2)), tuple(rng.randint(8, 900, 2)))
            for _ in range(25)
        ]
        for (sh, sw), (th, tw) in shapes:
            src = rng.randint(0, 256, (sh, sw)).astype(np.uint8)
            pil = np.asarray(
                Image.fromarray(src, "L").resize((tw, th), Image.NEAREST)
            )
            np.testing.assert_array_equal(
                native.resize_nearest_u8(src, (th, tw)), pil,
                err_msg=f"{(sh, sw)} -> {(th, tw)}",
            )

    def test_flip_fused_bit_exact(self, rng):
        """flip=True == FLIP_LEFT_RIGHT then resize, with no flipped copy."""
        for _ in range(12):
            sh, sw = rng.randint(8, 600, 2)
            th, tw = rng.randint(8, 600, 2)
            src = rng.randint(0, 256, (sh, sw, 3)).astype(np.uint8)
            im = Image.fromarray(src).transpose(Image.FLIP_LEFT_RIGHT)
            np.testing.assert_array_equal(
                native.resize_bilinear_u8(src, (th, tw), flip=True),
                np.asarray(im.resize((tw, th), Image.BILINEAR)),
            )
            lab = rng.randint(0, 151, (sh, sw)).astype(np.uint8)
            lim = Image.fromarray(lab, "L").transpose(Image.FLIP_LEFT_RIGHT)
            np.testing.assert_array_equal(
                native.resize_nearest_u8(lab, (th, tw), flip=True),
                np.asarray(lim.resize((tw, th), Image.NEAREST)),
            )

    def test_preprocess_flip(self, rng):
        src = rng.randint(0, 256, (100, 130, 3)).astype(np.uint8)
        out = native.preprocess(src, (64, 96), (64, 128), MEAN, STD, flip=True)
        pil = (
            Image.fromarray(src)
            .transpose(Image.FLIP_LEFT_RIGHT)
            .resize((96, 64), Image.BILINEAR)
        )
        ref = np.zeros((64, 128, 3), np.float32)
        ref[:, :96] = (np.asarray(pil) / 255.0 - MEAN) / STD
        np.testing.assert_allclose(out, ref, atol=1e-6)


def _jpeg_bytes(arr, quality=90):
    import io

    b = io.BytesIO()
    Image.fromarray(arr).save(b, "JPEG", quality=quality)
    return b.getvalue()


@pytest.mark.skipif(
    not native.jpeg_available(), reason="built without libjpeg"
)
class TestJpegDecode:
    def test_full_decode_bit_equal_to_pil(self, rng):
        """System-libjpeg decode must match Pillow's bundled decoder exactly
        (the once-per-process oracle in decode_jpeg_verified relies on it)."""
        import io

        for q in (75, 90, 100):
            data = _jpeg_bytes(
                rng.randint(0, 256, (97, 143, 3)).astype(np.uint8), q
            )
            ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
            np.testing.assert_array_equal(native.decode_jpeg(data), ref)

    def test_grayscale_jpeg_decodes_to_rgb(self, rng):
        import io

        b = io.BytesIO()
        Image.fromarray(
            rng.randint(0, 256, (64, 80)).astype(np.uint8), "L"
        ).save(b, "JPEG", quality=90)
        data = b.getvalue()
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(native.decode_jpeg(data), ref)

    def test_non_jpeg_returns_none(self, rng):
        import io

        b = io.BytesIO()
        Image.fromarray(
            rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        ).save(b, "PNG")
        assert native.decode_jpeg(b.getvalue()) is None
        assert native.decode_jpeg(b"not an image") is None

    def test_prescale_matches_pil_draft(self, rng):
        """scale_num/8 decode == PIL's Image.draft at the scales Pillow
        exposes (1/8, 1/4, 1/2 == scale_num 1, 2, 4): same engine."""
        import io

        arr = rng.randint(0, 256, (257, 385, 3)).astype(np.uint8)
        data = _jpeg_bytes(arr)
        for m in (1, 2, 4):
            pim = Image.open(io.BytesIO(data))
            pim.draft("RGB", (385 * m // 8, 257 * m // 8))
            ref = np.asarray(pim.convert("RGB"))
            out = native.decode_jpeg(data, scale_num=m)
            assert out.shape == ref.shape
            np.testing.assert_array_equal(out, ref)

    def test_prescale_dims_and_content(self, rng):
        """Non-power-of-two scale_nums: dims are ceil(dim*M/8) and the
        decode resampled to a common size stays close to the exact path."""
        arr = np.zeros((256, 320, 3), np.uint8)
        arr[:, :] = np.linspace(0, 255, 320, dtype=np.uint8)[None, :, None]
        data = _jpeg_bytes(arr, quality=95)
        full = native.decode_jpeg(data)
        for m in (3, 5, 7):
            out = native.decode_jpeg(data, scale_num=m)
            assert out.shape == (-(-256 * m // 8), -(-320 * m // 8), 3)
            a = native.resize_bilinear_u8(out, (64, 80)).astype(np.float32)
            b = native.resize_bilinear_u8(full, (64, 80)).astype(np.float32)
            assert np.mean(np.abs(a - b)) < 3.0

    def test_verified_oracle_gates_decode(self, rng, monkeypatch):
        data = _jpeg_bytes(rng.randint(0, 256, (32, 48, 3)).astype(np.uint8))
        # Fresh oracle: first call compares against PIL and (on this host,
        # where the full-decode test above passed) trusts the stream's
        # decode class.
        monkeypatch.setattr(native, "_trusted_classes", set())
        monkeypatch.setattr(native, "_decode_disabled", False)
        assert native.decode_jpeg_verified(data) is not None
        assert len(native._trusted_classes) == 1
        # A host where any comparison failed must stay on PIL forever.
        monkeypatch.setattr(native, "_decode_disabled", True)
        assert native.decode_jpeg_verified(data) is None

    def test_oracle_verifies_each_decode_class(self, rng, monkeypatch):
        """Distinct decode paths (chroma subsampling, progressive) each get
        their own PIL comparison — bit-equality on baseline 4:2:0 says
        nothing about e.g. 4:4:4's different upsampling SIMD path."""
        import io

        arr = rng.randint(0, 256, (40, 56, 3)).astype(np.uint8)
        variants = []
        for kw in (
            {"subsampling": 2},               # 4:2:0 baseline
            {"subsampling": 0},               # 4:4:4
            {"subsampling": 2, "progressive": True},
        ):
            b = io.BytesIO()
            Image.fromarray(arr).save(b, "JPEG", quality=90, **kw)
            variants.append(b.getvalue())
        classes = {native._load().ssg_jpeg_class(
            native._u8(np.frombuffer(v, np.uint8)),
            len(v)) for v in variants}
        assert len(classes) == 3  # the signature separates them
        monkeypatch.setattr(native, "_trusted_classes", set())
        monkeypatch.setattr(native, "_decode_disabled", False)
        for i, v in enumerate(variants):
            ref = np.asarray(Image.open(io.BytesIO(v)).convert("RGB"))
            out = native.decode_jpeg_verified(v)
            assert out is not None and np.array_equal(out, ref)
            assert len(native._trusted_classes) == i + 1


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

    @pytest.mark.skipif(
        not native.jpeg_available(), reason="built without libjpeg"
    )
    def test_fast_decode_close_to_exact(self, tmp_path, rng):
        """cfg.TPU.train_fast_decode: labels identical, images close to the
        exact path (DCT-domain prescale is a different — cheaper —
        resample, so only tolerance equality is claimed)."""
        import json
        import os

        from semseg_tpu.config import cfg
        from semseg_tpu.data import TrainDataset

        root = tmp_path
        os.makedirs(root / "img")
        os.makedirs(root / "ann")
        recs = []
        for i, (h, w) in enumerate([(600, 800), (760, 620)] * 2):
            # Smooth content: keeps JPEG quantization noise itself small so
            # the tolerance below measures the PRESCALE effect.
            yy, xx = np.mgrid[:h, :w]
            img = np.stack(
                [(yy * 255 // h), (xx * 255 // w), ((yy + xx) * 255 // (h + w))],
                axis=-1,
            ).astype(np.uint8)
            Image.fromarray(img).save(root / "img" / f"{i}.jpg", quality=95)
            Image.fromarray(
                rng.randint(0, 151, (h, w)).astype(np.uint8), "L"
            ).save(root / "ann" / f"{i}.png")
            recs.append(
                {"fpath_img": f"img/{i}.jpg", "fpath_segm": f"ann/{i}.png",
                 "width": w, "height": h}
            )
        odgt = root / "l.odgt"
        odgt.write_text("\n".join(json.dumps(r) for r in recs))

        opt = cfg.clone().DATASET
        exact = TrainDataset(
            str(root), str(odgt), opt, batch_per_gpu=2, seed=7
        ).next_batch()
        fast = TrainDataset(
            str(root), str(odgt), opt, batch_per_gpu=2, seed=7,
            fast_decode=True,
        ).next_batch()

        np.testing.assert_array_equal(fast["seg_label"], exact["seg_label"])
        assert fast["img_data"].shape == exact["img_data"].shape
        # Normalized units (std ~0.225): mean |delta| well under one 8-bit
        # step, worst pixel bounded.
        diff = np.abs(fast["img_data"] - exact["img_data"])
        assert diff.mean() < 0.02, diff.mean()
        assert diff.max() < 0.5, diff.max()
