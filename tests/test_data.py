"""Data pipeline tests on synthetic ADE20K-style fixtures."""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

from semseg_tpu.config import cfg
from semseg_tpu.data import (
    TestDataset,
    TrainDataset,
    ValDataset,
    img_transform,
    round2nearest_multiple,
    scale_for,
)
from semseg_tpu.data.loader import EvalLoader, TrainLoader

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ade")
    rng = np.random.RandomState(7)
    records = []
    sizes = [(123, 87), (64, 200), (300, 150), (90, 90), (140, 210), (77, 311)]
    for i, (h, w) in enumerate(sizes):
        img = Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
        lab = Image.fromarray(rng.randint(0, 151, (h, w)).astype(np.uint8), mode="L")
        img_p = f"images/img{i}.jpg"
        lab_p = f"annotations/lab{i}.png"
        os.makedirs(root / "images", exist_ok=True)
        os.makedirs(root / "annotations", exist_ok=True)
        img.save(root / img_p)
        lab.save(root / lab_p)
        records.append(
            {"fpath_img": img_p, "fpath_segm": lab_p, "width": w, "height": h}
        )
    odgt = root / "list.odgt"
    odgt.write_text("\n".join(json.dumps(r) for r in records))
    return root, str(odgt), records


def make_opt(**over):
    c = cfg.clone()
    for k, v in over.items():
        c.DATASET[k] = v
    return c.DATASET


class TestTrainDataset:
    def test_batch_shapes_and_padding(self, fixture_dir):
        root, odgt, _ = fixture_dir
        ds = TrainDataset(str(root), odgt, make_opt(), batch_per_gpu=2, seed=0)
        for _ in range(4):
            batch = ds.next_batch()
            img, lab = batch["img_data"], batch["seg_label"]
            assert img.shape[0] == 2 and img.shape[-1] == 3
            assert img.shape[1] % 8 == 0 and img.shape[2] % 8 == 0
            assert lab.shape == (2, img.shape[1] // 8, img.shape[2] // 8)
            assert lab.min() >= -1 and lab.max() <= 149
            assert img.dtype == np.float32 and lab.dtype == np.int32

    def test_aspect_grouping(self, fixture_dir):
        root, odgt, records = fixture_dir
        ds = TrainDataset(str(root), odgt, make_opt(), batch_per_gpu=2, seed=1)
        by_name = {r["fpath_img"]: r for r in records}
        for _ in range(6):
            recs = ds._get_sub_batch()
            orients = [r["height"] > r["width"] for r in recs]
            assert len(set(orients)) == 1  # all portrait or all landscape

    def test_bucket_step_rounding(self, fixture_dir):
        root, odgt, _ = fixture_dir
        ds = TrainDataset(
            str(root), odgt, make_opt(), batch_per_gpu=2, seed=2, bucket_step=64
        )
        for _ in range(3):
            b = ds.next_batch()
            assert b["img_data"].shape[1] % 64 == 0
            assert b["img_data"].shape[2] % 64 == 0

    def test_raw_transport_matches_host_pipeline(self, fixture_dir):
        """raw_transport=True ships uint8 + valid hw; normalizing it on the
        host must reproduce the float32 pipeline's batch exactly."""
        from semseg_tpu.data.transforms import MEAN, STD

        root, odgt, _ = fixture_dir
        a = TrainDataset(str(root), odgt, make_opt(), batch_per_gpu=2, seed=7)
        b = TrainDataset(
            str(root), odgt, make_opt(), batch_per_gpu=2, seed=7,
            raw_transport=True,
        )
        for _ in range(3):
            ba, bb = a.next_batch(), b.next_batch()
            img = bb["img_data"]
            assert img.dtype == np.uint8
            hw = bb["img_valid_hw"]
            assert hw.shape == (2, 2) and hw.dtype == np.int32
            norm = (img.astype(np.float32) / 255.0 - MEAN) / STD
            for i, (h, w) in enumerate(hw):
                norm[i, h:] = 0.0
                norm[i, :, w:] = 0.0
            np.testing.assert_allclose(
                ba["img_data"], norm, atol=1e-6, rtol=0
            )
            np.testing.assert_array_equal(ba["seg_label"], bb["seg_label"])

    def test_deterministic_with_seed(self, fixture_dir):
        root, odgt, _ = fixture_dir
        a = TrainDataset(str(root), odgt, make_opt(), batch_per_gpu=2, seed=3)
        b = TrainDataset(str(root), odgt, make_opt(), batch_per_gpu=2, seed=3)
        ba, bb = a.next_batch(), b.next_batch()
        np.testing.assert_array_equal(ba["img_data"], bb["img_data"])
        np.testing.assert_array_equal(ba["seg_label"], bb["seg_label"])


class TestValTestDataset:
    def test_pyramid_sizes_match_reference_formula(self, fixture_dir):
        root, odgt, records = fixture_dir
        opt = make_opt()
        ds = ValDataset(str(root), odgt, opt)
        item = ds[0]
        h, w = records[0]["height"], records[0]["width"]
        assert len(item["img_data"]) == len(opt.imgSizes)
        for short_size, arr in zip(opt.imgSizes, item["img_data"]):
            s = scale_for(h, w, short_size, opt.imgMaxSize)
            th = round2nearest_multiple(int(h * s), opt.padding_constant)
            tw = round2nearest_multiple(int(w * s), opt.padding_constant)
            assert arr.shape == (1, th, tw, 3)
        assert item["seg_label"].shape == (1, h, w)
        assert item["seg_label"].min() >= -1

    def test_normalization_values(self, fixture_dir):
        # img_transform must match (x/255 - mean) / std.
        arr = np.full((10, 12, 3), 128, np.uint8)
        out = img_transform(Image.fromarray(arr))
        expected = (128 / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.229, 0.224, 0.225]
        )
        np.testing.assert_allclose(out[0, 0], expected, atol=1e-6)

    def test_test_dataset_no_labels(self, fixture_dir):
        root, odgt, records = fixture_dir
        items = [
            {"fpath_img": os.path.join(str(root), r["fpath_img"])}
            for r in records[:2]
        ]
        ds = TestDataset(items, make_opt())
        item = ds[0]
        assert "seg_label" not in item
        assert len(item["img_data"]) == 5


class TestLoaders:
    def test_train_loader_stream(self, fixture_dir):
        root, odgt, _ = fixture_dir
        loader = TrainLoader(
            lambda seed: TrainDataset(
                str(root), odgt, make_opt(), batch_per_gpu=2, seed=seed
            ),
            num_workers=2,
            prefetch=4,
        )
        it = iter(loader)
        batches = [next(it) for _ in range(5)]
        assert all(b["img_data"].ndim == 4 for b in batches)
        loader.close()

    def test_eval_loader_order(self, fixture_dir):
        root, odgt, records = fixture_dir
        ds = ValDataset(str(root), odgt, make_opt())
        out = list(EvalLoader(ds, num_workers=3, prefetch=2))
        assert [o["info"] for o in out] == [r["fpath_img"] for r in records]


class TestMetricsParity:
    def test_intersection_union_vs_reference(self):
        from mit_semseg.utils import intersectionAndUnion as ref_iau
        from semseg_tpu.utils import intersectionAndUnion

        rng = np.random.RandomState(0)
        pred = rng.randint(0, 150, (50, 60))
        lab = rng.randint(-1, 150, (50, 60))
        mine = intersectionAndUnion(pred, lab, 150)
        ref = ref_iau(pred, lab, 150)
        np.testing.assert_array_equal(mine[0], ref[0])
        np.testing.assert_array_equal(mine[1], ref[1])

    def test_accuracy_vs_reference(self):
        from mit_semseg.utils import accuracy as ref_acc
        from semseg_tpu.utils import accuracy

        rng = np.random.RandomState(1)
        pred = rng.randint(0, 150, (30, 40))
        lab = rng.randint(-1, 150, (30, 40))
        a, n = accuracy(pred, lab)
        ra, rn = ref_acc(pred, lab)
        assert a == pytest.approx(ra)
        assert n == rn

    def test_color_encode(self):
        from semseg_tpu.utils import colorEncode, load_colors

        colors = load_colors()
        assert colors.shape == (150, 3)
        lab = np.array([[-1, 0], [1, 149]])
        out = colorEncode(lab, colors)
        np.testing.assert_array_equal(out[0, 0], [0, 0, 0])
        np.testing.assert_array_equal(out[0, 1], colors[0])
        np.testing.assert_array_equal(out[1, 1], colors[149])

    def test_class_names(self):
        from semseg_tpu.utils import load_class_names

        names = load_class_names()
        assert names[1] == "wall"
        assert len(names) == 150

    def test_parse_devices(self):
        from semseg_tpu.utils import parse_devices

        assert parse_devices("0-3") == ["tpu0", "tpu1", "tpu2", "tpu3"]
        assert parse_devices("0,2") == ["tpu0", "tpu2"]
        assert parse_devices("gpu0") == ["tpu0"]


class TestLoaderFailure:
    def test_train_loader_propagates_worker_error(self):
        class Boom:
            def next_batch(self):
                raise RuntimeError("decode failed")

        loader = TrainLoader(lambda seed: Boom(), num_workers=1, prefetch=2)
        with pytest.raises(RuntimeError):
            next(iter(loader))
        loader.close()

    def test_eval_loader_propagates_error(self):
        class BadDataset:
            def __len__(self):
                return 3

            def __getitem__(self, i):
                if i == 1:
                    raise ValueError("corrupt image")
                return {"i": i}

        with pytest.raises(RuntimeError):
            list(EvalLoader(BadDataset(), num_workers=2, prefetch=2))

    def test_train_loader_surfaces_error_despite_live_workers(self):
        """A dead worker's exception must surface even while survivors keep
        the queue fed (its seeded sample stream is silently gone)."""
        import numpy as np

        class Stream:
            def __init__(self, boom):
                self.boom = boom
                self.n = 0

            def next_batch(self):
                self.n += 1
                if self.boom and self.n > 1:
                    raise RuntimeError("worker 1 died")
                return {"x": np.zeros(1)}

        loader = TrainLoader(
            lambda seed: Stream(boom=(seed == 1)), num_workers=2, prefetch=2
        )
        with pytest.raises(RuntimeError):
            for _ in range(200):  # healthy worker keeps feeding regardless
                next(iter(loader))
        loader.close()

    def test_eval_loader_abandonment_stops_workers(self):
        """Abandoning the iterator mid-stream must stop the worker threads
        (they otherwise spin in their backpressure waits forever)."""
        import time

        fetched = []

        class Slow:
            def __len__(self):
                return 1000

            def __getitem__(self, i):
                fetched.append(i)
                return {"i": i}

        it = iter(EvalLoader(Slow(), num_workers=2, prefetch=2))
        next(it)
        it.close()
        time.sleep(0.8)  # > the workers' 0.5 s cond.wait
        n = len(fetched)
        time.sleep(0.6)
        assert len(fetched) == n, "workers still fetching after close"
        assert n < 1000


class TestLatticeFuzz:
    def test_train_batch_invariants_over_random_shapes(self, tmp_path):
        """Fuzz the batch-assembly lattice logic: random record sizes,
        scales, lattices and label rates must always produce aligned
        canvases with in-range labels (the class of bug where a sample's
        ceil-rounded label block overflows the floored canvas)."""
        from PIL import Image as PILImage

        from semseg_tpu.config import cfg as _cfg
        from semseg_tpu.data.dataset import TrainDataset

        rng = np.random.RandomState(7)
        os.makedirs(tmp_path / "img", exist_ok=True)
        recs = []
        for i in range(10):
            h = int(rng.randint(33, 260))
            w = int(rng.randint(33, 260))
            PILImage.fromarray(
                rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            ).save(tmp_path / "img" / f"{i}.jpg")
            PILImage.fromarray(
                rng.randint(0, 151, (h, w)).astype(np.uint8), "L"
            ).save(tmp_path / "img" / f"{i}.png")
            recs.append({"fpath_img": f"img/{i}.jpg",
                         "fpath_segm": f"img/{i}.png",
                         "width": w, "height": h})

        for pad, rate in [(8, 8), (32, 4), (16, 8), (8, 4), (32, 8)]:
            for bucket in [0, pad, 3 * pad, 64]:
                opt = _cfg.DATASET.clone()
                opt.imgSizes = (48, 72, 100)
                opt.imgMaxSize = 200
                opt.padding_constant = pad
                opt.segm_downsampling_rate = rate
                ds = TrainDataset(
                    str(tmp_path), recs, opt, batch_per_gpu=3, seed=i,
                    bucket_step=bucket or None,
                )
                lattice = ds.bucket_step
                assert lattice % pad == 0
                for _ in range(4):
                    b = ds.next_batch()
                    n, bh, bw, _ = b["img_data"].shape
                    assert bh % lattice == 0 and bw % lattice == 0, (bh, bw)
                    assert b["seg_label"].shape == (n, bh // rate, bw // rate)
                    assert b["seg_label"].min() >= -1
                    assert b["seg_label"].max() <= 149
        # Non-dividing rate is rejected loudly, not corrupted silently.
        opt = _cfg.DATASET.clone()
        opt.padding_constant = 12
        opt.segm_downsampling_rate = 8
        with pytest.raises(AssertionError):
            TrainDataset(str(tmp_path), recs, opt, batch_per_gpu=2)
