"""Inference engine tests: bucketed mode vs exact reference computation,
checkpoint round-trips, and fix_bn semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semseg_tpu.config import cfg
from semseg_tpu.engine import InferenceEngine
from semseg_tpu.models import ModelBuilder, init_variables


@pytest.fixture(scope="module")
def model_and_vars():
    c = cfg.clone()
    c.MODEL.arch_encoder = "resnet18dilated"
    c.MODEL.arch_decoder = "ppm_deepsup"
    c.MODEL.fc_dim = 512
    model = ModelBuilder.build_model(c, dtype=jnp.float32)
    variables = init_variables(model, seed=0)
    return model, variables


def make_pyramid(rng, sizes=((96, 120), (72, 88))):
    return [rng.randn(1, h, w, 3).astype(np.float32) * 0.5 for h, w in sizes]


class TestEngine:
    def test_exact_mode_averages_scales(self, model_and_vars, rng):
        model, variables = model_and_vars
        engine = InferenceEngine(model, variables, exact=True)
        pyr = make_pyramid(rng)
        scores = engine.scores_for_pyramid(pyr, (100, 130))
        assert scores.shape == (100, 130, 150)
        np.testing.assert_allclose(scores.sum(-1), 1.0, atol=1e-4)

    def test_bucketed_close_to_exact(self, model_and_vars, rng):
        """Bucketed (pad + host resize) must closely track the exact path.

        The zero-pad border perturbs features near the pad edge, so require
        high argmax agreement rather than bitwise equality.
        """
        model, variables = model_and_vars
        exact = InferenceEngine(model, variables, exact=True)
        bucketed = InferenceEngine(
            model, variables, output_stride=8, bucket_step=64
        )
        pyr = make_pyramid(rng, sizes=((96, 120),))
        seg = (90, 115)
        s_exact = exact.scores_for_pyramid(pyr, seg)
        s_bucket = bucketed.scores_for_pyramid(pyr, seg)
        # With random (uncalibrated) weights the 150-class probabilities are
        # nearly flat (top prob ~0.06), so argmax is not a stable statistic;
        # assert closeness at the probability level instead.
        diff = np.abs(s_exact - s_bucket)
        assert diff.mean() < 5e-3, diff.mean()
        assert diff.max() < 0.15, diff.max()

    def test_bucketed_no_pad_matches_exact(self, model_and_vars, rng):
        """When the input already sits on the bucket lattice there is no
        padding at all; bucketed must equal exact up to resize backend."""
        model, variables = model_and_vars
        exact = InferenceEngine(model, variables, exact=True)
        bucketed = InferenceEngine(
            model, variables, output_stride=8, bucket_step=8
        )
        pyr = [rng.randn(1, 64, 64, 3).astype(np.float32) * 0.5]
        s_exact = exact.scores_for_pyramid(pyr, (64, 64))
        s_bucket = bucketed.scores_for_pyramid(pyr, (64, 64))
        np.testing.assert_allclose(s_bucket, s_exact, atol=2e-3)
        assert (s_exact.argmax(-1) == s_bucket.argmax(-1)).mean() > 0.999


class TestCheckpointRoundtrip:
    def test_train_state_roundtrip(self, tmp_path, model_and_vars):
        from semseg_tpu.parallel import create_train_state
        from semseg_tpu.checkpoint import restore_train_state, save_train_state

        c = cfg.clone()
        c.MODEL.arch_encoder = "resnet18dilated"
        c.MODEL.fc_dim = 512
        model, variables = model_and_vars
        state = create_train_state(c, model, variables)
        state = state.replace(step=jnp.asarray(7, jnp.int32))
        save_train_state(str(tmp_path), 3, state, {"train": {"loss": [1.0]}})

        fresh = create_train_state(c, model, variables)
        restored = restore_train_state(str(tmp_path), 3, fresh)
        assert int(restored.step) == 7
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert (tmp_path / "history_epoch_3.json").exists()

    def test_async_saver_survives_donated_live_state(
        self, tmp_path, model_and_vars
    ):
        """AsyncSaver must snapshot on device: after save() returns, the
        LIVE state's buffers get donated to the next step (deleted) and
        history keeps growing — the written checkpoint still holds the
        values and history from save time."""
        from semseg_tpu.checkpoint import AsyncSaver, restore_train_state
        from semseg_tpu.parallel import create_train_state

        c = cfg.clone()
        c.MODEL.arch_encoder = "resnet18dilated"
        c.MODEL.fc_dim = 512
        model, variables = model_and_vars
        # Private copies: this test deletes the state's buffers, which must
        # not touch the module-scoped fixture's arrays.
        state = create_train_state(
            c, model, jax.tree.map(jnp.copy, dict(variables))
        )
        state = state.replace(step=jnp.asarray(5, jnp.int32))
        expect_leaves = [
            np.asarray(x).copy() for x in jax.tree.leaves(state.params)
        ]
        history = {"train": {"loss": [1.0]}}

        with AsyncSaver() as saver:
            saver.save(str(tmp_path), 2, state, history)
            # Emulate what the train loop does next: donate the live
            # buffers and mutate history.
            for leaf in jax.tree.leaves(state.params) + [state.step]:
                leaf.delete()
            history["train"]["loss"].append(2.0)
            saver.wait()

        fresh = create_train_state(c, model, variables)
        restored = restore_train_state(str(tmp_path), 2, fresh)
        assert int(restored.step) == 5
        for a, b in zip(expect_leaves, jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(a, np.asarray(b))
        import json

        hist = json.load(open(tmp_path / "history_epoch_2.json"))
        assert hist["train"]["loss"] == [1.0]

    def test_variables_restore_from_train_state(self, tmp_path, model_and_vars):
        from semseg_tpu.parallel import create_train_state
        from semseg_tpu.checkpoint import restore_variables, save_train_state

        c = cfg.clone()
        c.MODEL.arch_encoder = "resnet18dilated"
        c.MODEL.fc_dim = 512
        model, variables = model_and_vars
        state = create_train_state(c, model, variables)
        save_train_state(str(tmp_path), 1, state)
        out = restore_variables(str(tmp_path / "epoch_1"), dict(variables))
        assert "params" in out and "batch_stats" in out
        for a, b in zip(
            jax.tree.leaves(variables["params"]), jax.tree.leaves(out["params"])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFixBN:
    def test_fix_bn_freezes_stats(self, rng):
        c = cfg.clone()
        c.MODEL.arch_encoder = "resnet18dilated"
        c.MODEL.arch_decoder = "c1"
        c.MODEL.fc_dim = 512
        c.TRAIN.fix_bn = True
        model = ModelBuilder.build_model(c, dtype=jnp.float32)
        assert model.fix_bn
        variables = init_variables(model)
        img = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        lab = jnp.zeros((1, 8, 8), jnp.int32)
        (loss, acc), mutated = model.apply(
            variables, img, seg_label=lab, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)},
        )
        for a, b in zip(
            jax.tree.leaves(variables["batch_stats"]),
            jax.tree.leaves(mutated["batch_stats"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDevicePreprocess:
    def test_uint8_path_matches_float_path(self, model_and_vars):
        """On-device normalize (uint8 input) == host-normalized input."""
        from semseg_tpu.data.transforms import MEAN, STD

        model, variables = model_and_vars
        engine = InferenceEngine(model, variables, output_stride=8, bucket_step=32)
        rng = np.random.RandomState(3)
        u8 = rng.randint(0, 256, (1, 96, 120, 3), dtype=np.uint8)
        f32 = ((u8.astype(np.float32) / 255.0) - MEAN.astype(np.float32)) / STD.astype(np.float32)
        s_u8 = engine.scores_for_pyramid([u8], (90, 115))
        s_f32 = engine.scores_for_pyramid([f32], (90, 115))
        np.testing.assert_allclose(s_u8, s_f32, atol=2e-5)


class TestSpatialSharding:
    def test_spatial_engine_matches_single_device(self, model_and_vars):
        """H-sharded multi-chip inference == single-device inference."""
        from semseg_tpu.parallel.mesh import make_mesh

        model, variables = model_and_vars
        base = InferenceEngine(model, variables, output_stride=8, bucket_step=32)
        spatial = InferenceEngine(
            model, variables, output_stride=8, bucket_step=32,
            spatial_mesh=make_mesh(4),
        )
        rng = np.random.RandomState(5)
        img = rng.randn(1, 96, 128, 3).astype(np.float32)
        s_base = base.scores_for_pyramid([img], (90, 120))
        s_spatial = spatial.scores_for_pyramid([img], (90, 120))
        np.testing.assert_allclose(s_spatial, s_base, atol=2e-4)


class TestBatchedEngine:
    def test_batched_equals_batch1(self, model_and_vars):
        from semseg_tpu.engine import BatchedInferenceEngine

        model, variables = model_and_vars
        base = InferenceEngine(model, variables, output_stride=8, bucket_step=32)
        batched = BatchedInferenceEngine(
            model, variables, output_stride=8, bucket_step=32, batch_size=3
        )
        rng = np.random.RandomState(9)
        items, seg_sizes = [], []
        # 5 images, 2 scales each, mixed shapes (some share buckets)
        for hw in [(60, 80), (63, 82), (90, 70), (60, 80), (45, 100)]:
            pyr = [
                rng.randint(0, 256, (1, hw[0], hw[1], 3), dtype=np.uint8),
                rng.randint(0, 256, (1, hw[0] // 2 * 2, hw[1] // 2 * 2, 3), dtype=np.uint8),
            ]
            items.append(pyr)
            seg_sizes.append((hw[0] + 3, hw[1] - 2))

        preds = batched.batched_predict(items, seg_sizes)
        for i in range(len(items)):
            ref = base.predict(items[i], seg_sizes[i])
            agree = (preds[i] == ref).mean()
            assert agree > 0.999, (i, agree)


class TestDevicePostproc:
    def test_device_postproc_matches_host(self, model_and_vars):
        from semseg_tpu.engine import BatchedInferenceEngine

        model, variables = model_and_vars
        eng = BatchedInferenceEngine(
            model, variables, output_stride=8, bucket_step=32, batch_size=2
        )
        rng = np.random.RandomState(13)
        items, seg_sizes = [], []
        for hw in [(60, 80), (90, 70), (64, 96)]:
            items.append([
                rng.randint(0, 256, (1, hw[0], hw[1], 3), dtype=np.uint8),
                rng.randint(0, 256, (1, hw[0] + 8, hw[1] + 8, 3), dtype=np.uint8),
            ])
            seg_sizes.append((hw[0] * 2 - 7, hw[1] * 2 + 5))
        on_dev = eng.batched_predict(items, seg_sizes, device_postproc=True)
        on_host = eng.batched_predict(items, seg_sizes, device_postproc=False)
        for i in range(len(items)):
            assert on_dev[i].shape == seg_sizes[i]
            agree = (on_dev[i] == on_host[i]).mean()
            assert agree > 0.999, (i, agree)


class TestDeviceMetrics:
    def test_device_metrics_match_host_metrics(self, model_and_vars):
        from semseg_tpu.engine import BatchedInferenceEngine
        from semseg_tpu.utils import accuracy, intersectionAndUnion

        model, variables = model_and_vars
        eng = BatchedInferenceEngine(
            model, variables, output_stride=8, bucket_step=32, batch_size=2
        )
        rng = np.random.RandomState(21)
        items, labels = [], []
        for hw in [(60, 80), (90, 70), (64, 96)]:
            items.append([
                rng.randint(0, 256, (1, hw[0], hw[1], 3), dtype=np.uint8),
                rng.randint(0, 256, (1, hw[0] + 8, hw[1] - 8, 3), dtype=np.uint8),
            ])
            labels.append(rng.randint(-1, 150, (hw[0] + 5, hw[1] + 3)).astype(np.int32))

        dev = eng.batched_metrics(items, labels)
        preds = eng.batched_predict(items, [l.shape for l in labels])
        for i in range(len(items)):
            acc, pix = accuracy(preds[i], labels[i])
            inter, union = intersectionAndUnion(preds[i], labels[i], 150)
            a_s, p_s, d_inter, d_union = dev[i]
            assert int(p_s) == int(pix)
            np.testing.assert_allclose(int(a_s) / (int(p_s) + 1e-10), acc, atol=1e-6)
            np.testing.assert_array_equal(d_inter.astype(np.int64), inter)
            np.testing.assert_array_equal(d_union.astype(np.int64), union)


    def test_degenerate_inputs(self, model_and_vars):
        """Empty requests return []; an empty pyramid fails loudly instead
        of a KeyError from the metric-packing loop."""
        from semseg_tpu.engine import BatchedInferenceEngine

        model, variables = model_and_vars
        eng = BatchedInferenceEngine(
            model, variables, output_stride=8, bucket_step=32, batch_size=2
        )
        assert eng.batched_metrics([], []) == []
        assert eng.batched_predict([], []) == []
        with pytest.raises(AssertionError, match="level"):
            eng.batched_metrics(
                [[]], [np.zeros((8, 8), np.int32)]
            )

    def test_canvas_budget_windows_match_unbounded(self, model_and_vars):
        """A canvas budget small enough to force one window per image must
        not change any metric (it only bounds live HBM score canvases)."""
        from semseg_tpu.engine import BatchedInferenceEngine

        model, variables = model_and_vars
        rng = np.random.RandomState(33)
        items, labels = [], []
        for hw in [(60, 80), (90, 70), (64, 96)]:
            items.append([
                rng.randint(0, 256, (1, hw[0], hw[1], 3), dtype=np.uint8),
                rng.randint(0, 256, (1, hw[0] + 8, hw[1] - 8, 3), dtype=np.uint8),
            ])
            labels.append(
                rng.randint(-1, 150, (hw[0] + 5, hw[1] + 3)).astype(np.int32)
            )

        kw = dict(output_stride=8, bucket_step=32, batch_size=2)
        wide = BatchedInferenceEngine(model, variables, **kw)
        tight = BatchedInferenceEngine(
            model, variables, canvas_budget_mb=1, **kw
        )
        assert len(tight._canvas_windows(
            [l.shape for l in labels], range(3))) == 3

        for a, b in zip(wide.batched_metrics(items, labels),
                        tight.batched_metrics(items, labels)):
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestSegmentationModuleWrapper:
    def test_feed_dict_api(self, model_and_vars, rng):
        """The reference calling convention: module(feed_dict, segSize=...)."""
        from semseg_tpu.models import SegmentationModule

        model, variables = model_and_vars
        module = SegmentationModule(model, variables)
        img = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        scores = module({"img_data": img}, segSize=(50, 60))
        assert scores.shape == (1, 50, 60, 150)
        np.testing.assert_allclose(np.asarray(scores).sum(-1), 1.0, atol=1e-4)

        # Training forward at batch 2 (the reference default): batch 1
        # through the PPM's 1x1-pooled BN raises in torch too ("Expected
        # more than 1 value per channel") — asserted below.
        img2 = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
        lab2 = jnp.asarray(rng.randint(-1, 150, (2, 8, 8)).astype(np.int32))
        loss, acc = module({"img_data": img2, "seg_label": lab2})
        assert np.isfinite(float(loss)) and 0.0 <= float(acc) <= 1.0

        with pytest.raises(ValueError, match=">1 element"):
            module({"img_data": img, "seg_label": lab2[:1]})


class TestConverterErrors:
    def test_missing_torch_key_raises(self, model_and_vars):
        from semseg_tpu.models.convert import convert_checkpoints

        model, variables = model_and_vars
        with pytest.raises(KeyError):
            convert_checkpoints(
                dict(variables),
                arch_encoder="resnet18dilated",
                arch_decoder="ppm_deepsup",
                encoder_state={"conv1.weight": np.zeros((64, 3, 3, 3), np.float32)},
            )


def test_engine_allocations_follow_variables_device(model_and_vars):
    """Engines must allocate uploads/canvases on THEIR device — bare
    jnp.asarray would stage everything through device 0 in multi-device
    eval (one device holds all engines' canvases)."""
    model, variables = model_and_vars
    dev = jax.devices()[3]
    eng = InferenceEngine(
        model, jax.device_put(variables, dev), num_class=150,
        output_stride=8, bucket_step=16,
    )
    assert eng.device == dev
    a = eng._put(np.zeros((4, 4), np.uint8))
    z = eng._zeros((8, 8, 3), jnp.float32)
    assert a.devices() == {dev} and z.devices() == {dev}


def test_engine_bucket_step_keeps_padding_alignment(model_and_vars):
    """The padding_constant lattice rule lives in the engine itself, not
    just in one CLI call site."""
    model, variables = model_and_vars
    eng = InferenceEngine(
        model, variables, num_class=150, output_stride=8,
        bucket_step=48, padding_constant=32,
    )
    assert eng.bucket_step == 64  # smallest 32-aligned lattice >= 48
