"""AOT serving bundle: export → load → predict parity (semseg_tpu/serving.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semseg_tpu.config import cfg
from semseg_tpu.models import ModelBuilder, init_variables
from semseg_tpu.ops.resize import resize_bilinear
from semseg_tpu.serving import Predictor, export_bundle


@pytest.fixture(scope="module")
def small_model():
    c = cfg.clone()
    c.MODEL.arch_encoder = "mobilenetv2dilated"
    c.MODEL.arch_decoder = "c1_deepsup"
    c.MODEL.fc_dim = 320
    model = ModelBuilder.build_model(c, dtype=jnp.float32)
    return model, init_variables(model, seed=0, image_size=(64, 64))


def test_bundle_roundtrip(small_model, tmp_path):
    model, variables = small_model
    out = str(tmp_path / "bundle")
    manifest = export_bundle(
        model, variables, out, shapes=[(64, 64), (64, 96)], batch_size=1
    )
    assert len(manifest["programs"]) == 2

    pred = Predictor(out)

    # Exact bucket shape: must equal the in-process program bit for bit.
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (64, 96, 3), dtype=np.uint8)
    got = pred.predict(img)
    assert got.shape == (64, 96) and got.dtype == np.int64

    from semseg_tpu.data.transforms import MEAN, STD

    x = (img[None].astype(np.float32) / 255.0 - MEAN) / STD
    logits = model.apply(variables, jnp.asarray(x), train=False)
    want = np.asarray(
        jnp.argmax(resize_bilinear(logits, (64, 96)), axis=-1)
    )[0]
    np.testing.assert_array_equal(got, want)


def test_predict_batch_matches_predict(small_model, tmp_path):
    """Packed batched prediction must equal one-at-a-time prediction."""
    model, variables = small_model
    out = str(tmp_path / "bundle")
    export_bundle(
        model, variables, out, shapes=[(64, 64), (64, 96)], batch_size=2
    )
    pred = Predictor(out)
    rng = np.random.RandomState(2)
    imgs = [
        rng.randint(0, 256, (64, 64, 3), dtype=np.uint8),
        rng.randint(0, 256, (64, 96, 3), dtype=np.uint8),
        rng.randint(0, 256, (64, 64, 3), dtype=np.uint8),  # odd-size chunk
    ]
    batch_out = pred.predict_batch(imgs)
    for img, got in zip(imgs, batch_out):
        np.testing.assert_array_equal(got, pred.predict(img))


def test_bundle_resizes_foreign_shapes(small_model, tmp_path):
    model, variables = small_model
    out = str(tmp_path / "bundle")
    export_bundle(model, variables, out, shapes=[(64, 64)], batch_size=1)
    pred = Predictor(out)
    img = np.random.RandomState(1).randint(0, 256, (50, 70, 3), dtype=np.uint8)
    got = pred.predict(img)
    assert got.shape == (50, 70)
    assert got.min() >= 0 and got.max() < 150
