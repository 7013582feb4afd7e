"""LivePredictor (serving backend over the eval engine): numeric oracle.

The bundle backend already has an end-to-end oracle in test_server.py;
this closes the live-backend path: HTTP-shaped uint8 input → dataset
pyramid transforms → BatchedInferenceEngine → label map must equal the
directly-computed model forward.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from semseg_tpu.config import cfg
from semseg_tpu.engine import BatchedInferenceEngine
from semseg_tpu.models import ModelBuilder, init_variables
from semseg_tpu.server import LivePredictor


@pytest.fixture(scope="module")
def live_setup():
    c = cfg.clone()
    c.MODEL.arch_encoder = "mobilenetv2dilated"
    c.MODEL.arch_decoder = "c1_deepsup"
    c.MODEL.fc_dim = 320
    c.DATASET.imgSizes = (64,)   # single scale == direct-forward oracle
    c.DATASET.imgMaxSize = 128
    c.TPU.eval_bucket_step = 8
    model = ModelBuilder.build_model(c, dtype=jnp.float32)
    variables = init_variables(model, seed=0, image_size=(64, 64))
    engine = BatchedInferenceEngine(
        model,
        variables,
        num_class=c.DATASET.num_class,
        output_stride=c.DATASET.segm_downsampling_rate,
        bucket_step=c.TPU.eval_bucket_step,
        batch_size=2,
    )
    return c, model, variables, engine


def test_live_predictor_matches_direct_forward(live_setup, rng):
    from semseg_tpu.data.transforms import MEAN, STD
    from semseg_tpu.ops.resize import resize_bilinear

    c, model, variables, engine = live_setup
    backend = LivePredictor(c, engine)

    # 64x64 lands exactly on the one pyramid scale and the lattice, so the
    # backend's output must be the model's own argmax at full resolution.
    img = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    got = backend.predict_batch([img])[0]
    assert got.shape == (64, 64)

    x = (img[None].astype(np.float32) / 255.0 - MEAN) / STD
    logits = model.apply(variables, jnp.asarray(x), train=False)
    want = np.asarray(
        jnp.argmax(resize_bilinear(logits.astype(jnp.float32), (64, 64)), -1)
    )[0]
    np.testing.assert_array_equal(got, want)


def test_live_predictor_mixed_sizes_batch(live_setup, rng):
    """Foreign sizes route through the pyramid/lattice machinery and come
    back at their own resolution, batched together."""
    c, _, _, engine = live_setup
    backend = LivePredictor(c, engine)
    imgs = [
        rng.randint(0, 256, (50, 70, 3)).astype(np.uint8),
        rng.randint(0, 256, (64, 64, 3)).astype(np.uint8),
        rng.randint(0, 256, (90, 40, 3)).astype(np.uint8),
    ]
    outs = backend.predict_batch(imgs)
    for img, out in zip(imgs, outs):
        assert out.shape == img.shape[:2]
        assert out.min() >= 0 and out.max() < c.DATASET.num_class


def test_live_preprocess_path_matches_raw_path(live_setup, rng):
    """MicroBatcher(preprocess=...) wiring: raw images submitted through
    the batcher (which preprocesses in the caller thread) must produce
    the same label maps as predict_batch on raw images."""
    from semseg_tpu.server import MicroBatcher

    c, _, _, engine = live_setup
    backend = LivePredictor(c, engine)
    imgs = [rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
            for _ in range(3)]
    want = backend.predict_batch(list(imgs))

    mb = MicroBatcher(
        backend.predict_batch, max_batch=2, max_wait_ms=5,
        preprocess=backend.preprocess,
    )
    try:
        futs = [mb.submit(im) for im in imgs]
        got = [f.result(timeout=60) for f in futs]
    finally:
        mb.close()
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_live_seg_canvas_cap_upscales_label_map(live_setup, rng):
    """Oversized request images are scored at a capped canvas resolution
    and NEAREST-upscaled back — the canvas allocation (H*W*num_class f32
    on device) must not scale with untrusted request size."""
    c, _, _, engine = live_setup
    capped = LivePredictor(c, engine, max_seg_pixels=32 * 32)
    img = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    pyr, seg, orig = capped.preprocess(img)
    assert orig == (64, 64)
    assert seg[0] * seg[1] <= 32 * 32
    out = capped.predict_batch([img])[0]
    assert out.shape == (64, 64)  # full-size label map returned
    # And the capped prediction is the NEAREST-upscale of the small one.
    small = engine.batched_predict([pyr], [seg])[0]
    from PIL import Image

    want = np.asarray(
        Image.fromarray(small.astype(np.int32), mode="I").resize(
            (64, 64), Image.NEAREST
        ),
        np.int64,
    )
    np.testing.assert_array_equal(out, want)
