"""Pad-aware pooling: valid-region-exact adaptive pooling on padded
bucket canvases (ops/resize_dynamic.py + the PPM/UPerNet decoders).

The eval engines batch images inside zero-padded buckets; the global
adaptive pools of PPM-family decoders otherwise ingest that padding
(measured at up to 2e-2 pixel accuracy on small images — the "pad-bleed"
mechanism in PARITY.md). These tests pin the op-level exactness and the
end-to-end effect: a padded engine forward with pad_aware_pool must be
far closer to the unpadded computation than one without.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from semseg_tpu.config import cfg
from semseg_tpu.engine import BatchedInferenceEngine
from semseg_tpu.models import ModelBuilder, init_variables
from semseg_tpu.ops import (
    adaptive_avg_pool2d,
    adaptive_avg_pool2d_valid,
    resize_bilinear,
    upsample_grid_valid,
)


class TestValidPoolOp:
    @pytest.mark.parametrize("grid", [1, 2, 3, 6])
    def test_matches_cropped_pool(self, grid):
        rng = np.random.RandomState(grid)
        x = rng.randn(2, 24, 32, 5).astype(np.float32)
        # zero the pad region like the engines do, with per-sample valids
        valids = np.array([[17, 23], [24, 32]], np.int32)
        xp = x.copy()
        for n, (h, w) in enumerate(valids):
            xp[n, h:] = 0.0
            xp[n, :, w:] = 0.0
        out = adaptive_avg_pool2d_valid(jnp.asarray(xp), grid, valids)
        for n, (h, w) in enumerate(valids):
            ref = adaptive_avg_pool2d(jnp.asarray(x[None, n, :h, :w]), grid)
            np.testing.assert_allclose(
                np.asarray(out[n]), np.asarray(ref[0]), rtol=2e-5, atol=2e-5
            )

    def test_full_valid_is_plain_pool(self):
        rng = np.random.RandomState(0)
        x = rng.randn(1, 24, 32, 4).astype(np.float32)
        valids = np.array([[24, 32]], np.int32)
        a = adaptive_avg_pool2d_valid(jnp.asarray(x), (2, 3), valids)
        b = adaptive_avg_pool2d(jnp.asarray(x), (2, 3))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


class TestGridUpsample:
    def test_matches_cropped_resize(self):
        rng = np.random.RandomState(1)
        p = rng.randn(2, 3, 3, 4).astype(np.float32)
        valids = np.array([[19, 27], [24, 32]], np.int32)
        out = upsample_grid_valid(jnp.asarray(p), (24, 32), valids)
        for n, (h, w) in enumerate(valids):
            ref = resize_bilinear(jnp.asarray(p[None, n]), (int(h), int(w)))
            np.testing.assert_allclose(
                np.asarray(out[n, :h, :w]), np.asarray(ref[0]),
                rtol=2e-5, atol=2e-5,
            )
            # and zero beyond the valid extent
            assert np.all(np.asarray(out[n, h:]) == 0.0)
            assert np.all(np.asarray(out[n, :, w:]) == 0.0)


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        c = cfg.clone()
        c.MODEL.arch_encoder = "resnet18dilated"
        c.MODEL.arch_decoder = "ppm_deepsup"
        c.MODEL.fc_dim = 512
        model = ModelBuilder.build_model(c, dtype=jnp.float32)
        return model, init_variables(model, seed=0)

    def test_pad_aware_tracks_unpadded(self, model_and_vars):
        """Heavily padded bucket (96x120 image in a 160x192 canvas):
        pad-aware pooling's LOGITS must sit far closer to the unpadded
        forward than padded pooling's (metric counts are argmax-noisy
        under random init, so compare logits directly)."""
        model, variables = model_and_vars
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (1, 96, 120, 3)).astype(np.uint8)

        def logits(pad_aware, bucket):
            eng = BatchedInferenceEngine(
                model, variables, num_class=150, output_stride=8,
                bucket_step=bucket, batch_size=1,
                pad_aware_pool=pad_aware, bucket_denylist=(),
            )
            ph = -(-96 // bucket) * bucket
            pw = -(-120 // bucket) * bucket
            canvas = np.zeros((1, ph, pw, 3), np.uint8)
            canvas[0, :96, :120] = img[0]
            out = eng._batched_raw_fn(
                eng.variables, jnp.asarray(canvas),
                jnp.asarray([96]), jnp.asarray([120]), True,
            )
            # valid logits region at output stride 8
            return np.asarray(out)[0, :12, :15].astype(np.float32)

        ref = logits(True, 8)  # 96x120 sits on the step-8 lattice: no pad
        aware = logits(True, 64)  # 160x192 canvas, 61% padding
        naive = logits(False, 64)
        d_aware = float(np.abs(aware - ref).mean())
        d_naive = float(np.abs(naive - ref).mean())
        # At this tiny image size the dilated encoder's receptive-field
        # bleed dominates both paths (every pixel is "border"), so the
        # margin is modest — but removing the global-pool term must
        # never make things worse, and the decoder-level test below pins
        # the pool itself as exact. Real-scale effect is measured by
        # tools/parity_oracle.py (PARITY.md packed rows).
        assert d_aware < d_naive, (d_aware, d_naive)


class TestDecoderExactness:
    def test_ppm_decoder_valid_region_exact(self):
        """Decoder-level: PPMDeepsup on a zero-padded conv5 with valid_hw
        must equal the decoder on the CROPPED conv5 over the interior of
        the valid region (the only remaining pad effect is the 3x3
        conv_last_cbr's 1-pixel border bleed)."""
        import jax

        from semseg_tpu.models.decoders import PPMDeepsup

        rng = np.random.RandomState(0)
        dec = PPMDeepsup(num_class=19, fc_dim=64)
        c4 = rng.randn(1, 24, 30, 32).astype(np.float32)
        c5 = rng.randn(1, 20, 24, 64).astype(np.float32)
        variables = dec.init(
            jax.random.PRNGKey(0), [jnp.asarray(c4), jnp.asarray(c5)]
        )
        hv, wv = 13, 17
        c5p = c5.copy()
        c5p[0, hv:] = 0.0
        c5p[0, :, wv:] = 0.0
        valid = [
            jnp.asarray([[hv, wv]], jnp.int32),
            jnp.asarray([[hv, wv]], jnp.int32),
        ]
        padded = dec.apply(
            variables, [jnp.asarray(c4), jnp.asarray(c5p)],
            train=False, valid_hw=valid,
        )
        ref = dec.apply(
            variables,
            [jnp.asarray(c4[:, :hv, :wv]), jnp.asarray(c5[:, :hv, :wv])],
            train=False,
        )
        got = np.asarray(padded)[0, 1 : hv - 1, 1 : wv - 1]
        want = np.asarray(ref)[0, 1 : hv - 1, 1 : wv - 1]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
