"""Op-level golden tests against torch (CPU) oracles.

Each op that has tricky PyTorch-semantics corners (adaptive pooling integer
bins, align_corners=False bilinear, symmetric conv padding, ignore-index
losses) is validated against the corresponding torch functional on random
inputs. Layout convention: ours NHWC, torch NCHW.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from semseg_tpu import ops


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def assert_close(ours_nhwc, theirs_nchw, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours_nhwc), (0, 3, 1, 2)),
        theirs_nchw.numpy(),
        atol=atol,
        rtol=rtol,
    )


class TestConv2d:
    @pytest.mark.parametrize(
        "stride,padding,dilation,groups,kh",
        [
            (1, 1, 1, 1, 3),
            (2, 1, 1, 1, 3),
            (1, 2, 2, 1, 3),   # dilated-resnet layer3
            (1, 4, 4, 1, 3),   # dilated-resnet layer4
            (1, 0, 1, 1, 1),   # pointwise
            (2, 3, 1, 1, 7),
            (1, 1, 1, 8, 3),   # grouped (resnext-style)
        ],
    )
    def test_matches_torch(self, rng, stride, padding, dilation, groups, kh):
        cin, cout = 8, 16
        x = rng.randn(2, 13, 17, cin).astype(np.float32)
        w = rng.randn(kh, kh, cin // groups, cout).astype(np.float32)
        ours = ops.conv2d(
            jnp.asarray(x), jnp.asarray(w),
            stride=stride, padding=padding, dilation=dilation, groups=groups,
        )
        theirs = F.conv2d(
            torch.from_numpy(to_nchw(x)),
            torch.from_numpy(np.transpose(w, (3, 2, 0, 1))),
            stride=stride, padding=padding, dilation=dilation, groups=groups,
        )
        assert_close(ours, theirs, atol=1e-4, rtol=1e-4)

    def test_depthwise(self, rng):
        c = 12
        x = rng.randn(1, 9, 9, c).astype(np.float32)
        w = rng.randn(3, 3, 1, c).astype(np.float32)
        ours = ops.conv2d(jnp.asarray(x), jnp.asarray(w), stride=1, padding=1, groups=c)
        theirs = F.conv2d(
            torch.from_numpy(to_nchw(x)),
            torch.from_numpy(np.transpose(w, (3, 2, 0, 1))),
            stride=1, padding=1, groups=c,
        )
        assert_close(ours, theirs, atol=1e-5)


class TestPooling:
    def test_maxpool_stem(self, rng):
        # The ResNet stem pool: MaxPool2d(3, 2, 1).
        x = rng.randn(2, 15, 21, 6).astype(np.float32)
        ours = ops.max_pool2d(jnp.asarray(x), kernel_size=3, stride=2, padding=1)
        theirs = F.max_pool2d(torch.from_numpy(to_nchw(x)), 3, 2, 1)
        assert_close(ours, theirs)

    @pytest.mark.parametrize("out", [1, 2, 3, 6, (2, 5)])
    @pytest.mark.parametrize("hw", [(12, 12), (13, 17), (7, 24)])
    def test_adaptive_avg_pool(self, rng, out, hw):
        x = rng.randn(2, hw[0], hw[1], 5).astype(np.float32)
        ours = ops.adaptive_avg_pool2d(jnp.asarray(x), out)
        theirs = F.adaptive_avg_pool2d(torch.from_numpy(to_nchw(x)), out)
        assert_close(ours, theirs, atol=1e-4, rtol=1e-4)

    def test_avg_pool(self, rng):
        x = rng.randn(2, 14, 14, 4).astype(np.float32)
        ours = ops.avg_pool2d(jnp.asarray(x), kernel_size=2, stride=2)
        theirs = F.avg_pool2d(torch.from_numpy(to_nchw(x)), 2, 2)
        assert_close(ours, theirs)


class TestResize:
    @pytest.mark.parametrize("size", [(32, 32), (17, 23), (5, 7), (64, 96)])
    @pytest.mark.parametrize("align", [False, True])
    def test_bilinear_matches_torch(self, rng, size, align):
        x = rng.randn(2, 16, 16, 4).astype(np.float32)
        ours = ops.resize_bilinear(jnp.asarray(x), size, align_corners=align)
        theirs = F.interpolate(
            torch.from_numpy(to_nchw(x)), size=size,
            mode="bilinear", align_corners=align,
        )
        assert_close(ours, theirs, atol=1e-4, rtol=1e-3)


class TestLosses:
    def test_nll_ignore_index(self, rng):
        logits = rng.randn(2, 8, 8, 150).astype(np.float32)
        labels = rng.randint(-1, 150, size=(2, 8, 8)).astype(np.int64)
        logp = jnp.asarray(logits) - jnp.log(
            jnp.sum(jnp.exp(jnp.asarray(logits)), axis=-1, keepdims=True)
        )
        ours = ops.nll_loss(logp, jnp.asarray(labels), ignore_index=-1)
        t_logp = torch.log_softmax(torch.from_numpy(to_nchw(logits)), dim=1)
        theirs = F.nll_loss(t_logp, torch.from_numpy(labels), ignore_index=-1)
        np.testing.assert_allclose(float(ours), float(theirs), atol=1e-5)

    def test_fused_xent_equals_nll_of_logsoftmax(self, rng):
        logits = jnp.asarray(rng.randn(2, 6, 6, 19).astype(np.float32))
        labels = jnp.asarray(rng.randint(-1, 19, size=(2, 6, 6)))
        a = ops.softmax_cross_entropy_with_ignore(logits, labels)
        import jax.nn

        b = ops.nll_loss(jax.nn.log_softmax(logits, axis=-1), labels)
        np.testing.assert_allclose(float(a), float(b), atol=1e-5)

    def test_pixel_accuracy(self, rng):
        scores = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
        labels = jnp.asarray(
            np.array([[[0, 1, 2, -1], [0, 0, 0, 0], [1, 1, 1, 1], [2, 2, 2, 2]]])
        )
        acc = ops.pixel_accuracy(scores, labels)
        preds = np.argmax(np.asarray(scores), axis=-1)
        lab = np.asarray(labels)
        valid = lab != -1
        expected = ((preds == lab) & valid).sum() / valid.sum()
        np.testing.assert_allclose(float(acc), expected, atol=1e-6)


class TestPallasPyramidPool:
    def test_matches_adaptive_pool_interpret(self, rng):
        """Fused pallas pyramid pool == four adaptive_avg_pool2d calls."""
        import jax.numpy as jnp
        from semseg_tpu.ops.pallas.ppm_pool import pyramid_pool

        x = jnp.asarray(rng.randn(2, 13, 17, 256).astype(np.float32))
        outs = pyramid_pool(x, (1, 2, 3, 6), interpret=True)
        for s, o in zip((1, 2, 3, 6), outs):
            ref = ops.adaptive_avg_pool2d(x, s)
            np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=1e-5)
