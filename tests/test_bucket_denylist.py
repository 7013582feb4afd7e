"""Faulty-bucket routing: engines must dodge denylisted forward shapes.

The experimental axon TPU runtime kernel-faults on ONE compiled forward
shape (flagship bf16 batch-4 at exactly 304x400 — PERF_NOTES "Step-8
lattice worker fault"). The engines route any task whose lattice bucket
lands on a denylisted shape to the next lattice point instead. Because
every engine path masks the pad region (normalize_u8_masked /
valid_mask) and zeroes it out of the accumulate, routing is numerically
EXACT for models without spatial mixing — verified here with a 1x1-conv
model, so the only approximation left in production (conv pad bleed) is
the same mechanism already quantified for coarser bucket steps
(PARITY.md).
"""

import numpy as np
import pytest

import flax.linen as nn
import jax.numpy as jnp

from semseg_tpu.engine import (
    AXON_FAULT_BUCKETS,
    BatchedInferenceEngine,
    DevicePyramidEngine,
    InferenceEngine,
)


class _PointwiseNet(nn.Module):
    """1x1 convs + stride-8 subsample: zero spatial mixing, so zero-pad
    routing cannot change any valid output pixel (exact-equality oracle)."""

    num_class: int = 150

    @nn.compact
    def __call__(self, x, seg_size=None, train=False, valid_hw=None):
        x = nn.Conv(16, (1, 1))(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_class, (1, 1))(x)
        return x[:, ::8, ::8]


def _make(engine_cls, denylist, **kw):
    import jax

    model = _PointwiseNet()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3), jnp.float32)
    )
    return engine_cls(
        model,
        variables,
        num_class=150,
        output_stride=8,
        bucket_step=8,
        batch_size=2,
        bucket_denylist=denylist,
        **kw,
    )


class TestBucketKey:
    def test_routes_around_denylist(self):
        eng = _make(BatchedInferenceEngine, {(304, 400)})
        # 300x396 rounds to the faulty 304x400 -> bumped along W
        # (adding a W step costs 8*304 pixels vs 8*400 for an H step).
        assert eng._bucket_key(300, 396) == (304, 408)
        assert eng._bucket_key(304, 400) == (304, 408)
        # Untouched shapes keep exact step-8 rounding.
        assert eng._bucket_key(300, 404) == (304, 408)
        assert eng._bucket_key(96, 120) == (96, 120)

    def test_chained_denylist_and_direction(self):
        eng = _make(BatchedInferenceEngine, {(304, 400), (304, 408)})
        assert eng._bucket_key(300, 396) == (304, 416)
        # Portrait orientation bumps H (the cheaper dimension there).
        eng2 = _make(BatchedInferenceEngine, {(400, 304)})
        assert eng2._bucket_key(400, 304) == (408, 304)

    def test_explicit_empty_disables_routing(self):
        eng = _make(BatchedInferenceEngine, ())
        assert eng._bucket_key(300, 396) == (304, 400)

    def test_auto_on_cpu_is_empty(self):
        # The suite pins JAX_PLATFORMS=cpu; "auto" must resolve to no
        # denylist there (the fault is an axon-stack bug).
        eng = _make(BatchedInferenceEngine, "auto")
        assert eng.bucket_denylist == frozenset()
        # The probed-faulty family (tools/fault_probe.py) must at least
        # contain the originally-bisected point.
        assert (304, 400) in AXON_FAULT_BUCKETS


class TestRoutedResultsExact:
    def _pyramids(self, rng, shapes):
        pyrs, labels = [], []
        for (h, w) in shapes:
            pyrs.append(
                [
                    rng.randint(0, 255, (1, h, w, 3)).astype(np.uint8),
                    rng.randint(0, 255, (1, h // 2, w // 2, 3)).astype(
                        np.uint8
                    ),
                ]
            )
            labels.append(rng.randint(-1, 150, (h, w)).astype(np.int32))
        return pyrs, labels

    def test_batched_metrics_unchanged_by_routing(self):
        rng = np.random.RandomState(0)
        # 304x400 sits exactly on the denylisted bucket; 96x120 is a
        # control that must not be rerouted.
        pyrs, labels = self._pyramids(rng, [(304, 400), (96, 120)])
        plain = _make(BatchedInferenceEngine, ())
        routed = _make(BatchedInferenceEngine, {(304, 400)})
        m0 = plain.batched_metrics(pyrs, labels)
        m1 = routed.batched_metrics(pyrs, labels)
        for (a, b) in zip(m0, m1):
            for (x, y) in zip(a, b):
                np.testing.assert_allclose(x, y, atol=1e-5)

    def test_batched_predict_unchanged_by_routing(self):
        rng = np.random.RandomState(1)
        pyrs, labels = self._pyramids(rng, [(304, 400)])
        seg_sizes = [lab.shape for lab in labels]
        plain = _make(BatchedInferenceEngine, ())
        routed = _make(BatchedInferenceEngine, {(304, 400)})
        p0 = plain.batched_predict(pyrs, seg_sizes)
        p1 = routed.batched_predict(pyrs, seg_sizes)
        # The larger routed canvas re-tiles XLA's reductions, so last-ulp
        # score differences can flip argmax TIES (random-init probabilities
        # are near-flat). Require near-perfect agreement, not bitwise.
        agree = (p0[0] == p1[0]).mean()
        assert agree > 0.9999, agree

    def test_device_pyramid_metrics_unchanged_by_routing(self):
        rng = np.random.RandomState(2)
        # imgSizes chosen so one level's plan lands on the 304x400 bucket:
        # scale_for targets short side 300 with the 304x400 original
        # already nearly there.
        kw = dict(
            img_sizes=(300,),
            img_max_size=1000,
            ori_step=64,
            ori_canvas=(448, 448),
        )
        originals = [rng.randint(0, 255, (304, 400, 3)).astype(np.uint8)]
        labels = [rng.randint(-1, 150, (304, 400)).astype(np.int32)]
        plain = _make(DevicePyramidEngine, (), **kw)
        routed = _make(DevicePyramidEngine, {(304, 400)}, **kw)
        m0 = plain.batched_metrics_from_originals(originals, labels)
        m1 = routed.batched_metrics_from_originals(originals, labels)
        for (a, b) in zip(m0, m1):
            for (x, y) in zip(a, b):
                np.testing.assert_allclose(x, y, atol=1e-5)

    def test_per_image_engine_scores_unchanged_by_routing(self):
        rng = np.random.RandomState(3)
        pyr = [rng.randint(0, 255, (1, 304, 400, 3)).astype(np.uint8)]
        model = _PointwiseNet()
        import jax

        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3), jnp.float32)
        )
        mk = lambda dl: InferenceEngine(
            model,
            variables,
            num_class=150,
            output_stride=8,
            bucket_step=8,
            bucket_denylist=dl,
        )
        s0 = mk(())
        s1 = mk({(304, 400)})
        a = s0.scores_for_pyramid(pyr, (304, 400))
        b = s1.scores_for_pyramid(pyr, (304, 400))
        np.testing.assert_allclose(a, b, atol=1e-5)
