"""Train-step tests: optimizer semantics vs torch SGD, sharded execution."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from semseg_tpu.config import cfg
from semseg_tpu.models import ModelBuilder, init_variables
from semseg_tpu.parallel import (
    create_train_state,
    jitted_train_step,
    make_mesh,
    replicate_state,
    shard_batch,
    train_step,
)
from semseg_tpu.parallel.train_step import current_lrs, decay_mask, poly_schedule


def small_cfg():
    c = cfg.clone()
    c.MODEL.arch_encoder = "resnet18dilated"
    c.MODEL.arch_decoder = "ppm_deepsup"
    c.MODEL.fc_dim = 512
    c.TRAIN.num_epoch = 2
    c.TRAIN.epoch_iters = 10
    return c


@pytest.fixture(scope="module")
def setup():
    c = small_cfg()
    model = ModelBuilder.build_model(c, dtype=jnp.float32)
    variables = init_variables(model, seed=0)
    state = create_train_state(c, model, variables)
    return c, model, state


def make_batch(rng, n=2, hw=(64, 64), ds=8):
    return {
        "img_data": rng.randn(n, hw[0], hw[1], 3).astype(np.float32),
        "seg_label": rng.randint(-1, 150, (n, hw[0] // ds, hw[1] // ds)).astype(
            np.int32
        ),
    }


class TestTrainStep:
    def test_loss_decreases_on_repeated_batch(self, setup, rng):
        c, model, state = setup
        batch = make_batch(rng)
        step = jax.jit(train_step)
        key = jax.random.PRNGKey(0)
        losses = []
        for _ in range(5):
            state, metrics = step(state, batch, key)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        assert int(state.step) == 5

    def test_batch_stats_update(self, setup, rng):
        c, model, state = setup
        batch = make_batch(rng)
        new_state, _ = jax.jit(train_step)(state, batch, jax.random.PRNGKey(0))
        before = jax.tree.leaves(state.batch_stats)
        after = jax.tree.leaves(new_state.batch_stats)
        changed = sum(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )
        assert changed > 0

    def test_fix_bn_trains_deepsup_with_frozen_stats(self, rng):
        """cfg.TRAIN.fix_bn + a *_deepsup decoder must train (the reference
        runs eval-mode BN with both heads, train.py:26): params update, the
        deep-supervision branch runs, BN statistics stay frozen."""
        c = small_cfg()
        c.TRAIN.fix_bn = True
        model = ModelBuilder.build_model(c, dtype=jnp.float32)
        variables = init_variables(model, seed=0)
        state = create_train_state(c, model, variables)
        batch = make_batch(rng)
        s2, m = jax.jit(train_step)(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))
        for a, b in zip(
            jax.tree.leaves(state.batch_stats), jax.tree.leaves(s2.batch_stats)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        changed = sum(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(state.params), jax.tree.leaves(s2.params)
            )
        )
        assert changed > 0

    def test_raw_uint8_transport_matches_host_normalize(self, setup, rng):
        """TPU.device_preproc: a raw uint8 batch (+ per-image valid hw,
        normalize on device) must produce the same step as the host-side
        float32 pipeline — including zero pad in NORMALIZED space."""
        from semseg_tpu.data.transforms import MEAN, STD

        c, model, state = setup
        key = jax.random.PRNGKey(2)
        n, H, W = 2, 64, 64
        hw = np.array([[56, 64], [64, 48]], np.int32)  # ragged valid regions
        raw = np.zeros((n, H, W, 3), np.uint8)
        host = np.zeros((n, H, W, 3), np.float32)
        for i, (h, w) in enumerate(hw):
            px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            raw[i, :h, :w] = px
            host[i, :h, :w] = (px.astype(np.float32) / 255.0 - MEAN) / STD
        label = rng.randint(-1, 150, (n, H // 8, W // 8)).astype(np.int32)

        # The normalize+mask itself is exact (isolated, nothing to fuse into).
        from semseg_tpu.parallel.train_step import _normalize_raw

        np.testing.assert_allclose(
            np.asarray(jax.jit(_normalize_raw)(raw, hw)), host,
            atol=1e-6, rtol=0,
        )

        step = jax.jit(train_step)
        s_host, m_host = step(
            state, {"img_data": host, "seg_label": label}, key
        )
        s_raw, m_raw = step(
            state,
            {"img_data": raw, "seg_label": label, "img_valid_hw": hw},
            key,
        )
        # Inside the full step XLA fuses the normalize into neighboring ops
        # with different rounding than numpy's separate passes; that few-ULP
        # input delta amplifies ~1000x through 20 random-init BN layers'
        # gradients, so the step-level check is only a wiring guard (a
        # missing pad mask would show up as ~1e-1 param deltas).
        np.testing.assert_allclose(
            float(m_host["loss"]), float(m_raw["loss"]), rtol=1e-4
        )
        for a, b in zip(
            jax.tree.leaves(s_host.params), jax.tree.leaves(s_raw.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3, rtol=0
            )

    @pytest.mark.slow
    def test_sharded_matches_single_device(self, setup, rng):
        """DP over the 8-device mesh must equal single-device training."""
        c, model, state = setup
        batch = make_batch(rng, n=8)
        key = jax.random.PRNGKey(1)

        step = jax.jit(train_step)
        mesh = make_mesh(8)

        # One step: loss identical, params equal up to f32 cross-device
        # reduction-order noise.
        s1, m1 = step(state, batch, key)
        s2, m2 = step(replicate_state(mesh, state), shard_batch(mesh, batch), key)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-3, rtol=0
            )

        # Multi-step: the tiny per-step noise compounds chaotically, so only
        # the loss trajectory is compared, loosely.
        l1, l2 = [], []
        for _ in range(2):
            s1, m1 = step(s1, batch, key)
            s2, m2 = step(s2, shard_batch(mesh, batch), key)
            l1.append(float(m1["loss"]))
            l2.append(float(m2["loss"]))
        np.testing.assert_allclose(l1, l2, rtol=5e-3)

    def test_hybrid_batch_sharding_specs(self):
        """On a (data, spatial) mesh, images/labels shard H over 'spatial';
        per-image metadata stays data-sharded (train CLI TPU.spatial)."""
        from jax.sharding import PartitionSpec as P

        from semseg_tpu.parallel import make_mesh_2d

        mesh = make_mesh_2d(2, 2)
        rng = np.random.RandomState(0)
        sharded = shard_batch(mesh, {
            "img_data": rng.randint(0, 255, (4, 64, 64, 3)).astype(np.uint8),
            "seg_label": rng.randint(-1, 150, (4, 8, 8)).astype(np.int32),
            "img_valid_hw": np.full((4, 2), 64, np.int32),
        })
        assert sharded["img_data"].sharding.spec == P("data", "spatial")
        assert sharded["seg_label"].sharding.spec == P("data", "spatial")
        assert sharded["img_valid_hw"].sharding.spec == P("data")

    @pytest.mark.slow
    def test_hybrid_mesh_matches_single_device(self, setup, rng):
        """One step on a 2-way-data x 2-way-spatial mesh (image height
        sharded: GSPMD conv halo exchanges + gradient/BN reductions over
        BOTH axes) must equal single-device training — the numerics behind
        the train CLI's TPU.spatial knob."""
        from semseg_tpu.parallel import make_mesh_2d

        c, model, state = setup
        batch = make_batch(rng, n=4)
        key = jax.random.PRNGKey(2)

        step = jax.jit(train_step)
        mesh = make_mesh_2d(2, 2)

        s1, m1 = step(state, batch, key)
        s2, m2 = step(
            replicate_state(mesh, state), shard_batch(mesh, batch), key
        )
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(m1["acc"]), float(m2["acc"]), rtol=1e-6
        )
        for a, b in zip(
            jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-3, rtol=0
            )
        for a, b in zip(
            jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s2.batch_stats)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=0
            )


class TestGradAccum:
    def test_accum_matches_manual_microbatch_loop(self, setup, rng):
        """TPU.grad_accum's lax.scan must equal the documented torch-style
        accumulation loop: per-microbatch grads with evolving BN stats,
        averaged into one optimizer update."""
        import functools

        import optax

        from semseg_tpu.parallel.train_step import (
            _microbatch_grads,
            stack_microbatches,
        )

        c, model, state = setup
        batch = make_batch(rng, n=4)
        key = jax.random.PRNGKey(3)
        K = 2

        s_acc, m_acc = jax.jit(
            functools.partial(train_step, grad_accum=K), donate_argnums=()
        )(state, stack_microbatches(batch, K), key)

        dropout_rng = jax.random.fold_in(key, state.step)
        stats = state.batch_stats
        grad_sum, loss_sum, acc_sum = None, 0.0, 0.0
        micro_fn = jax.jit(_microbatch_grads)
        mb = 4 // K
        for i in range(K):
            micro = {k: v[i * mb : (i + 1) * mb] for k, v in batch.items()}
            loss, acc, stats, grads = micro_fn(
                state, micro, stats, jax.random.fold_in(dropout_rng, i)
            )
            loss_sum += float(loss)
            acc_sum += float(acc)
            grad_sum = (
                grads
                if grad_sum is None
                else jax.tree.map(jnp.add, grad_sum, grads)
            )
        avg = jax.tree.map(lambda g: g / K, grad_sum)
        updates, _ = state.tx.update(avg, state.opt_state, state.params)
        ref_params = optax.apply_updates(state.params, updates)

        np.testing.assert_allclose(
            float(m_acc["loss"]), loss_sum / K, rtol=1e-6
        )
        np.testing.assert_allclose(float(m_acc["acc"]), acc_sum / K, rtol=1e-6)
        # scan vs unrolled loop: same math, slightly different XLA
        # fusions -> few-ULP noise
        for a, b in zip(
            jax.tree.leaves(s_acc.params), jax.tree.leaves(ref_params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-6, rtol=0
            )
        for a, b in zip(
            jax.tree.leaves(s_acc.batch_stats), jax.tree.leaves(stats)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=0
            )

    def test_accum_equals_full_batch_when_bn_frozen(self, rng):
        """With frozen BN (fix_bn), no dropout (c1 decoder), and equal
        valid-pixel counts per microbatch, accumulation is mathematically
        identical to one full-batch step."""
        import functools

        from semseg_tpu.parallel.train_step import stack_microbatches

        c = small_cfg()
        c.MODEL.arch_decoder = "c1"
        c.TRAIN.fix_bn = True
        model = ModelBuilder.build_model(c, dtype=jnp.float32)
        variables = init_variables(model, seed=0)
        state = create_train_state(c, model, variables)
        batch = make_batch(rng, n=4)
        batch["seg_label"] = np.abs(batch["seg_label"])  # all pixels valid
        key = jax.random.PRNGKey(4)

        s1, m1 = jax.jit(train_step, donate_argnums=())(state, batch, key)
        s2, m2 = jax.jit(
            functools.partial(train_step, grad_accum=2), donate_argnums=()
        )(state, stack_microbatches(batch, 2), key)
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-5
        )
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=0
            )

    def test_sharded_accum_is_local_and_matches_single_device(self, setup, rng):
        """Under data parallelism the microbatch scan must slice locally:
        the compiled step contains NO all-gather of the image batch (the K
        axis ships replicated, N sharded — batch_sharding), and the
        numerics equal the single-device step."""
        import functools
        import re

        from semseg_tpu.parallel.train_step import stack_microbatches

        c, model, state = setup
        batch = stack_microbatches(make_batch(rng, n=8), 2)
        key = jax.random.PRNGKey(5)
        mesh = make_mesh(4)

        step = jax.jit(
            functools.partial(train_step, grad_accum=2), donate_argnums=()
        )
        sb = shard_batch(mesh, batch, microbatched=True)
        assert sb["img_data"].sharding.spec == jax.sharding.PartitionSpec(
            None, "data"
        )
        hlo = step.lower(
            replicate_state(mesh, state), sb, key
        ).compile().as_text()
        # grads/BN reductions may legitimately gather small per-channel
        # vectors; a batch-sized image/label gather (>=100k elements) is
        # the regression this guards against.
        big = []
        for line in hlo.splitlines():
            m = re.search(r"=\s+\w+\[([\d,]+)\][^=]*all-gather\(", line)
            if m:
                elems = int(np.prod([int(d) for d in m.group(1).split(",")]))
                if elems >= 100_000:
                    big.append(line.strip()[:120])
        assert not big, big[:3]

        s1, m1 = step(state, batch, key)
        s2, m2 = step(replicate_state(mesh, state), sb, key)
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-6
        )
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-3, rtol=0
            )

    @pytest.mark.slow
    def test_accum_on_hybrid_mesh_matches_single_device(self, setup, rng):
        """grad-accum scan x hybrid (data, spatial) mesh: microbatched
        images shard P(None, data, spatial) — halo exchanges inside each
        scan iteration — and must equal the single-device step."""
        import functools

        from jax.sharding import PartitionSpec as P

        from semseg_tpu.parallel import make_mesh_2d
        from semseg_tpu.parallel.train_step import stack_microbatches

        c, model, state = setup
        batch = stack_microbatches(make_batch(rng, n=4), 2)
        key = jax.random.PRNGKey(6)
        mesh = make_mesh_2d(2, 2)

        step = jax.jit(
            functools.partial(train_step, grad_accum=2), donate_argnums=()
        )
        sb = shard_batch(mesh, batch, microbatched=True)
        assert sb["img_data"].sharding.spec == P(None, "data", "spatial")
        assert sb["seg_label"].sharding.spec == P(None, "data", "spatial")

        s1, m1 = step(state, batch, key)
        s2, m2 = step(replicate_state(mesh, state), sb, key)
        # two scanned microbatches of cross-axis reductions: slightly more
        # reduction-order noise than the plain hybrid test, amplified
        # through random-init BN gradients (cf. the uint8-transport test's
        # tolerance note)
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-5
        )
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-3, rtol=0
            )


class TestOptimizerSemantics:
    def test_poly_schedule(self):
        sched = poly_schedule(0.02, 100, 0.9)
        assert float(sched(0)) == pytest.approx(0.02)
        assert float(sched(50)) == pytest.approx(0.02 * 0.5 ** 0.9)
        assert float(sched(100)) == pytest.approx(0.0)

    def test_current_lrs(self):
        c = small_cfg()
        lr_e, lr_d = current_lrs(c, 10)
        assert lr_e == pytest.approx(0.02 * (1 - 10 / 20) ** 0.9)
        assert lr_e == lr_d

    def test_decay_mask_excludes_bn_and_bias(self, setup):
        c, model, state = setup
        mask = decay_mask(state.params)
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        for path, decayed in flat:
            name = path[-1].key
            if name == "kernel":
                assert decayed
            else:
                assert not decayed, path

    def test_matches_torch_sgd_on_toy_problem(self):
        """optax chain(decay, sgd) == torch.optim.SGD(momentum, weight_decay)."""
        import optax

        w0 = np.array([1.5, -2.0, 0.5], np.float32)
        lr, mu, wd = 0.1, 0.9, 1e-2

        wt = torch.tensor(w0, requires_grad=True)
        opt = torch.optim.SGD([wt], lr=lr, momentum=mu, weight_decay=wd)
        for _ in range(5):
            opt.zero_grad()
            loss = (wt ** 2).sum()
            loss.backward()
            opt.step()

        tx = optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(learning_rate=lr, momentum=mu),
        )
        wj = jnp.asarray(w0)
        opt_state = tx.init(wj)
        for _ in range(5):
            grads = jax.grad(lambda w: (w ** 2).sum())(wj)
            updates, opt_state = tx.update(grads, opt_state, wj)
            wj = optax.apply_updates(wj, updates)

        np.testing.assert_allclose(
            np.asarray(wj), wt.detach().numpy(), atol=1e-6
        )


class TestRemat:
    def test_remat_matches_plain(self, rng):
        """TPU.remat=True must not change the forward or the gradients."""
        import jax.numpy as jnp
        from semseg_tpu.models.resnet import resnet18

        enc_a = resnet18(dilate_scale=8)
        enc_b = resnet18(dilate_scale=8, remat=True)
        img = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        va = enc_a.init({"params": jax.random.PRNGKey(0)}, img, train=False)
        fa = enc_a.apply(va, img, train=False)
        fb = enc_b.apply(va, img, train=False)
        for a, b in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

        def loss(vs, enc):
            return sum(jnp.sum(f ** 2) for f in enc.apply(vs, img, train=False))

        ga = jax.grad(lambda v: loss(v, enc_a))(va)
        gb = jax.grad(lambda v: loss(v, enc_b))(va)
        for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.abs(a - b) / (np.abs(a) + np.abs(a).mean() + 1e-6)
            assert rel.max() < 1e-4


class TestDeterminismAndPrecision:
    def test_same_seed_same_losses(self, rng):
        """Two runs from the same seed produce identical loss trajectories."""
        c = small_cfg()
        model = ModelBuilder.build_model(c, dtype=jnp.float32)
        batch = make_batch(rng)

        def run2():
            variables = init_variables(model, seed=7)
            state = create_train_state(c, model, variables)
            step = jax.jit(train_step)
            key = jax.random.PRNGKey(7)
            losses = []
            for _ in range(3):
                state, m = step(state, batch, key)
                losses.append(float(m["loss"]))
            return losses

        np.testing.assert_array_equal(run2(), run2())

    def test_bf16_close_to_f32(self, rng):
        """bfloat16 compute tracks the float32 forward."""
        c = small_cfg()
        m32 = ModelBuilder.build_model(c, dtype=jnp.float32)
        m16 = ModelBuilder.build_model(c, dtype=jnp.bfloat16)
        variables = init_variables(m32, seed=0)
        img = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        s32 = np.asarray(m32.apply(variables, img, seg_size=(64, 64), train=False))
        s16 = np.asarray(m16.apply(variables, img, seg_size=(64, 64), train=False))
        # probabilities: bf16 rounding shifts them slightly
        assert np.abs(s32 - s16).mean() < 2e-3
        agree = (s32.argmax(-1) == s16.argmax(-1)).mean()
        assert agree > 0.95, agree


class TestDevicePrefetch:
    def test_abandonment_releases_worker(self):
        """Closing the prefetch generator mid-stream must stop the worker
        (it otherwise blocks in q.put forever, pinning device batches)."""
        import time

        from semseg_tpu.parallel.mesh import device_prefetch, make_mesh

        pulled = []

        def source():
            for i in range(1000):
                pulled.append(i)
                yield {"x": np.zeros((2, 2), np.float32)}

        mesh = make_mesh(1)
        it = device_prefetch(source(), mesh, depth=2)
        next(it)
        it.close()  # abandon mid-stream
        time.sleep(0.6)  # > the worker's 0.2 s put timeout
        n = len(pulled)
        time.sleep(0.4)
        assert len(pulled) == n, "worker still consuming after close"
        assert n < 1000

    def test_full_stream_delivery(self):
        from semseg_tpu.parallel.mesh import device_prefetch, make_mesh

        mesh = make_mesh(1)
        batches = ({"x": np.full((1,), i, np.float32)} for i in range(7))
        got = [float(b["x"][0]) for b in device_prefetch(batches, mesh)]
        assert got == [float(i) for i in range(7)]


class TestDistributedHelpers:
    def test_single_process_helpers(self):
        from semseg_tpu.parallel.distributed import (
            global_batch_size,
            is_primary,
            local_batch_slice,
            process_seed,
        )

        assert is_primary()
        assert global_batch_size(2) == 2 * jax.device_count()
        s = local_batch_slice(2)
        assert s.start == 0 and s.stop == 2 * jax.local_device_count()
        assert process_seed(304) != process_seed(304, worker=1)


class TestReviewRegressions:
    def test_deepsup_loss_with_train_false(self, setup, rng):
        """Validation loss on a deepsup model (train=False + seg_label):
        the decoder returns ONE logits array there, and the module must
        not mis-unpack it as (logits, deepsup)."""
        c, model, state = setup
        batch = make_batch(rng)
        loss, acc = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, jnp.asarray(batch["img_data"]),
            seg_label=jnp.asarray(batch["seg_label"]), train=False,
        )
        assert np.isfinite(float(loss)) and 0.0 <= float(acc) <= 1.0

    def test_batch_norm_train_rejects_single_element(self):
        """n==1 would put 0/0 NaNs into the running stats (the reference
        asserts size > 1) — we raise at trace time instead."""
        from semseg_tpu.ops.norm import batch_norm_train

        x = jnp.ones((1, 1, 1, 8), jnp.float32)
        one = jnp.ones((8,), jnp.float32)
        zero = jnp.zeros((8,), jnp.float32)
        with pytest.raises(ValueError, match=">1 element"):
            batch_norm_train(x, one, zero, zero, one, jnp.ones(()))

    def test_module_training_forwards_draw_fresh_dropout(self, setup, rng):
        """SegmentationModule training forwards must not reuse one fixed
        dropout mask (the reference draws fresh masks per call)."""
        from semseg_tpu.models.segmentation import SegmentationModule

        c, model, state = setup
        mod = SegmentationModule(model, {"params": state.params, "batch_stats": state.batch_stats})
        batch = make_batch(rng)
        feed = {"img_data": jnp.asarray(batch["img_data"]),
                "seg_label": jnp.asarray(batch["seg_label"])}
        losses = {float(mod(feed)[0]) for _ in range(4)}
        assert len(losses) > 1, "identical dropout mask on every forward"

    def test_module_training_forward_updates_running_stats(self, setup, rng):
        """The wrapper's training forward must fold the mutated batch_stats
        back into its held variables (the reference updates running stats on
        every train forward, mit_semseg/lib/nn/modules/batchnorm.py:49-54) —
        round-2 VERDICT found the wrapper silently discarding them."""
        from semseg_tpu.models.segmentation import SegmentationModule

        c, model, state = setup
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        mod = SegmentationModule(model, variables, seed=0)
        batch = make_batch(rng)
        feed = {"img_data": jnp.asarray(batch["img_data"]),
                "seg_label": jnp.asarray(batch["seg_label"])}
        mod(feed)

        # Oracle: one mutable apply with the identical dropout key the
        # wrapper used for its first forward (fold_in(base, 0)). jitted so
        # the comparison is same-compilation (eager reduction order differs
        # enough to blur near-zero running means).
        key = jax.random.fold_in(jax.random.PRNGKey(0), 0)

        @jax.jit
        def oracle(variables, img, label, key):
            return model.apply(
                variables, img, seg_label=label, train=True,
                mutable=["batch_stats"], rngs={"dropout": key},
            )

        _, mutated = oracle(variables, feed["img_data"], feed["seg_label"], key)
        expect = jax.tree.leaves(mutated["batch_stats"])
        got = jax.tree.leaves(mod.variables["batch_stats"])
        before = jax.tree.leaves(variables["batch_stats"])
        changed = sum(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, got)
        )
        assert changed > 0, "wrapper forward left running stats untouched"
        for e, g in zip(expect, got):
            # jit-vs-eager fusion noise only (measured max ~6e-7 abs).
            np.testing.assert_allclose(
                np.asarray(e), np.asarray(g), rtol=1e-4, atol=1e-5
            )

    def test_upernet_validates_fpn_inplanes(self):
        """fpn_inplanes is a declared contract with the encoder's pyramid;
        a mismatched pyramid must fail loudly, not silently train a
        different FPN than the config says."""
        from semseg_tpu.models import decoders as dec

        up = dec.UPerNet(num_class=4, fc_dim=32, fpn_inplanes=(8, 16, 32))
        pyr = [jnp.zeros((1, 16, 16, 8)), jnp.zeros((1, 8, 8, 99)),
               jnp.zeros((1, 4, 4, 32))]
        with pytest.raises(ValueError, match="fpn_inplanes"):
            up.init(jax.random.PRNGKey(0), pyr)
