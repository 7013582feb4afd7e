"""Multi-scale TTA inference engine with TPU shape bucketing.

The reference eval loop (``/root/reference/eval.py:41-104``) runs one forward
per pyramid scale, upsamples scores to label resolution inside the model, and
averages softmax probabilities over scales. On GPU each image's unique shape
is free; under XLA every distinct shape is a fresh compilation, so a naive
port would compile thousands of programs over the 2,000-image val set.

Design here:

* the **model forward runs on TPU at bucketed shapes**. Primary bucketing is
  BY RESIZE in the data pipeline (``ValDataset(bucket_step=...)``): each
  pyramid level is resized so H/W land directly on the bucket lattice — no
  padded canvas, hence no receptive-field/PPM-pooling pad contamination
  (measured: zero-pad canvases drift interior encoder features up to ~48%
  on small images, while the coarser aspect rounding costs ~1e-4 mIoU at
  deployment scales — see tests/test_eval_oracle.py). Inputs not already on
  the lattice are zero-padded (normalized space — zero = ImageNet mean
  pixel, the value the reference's train-time batch padding injects,
  dataset.py:146-151) and masked, as a fallback;
* the decoder returns **logits at feature resolution** (no in-model resize);
  the valid region is cropped and the final bilinear-resize-to-label-size +
  softmax + scale-averaging runs vectorized on the host (cv2/numpy) — the
  label-size resize would otherwise recompile per image;
* ``exact=True`` bypasses bucketing entirely and reproduces the reference
  computation op-for-op (model resize + softmax on device) — used by the
  parity tests and fine for small image counts.
"""

from __future__ import annotations

import functools
import threading
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp


# The one lattice-rounding rule the dataset↔engine bucket alignment
# depends on (data/transforms.py) — aliased, not re-derived.
from semseg_tpu.data.transforms import round2nearest_multiple as _round_up  # noqa: E402


# Dynamic-valid-size bilinear matrix (shared with the decoders' pad-
# aware pooling); see ops/resize_dynamic.py for the semantics.
from semseg_tpu.ops.resize_dynamic import resize_matrix as _resize_matrix  # noqa: E402


def _host_resize_bilinear(x: np.ndarray, size) -> np.ndarray:
    """Bilinear-resize (H, W, C) to ``size`` = (H', W') on the host.

    cv2.resize INTER_LINEAR (half-pixel centers == align_corners=False), but
    cv2 caps channel count, so wide maps are resized in 4-channel chunks.
    """
    import cv2

    h, w, c = x.shape
    oh, ow = size
    if (h, w) == (oh, ow):
        return x.astype(np.float32, copy=False)
    out = np.empty((oh, ow, c), np.float32)
    for lo in range(0, c, 4):
        hi = min(lo + 4, c)
        chunk = cv2.resize(
            np.ascontiguousarray(x[:, :, lo:hi]),
            (ow, oh),
            interpolation=cv2.INTER_LINEAR,
        )
        out[:, :, lo:hi] = chunk if chunk.ndim == 3 else chunk[:, :, None]
    return out


# Bucket shapes whose compiled forward is known to CRASH a platform's
# runtime (PERF_NOTES "Step-8 lattice worker fault"): the experimental
# axon TPU stack kernel-faults on flagship bf16 batch-4 programs in a
# neighborhood around (304, 400), mapped by subprocess bisection
# (tools/fault_probe.py). Tasks whose lattice bucket lands on a
# denylisted shape are routed to the next non-denylisted lattice point
# instead of compiling the faulty program; the valid-region mask is
# unchanged, so the only numerical effect is a slightly wider zero-pad
# border on those tasks (the same drift mechanism as a coarser bucket
# step, PARITY.md). The family is irregular — (304, 432) and (320, 416)
# probe clean between the faulty points — so beyond this statically-
# probed set, shapes learned at runtime are merged in from the
# persistent fault registry (utils/fault_registry.py).
AXON_FAULT_BUCKETS = frozenset({
    # H=304 row: the faulty band is W in {392, 400, 408, 416};
    # 384/424/432/440/448 probed clean (an early CRASH verdict for
    # (304, 424) was dead-worker pollution — a clean re-probe passed).
    (304, 392), (304, 400), (304, 408), (304, 416),
    (312, 400), (320, 400), (336, 432),
})


def default_bucket_denylist():
    """Known-faulty forward bucket shapes for the current backend:
    the statically-probed set plus this host's learned registry."""
    from semseg_tpu.utils import fault_registry

    try:
        platform = jax.devices()[0].platform
    except Exception:  # backend unreachable — caller will fail later anyway
        return frozenset()
    static = AXON_FAULT_BUCKETS if platform == "axon" else frozenset()
    return static | fault_registry.known_buckets(platform)


class InferenceEngine:
    """Caches jit-compiled forwards per bucket shape."""

    def __init__(
        self,
        model,
        variables,
        *,
        num_class: int = 150,
        output_stride: int = 8,
        bucket_step: int = 64,
        padding_constant: int = 1,
        exact: bool = False,
        spatial_mesh=None,
        fetch_dtype=None,
        bucket_denylist="auto",
        pad_aware_pool: bool = True,
    ):
        from semseg_tpu.data.dataset import _effective_lattice

        self.model = model
        self.variables = variables
        self.num_class = num_class
        self.output_stride = output_stride
        # Keep the architecture's padding_constant alignment INSIDE the
        # engine (the same _effective_lattice rule ValDataset applies), so
        # a constructor passing e.g. bucket_step=48 with a 32-pad UPerNet
        # model cannot produce level shapes the model rejects or that
        # disagree with the dataset's host pyramids.
        self.bucket_step = _effective_lattice(
            max(bucket_step or 0, padding_constant), padding_constant
        )
        self.exact = exact
        # Faulty-shape routing: forward buckets the platform's runtime is
        # known to miscompile ("auto" = the per-backend default above) are
        # bumped to the next lattice point by _bucket_key.
        if isinstance(bucket_denylist, str) and bucket_denylist == "auto":
            bucket_denylist = default_bucket_denylist()
        self.bucket_denylist = frozenset(
            (int(h), int(w)) for (h, w) in (bucket_denylist or ())
        )
        # Pass per-sample valid extents into the model so pooling decoders
        # (PPM/UPerNet) pool the valid region EXACTLY instead of ingesting
        # the bucket's zero padding (ops/resize_dynamic.py); measured at up
        # to 2e-2 pixel-accuracy on small images through the global pool
        # (PARITY.md "pad-bleed"). Off reproduces the padded-pool behavior.
        self.pad_aware_pool = pad_aware_pool
        # Device→host logits dtype: 'bfloat16' halves the D2H transfer (the
        # bottleneck on tunneled/remote device links) at ~1e-3 probability
        # cost; None keeps float32.
        self.fetch_dtype = jnp.dtype(fetch_dtype) if fetch_dtype else jnp.float32
        # Optional multi-chip single-image parallelism: a Mesh whose last
        # axis shards the image height; GSPMD inserts conv halo exchanges.
        self.spatial_mesh = spatial_mesh
        if spatial_mesh is not None:
            from semseg_tpu.parallel.mesh import replicated, spatial_sharding

            self._img_sharding = spatial_sharding(spatial_mesh)
            self.variables = jax.device_put(
                self.variables, replicated(spatial_mesh)
            )
        # Device affinity: eager allocations (uploads, score canvases) must
        # land on the SAME device as the committed variables — bare
        # jnp.asarray/zeros go to the global default, so multi-device eval
        # would stage every canvas and input through device 0 (HBM
        # pressure there + an extra copy hop per upload).
        # Crash-attribution state (see _note_dispatch below).
        self._pending_buckets: list = []
        self._verified_buckets: set = set()
        self.device = None
        if spatial_mesh is None:
            leaves = jax.tree.leaves(self.variables)
            if leaves and hasattr(leaves[0], "devices"):
                devs = leaves[0].devices()
                if len(devs) == 1:
                    (self.device,) = devs

    # -- crash attribution ---------------------------------------------------
    # Deterministic faults mean: any bucket that ever completed a verified
    # fetch is clean for this (model, dtype, batch); after a worker crash
    # the suspects are exactly the buckets dispatched since the last
    # verified fetch minus the known-clean set. cli/eval.py's self-healing
    # probes those suspects (semseg_tpu.probing) and records confirmed
    # faults in the persistent registry.
    def _note_dispatch(self, key):
        # Known limitation: only FORWARD bucket shapes are attributed.
        # The epilogue programs (accumulate/argmax/metrics at canvas
        # shapes) are not tracked here, so a runtime fault in a fresh
        # canvas-shape epilogue program would surface with forward-only
        # suspects (probing.py stage='epilogue' exists for manual
        # bisection of that class; no such fault has been observed).
        if key not in self._pending_buckets:
            self._pending_buckets.append(key)

    def _mark_verified(self):
        self._verified_buckets.update(self._pending_buckets)
        self._pending_buckets.clear()

    def suspect_buckets(self):
        """Buckets dispatched since the last verified fetch, excluding
        ones that ever completed successfully (ordered by dispatch)."""
        return [
            k for k in self._pending_buckets
            if k not in self._verified_buckets
        ]

    def _bucket_key(self, h: int, w: int):
        """Lattice bucket for an (h, w) task, routed around denylisted
        forward shapes. The bump direction minimizes the added padded area
        (growing H by one step adds step*W pixels and vice versa)."""
        ph = _round_up(h, self.bucket_step)
        pw = _round_up(w, self.bucket_step)
        while (ph, pw) in self.bucket_denylist:
            if pw <= ph:
                ph += self.bucket_step
            else:
                pw += self.bucket_step
        return ph, pw

    def _on_device(self):
        import contextlib

        return (
            jax.default_device(self.device)
            if self.device is not None
            else contextlib.nullcontext()
        )

    def _put(self, x, dtype=None):
        """jnp.asarray onto this engine's device."""
        with self._on_device():
            return jnp.asarray(x) if dtype is None else jnp.asarray(x, dtype)

    def _put_tree(self, tree):
        """ONE batched device_put over a whole pytree of host arrays.

        On tunneled/high-latency transports each separate put is a link
        round-trip; batching a window's uploads into a single transfer is
        the same lever parallel/mesh.py:80-93 measured for train batches.
        Leaves must already carry their final dtypes (no implicit casts).
        """
        if self.device is not None:
            return jax.device_put(tree, self.device)
        return jax.device_put(tree)

    def _zeros(self, shape, dtype):
        with self._on_device():
            return jnp.zeros(shape, dtype)

    # -- jitted kernels ----------------------------------------------------
    @functools.cached_property
    def _logits_fn(self):
        @jax.jit
        def run(variables, img, h, w):
            valid_hw = (
                jnp.stack([jnp.asarray(h), jnp.asarray(w)])[None, :]
                if self.pad_aware_pool else None
            )
            out = self.model.apply(
                variables, img, seg_size=None, train=False, valid_hw=valid_hw
            )
            return out.astype(self.fetch_dtype)

        return run

    @functools.cached_property
    def _logits_raw_fn(self):
        """uint8 path: on-device normalize + valid-region mask, fused by XLA
        into the first conv. The image arrives padded as uint8 (4x smaller
        host→device transfer); (h, w) are dynamic scalars, so one compile
        serves every image in the same bucket."""
        from semseg_tpu.ops.preproc import normalize_u8_masked

        @jax.jit
        def run(variables, img_u8, h, w):
            x = normalize_u8_masked(img_u8, h, w)
            valid_hw = (
                jnp.stack([jnp.asarray(h), jnp.asarray(w)])[None, :]
                if self.pad_aware_pool else None
            )
            out = self.model.apply(
                variables, x, seg_size=None, train=False, valid_hw=valid_hw
            )
            return out.astype(self.fetch_dtype)

        return run

    @functools.cached_property
    def _exact_fn(self):
        @functools.partial(jax.jit, static_argnums=(2,))
        def run(variables, img, seg_size):
            return self.model.apply(variables, img, seg_size=seg_size, train=False)

        return run

    # -- public API --------------------------------------------------------
    def scores_for_pyramid(
        self, pyramid: Sequence[np.ndarray], seg_size
    ) -> np.ndarray:
        """Average softmax scores over a multi-scale pyramid.

        ``pyramid``: list of (1, H_s, W_s, 3) normalized images.
        Returns (H, W, num_class) float32 scores (mean over scales), matching
        eval.py:60-72.
        """
        acc = np.zeros((*seg_size, self.num_class), np.float32)
        if self.exact:
            from semseg_tpu.data.transforms import MEAN, STD

            for img in pyramid:
                if img.dtype == np.uint8:
                    img = ((img.astype(np.float32) / 255.0) - MEAN) / STD
                probs = self._exact_fn(
                    self.variables, self._put(img), tuple(seg_size)
                )
                acc += np.asarray(probs[0])
            acc /= len(pyramid)
            return acc

        # Phase 0: pad every scale on host, ship the whole pyramid in ONE
        # batched device_put (a per-scale put is a link round-trip each).
        padded, hws = [], []
        for img in pyramid:
            h, w = img.shape[1], img.shape[2]
            ph, pw = self._bucket_key(h, w)
            if (ph, pw) != (h, w):
                img = np.pad(img, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
            padded.append(img)
            hws.append((h, w))
        dev_imgs = self._put_tree(padded)

        # Phase 1: dispatch every scale's forward (async) so device work for
        # scale k overlaps the fetch/post-processing of scale k-1.
        pending = []
        for dev_img, (h, w) in zip(dev_imgs, hws):
            self._note_dispatch(tuple(dev_img.shape[1:3]))
            if self.spatial_mesh is not None:
                dev_img = jax.device_put(dev_img, self._img_sharding)
            if dev_img.dtype == jnp.uint8:
                logits = self._logits_raw_fn(self.variables, dev_img, h, w)
            else:
                logits = self._logits_fn(self.variables, dev_img, h, w)
            pending.append((logits, h, w))

        # Phase 2: fetch + host resize/softmax per scale.
        for logits, h, w in pending:
            acc += self._postprocess(np.asarray(logits[0]), h, w, seg_size)
        acc /= len(pyramid)
        self._mark_verified()
        return acc

    def _postprocess(self, logits, h, w, seg_size):
        """Crop valid region, bilinear-resize to label size (cv2 INTER_LINEAR
        is half-pixel-center, same as align_corners=False), softmax."""
        os_ = self.output_stride
        logits = logits[: -(-h // os_), : -(-w // os_)].astype(np.float32)
        resized = _host_resize_bilinear(logits, (seg_size[0], seg_size[1]))
        resized -= resized.max(axis=-1, keepdims=True)
        np.exp(resized, out=resized)
        resized /= resized.sum(axis=-1, keepdims=True)
        return resized

    def predict(self, pyramid, seg_size) -> np.ndarray:
        """Argmax class map at ``seg_size`` (reference eval.py:74-75)."""
        return self.scores_for_pyramid(pyramid, seg_size).argmax(-1)


def output_stride_for(cfg) -> int:
    """The decoder's training-mode output stride (= label downsample rate)."""
    return cfg.DATASET.segm_downsampling_rate


class BatchedInferenceEngine(InferenceEngine):
    """Throughput-mode engine: batches same-bucket pyramid levels ACROSS
    images before the device forward.

    Batch-1 conv inference on TPU leaves the MXU badly underfed (measured
    ~12 TFLOP/s at batch 1 vs ~51 at batch 4 for the dilated-ResNet50 core
    convs on v5e); grouping levels that land in the same bucket recovers
    that utilization. Numerically identical to the batch-1 engine: BN runs
    on running statistics and every image keeps its own valid-region mask.
    """

    def __init__(self, *args, batch_size: int = 4, postproc_workers: int = 8,
                 canvas_budget_mb: int = 4096, pack_buckets: bool = False,
                 pack_max_area_ratio: float = 1.3,
                 pack_max_pad_px: int = 32,
                 upload_pipeline: bool = True, **kw):
        super().__init__(*args, **kw)
        self.batch_size = batch_size
        self.postproc_workers = postproc_workers
        # Stage chunk k+1's host batch assembly + H2D upload on a worker
        # thread while chunk k's forward dispatches (numerically inert —
        # same tensors, different overlap). The same design the
        # device-pyramid engine ships: ONE coalesced device_put per chunk
        # from the uploader, so it does not contend with the dispatch
        # stream the way per-leaf puts measured (PERF_NOTES round-4
        # pipelining table).
        self.upload_pipeline = upload_pipeline
        # Throughput knob: fold under-filled bucket groups into larger
        # buckets when the cost model (padded-batch area) says the fill
        # gain beats the extra padding. Off by default — the wider pad
        # border adds conv-bleed drift beyond the bucket lattice's own,
        # so parity runs keep exact lattice grouping.
        self.pack_buckets = pack_buckets
        # Accuracy guards: never fold into a bucket more than
        # ``pack_max_area_ratio`` larger, NOR one adding more than
        # ``pack_max_pad_px`` zero-pad per dimension. Uncapped folds
        # measured catastrophic (0.4 per-class IoU swings) even though
        # the FLOP model approved them — pad cost is invisible to it.
        # pad_aware_pool removes the global-pool term, but conv-border
        # bleed scales with ABSOLUTE pad width (the encoder's receptive
        # field is fixed in pixels), hence the per-dimension cap: an
        # area-only cap still allowed ~96 px folds at coarse lattices
        # and measured 2.6e-2 accuracy drift (PARITY.md packed rows).
        self.pack_max_area_ratio = pack_max_area_ratio
        self.pack_max_pad_px = pack_max_pad_px
        # Upper bound on simultaneously-live per-image f32 score canvases.
        # Without it, a caller chunk of 32 canvas-limit images would pin
        # 32 x ~1 GB on a 16 GB chip (each image's levels are spread across
        # the shared bucket groups, so canvases stay live until the last
        # group runs). Windows always hold >= 1 image, so the single-image
        # maximum (ori_canvas at 150 classes, ~1 GB) still fits.
        self.canvas_budget_bytes = canvas_budget_mb * (1 << 20)

    @functools.cached_property
    def _batched_raw_fn(self):
        from semseg_tpu.ops.preproc import normalize_u8_masked

        @functools.partial(jax.jit, static_argnums=(4,))
        def run(variables, img_u8, hs, ws, to_fetch=False):
            x = normalize_u8_masked(img_u8, hs, ws)
            valid_hw = (
                jnp.stack([hs, ws], axis=-1) if self.pad_aware_pool else None
            )
            out = self.model.apply(
                variables, x, seg_size=None, train=False, valid_hw=valid_hw
            )
            # fetch_dtype narrows the device→host transfer; the on-device
            # metric paths (to_fetch=False) never transfer logits, so they
            # keep full precision instead of paying a pointless bf16 trip.
            return out.astype(self.fetch_dtype) if to_fetch else out

        return run

    # -- fully on-device post-processing ------------------------------------
    @functools.cached_property
    def _accum_fn(self):
        """acc += softmax(bilinear_resize(logits → label canvas)).

        Runs the reference's per-scale epilogue (resize logits to label size,
        softmax, accumulate — eval.py:63-72 + models.py:480-483) entirely on
        the MXU via dynamic-size dense resize matrices; only the final argmax
        map ever crosses the (slow) device→host link.
        """

        def run(acc, logits, hv, wv, H, W):
            hp, wp, c = logits.shape
            Hp, Wp = acc.shape[0], acc.shape[1]
            m_h = _resize_matrix(Hp, hp, H, hv)
            m_w = _resize_matrix(Wp, wp, W, wv)
            r = jnp.einsum(
                "ik,kwc->iwc", m_h, logits.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            r = jnp.einsum(
                "jw,iwc->ijc", m_w, r, preferred_element_type=jnp.float32
            )
            p = jax.nn.softmax(r, axis=-1)
            ii = jnp.arange(Hp)[:, None, None]
            jj = jnp.arange(Wp)[None, :, None]
            p = jnp.where((ii < H) & (jj < W), p, 0.0)
            return acc + p

        # Donate the accumulator: callers overwrite their only reference
        # (accs[i] = _accum_fn(accs[i], ...)), and without donation XLA
        # holds input AND output canvases live per call — a transient
        # extra canvas (up to ~1 GB at large label sizes) that the
        # canvas-window budget does not account for.
        return jax.jit(run, donate_argnums=(0,))

    @functools.cached_property
    def _argmax_fn(self):
        @jax.jit
        def run(acc):
            return jnp.argmax(acc, axis=-1).astype(jnp.uint8)

        return run

    @functools.cached_property
    def _metrics_fn(self):
        """On-device pixel-accuracy + per-class intersection/union.

        Exact ``utils.accuracy`` / ``intersectionAndUnion`` semantics
        (reference utils.py:128-156): unlabeled pixels (-1; includes canvas
        padding) are excluded, and predictions on unlabeled pixels count
        toward neither histogram. Returns ONE packed f32 vector
        ``[acc_sum, pix_sum, inter(C), union(C)]`` so a whole chunk's
        metrics cross the (high-latency) device→host link as a single
        fetch instead of 4 RPCs per image. f32 counts are exact below
        2^24 pixels — far above any ADE image.
        """

        @jax.jit
        def run(acc, label_u8):
            # labels travel as uint8 (255 = void) — 4x less H2D than int32.
            label = jnp.where(label_u8 == 255, -1, label_u8.astype(jnp.int32))
            pred = jnp.argmax(acc, axis=-1)
            valid = label >= 0
            acc_sum = jnp.sum(valid & (pred == label))
            pix_sum = jnp.sum(valid)
            p1 = jax.nn.one_hot(
                jnp.where(valid, pred, -1), self.num_class, dtype=jnp.float32
            )
            l1 = jax.nn.one_hot(label, self.num_class, dtype=jnp.float32)
            inter = jnp.sum(p1 * l1, axis=(0, 1))
            area_pred = jnp.sum(p1, axis=(0, 1))
            area_lab = jnp.sum(l1, axis=(0, 1))
            union = area_pred + area_lab - inter
            return jnp.concatenate(
                [
                    jnp.stack([acc_sum, pix_sum]).astype(jnp.float32),
                    inter,
                    union,
                ]
            )

        return run

    def _group_by_bucket(self, items):
        """Group (item, level) tasks by padded bucket shape (fault-routed)."""
        groups: dict = {}
        for i, pyramid in enumerate(items):
            for arr in pyramid:
                assert arr.dtype == np.uint8, "batched engine needs raw uint8"
                h, w = arr.shape[1], arr.shape[2]
                groups.setdefault(self._bucket_key(h, w), []).append(
                    (i, arr, h, w)
                )
        return self._pack_groups(groups)

    def _pack_groups(self, groups):
        """Fold under-filled bucket groups into LARGER buckets when the
        batch-fill gain beats the extra padded area.

        A padded chunk always computes ``batch_size`` images worth of the
        bucket's area, so a group of n tasks at bucket (h, w) costs
        ``ceil(n/B) * h * w`` area-batches. Greedy smallest-area-first:
        fold a group into whichever covering bucket (both dims >=) lowers
        total cost the most. Real-val-distribution motivation: at bucket
        step 32 the 5-scale protocol leaves ~3.3 of 4 slots filled
        (PERF_NOTES "distribution-honesty update"), so sibling buckets
        with spare slots are common. Tasks keep their own valid (h, w)
        masks, so folding only widens the zero-pad border (the coarser-
        lattice drift mechanism, PARITY.md), and also shrinks the
        compiled-program inventory.
        """
        if not self.pack_buckets or len(groups) <= 1:
            return groups
        B = self.batch_size

        def cost(key, n):
            return -(-n // B) * key[0] * key[1]

        max_ratio = self.pack_max_area_ratio
        max_pad = self.pack_max_pad_px
        for k in sorted(groups, key=lambda k: k[0] * k[1]):
            if k not in groups:
                continue
            n_k = len(groups[k])
            best, best_delta = None, 0
            for k2 in groups:
                if k2 == k or k2[0] < k[0] or k2[1] < k[1]:
                    continue
                if k2[0] * k2[1] > max_ratio * k[0] * k[1]:
                    continue
                if k2[0] - k[0] > max_pad or k2[1] - k[1] > max_pad:
                    continue
                n2 = len(groups[k2])
                delta = cost(k2, n2 + n_k) - cost(k2, n2) - cost(k, n_k)
                if delta < best_delta:
                    best, best_delta = k2, delta
            if best is not None:
                groups[best].extend(groups.pop(k))
        return groups

    def _stage_host_chunk(self, key, padded_chunk):
        """Assemble + upload one padded host-pyramid chunk (no dispatch).

        Runs on the pipeline's uploader thread: ONE coalesced device_put
        for (batch, hs, ws), so it never floods the link with per-leaf
        RPCs while the main thread dispatches forwards.
        """
        ph, pw = key
        batch = np.zeros((self.batch_size, ph, pw, 3), np.uint8)
        hs = np.zeros(self.batch_size, np.int32)
        ws = np.zeros(self.batch_size, np.int32)
        for j, (_, arr, h, w) in enumerate(padded_chunk):
            batch[j, :h, :w] = arr[0]
            hs[j], ws[j] = h, w
        return self._put_tree((batch, hs, ws))

    def _forward_host_chunk(self, key, padded_chunk, staged=None, *,
                            to_fetch=False):
        """Forward one padded host-pyramid chunk; returns (logits, hw_list).

        ``staged``: pre-uploaded device inputs from ``_stage_host_chunk``
        (upload pipelining); None = stage inline.
        ``to_fetch``: the logits will cross the device→host link (host
        post-processing) — narrow them to ``fetch_dtype`` on device.
        """
        self._note_dispatch(key)
        if staged is None:
            staged = self._stage_host_chunk(key, padded_chunk)
        dev_logits = self._batched_raw_fn(self.variables, *staged, to_fetch)
        return dev_logits, [(h, w) for (_, _, h, w) in padded_chunk]

    def _accumulate_on_device(self, seg_sizes, groups, n_levels,
                              forward_chunk, finalize, stage_chunk=None):
        """Shared driver: batched forwards + per-image on-device score
        canvases.

        ``groups``: {shape_key: [task, ...]} where ``task[0]`` is the item
        index; ``n_levels``: {item_idx: level count};
        ``forward_chunk(shape_key, padded_chunk)`` runs one device batch and
        returns (logits, per-entry valid (h, w) at input resolution);
        ``finalize(item_idx, acc_canvas)`` is called once each image's last
        level has been accumulated (its canvas is then freed);
        ``stage_chunk(shape_key, padded_chunk)``: optional upload stager —
        when given, a worker thread stages chunk k+1's device inputs while
        chunk k forwards, and ``forward_chunk`` receives the staged inputs
        as a third argument. Returns {item_idx: finalize result}.
        """
        os_ = self.output_stride
        accs: dict = {}
        remaining = dict(n_levels)
        out: dict = {}

        # Flatten the chunk schedule up front so the uploader thread and
        # the dispatch loop walk the identical order.
        schedule = []
        for key, tasks in groups.items():
            for lo in range(0, len(tasks), self.batch_size):
                chunk = tasks[lo : lo + self.batch_size]
                # Pad the final chunk to the full batch so each bucket
                # compiles exactly once; surplus outputs are dropped.
                padded = chunk + [chunk[-1]] * (self.batch_size - len(chunk))
                schedule.append((key, chunk, padded))

        stop_uploader = None
        if stage_chunk is not None and len(schedule) > 1:
            import queue as _queue

            # Bounded depth: at most 2 staged chunk uploads in flight
            # (~MBs of uint8) — enough to hide the upload, never enough
            # to pile HBM.
            staged_q: _queue.Queue = _queue.Queue(maxsize=2)
            # If the CONSUMER loop dies (e.g. a device-worker crash in
            # forward_chunk), the uploader must not stay blocked in put()
            # forever holding staged device buffers — the stop event plus
            # a drain on exit guarantees the thread unblocks and exits.
            stop = threading.Event()

            def _bounded_put(item):
                while not stop.is_set():
                    try:
                        staged_q.put(item, timeout=0.1)
                        return
                    except _queue.Full:
                        continue

            def _uploader():
                try:
                    for key, _, padded in schedule:
                        if stop.is_set():
                            return
                        _bounded_put(stage_chunk(key, padded))
                except BaseException as e:  # propagate to the consumer
                    _bounded_put(e)

            uploader = threading.Thread(
                target=_uploader, name="chunk-uploader", daemon=True
            )
            uploader.start()

            def stop_uploader():
                stop.set()
                while True:  # free staged device buffers
                    try:
                        staged_q.get_nowait()
                    except _queue.Empty:
                        break
                uploader.join(timeout=5.0)

            def _staged_iter():
                for key, chunk, padded in schedule:
                    staged = staged_q.get()
                    if isinstance(staged, BaseException):
                        raise staged
                    yield key, chunk, padded, staged
        else:
            def _staged_iter():
                for key, chunk, padded in schedule:
                    yield key, chunk, padded, None

        try:
            for key, chunk, padded_chunk, staged in _staged_iter():
                dev_logits, hws = (
                    forward_chunk(key, padded_chunk)
                    if staged is None
                    else forward_chunk(key, padded_chunk, staged)
                )
                for j, task in enumerate(chunk):
                    item_idx = task[0]
                    h, w = hws[j]
                    H, W = seg_sizes[item_idx]
                    if item_idx not in accs:
                        # _bucket_key (not bare rounding): the canvas shape
                        # also selects the accum/argmax/metrics programs, so
                        # it must dodge denylisted shapes too. Exact: canvas
                        # padding is masked out of the accumulate and void
                        # (255) in the label, so a larger canvas counts
                        # nothing extra.
                        accs[item_idx] = self._zeros(
                            (*self._bucket_key(H, W), self.num_class),
                            jnp.float32,
                        )
                    accs[item_idx] = self._accum_fn(
                        accs[item_idx], dev_logits[j],
                        -(-h // os_), -(-w // os_), H, W,
                    )
                    remaining[item_idx] -= 1
                    if remaining[item_idx] == 0:
                        out[item_idx] = finalize(item_idx, accs.pop(item_idx))
        finally:
            if stop_uploader is not None:
                stop_uploader()
        return out

    def _canvas_windows(self, seg_sizes, item_indices):
        """Partition items into windows whose summed f32 canvas bytes stay
        under ``canvas_budget_bytes`` (every window holds >= 1 item)."""
        windows, cur, cur_bytes = [], [], 0
        for i in item_indices:
            ch, cw = self._bucket_key(*seg_sizes[i])
            b = ch * cw * self.num_class * 4
            if cur and cur_bytes + b > self.canvas_budget_bytes:
                windows.append(cur)
                cur, cur_bytes = [], 0
            cur.append(i)
            cur_bytes += b
        if cur:
            windows.append(cur)
        return windows

    def batched_metrics(self, items, labels):
        """Multi-scale predict + metrics fully on device.

        ``labels``: per-item (H, W) int arrays (-1 = void). Returns a list of
        (acc_sum, pix_sum, intersection, union) numpy tuples.

        All per-item metric vectors stay on device until the end, then come
        back in ONE stacked fetch — on a high-latency link, per-item fetches
        (4 RPCs/image) would otherwise dominate the whole protocol.
        """
        assert self.num_class < 255  # uint8 label transport, 255 = void
        if not items:
            return []
        assert all(len(p) for p in items), "every item needs >= 1 level"
        seg_sizes = [lab.shape for lab in labels]

        finalize, prepare_window = self._metrics_finalizer(seg_sizes, labels)
        out = self._windowed_accumulate(
            items, seg_sizes, finalize, prepare_window=prepare_window
        )
        res = self._fetch_packed_metrics(out, len(items))
        self._mark_verified()
        return res

    def _windowed_accumulate(self, items, seg_sizes, finalize,
                             prepare_window=None):
        """Canvas-budget-windowed driver over host pyramids: group each
        window's levels by bucket, forward + accumulate, finalize per item.
        Windows bound live HBM because the device executes its stream in
        order — window k+1's canvas allocations run after window k's
        finalizers, whose canvases are freed on their last consumer.
        ``prepare_window(window)``: optional per-window hook (batched label
        uploads) run before the window's forwards."""
        out: dict = {}
        for window in self._canvas_windows(seg_sizes, range(len(items))):
            if prepare_window is not None:
                prepare_window(window)
            in_window = set(window)
            groups = self._group_by_bucket(
                [
                    items[i] if i in in_window else []
                    for i in range(len(items))
                ]
            )
            out.update(
                self._accumulate_on_device(
                    seg_sizes, groups, {i: len(items[i]) for i in window},
                    self._forward_host_chunk,
                    finalize,
                    stage_chunk=(
                        self._stage_host_chunk if self.upload_pipeline
                        else None
                    ),
                )
            )
        return out

    def _void_label_canvas(self, label, H, W):
        """uint8 label canvas at the accumulate-canvas shape: 255 = void
        (the reference's -1), padding beyond (H, W) stays void so it
        counts nothing in the on-device metrics."""
        lab = np.full(self._bucket_key(H, W), 255, np.uint8)
        lab[:H, :W] = np.where(label < 0, 255, label).astype(np.uint8)
        return lab

    def _metrics_finalizer(self, seg_sizes, labels):
        """Returns (finalize, prepare_window): each window's uint8 label
        canvases go up in ONE batched device_put instead of one transfer
        per image scattered through the run (a per-image round-trip on the
        tunneled link was a measurable slice of the MS protocol)."""
        dev_labels: dict = {}

        def prepare_window(window):
            host = []
            for i in window:
                H, W = seg_sizes[i]
                host.append(self._void_label_canvas(labels[i], H, W))
            for i, d in zip(window, self._put_tree(host)):
                dev_labels[i] = d

        def finalize(item_idx, acc):
            return self._metrics_fn(acc, dev_labels.pop(item_idx))

        return finalize, prepare_window

    def _fetch_packed_metrics(self, out, n_items):
        """Stack every per-image metric vector and fetch in ONE transfer."""
        packed = np.asarray(jnp.stack([out[i] for i in range(n_items)]))
        C = self.num_class
        return [
            (row[0], row[1], row[2 : 2 + C], row[2 + C : 2 + 2 * C])
            for row in packed
        ]

    def _device_postproc_predict(self, items, seg_sizes):
        """On-device resize/softmax/accumulate/argmax; fetch only uint8 maps."""
        # Same uint8-transport bound the metrics paths assert: class ids
        # >= 255 would silently wrap in the fetched prediction maps.
        assert self.num_class < 255, self.num_class
        preds = self._windowed_accumulate(
            items, seg_sizes, lambda _i, acc: self._argmax_fn(acc)
        )
        res = [
            np.asarray(preds[i])[: seg_sizes[i][0], : seg_sizes[i][1]].astype(
                np.int64
            )
            for i in range(len(items))
        ]
        self._mark_verified()
        return res

    def batched_predict(self, items, seg_sizes, *, device_postproc=True):
        """Predict class maps for a list of multi-scale pyramids.

        ``items``: list of pyramids (each a list of (1, H_s, W_s, 3) uint8
        arrays); ``seg_sizes``: per-item (H, W) output size. Returns a list
        of (H, W) int argmax maps in item order.
        """
        from concurrent.futures import ThreadPoolExecutor

        n_items = len(items)
        if not n_items:
            return []
        assert all(len(p) for p in items), "every item needs >= 1 level"

        if device_postproc:
            return self._device_postproc_predict(items, seg_sizes)

        groups = self._group_by_bucket(items)
        counts = [len(p) for p in items]

        def fetch_and_postprocess(item_idx, dev_logits_row, h, w, seg_size):
            # np.asarray here (in the pool) overlaps D2H transfers with the
            # main thread's dispatches and with other fetches.
            logits = np.asarray(dev_logits_row)
            return item_idx, self._postprocess(logits, h, w, seg_size)

        # Host-postproc path: per-image float32 score canvases on the HOST.
        # Items are processed in canvas-budget windows (same budget as the
        # device path) — allocating every canvas up front and dispatching
        # every chunk before draining any fetch peaked at
        # sum-over-items(H*W*150*4) host bytes plus all in-flight device
        # logits (tens of GB on large-image lists).
        res = [None] * n_items
        for window in self._canvas_windows(seg_sizes, list(range(n_items))):
            win_set = set(window)
            accs = {
                i: np.zeros((*seg_sizes[i], self.num_class), np.float32)
                for i in window
            }
            with ThreadPoolExecutor(self.postproc_workers) as pool:
                futures = []
                # Dispatch this window's batches (async), then collect.
                for (ph, pw), tasks in groups.items():
                    wtasks = [t for t in tasks if t[0] in win_set]
                    for lo in range(0, len(wtasks), self.batch_size):
                        chunk = wtasks[lo : lo + self.batch_size]
                        bsz = len(chunk)
                        # Pad the final chunk to the full batch so each
                        # bucket compiles exactly once; surplus outputs
                        # are dropped.
                        padded_chunk = (
                            chunk + [chunk[-1]] * (self.batch_size - bsz)
                        )
                        dev_logits, _ = self._forward_host_chunk(
                            (ph, pw), padded_chunk, to_fetch=True
                        )
                        for j in range(bsz):
                            item_idx, _, h, w = chunk[j]
                            futures.append(
                                pool.submit(
                                    fetch_and_postprocess, item_idx,
                                    dev_logits[j], h, w,
                                    seg_sizes[item_idx],
                                )
                            )

                for fut in futures:
                    item_idx, scores = fut.result()
                    accs[item_idx] += scores
            for i in window:
                res[i] = (accs[i] / counts[i]).argmax(-1)

        self._mark_verified()
        return res


def _pil_resize_matrix(out_pad: int, in_pad: int, out_valid, in_valid):
    """Dense ANTIALIASED bilinear (triangle-filter) matrix, dynamic sizes.

    Reproduces Pillow's BILINEAR resampling (the reference's ``imresize``,
    dataset.py:9-19): filter support scales with the downsampling ratio and
    clipped windows renormalize at the borders. For upscaling it reduces to
    half-pixel-center bilinear. ``out_valid``/``in_valid`` are runtime
    scalars, so one compiled program serves every (source, target) size pair
    inside a (out_pad, in_pad) canvas pair.
    """
    i = jax.lax.broadcasted_iota(jnp.float32, (out_pad, in_pad), 0)
    k = jax.lax.broadcasted_iota(jnp.float32, (out_pad, in_pad), 1)
    out_valid = jnp.asarray(out_valid, jnp.float32)
    in_valid = jnp.asarray(in_valid, jnp.float32)
    scale = in_valid / out_valid
    support = jnp.maximum(scale, 1.0)
    center = (i + 0.5) * scale
    w = jnp.maximum(0.0, 1.0 - jnp.abs(k + 0.5 - center) / support)
    w = jnp.where(k < in_valid, w, 0.0)
    denom = jnp.sum(w, axis=1, keepdims=True)
    return w / jnp.maximum(denom, 1e-12)


class DevicePyramidEngine(BatchedInferenceEngine):
    """Builds the multi-scale pyramid ON DEVICE from the original image.

    The host uploads each original ONCE (uint8, padded to a coarse
    ``ori_step`` lattice — ~5.7x less H2D than the 5-level pyramid on the
    real val distribution, and ~3x less host CPU since PIL resizes per
    scale disappear). Each pyramid level is derived with the dynamic
    antialiased resize above — a single resample from the original, same
    triangle filter as Pillow, so the only divergence from the reference
    protocol is Pillow's 8-bit fixed-point coefficient rounding (measured
    pixel drift <= 1/255).

    Program inventory: one tiny embed program per original bucket (~24-60
    over the real val set) + the same per-level-bucket forward count as the
    host-pyramid engine (the resize matmuls add ~1.5% FLOPs and fuse into
    the forward program).
    """

    def __init__(self, *args, img_sizes, img_max_size, ori_step: int = 64,
                 ori_canvas=(1088, 1600), upload_pipeline: bool = True, **kw):
        super().__init__(*args, **kw)
        # Scalar imgSizes (single-scale configs) are valid everywhere else
        # in the pipeline (dataset.py handles both forms).
        self.img_sizes = (
            tuple(img_sizes)
            if isinstance(img_sizes, (list, tuple))
            else (img_sizes,)
        )
        self.img_max_size = img_max_size
        self.ori_step = ori_step
        # Originals are padded UP to the ori_step lattice before the
        # dynamic_update_slice into the canvas, so the canvas itself must
        # sit on the lattice — otherwise an image that passes fits() by raw
        # size could overflow after padding (e.g. 990 -> 1024 > 1000).
        self.ori_canvas = (
            _round_up(int(ori_canvas[0]), ori_step),
            _round_up(int(ori_canvas[1]), ori_step),
        )
        # Overlap window k+1's original/label uploads (worker thread) with
        # window k's forwards. Default ON since the batched-pytree upload
        # coalescing landed: with ONE device_put per window the uploader
        # thread no longer floods the link/GIL with per-image RPCs, and the
        # round-4 interleaved A/B on the tunneled 1-core host (the WORST
        # case for a second dispatch thread) measured 21.1 vs 19.9 img/s
        # at batch 4 (22.3 vs 22.1 at batch 8) in pipelined mode — the
        # pre-coalescing measurement (11.7 vs 14.9, per-image puts) is
        # obsolete.
        self.upload_pipeline = upload_pipeline

    # -- device programs -----------------------------------------------------
    @functools.cached_property
    def _embed_fn(self):
        """uint8 (obh, obw, 3) -> fixed ori canvas; jit caches per bucket."""
        ch, cw = self.ori_canvas

        @jax.jit
        def run(ori_u8):
            canvas = jnp.zeros((ch, cw, 3), jnp.uint8)
            return jax.lax.dynamic_update_slice(canvas, ori_u8, (0, 0, 0))

        return run

    @functools.cached_property
    def _pyramid_level_fn(self):
        """(B ori canvases, oh, ow, th, tw) -> logits at a level bucket.

        Per-image dynamic resize matrices (vmapped), then the standard
        normalize + valid-mask + forward. Compiled once per level-bucket
        shape, exactly like the host-pyramid batched path.
        """
        from semseg_tpu.ops.preproc import normalize_255, valid_mask

        @functools.partial(jax.jit, static_argnums=(5, 6))
        def run(variables, canvases, ohs, ows, ths_tws, lh, lw):
            ths, tws = ths_tws[:, 0], ths_tws[:, 1]

            def one(canvas, oh, ow, th, tw):
                m_h = _pil_resize_matrix(lh, canvas.shape[0], th, oh)
                m_w = _pil_resize_matrix(lw, canvas.shape[1], tw, ow)
                x = canvas.astype(jnp.float32)
                x = jnp.einsum("oh,hwc->owc", m_h, x,
                               preferred_element_type=jnp.float32)
                x = jnp.einsum("pw,owc->opc", m_w, x,
                               preferred_element_type=jnp.float32)
                x = normalize_255(x)
                mask = valid_mask((lh, lw), th, tw)
                return jnp.where(mask[..., None], x, 0.0)

            x = jax.vmap(one)(canvases, ohs, ows, ths, tws)
            # Consumed only by the on-device accumulator — keep full
            # precision (fetch_dtype is for logits that cross the link).
            return self.model.apply(
                variables, x, seg_size=None, train=False,
                valid_hw=ths_tws if self.pad_aware_pool else None,
            )

        return run

    # -- pipeline --------------------------------------------------------------
    def level_plan(self, ori_h: int, ori_w: int):
        """Per-scale (target_h, target_w) — must mirror ValDataset's
        multi_scale_pyramid rounding (bucket-by-resize lattice)."""
        from semseg_tpu.data.transforms import (
            round2nearest_multiple,
            scale_for,
        )

        plan = []
        for s in self.img_sizes:
            sc = scale_for(ori_h, ori_w, s, self.img_max_size)
            plan.append(
                (
                    round2nearest_multiple(int(ori_h * sc), self.bucket_step),
                    round2nearest_multiple(int(ori_w * sc), self.bucket_step),
                )
            )
        return plan

    def fits(self, ori_h: int, ori_w: int) -> bool:
        return ori_h <= self.ori_canvas[0] and ori_w <= self.ori_canvas[1]

    def batched_metrics_from_originals(self, originals, labels):
        """Full multi-scale metrics from original images.

        ``originals``: list of (H, W, 3) uint8 arrays; ``labels``: matching
        (H, W) int arrays (-1 = void). Returns the same packed metric tuples
        as ``batched_metrics``.
        """
        assert self.num_class < 255
        seg_sizes = [lab.shape for lab in labels]
        canvases: dict = {}
        dev_labels: dict = {}

        def upload_window(idx_list):
            """One original (padded to the ori_step lattice) + one uint8
            label canvas per image, shipped as ONE batched device_put per
            window (_put_tree): per-image puts were 2 link round-trips per
            image — the dominant cost of the otherwise-serial upload phase
            (~47% of the protocol). Runs on a worker thread when
            upload_pipeline overlaps it with the previous window's
            forwards."""
            host_oris, host_labs = [], []
            for i in idx_list:
                ori = originals[i]
                h, w = ori.shape[:2]
                assert self.fits(h, w), (h, w, self.ori_canvas)
                obh = _round_up(h, self.ori_step)
                obw = _round_up(w, self.ori_step)
                padded = np.zeros((obh, obw, 3), np.uint8)
                padded[:h, :w] = ori
                host_oris.append(padded)
                H, W = seg_sizes[i]
                host_labs.append(self._void_label_canvas(labels[i], H, W))
            dev_oris, dev_labs = self._put_tree((host_oris, host_labs))
            for i, d_ori, d_lab in zip(idx_list, dev_oris, dev_labs):
                canvases[i] = self._embed_fn(d_ori)
                dev_labels[i] = d_lab

        def forward_chunk(key, padded_chunk):
            lh, lw = key
            self._note_dispatch(key)
            cvs = jnp.stack([canvases[i] for (i, _, _) in padded_chunk])
            ohs, ows, ths_tws = self._put_tree((
                np.asarray(
                    [originals[i].shape[0] for (i, _, _) in padded_chunk],
                    np.int32,
                ),
                np.asarray(
                    [originals[i].shape[1] for (i, _, _) in padded_chunk],
                    np.int32,
                ),
                np.asarray([(th, tw) for (_, th, tw) in padded_chunk],
                           np.int32),
            ))
            dev_logits = self._pyramid_level_fn(
                self.variables, cvs, ohs, ows, ths_tws, lh, lw
            )
            return dev_logits, [(th, tw) for (_, th, tw) in padded_chunk]

        if not originals:
            return []

        plans = [self.level_plan(*ori.shape[:2]) for ori in originals]
        assert all(len(p) for p in plans), "every image needs >= 1 level"

        def finalize(item_idx, acc):
            return self._metrics_fn(acc, dev_labels.pop(item_idx))

        def process_window(window):
            # Group this window's (item, level) tasks by level bucket.
            groups: dict = {}
            for i in window:
                for (th, tw) in plans[i]:
                    groups.setdefault(self._bucket_key(th, tw), []).append(
                        (i, th, tw)
                    )
            groups = self._pack_groups(groups)
            out.update(
                self._accumulate_on_device(
                    seg_sizes, groups, {i: len(plans[i]) for i in window},
                    forward_chunk,
                    finalize,
                )
            )
            for i in window:
                canvases.pop(i, None)  # free the device original

        # Pipeline windows: canvas-budget windows, further split so upload
        # of window k+1 (worker thread) overlaps compute of window k. A
        # window of 2 batches keeps the cross-image level batching intact.
        max_items = (
            max(2 * self.batch_size, 1)
            if self.upload_pipeline
            else len(originals)
        )
        windows = [
            w[lo : lo + max_items]
            for w in self._canvas_windows(seg_sizes, range(len(originals)))
            for lo in range(0, len(w), max_items)
        ]
        out: dict = {}
        if not self.upload_pipeline:
            # Strictly serial: never run the uploader concurrently with the
            # dispatch stream (measured slower on 1-core tunneled hosts even
            # when only the canvas budget splits the windows).
            for window in windows:
                upload_window(window)
                process_window(window)
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(1) as uploader:
                fut = uploader.submit(upload_window, windows[0])
                for k, window in enumerate(windows):
                    fut.result()
                    if k + 1 < len(windows):
                        fut = uploader.submit(upload_window, windows[k + 1])
                    process_window(window)
        res = self._fetch_packed_metrics(out, len(originals))
        self._mark_verified()
        return res
