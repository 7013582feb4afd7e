"""Evaluation CLI — counterpart of ``/root/reference/eval.py`` and
``eval_multipro.py``.

Multi-scale TTA over the ADE20K val set with mIoU / pixel-accuracy
reporting. With multiple devices the val list is dispatched round-robin
across per-device inference engines (threads + async dispatch replace the
reference's one-process-per-GPU + result queue, eval_multipro.py:84-155).
"""

from __future__ import annotations

import argparse
import os
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from semseg_tpu.checkpoint import load_weights
from semseg_tpu.config import cfg
from semseg_tpu.data import ValDataset
from semseg_tpu.data.loader import EvalLoader
from semseg_tpu.engine import InferenceEngine, output_stride_for
from semseg_tpu.models import ModelBuilder, init_variables
from semseg_tpu.utils import (
    AverageMeter,
    accuracy,
    colorEncode,
    intersectionAndUnion,
    load_class_names,
    setup_logger,
)


def visualize_result(item, pred, save_dir):
    from PIL import Image

    img = item["img_ori"]
    seg = item["seg_label"][0]
    seg_color = colorEncode(seg, mode="RGB")
    pred_color = colorEncode(pred, mode="RGB")
    im_vis = np.concatenate((img, seg_color, pred_color), axis=1).astype(np.uint8)
    img_name = os.path.basename(item["info"])
    os.makedirs(save_dir, exist_ok=True)
    # splitext, not .replace(".jpg", ...): replace rewrites a ".jpg"
    # anywhere in the name and leaves .jpeg/.JPG sources extension-
    # mislabeled for the PNG bytes PIL writes.
    Image.fromarray(im_vis).save(
        os.path.join(save_dir, os.path.splitext(img_name)[0] + ".png")
    )


def evaluate(engines, loader, cfg, logger, visualize=False, vis_dir=None):
    acc_meter = AverageMeter()
    iou_meter_inter = np.zeros(cfg.DATASET.num_class, np.float64)
    iou_meter_union = np.zeros(cfg.DATASET.num_class, np.float64)
    time_meter = AverageMeter()
    lock = threading.Lock()

    # Progress reporting (reference eval.py:49 / eval_multipro.py:129).
    try:
        from tqdm import tqdm

        pbar = tqdm(total=len(loader))
    except Exception:  # tqdm unavailable or loader without __len__
        pbar = None

    # Stream the val set: a shared iterator hands out chunks so memory stays
    # O(chunk × engines), not O(dataset) (2,000 pyramids would be ~10 GB).
    n_eng = len(engines)
    item_iter = iter(loader)
    iter_lock = threading.Lock()

    def next_chunk(size=32):
        out = []
        with iter_lock:
            for _ in range(size):
                try:
                    out.append(next(item_iter))
                except StopIteration:
                    break
        return out

    def score_one(item, pred):
        seg_label = np.asarray(item["seg_label"][0])
        acc, pix = accuracy(pred, seg_label)
        inter, union = intersectionAndUnion(pred, seg_label, cfg.DATASET.num_class)
        with lock:
            nonlocal iou_meter_inter, iou_meter_union
            acc_meter.update(acc, pix)
            iou_meter_inter += inter
            iou_meter_union += union
        if visualize:
            visualize_result(item, pred, vis_dir)

    def run_shard(eng_idx):
        engine = engines[eng_idx]
        batched = hasattr(engine, "batched_predict")
        while True:
            chunk = next_chunk(32 if batched else 1)
            if not chunk:
                return
            if batched and not visualize:
                # Throughput mode: cross-image bucket batching + fully
                # on-device metrics (only scalars/histograms leave the
                # device).
                nonlocal iou_meter_inter, iou_meter_union
                labels = [np.asarray(it["seg_label"][0]) for it in chunk]
                tic = time.perf_counter()
                dp_idx = [
                    k for k, it in enumerate(chunk) if not it["img_data"]
                ]
                if dp_idx:
                    # Device-pyramid items (empty host pyramid): the engine
                    # derives every scale on device from the original.
                    dp_set = set(dp_idx)
                    host_idx = [
                        k for k in range(len(chunk)) if k not in dp_set
                    ]
                    metrics = [None] * len(chunk)
                    dp_out = engine.batched_metrics_from_originals(
                        [chunk[k]["img_ori"] for k in dp_idx],
                        [labels[k] for k in dp_idx],
                    )
                    for k, m in zip(dp_idx, dp_out):
                        metrics[k] = m
                    if host_idx:  # oversized-original fallback
                        host_out = engine.batched_metrics(
                            [chunk[k]["img_data"] for k in host_idx],
                            [labels[k] for k in host_idx],
                        )
                        for k, m in zip(host_idx, host_out):
                            metrics[k] = m
                else:
                    metrics = engine.batched_metrics(
                        [it["img_data"] for it in chunk], labels
                    )
                elapsed = (time.perf_counter() - tic) / len(chunk)
                with lock:
                    for acc_sum, pix_sum, inter, union in metrics:
                        acc_meter.update(
                            float(acc_sum) / (float(pix_sum) + 1e-10),
                            int(pix_sum),
                        )
                        iou_meter_inter += inter.astype(np.float64)
                        iou_meter_union += union.astype(np.float64)
                        time_meter.update(elapsed)
                    if pbar is not None:
                        pbar.update(len(metrics))
            elif batched:
                # Visualization needs the prediction maps on the host.
                seg_sizes = [
                    np.asarray(it["seg_label"][0]).shape for it in chunk
                ]
                tic = time.perf_counter()
                preds = engine.batched_predict(
                    [it["img_data"] for it in chunk], seg_sizes
                )
                elapsed = (time.perf_counter() - tic) / len(chunk)
                for item, pred in zip(chunk, preds):
                    with lock:
                        time_meter.update(elapsed)
                        if pbar is not None:
                            pbar.update(1)
                    score_one(item, pred)
            else:
                item = chunk[0]
                seg_label = np.asarray(item["seg_label"][0])
                tic = time.perf_counter()
                pred = engine.predict(item["img_data"], seg_label.shape)
                with lock:
                    time_meter.update(time.perf_counter() - tic)
                    if pbar is not None:
                        pbar.update(1)
                score_one(item, pred)

    errors = []

    def guarded(i):
        try:
            run_shard(i)
        except Exception as e:  # propagate worker failures to the caller
            errors.append(e)

    threads = [
        threading.Thread(target=guarded, args=(i,)) for i in range(n_eng)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if pbar is not None:
        pbar.close()
    if errors:
        raise errors[0]

    from semseg_tpu.utils.metrics import miou_from_meters

    iou, miou = miou_from_meters(iou_meter_inter, iou_meter_union)
    names = load_class_names()
    for i, class_iou in enumerate(iou):
        # .get: the name map is the 150-class ADE20K table; a config
        # with a different num_class must not crash the summary.
        logger.info(
            f"class [{i}], IoU: {class_iou:.4f}  ({names.get(i + 1, '?')})"
        )
    logger.info(
        f"[Eval Summary]:\nMean IoU: {miou:.4f}, "
        f"Accuracy: {acc_meter.average() * 100:.2f}%, "
        f"Inference Time: {time_meter.average():.4f}s"
    )
    raw = {
        # Shard-combinable sums (per-class ratios are NOT combinable):
        # global metrics = f(Σ over shards of each array/scalar).
        "acc_sum": float(acc_meter.sum or 0.0),
        "pix_count": float(acc_meter.count or 0.0),
        "inter": iou_meter_inter,
        "union": iou_meter_union,
    }
    return miou, acc_meter.average(), iou, raw


def build_engines(cfg, num_devices=1, exact=False, spatial=0, batch=0,
                  fetch_dtype=None, device_pyramid=False,
                  batch_explicit=True, bucket_denylist="auto",
                  pack_buckets=False):
    from semseg_tpu.data.dataset import _effective_lattice

    # The engine's grouping lattice must equal the dataset's resize lattice
    # (and both must keep the architecture's padding_constant alignment —
    # 32 for UPerNet/HRNet configs).
    eval_step = _effective_lattice(
        cfg.TPU.eval_bucket_step, cfg.DATASET.padding_constant
    )
    model = ModelBuilder.build_model(cfg, dtype=jnp.dtype(cfg.TPU.compute_dtype))
    variables = init_variables(
        model, image_size=(cfg.DATASET.padding_constant * 8,) * 2
    )
    variables = load_weights(
        dict(variables),
        arch_encoder=cfg.MODEL.arch_encoder,
        arch_decoder=cfg.MODEL.arch_decoder,
        weights_encoder=cfg.MODEL.weights_encoder,
        weights_decoder=cfg.MODEL.weights_decoder,
    )
    if spatial > 1:
        # One engine sharding each image's height across `spatial` chips
        # (GSPMD conv halo exchange) — multi-chip single-image latency.
        from semseg_tpu.parallel.mesh import make_mesh

        if (batch > 1 and batch_explicit) or device_pyramid:
            # Only warn about flags the user actually passed — `batch`
            # carries a default of 4 that must not trigger this.
            import logging

            logging.getLogger("Logger").warning(
                "--spatial is a single-image latency mode: "
                "--batch/--device-pyramid are ignored"
            )
        return [
            InferenceEngine(
                model,
                variables,
                num_class=cfg.DATASET.num_class,
                output_stride=output_stride_for(cfg),
                bucket_step=eval_step,
                padding_constant=cfg.DATASET.padding_constant,
                exact=exact,
                fetch_dtype=fetch_dtype,
                spatial_mesh=make_mesh(spatial),
                bucket_denylist=bucket_denylist,
            )
        ]
    devices = jax.devices()[: max(1, num_devices)]
    engines = []
    for d in devices:
        dev_vars = jax.device_put(variables, d)
        kw = dict(
            num_class=cfg.DATASET.num_class,
            output_stride=output_stride_for(cfg),
            bucket_step=eval_step,
            padding_constant=cfg.DATASET.padding_constant,
            exact=exact,
            fetch_dtype=fetch_dtype,
            bucket_denylist=bucket_denylist,
        )
        if device_pyramid and batch > 1 and not exact:
            from semseg_tpu.engine import DevicePyramidEngine

            engines.append(
                DevicePyramidEngine(
                    model, dev_vars, batch_size=batch,
                    img_sizes=cfg.DATASET.imgSizes,
                    img_max_size=cfg.DATASET.imgMaxSize,
                    pack_buckets=pack_buckets,
                    **kw,
                )
            )
        elif batch > 1 and not exact:
            from semseg_tpu.engine import BatchedInferenceEngine

            engines.append(
                BatchedInferenceEngine(
                    model, dev_vars, batch_size=batch,
                    pack_buckets=pack_buckets, **kw,
                )
            )
        else:
            engines.append(InferenceEngine(model, dev_vars, **kw))
    return engines


def _heal_or_raise(exc, engines, batch, args, logger, argv=None):
    """Self-healing on device-worker crashes ("learn once, never crash
    twice"): attribute the crash to the engines' suspect buckets (the
    fresh shapes dispatched since their last verified fetch) via
    subprocess probes, persist confirmed faults to the per-backend
    registry, and restart this CLI in place — the restarted run's
    ``bucket_denylist='auto'`` engines route around the learned shapes.
    Anything that is not a worker crash, or exhausting --max-heal
    attempts, re-raises.
    """
    import sys

    from semseg_tpu.utils import fault_registry

    attempt = int(os.environ.get("SEMSEG_HEAL_ATTEMPT", "0"))
    if attempt >= args.max_heal or not fault_registry.is_worker_crash(exc):
        raise exc
    suspects: list = []
    for eng in engines:
        for k in eng.suspect_buckets():
            if k not in suspects:
                suspects.append(k)
    platform = engines[0].device.platform if engines[0].device else (
        jax.devices()[0].platform
    )
    logger.error(
        f"device worker crashed ({exc}); probing {len(suspects)} suspect "
        f"bucket shapes in subprocesses (heal attempt {attempt + 1}/"
        f"{args.max_heal})"
    )
    if suspects:
        from semseg_tpu import probing

        spec = {
            "arch_encoder": cfg.MODEL.arch_encoder,
            "arch_decoder": cfg.MODEL.arch_decoder,
            "fc_dim": cfg.MODEL.fc_dim,
            "dtype": cfg.TPU.compute_dtype,
            "batch": batch,
        }
        faulty, _clean = probing.probe_shapes(
            suspects, spec, log=logger.info
        )
        if faulty:
            path = fault_registry.record(
                faulty, platform, {"source": "eval-self-heal", **spec}
            )
            logger.error(
                f"learned faulty shapes "
                f"{','.join(f'{h}x{w}' for h, w in faulty)} -> {path}"
            )
    logger.error("restarting evaluation with the learned fault registry")
    os.environ["SEMSEG_HEAL_ATTEMPT"] = str(attempt + 1)
    sys.stdout.flush()
    sys.stderr.flush()
    restart = (
        [sys.argv[0]] + list(argv) if argv is not None else sys.argv
    )
    os.execv(sys.executable, [sys.executable] + restart)


def main(argv=None):
    parser = argparse.ArgumentParser(description="semseg_tpu evaluation")
    parser.add_argument("--cfg", default="config/ade20k-resnet50dilated-ppm_deepsup.yaml")
    parser.add_argument("--devices", type=int, default=1, help="eval devices")
    parser.add_argument("--gpu", default=None, help="reference CLI parity")
    parser.add_argument("--exact", action="store_true",
                        help="bit-parity mode: no shape bucketing (slow on TPU)")
    parser.add_argument("--spatial", type=int, default=0,
                        help="shard each image's height across N chips")
    parser.add_argument("--batch", type=int, default=None,
                        help="cross-image bucket batch size (0/1 = per-image; "
                             "default 4)")
    parser.add_argument("--fetch-dtype", default="bfloat16",
                        help="device->host logits dtype (bfloat16 halves the "
                             "transfer; float32 for exact parity)")
    parser.add_argument("--bucket-step", type=int, default=0,
                        help="override TPU.eval_bucket_step: 8 = reference-"
                             "protocol-exact (default), 16/32 = fewer "
                             "compiled shapes at ~4e-4/1.2e-3 mIoU drift")
    parser.add_argument("--max-heal", type=int, default=2,
                        help="on a device-worker crash: probe the suspect "
                             "bucket shapes in subprocesses, persist "
                             "confirmed faults to the per-backend registry, "
                             "and restart the run routing around them — up "
                             "to this many times (0 = fail immediately)")
    parser.add_argument("--bucket-denylist", default="auto",
                        help="forward bucket shapes to route to the next "
                             "lattice point: 'auto' (per-backend known-"
                             "faulty shapes, e.g. 304x400 on the axon "
                             "stack), 'none', or 'HxW[,HxW...]'")
    parser.add_argument("--pack-buckets", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="fold under-filled bucket batches into larger "
                             "buckets (cost-model-driven, pad-aware-pooled; "
                             "measured drift at the default step-8 lattice "
                             "is below the --exact noise floor, PARITY.md "
                             "packed rows). On by default; "
                             "--no-pack-buckets restores one-bucket-per-"
                             "lattice-point execution")
    parser.add_argument("--device-pyramid", action="store_true",
                        help="derive every pyramid scale ON DEVICE from the "
                             "original image (one upload per image, ~5.7x "
                             "less H2D, ~3x less host CPU; Pillow-equivalent "
                             "antialiased resize, drift <=1/255 per pixel)")
    parser.add_argument("--start-idx", type=int, default=-1,
                        help="val-list shard start (multi-host eval: give "
                        "each host a slice, as eval_multipro.py:88-92 does "
                        "per GPU; combine shards with "
                        "tools/combine_eval_shards.py over --metrics-out "
                        "files)")
    parser.add_argument("--end-idx", type=int, default=-1,
                        help="val-list shard end (exclusive; omit for "
                        "'to the end')")
    parser.add_argument("--metrics-out", default="",
                        help="write raw combinable metric sums (acc_sum, "
                        "pix_count, per-class inter/union) to this .npz")
    parser.add_argument("--profile", default="",
                        help="capture a JAX profiler trace of the eval loop "
                             "into this directory (view with TensorBoard / "
                             "xprof) — the eval-side twin of train.py "
                             "--profile")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args(argv)
    # parse_odgt slices only when BOTH indices are >= 0; resolve open-ended
    # shards here so '--start-idx 1000' means 1000..end, not 'full list'.
    if (args.start_idx >= 0) != (args.end_idx >= 0):
        if args.start_idx >= 0:
            args.end_idx = 1 << 31
        else:
            args.start_idx = 0

    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.bucket_step:
        cfg.TPU.eval_bucket_step = args.bucket_step

    # Reference checkpoint name convention (eval.py:183-188).
    if args.bucket_denylist == "auto":
        denylist = "auto"
    elif args.bucket_denylist in ("none", ""):
        denylist = ()
    else:
        # Validate each entry is exactly HxW: a malformed shape would
        # parse into a tuple that silently never matches any bucket key,
        # so the user believes a faulty shape is routed around while the
        # engine still dispatches it.
        denylist = []
        for s in args.bucket_denylist.split(","):
            parts = s.strip().split("x")
            try:
                hw = tuple(int(v) for v in parts)
            except ValueError:
                hw = ()
            if len(hw) != 2:
                raise SystemExit(
                    f"--bucket-denylist entry {s!r} is not HxW "
                    "(e.g. 304x400)"
                )
            denylist.append(hw)
        denylist = tuple(denylist)

    from semseg_tpu.checkpoint import resolve_reference_checkpoint

    resolve_reference_checkpoint(cfg, cfg.VAL.checkpoint)

    from semseg_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(cfg.TPU.compile_cache)
    logger = setup_logger()
    batch_explicit = args.batch is not None
    batch = args.batch if batch_explicit else 4
    # Visualization runs batched_predict over the HOST pyramids, which are
    # intentionally empty in device-pyramid mode — so the two are exclusive;
    # --spatial builds a plain spatially-sharded InferenceEngine (no
    # original-image canvas), so it is exclusive too.
    device_pyramid = (
        args.device_pyramid and batch > 1 and not args.exact
        and not cfg.VAL.visualize and args.spatial <= 1
    )
    if args.device_pyramid and not device_pyramid:
        logger.warning(
            "--device-pyramid ignored (requires --batch > 1, no --exact, "
            "no --spatial, and VAL.visualize False)"
        )
    engines = build_engines(
        cfg, args.devices, exact=args.exact, spatial=args.spatial,
        batch=batch, batch_explicit=batch_explicit,
        fetch_dtype=None if args.exact else args.fetch_dtype,
        device_pyramid=device_pyramid,
        bucket_denylist=denylist,
        pack_buckets=args.pack_buckets,
    )

    dataset = ValDataset(
        cfg.DATASET.root_dataset,
        cfg.DATASET.list_val,
        cfg.DATASET,
        device_preprocess=not args.exact,
        # Bucket-by-resize: pyramid levels land directly on the jit shape
        # lattice, so the engine never pads (pad-bleed-free bucketing).
        bucket_step=None if args.exact else cfg.TPU.eval_bucket_step,
        device_pyramid_canvas=(
            engines[0].ori_canvas if device_pyramid else None
        ),
        start_idx=args.start_idx,
        end_idx=args.end_idx,
    )
    # Prefetch must cover at least one engine's chunk (32 for batched
    # engines): with prefetch 8, chunk assembly drained the prefetched
    # items then blocked on on-demand decodes while HOLDING the iterator
    # lock, idling the other engines' devices.
    loader = EvalLoader(
        dataset, num_workers=5,
        prefetch=max(16, 32 * max(1, len(engines))) if batch > 1 else 16,
    )
    profiling = [False]
    if args.profile:
        os.makedirs(args.profile, exist_ok=True)
        jax.profiler.start_trace(args.profile)
        profiling[0] = True

    def _stop_profile():  # idempotent: both exit paths below hit it
        if profiling[0]:
            profiling[0] = False
            jax.profiler.stop_trace()
            logger.info(f"Wrote profiler trace to {args.profile}")

    try:
        *_, raw = evaluate(
            engines,
            loader,
            cfg,
            logger,
            visualize=cfg.VAL.visualize,
            vis_dir=os.path.join(cfg.DIR, "result"),
        )
    except Exception as e:
        # os.execv in _heal_or_raise replaces the process WITHOUT
        # unwinding, so the finally below would never run on the heal
        # path — flush the trace first (the attempt's capture stays
        # viewable; the restarted run records its own).
        _stop_profile()
        _heal_or_raise(e, engines, batch, args, logger, argv)
        return  # unreachable: _heal_or_raise re-execs or raises
    finally:
        _stop_profile()
    if args.metrics_out:
        np.savez(args.metrics_out, **raw)
        logger.info(f"Wrote raw metric sums to {args.metrics_out}")
    logger.info("Evaluation Done!")


if __name__ == "__main__":
    main()
