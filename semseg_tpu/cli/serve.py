"""Serving CLI — the production inference endpoint.

No reference counterpart (the reference's deployment story ends at the
``test.py`` batch CLI); this serves segmentation over HTTP with dynamic
micro-batching (``semseg_tpu/server.py``), from either backend:

  # AOT bundle (tools/export_serving.py output) — no model zoo on the host:
  python -m semseg_tpu.cli.serve --bundle ./bundle --port 8000

  # Live engine — full 5-scale-TTA eval-protocol quality:
  python -m semseg_tpu.cli.serve --cfg config/ade20k-resnet50dilated-ppm_deepsup.yaml \
      TEST.checkpoint epoch_20.pth

  curl -s -X POST --data-binary @img.jpg localhost:8000/segment?format=color > seg.png
"""

from __future__ import annotations

import argparse

import numpy as np


def build_backends(args, opts):
    """Returns (list of predict_batch backends, info dict, warmup thunk).

    ``--devices N`` > 1 builds one backend per chip; the MicroBatcher runs
    one dispatcher thread per backend off the shared queue (single-process
    multi-chip serving — thread-per-engine dispatch measured GIL-clean,
    PERF_NOTES "Multi-engine eval dispatch").
    """
    n_devices = getattr(args, "devices", 1) or 1
    if n_devices > 1:
        import jax

        avail = len(jax.devices())
        if avail < n_devices:
            # Fail fast: silently serving at reduced capacity (the old
            # jax.devices()[:n] slice) hid provisioning mistakes behind
            # an info-dict hint nobody reads.
            raise SystemExit(
                f"--devices {n_devices} requested but only {avail} "
                f"device(s) available on this host"
            )
    if args.bundle:
        if opts:
            raise SystemExit(
                f"cfg overrides {opts} have no effect with --bundle "
                "(the bundle is already a compiled artifact)"
            )
        import jax

        from semseg_tpu.serving import Predictor

        devices = jax.devices()[:n_devices]
        backends = [Predictor(args.bundle, device=d) for d in devices]
        info = {
            "backend": "bundle",
            "bundle": args.bundle,
            "devices": len(backends),
            "programs": sorted(
                f"{b}x{h}x{w}" for (b, h, w) in backends[0].programs
            ),
        }

        def warmup():
            # One call per exported program per device: first `.call`
            # compiles; a cold program would tax the first unlucky request.
            for be in backends:
                for (b, h, w) in be.programs:
                    be.predict_batch([np.zeros((h, w, 3), np.uint8)] * b)

        return backends, info, warmup

    from semseg_tpu.checkpoint import resolve_reference_checkpoint
    from semseg_tpu.cli.eval import build_engines
    from semseg_tpu.config import cfg
    from semseg_tpu.server import LivePredictor
    from semseg_tpu.utils.compile_cache import enable_compile_cache

    cfg.merge_from_file(args.cfg)
    if opts:
        cfg.merge_from_list(opts)
    enable_compile_cache(cfg.TPU.compile_cache)
    resolve_reference_checkpoint(cfg, cfg.TEST.checkpoint)
    # batch>1 selects BatchedInferenceEngine (LivePredictor requires its
    # batched_predict); pack_buckets folds under-filled request batches.
    engines = build_engines(
        cfg, n_devices, batch=max(2, args.max_batch), pack_buckets=True
    )
    backends = [LivePredictor(cfg, e) for e in engines]
    info = {
        "backend": "live",
        "cfg": args.cfg,
        "arch": f"{cfg.MODEL.arch_encoder}+{cfg.MODEL.arch_decoder}",
        "devices": len(backends),
        "scales": list(cfg.DATASET.imgSizes),
    }

    def warmup():
        # Compiles the buckets of ONE representative shape (the canonical
        # 2:3 val image) per device; other buckets compile lazily per
        # request, off the persistent XLA cache when warm.
        for be in backends:
            be.predict_batch([np.zeros((512, 683, 3), np.uint8)])

    return backends, info, warmup


def build_backend(args, opts):
    """Single-backend convenience wrapper (kept for tests/embedding)."""
    backends, info, warmup = build_backends(args, opts)
    return backends[0], info, warmup


def main(argv=None):
    from semseg_tpu.server import MicroBatcher, SegmentationServer
    from semseg_tpu.utils import setup_logger

    p = argparse.ArgumentParser(description="semseg_tpu serving endpoint")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--bundle", help="AOT serving bundle directory")
    src.add_argument("--cfg", help="model config YAML (live TTA backend)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--devices", type=int, default=1,
                   help="serve from the first N chips (one dispatcher "
                        "thread per chip off the shared request queue)")
    p.add_argument("--max-batch", type=int, default=8,
                   help="batch-size flush threshold (PERF_NOTES sweet spot)")
    p.add_argument("--max-wait-ms", type=float, default=10.0,
                   help="deadline flush: max added queueing latency")
    p.add_argument("--max-queue", type=int, default=128,
                   help="admission control: pending requests beyond this "
                        "are rejected with 503")
    p.add_argument("--request-timeout-s", type=float, default=300.0,
                   help="per-request prediction deadline (504 past it)")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip the pre-bind compile warmup")
    p.add_argument("--quiet", action="store_true", help="no access log")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None,
                   help="cfg overrides (live backend), e.g. TEST.checkpoint …")
    args = p.parse_args(argv)

    logger = setup_logger()
    backends, info, warmup = build_backends(args, args.opts)
    if not args.no_warmup:
        logger.info("warming up compiled programs…")
        warmup()

    batcher = MicroBatcher(
        [b.predict_batch for b in backends],
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        max_queue=args.max_queue,
        # Live backend: pyramids build in the HTTP handler thread, ahead
        # of the batcher (all backends share the same dataset transforms).
        preprocess=getattr(backends[0], "preprocess", None),
    )
    server = SegmentationServer(
        (args.host, args.port), batcher, info=info, quiet=args.quiet,
        request_timeout_s=args.request_timeout_s,
    )
    logger.info(
        f"serving {info['backend']} backend ({len(backends)} device(s)) on "
        f"http://{args.host}:{server.server_address[1]} "
        f"(max_batch={args.max_batch}, max_wait_ms={args.max_wait_ms})"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("shutting down")
    finally:
        server.server_close()
        batcher.close()


if __name__ == "__main__":
    main()
