#!/usr/bin/env python3
"""Serving endpoint benchmark: request throughput under concurrency.

Measures what the micro-batcher is FOR: aggregate requests/sec as client
concurrency grows (batch fill rises with load, and the TPU forward scales
with batch — PERF_NOTES "Batch scaling, inference"). Reports one JSON
line per concurrency level with client-side throughput/latency and the
server's own /stats (mean batch fill).

Two measurement layers:
  * default — full HTTP round trip (PIL decode + predict + PNG encode);
    on this 1-core container the HOST side (HTTP + codecs) is a real cost
    against a tunneled device, so treat absolute numbers as directional.
  * --no-http — MicroBatcher+backend only (no sockets/codecs): isolates
    the batching/device throughput story.

Backend: an AOT bundle exported in-process at one bucket shape (the
single-scale serving protocol; --live switches to the 5-scale TTA engine).

Usage: python benchmarks/serving_bench.py [--arch resnet50dilated]
         [--shape 448,608] [--batch 8] [--concurrency 1,4,8,16]
         [--requests 64] [--live] [--no-http]
"""

import argparse
import io
import json
import tempfile
import threading
import time

import numpy as np


def build_model(arch, decoder, fc_dim, dtype_str="bfloat16"):
    import jax.numpy as jnp

    from semseg_tpu.config import cfg
    from semseg_tpu.models import ModelBuilder, init_variables
    from semseg_tpu.utils.compile_cache import enable_compile_cache

    import jax

    if jax.default_backend() == "tpu":  # see bench.py: CPU AOT entries
        enable_compile_cache()          # never reload cleanly
    c = cfg.clone()
    c.MODEL.arch_encoder = arch
    c.MODEL.arch_decoder = decoder
    c.MODEL.fc_dim = fc_dim
    model = ModelBuilder.build_model(c, dtype=jnp.dtype(dtype_str))
    variables = init_variables(model, seed=0, image_size=(64, 64))
    return c, model, variables


def make_backend(args):
    c, model, variables = build_model(args.arch, args.decoder, args.fc_dim)
    h, w = args.shape
    if args.live:
        from semseg_tpu.engine import BatchedInferenceEngine
        from semseg_tpu.server import LivePredictor

        # Same lattice the deployed CLI wires (build_engines asserts the
        # engine's grouping lattice == the pyramid's resize lattice) — a
        # mismatch would bill padding FLOPs the real server never pays.
        engine = BatchedInferenceEngine(
            model, variables,
            num_class=150,
            output_stride=c.DATASET.segm_downsampling_rate,
            bucket_step=c.TPU.eval_bucket_step,
            padding_constant=c.DATASET.padding_constant,
            batch_size=args.batch,
            fetch_dtype="bfloat16",
            pack_buckets=True,
        )
        return LivePredictor(c, engine), "live-5scale"
    from semseg_tpu.serving import Predictor, export_bundle

    d = tempfile.mkdtemp(prefix="serving_bench_")
    export_bundle(model, variables, d, shapes=[(h, w)],
                  batch_size=args.batch, platforms=("cpu", "tpu"))
    return Predictor(d), "bundle-single-scale"


def _percentiles(lat):
    lat = sorted(lat)
    return {
        "lat_ms_p50": round(1e3 * lat[len(lat) // 2], 1),
        "lat_ms_p95": round(1e3 * lat[min(len(lat) - 1, int(len(lat) * 0.95))], 1),
    }


def _run_clients(do_request, mb, conc, n):
    """Shared load harness: warm up, zero the batcher's counters (the
    fill-1 warmup batch would skew mean_batch_fill — the tuning signal),
    then drive ``n`` requests from ``conc`` client threads."""
    do_request()  # warmup: compile + caches
    mb.reset_stats()
    lat = []
    lock = threading.Lock()
    it = iter(range(n))

    def client():
        while True:
            with lock:
                try:
                    next(it)
                except StopIteration:
                    return
            t0 = time.perf_counter()
            do_request()
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(conc)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return {
        "concurrency": conc,
        "req_per_s": round(n / wall, 2),
        **_percentiles(lat),
        "mean_batch_fill": round(mb.stats()["mean_batch_fill"], 2),
    }


def bench_http(backend, args, conc):
    from semseg_tpu.server import MicroBatcher, SegmentationServer

    mb = MicroBatcher(backend.predict_batch, max_batch=args.batch,
                      max_wait_ms=args.max_wait_ms,
                      preprocess=getattr(backend, "preprocess", None))
    srv = SegmentationServer(("127.0.0.1", 0), mb, quiet=True)
    srv.serve_background()
    url = f"http://127.0.0.1:{srv.server_address[1]}/segment?format=png"
    try:
        from PIL import Image

        h, w = args.shape
        rng = np.random.RandomState(0)
        buf = io.BytesIO()
        Image.fromarray(
            rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        ).save(buf, format="PNG")
        body = buf.getvalue()

        import urllib.request

        def post():
            req = urllib.request.Request(url, data=body, method="POST")
            urllib.request.urlopen(req, timeout=600).read()

        return _run_clients(post, mb, conc, args.requests)
    finally:
        srv.close()


def bench_direct(backend, args, conc):
    """MicroBatcher-only: no HTTP, no image codecs."""
    from semseg_tpu.server import MicroBatcher

    mb = MicroBatcher(backend.predict_batch, max_batch=args.batch,
                      max_wait_ms=args.max_wait_ms,
                      preprocess=getattr(backend, "preprocess", None))
    try:
        h, w = args.shape
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        return _run_clients(
            lambda: mb.submit(img).result(), mb, conc, args.requests
        )
    finally:
        mb.close()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="resnet50dilated")
    p.add_argument("--decoder", default="ppm_deepsup")
    p.add_argument("--fc-dim", type=int, default=2048)
    p.add_argument("--shape", default="448,608",
                   help="request image H,W (the canonical 450 bucket)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=10.0)
    p.add_argument("--concurrency", default="1,4,8,16")
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--live", action="store_true")
    p.add_argument("--no-http", action="store_true")
    args = p.parse_args()
    args.shape = tuple(int(x) for x in args.shape.split(","))

    backend, kind = make_backend(args)
    runner = bench_direct if args.no_http else bench_http
    for conc in (int(x) for x in args.concurrency.split(",")):
        out = runner(backend, args, conc)
        out.update(backend=kind, http=not args.no_http,
                   shape=f"{args.shape[0]}x{args.shape[1]}",
                   max_batch=args.batch, n_requests=args.requests)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
