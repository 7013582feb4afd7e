#!/usr/bin/env python3
"""Host input-pipeline throughput: f32 host-normalize vs raw uint8 transport.

Measures TrainDataset.next_batch img/s per host core on synthetic
ADE20K-sized JPEGs (the decode+resize+normalize path that must keep the
chips fed; reference analogue: the 16-worker PIL loader, train.py:164-177).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root, n=24):
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "img"), exist_ok=True)
    os.makedirs(os.path.join(root, "ann"), exist_ok=True)
    recs = []
    # Real ADE val spread: landscape/portrait mix around 512x683
    for i in range(n):
        h, w = [(512, 683), (683, 512), (480, 640), (512, 768)][i % 4]
        Image.fromarray(
            rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(os.path.join(root, "img", f"{i}.jpg"), quality=90)
        Image.fromarray(
            rng.randint(0, 151, (h, w)).astype(np.uint8), "L"
        ).save(os.path.join(root, "ann", f"{i}.png"))
        recs.append(
            {"fpath_img": f"img/{i}.jpg", "fpath_segm": f"ann/{i}.png",
             "width": w, "height": h}
        )
    odgt = os.path.join(root, "train.odgt")
    with open(odgt, "w") as f:
        f.write("\n".join(json.dumps(r) for r in recs))
    return odgt


def bench(root, odgt, raw, batches=12, batch_per_gpu=2, fast_decode=False):
    from semseg_tpu.config import cfg
    from semseg_tpu.data.dataset import TrainDataset

    ds = TrainDataset(
        root, odgt, cfg.clone().DATASET, batch_per_gpu=batch_per_gpu,
        seed=0, bucket_step=64, raw_transport=raw, fast_decode=fast_decode,
    )
    ds.next_batch()  # warm caches
    t0 = time.perf_counter()
    for _ in range(batches):
        ds.next_batch()
    dt = time.perf_counter() - t0
    return batches * batch_per_gpu / dt


def main():
    from semseg_tpu import native

    with tempfile.TemporaryDirectory() as root:
        odgt = make_dataset(root)
        f32 = bench(root, odgt, raw=False)
        raw = bench(root, odgt, raw=True)
        fast = bench(root, odgt, raw=True, fast_decode=True)
    print(json.dumps({
        "native_available": native.available(),
        "native_jpeg": native.jpeg_available(),
        "f32_img_per_s_per_core": round(f32, 1),
        "raw_u8_img_per_s_per_core": round(raw, 1),
        "speedup": round(raw / f32, 2),
        "fast_decode_img_per_s_per_core": round(fast, 1),
        "fast_decode_speedup_vs_raw": round(fast / raw, 2),
    }))


if __name__ == "__main__":
    main()
