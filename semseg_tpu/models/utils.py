"""Pretrained checkpoint downloader.

Counterpart of ``/root/reference/mit_semseg/models/utils.py:10-18``: cache
a URL into ``./pretrained/`` and return the local path. The published zoo
lives at http://sceneparsing.csail.mit.edu/model/pytorch (README.md:12-13);
ImageNet backbone weights at .../pretrained_resnet/ (resnet.py:11-15,
mobilenet.py:17-19, hrnet.py:21-23, resnext.py:11-14). Downloads are
converted on load via ``semseg_tpu.models.convert``.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from typing import Optional
from urllib.parse import urlparse
from urllib.request import urlopen

PRETRAINED_URLS = {
    "resnet18": "http://sceneparsing.csail.mit.edu/model/pretrained_resnet/resnet18-imagenet.pth",
    "resnet50": "http://sceneparsing.csail.mit.edu/model/pretrained_resnet/resnet50-imagenet.pth",
    "resnet101": "http://sceneparsing.csail.mit.edu/model/pretrained_resnet/resnet101-imagenet.pth",
    "resnext101": "http://sceneparsing.csail.mit.edu/model/pretrained_resnet/resnext101-imagenet.pth",
    "mobilenetv2": "http://sceneparsing.csail.mit.edu/model/pretrained_resnet/mobilenet_v2.pth.tar",
    "hrnetv2": "http://sceneparsing.csail.mit.edu/model/pretrained_resnet/hrnetv2_w48-imagenet.pth",
}

ZOO_BASE = "http://sceneparsing.csail.mit.edu/model/pytorch"


def load_url(url: str, model_dir: str = "./pretrained", map_location=None) -> str:
    """Download-and-cache ``url``; returns the local file path.

    Unlike the reference (which returns the torch-loaded dict), this returns
    the path — feed it to ``semseg_tpu.checkpoint.load_weights``.
    """
    if not os.path.exists(model_dir):
        os.makedirs(model_dir, exist_ok=True)
    filename = os.path.basename(urlparse(url).path)
    cached_file = os.path.join(model_dir, filename)
    if not os.path.exists(cached_file):
        sys.stderr.write(f'Downloading: "{url}" to {cached_file}\n')
        # Download to a UNIQUE temp name and rename on success: a partial
        # file at the final path would be treated as a valid cache forever
        # after, and a shared ".part" name would interleave writes when two
        # processes (multi-host training on a shared FS) miss the cache at
        # once. os.replace keeps the winner atomic either way.
        fd, tmp = tempfile.mkstemp(
            prefix=filename + ".", suffix=".part", dir=model_dir
        )
        os.close(fd)
        try:
            # Bounded connect/read timeout so an offline host fails fast
            # instead of hanging the training launch on a dead socket.
            with urlopen(url, timeout=30) as resp, open(tmp, "wb") as f:
                shutil.copyfileobj(resp, f)
            os.replace(tmp, cached_file)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
    return cached_file


def arch_url_key(arch: str) -> Optional[str]:
    """``PRETRAINED_URLS`` key for an encoder arch, or None.

    Dilated variants fold onto their backbone family (the reference's
    dilation surgery happens AFTER the ImageNet load, models.py:65-101),
    so e.g. ``resnet50dilated`` downloads the ``resnet50`` weights.
    resnet34 has no published backbone (its build raises in the reference
    too) and maps to None.
    """
    key = arch.lower().replace("dilated", "")
    return key if key in PRETRAINED_URLS else None


def imagenet_backbone(arch: str, model_dir: str = "./pretrained") -> Optional[str]:
    """Local path of ``arch``'s published ImageNet backbone checkpoint.

    Downloads into ``model_dir`` on first use (reference resnet.py:160-200
    semantics: ``pretrained=True`` when no explicit weights are given).
    Returns None — after a loud warning — when the arch has no published
    backbone or the download fails (offline host); callers fall back to
    random init instead of crashing, unlike the reference.
    """
    key = arch_url_key(arch)
    if key is None:
        return None
    try:
        return load_url(PRETRAINED_URLS[key], model_dir=model_dir)
    except Exception as e:  # URLError, socket.timeout, OSError...
        sys.stderr.write(
            f"WARNING: could not fetch ImageNet weights for {arch} "
            f"({type(e).__name__}: {e}); the encoder will train from "
            "random init. Pre-download the checkpoint to "
            f"{os.path.join(model_dir, os.path.basename(urlparse(PRETRAINED_URLS[key]).path))} "
            "on a host with network access, or set MODEL.pretrained_encoder "
            "False to silence this.\n"
        )
        return None
