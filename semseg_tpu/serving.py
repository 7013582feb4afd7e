"""AOT-exported serving bundles: segmentation without model code.

Deployment path the reference does not have (it serves by shipping the
Python package + ``.pth`` checkpoints and paying eager dispatch): here the
inference program is exported to serialized StableHLO — one program per
(batch, H, W) bucket — plus one ``params.npz``. A bundle loads and runs on
any machine with jax (TPU/CPU/GPU backends alike) with **no flax, no model
zoo, no checkpoint converter** at serving time, and zero compile cost when
paired with the persistent compilation cache.

Program semantics per bucket (matches the single-scale reference protocol,
``test.py:55-91`` minus multi-scale averaging):
  uint8 NHWC batch → normalize (f32, MEAN/STD) → model forward → bilinear
  resize of logits to input resolution (align_corners=False, the
  reference's ``F.interpolate``) → argmax → uint8 label map.
``argmax(softmax(x)) == argmax(x)``, so the softmax is elided.

Inputs of other sizes are resized onto the nearest exported bucket (the
eval pipeline's bucket-by-resize discipline, PARITY.md) and the label map
is nearest-resized back.
"""

import json
import os
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from semseg_tpu.ops.preproc import normalize_u8
from semseg_tpu.ops.resize import resize_bilinear

_MANIFEST = "manifest.json"
_PARAMS = "params.npz"


def _program(model, treedef, h, w):
    """(leaves, img_u8) → uint8 label map, for export at a fixed shape."""

    def run(leaves, img_u8):
        variables = jax.tree.unflatten(treedef, leaves)
        x = normalize_u8(img_u8)
        logits = model.apply(variables, x, train=False)
        full = resize_bilinear(logits.astype(jnp.float32), (h, w))
        return jnp.argmax(full, axis=-1).astype(jnp.uint8)

    return run


def export_bundle(
    model,
    variables,
    out_dir: str,
    *,
    shapes: Sequence[Tuple[int, int]],
    batch_size: int = 1,
    num_class: int = 150,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> dict:
    """Serialize one program per (batch, h, w) bucket into ``out_dir``.

    Parameters are saved ONCE (``params.npz``) and passed to every program
    as arguments — closing over them would duplicate ~100 MB of weight
    constants into each serialized bucket. Programs are lowered for every
    platform in ``platforms`` (jax.export pins the lowering target; a
    single-platform export would refuse to run elsewhere).
    """
    assert num_class < 256, "uint8 label transport"
    os.makedirs(out_dir, exist_ok=True)
    leaves, treedef = jax.tree.flatten(variables)
    np.savez(
        os.path.join(out_dir, _PARAMS),
        **{str(i): np.asarray(x) for i, x in enumerate(leaves)},
    )

    leaf_specs = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in leaves]
    programs = []
    for h, w in shapes:
        run = _program(model, treedef, h, w)
        exp = jax.export.export(jax.jit(run), platforms=tuple(platforms))(
            leaf_specs,
            jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.uint8),
        )
        name = f"{batch_size}x{h}x{w}.shlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        programs.append({"h": h, "w": w, "batch": batch_size, "file": name})

    manifest = {
        "format": "semseg_tpu.serving/1",
        "num_class": num_class,
        "programs": programs,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class Predictor:
    """Runs an exported bundle. Needs only jax + numpy + PIL.

    ``device``: optional ``jax.Device`` to pin params and execution to —
    one Predictor per chip gives single-process multi-chip serving
    (exported programs are lowered per *platform*; execution follows the
    committed arguments' device).
    """

    def __init__(self, bundle_dir: str, *, device=None):
        with open(os.path.join(bundle_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        assert self.manifest["format"] == "semseg_tpu.serving/1"
        npz = np.load(os.path.join(bundle_dir, _PARAMS))
        # Commit params to a device at LOAD time even when the caller did
        # not pin one: numpy leaves re-upload the whole parameter set on
        # every call (measured 3.8 s p50 per single-forward request on the
        # tunneled v5e — the transfer, not the forward, dominated).
        self.device = device if device is not None else jax.devices()[0]
        self.leaves = jax.device_put(
            [npz[str(i)] for i in range(len(npz.files))], self.device
        )
        self.programs = {}
        self._calls = {}
        for p in self.manifest["programs"]:
            with open(os.path.join(bundle_dir, p["file"]), "rb") as f:
                exp = jax.export.deserialize(f.read())
            key = (p["batch"], p["h"], p["w"])
            self.programs[key] = exp
            # jit the exported call ONCE: ``Exported.call`` builds a fresh
            # traced function per invocation, which re-enters the compile /
            # persistent-cache path on EVERY request (measured 3.6 s p50
            # per single-forward request on the tunneled v5e — ~1000x the
            # forward itself). Under jit the first call compiles and every
            # later call takes the C++ fast path.
            self._calls[key] = jax.jit(exp.call)

    def _pick(self, h, w):
        """Exported bucket with the closest aspect-preserving fit."""

        def cost(key):
            _, bh, bw = key
            s = min(bh / h, bw / w)
            return abs(1 - s) + abs(bh / bw - h / w)

        return min(self.programs, key=cost)

    def predict(self, img: np.ndarray) -> np.ndarray:
        """uint8 (H, W, 3) image → int64 (H, W) label map (0-based)."""
        return self.predict_batch([img])[0]

    def predict_batch(self, imgs) -> list:
        """Segment a list of uint8 (H, W, 3) images.

        Images are grouped by their picked bucket and packed into the
        exported batch dimension (final partial chunks pad with zero
        images, whose surplus outputs are dropped) — one program call per
        chunk instead of per image.
        """
        from PIL import Image

        by_key: dict = {}
        for idx, img in enumerate(imgs):
            by_key.setdefault(self._pick(*img.shape[:2]), []).append(idx)

        out: list = [None] * len(imgs)
        for key, indices in by_key.items():
            b, bh, bw = key
            resized = [
                np.asarray(
                    Image.fromarray(imgs[i]).resize(
                        (bw, bh), Image.BILINEAR
                    ),
                    np.uint8,
                )
                for i in indices
            ]
            for lo in range(0, len(indices), b):
                chunk = indices[lo : lo + b]
                batch = np.zeros((b, bh, bw, 3), np.uint8)
                for j, i in enumerate(chunk):
                    batch[j] = resized[lo + j]
                batch = jax.device_put(batch, self.device)
                maps = np.asarray(self._calls[key](self.leaves, batch))
                for j, i in enumerate(chunk):
                    H, W = imgs[i].shape[:2]
                    m = maps[j]
                    if (bh, bw) != (H, W):
                        m = np.asarray(
                            Image.fromarray(m).resize((W, H), Image.NEAREST)
                        )
                    out[i] = m.astype(np.int64)
        return out
