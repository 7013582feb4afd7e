"""Flax variables → reference-format PyTorch checkpoints (convert.py reversed).

The reference consumes/produces its zoo as torch ``state_dict`` pairs
(``encoder_epoch_N.pth`` / ``decoder_epoch_N.pth``,
/root/reference/train.py:74-89, loaded by the builders with
``load_state_dict`` at /root/reference/mit_semseg/models/models.py:106-109,
153-156). ``convert.py`` maps those onto our flax trees; this module is the
exact inverse, so a model trained (or fine-tuned) on TPU can be handed back
to users of the reference as drop-in ``.pth`` files.

Inverse transforms:

* conv kernels: flax HWIO → torch OIHW (transpose 3, 2, 0, 1) — lossless;
* BN params ``scale/bias`` → ``weight/bias``;
* BN stats: we store the *normalized* running stats plus the bias-correction
  accumulator ``iter``; the reference stores the raw accumulators and
  recomputes ``running = tmp / iter`` every train forward
  (batchnorm.py:134-137), so ``_tmp_running_{mean,var} = running_{mean,var}
  * iter`` and ``_running_iter = iter`` reconstructs its buffers exactly;
* ``num_batches_tracked`` (registered by torch ``_BatchNorm`` but unused by
  the reference SyncBN forward, which has fixed momentum 0.001) is emitted
  as 0 so ``load_state_dict(strict=True)`` passes.

The torch key for every leaf comes from the SAME per-family path-translation
tables convert.py uses, so the two directions cannot drift apart.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from .convert import (
    ENCODER_PREFIX_FN,
    _decoder_torch_prefix,
    _encoder_family,
)


def _iter_component_leaves(variables, component: str):
    """Yield ``(collection, mod_path, leaf_name, ndarray)`` for one component."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    for keypath, leaf in flat:
        names = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        coll, names = names[0], names[1:]
        if not names or names[0] != component:
            continue
        yield coll, names[1:-1], names[-1], np.asarray(leaf)


def export_component(
    variables,
    *,
    arch: str,
    component: str,  # 'encoder' | 'decoder'
) -> Dict[str, np.ndarray]:
    """Export one component's params/batch_stats as a torch-keyed dict.

    Values are float32 numpy arrays (int64 for ``num_batches_tracked``),
    keyed exactly like the reference module's ``state_dict()``.
    """
    prefix_fn = (
        (lambda p: _decoder_torch_prefix(p, arch.lower()))
        if component == "decoder"
        else ENCODER_PREFIX_FN[_encoder_family(arch)]
    )

    out: Dict[str, np.ndarray] = {}
    iters: Dict[str, np.ndarray] = {}  # BN prefix -> iter scalar
    for coll, mod_path, leaf_name, arr in _iter_component_leaves(
        variables, component
    ):
        if coll == "params":
            if leaf_name == "kernel":
                # Same prefix rule as convert_component: bare Conv modules
                # (e.g. decoder conv_last) carry the kernel directly.
                prefix = (
                    prefix_fn(mod_path + ("conv",))
                    if mod_path and mod_path[-1] not in ("conv",)
                    else prefix_fn(mod_path)
                )
                out[f"{prefix}.weight"] = np.ascontiguousarray(
                    np.transpose(arr, (3, 2, 0, 1)).astype(np.float32)
                )
            elif leaf_name == "scale":
                out[f"{prefix_fn(mod_path)}.weight"] = arr.astype(np.float32)
            elif leaf_name == "bias":
                out[f"{prefix_fn(mod_path)}.bias"] = arr.astype(np.float32)
            else:
                raise KeyError((mod_path, leaf_name))
        elif coll == "batch_stats":
            prefix = prefix_fn(mod_path)
            if leaf_name == "mean":
                out[f"{prefix}.running_mean"] = arr.astype(np.float32)
            elif leaf_name == "var":
                out[f"{prefix}.running_var"] = arr.astype(np.float32)
            elif leaf_name == "iter":
                iters[prefix] = arr.astype(np.float32)
            else:
                raise KeyError((mod_path, leaf_name))

    # Reconstruct the SyncBN accumulator buffers (batchnorm.py:50-54):
    # tmp = running * iter; iter itself is a shape-(1,) buffer.
    for key in [k for k in out if k.endswith(".running_mean")]:
        prefix = key[: -len(".running_mean")]
        it = np.float32(iters.get(prefix, np.float32(1.0)))
        out[f"{prefix}._tmp_running_mean"] = (
            out[f"{prefix}.running_mean"] * it
        ).astype(np.float32)
        out[f"{prefix}._tmp_running_var"] = (
            out[f"{prefix}.running_var"] * it
        ).astype(np.float32)
        out[f"{prefix}._running_iter"] = np.reshape(it, (1,))
        out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)
    return out


def export_state_dicts(
    variables,
    *,
    arch_encoder: str,
    arch_decoder: str,
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Export (encoder_state_dict, decoder_state_dict) as torch-keyed dicts."""
    enc = export_component(variables, arch=arch_encoder, component="encoder")
    dec = export_component(variables, arch=arch_decoder, component="decoder")
    return enc, dec


def save_reference_checkpoints(
    variables,
    out_dir: str,
    *,
    arch_encoder: str,
    arch_decoder: str,
    epoch: int = 20,
) -> Tuple[str, str]:
    """Write ``encoder_epoch_N.pth`` / ``decoder_epoch_N.pth`` into out_dir.

    The files are ``torch.save``'d raw state_dicts — the exact on-disk
    format the reference's train.py:74-89 produces and its eval/test CLIs
    consume via ``MODEL.weights_{encoder,decoder}``.
    """
    import torch

    enc, dec = export_state_dicts(
        variables, arch_encoder=arch_encoder, arch_decoder=arch_decoder
    )
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, sd in (("encoder", enc), ("decoder", dec)):
        path = os.path.join(out_dir, f"{name}_epoch_{epoch}.pth")
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)
        paths.append(path)
    return tuple(paths)
