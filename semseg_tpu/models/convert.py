"""PyTorch checkpoint → flax variables converter.

The reference publishes its ADE20K zoo as torch ``state_dict`` files
(``encoder_epoch_N.pth`` / ``decoder_epoch_N.pth``, train.py:74-89; download
URLs in README.md:12-13). This module maps those checkpoints onto this
framework's parameter trees so converted models reproduce the published
mIoU/accuracy numbers.

Key transforms:
* conv kernels: torch OIHW → flax HWIO (transpose 2,3,1,0);
* BN: ``weight/bias`` → params ``scale/bias``; ``running_mean/running_var`` →
  batch_stats ``mean/var``; ``_running_iter`` (the reference SyncBN's
  bias-correction accumulator, batchnorm.py:52) → ``iter`` when present;
* module-path translation tables per architecture family (the flax modules
  are named so this mapping is mechanical — see the model files).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Path translation: flax module path (tuple of names) -> torch key prefix
# ---------------------------------------------------------------------------

def _resnet_prefix(path):
    """ResNet/ResNeXt encoders (mit_semseg/models/resnet.py, resnext.py)."""
    m = re.fullmatch(r"stem(\d)", path[0])
    if m:
        which = {"conv": "conv", "bn": "bn"}[path[1]]
        return f"{which}{m.group(1)}"
    m = re.fullmatch(r"layer(\d)_(\d+)", path[0])
    if m:
        base = f"layer{m.group(1)}.{m.group(2)}"
        sub = path[1]
        if sub == "downsample":
            return f"{base}.downsample.{0 if path[2] == 'conv' else 1}"
        i = sub[2:]  # cb1 -> 1
        return f"{base}.{'conv' if path[2] == 'conv' else 'bn'}{i}"
    raise KeyError(path)


def _mobilenet_prefix(path):
    """MobileNetV2 encoder (mit_semseg/models/mobilenet.py)."""
    m = re.fullmatch(r"features_(\d+)", path[0])
    idx = int(m.group(1))
    if idx == 0:
        return f"features.0.{0 if path[1] == 'conv' else 1}"
    # InvertedResidual Sequential indices: t==1 -> dw at 0, project at 3;
    # t!=1 -> expand 0, dw 3, project 6 (mobilenet.py:47-70).
    t1 = idx == 1
    seq = {"dw": 0, "project": 3} if t1 else {"expand": 0, "dw": 3, "project": 6}
    base = seq[path[1]]
    return f"features.{idx}.conv.{base if path[2] == 'conv' else base + 1}"


def _hrnet_prefix(path):
    """HRNetV2 encoder (mit_semseg/models/hrnet.py)."""
    p0 = path[0]
    m = re.fullmatch(r"stem(\d)", p0)
    if m:
        return f"{'conv' if path[1] == 'conv' else 'bn'}{m.group(1)}"
    m = re.fullmatch(r"layer1_(\d+)", p0)
    if m:
        base = f"layer1.{m.group(1)}"
        if path[1] == "downsample":
            return f"{base}.downsample.{0 if path[2] == 'conv' else 1}"
        return f"{base}.{'conv' if path[2] == 'conv' else 'bn'}{path[1][2:]}"
    m = re.fullmatch(r"transition(\d)_(\d+)(?:_(\d+))?", p0)
    if m:
        s, i, j = m.group(1), m.group(2), m.group(3)
        off = 0 if path[1] == "conv" else 1
        if j is None:
            # Width-adapt transitions are Sequential(conv, bn, relu); but
            # new-branch chains wrap each step in its own Sequential.
            # transition1 branch 0/1 adapt: transition1.{i}.0/.1
            # new branch (i >= prev): transition{s}.{i}.{j}.0/.1 — handled
            # below via the captured j.
            return f"transition{s}.{i}.{off}"
        return f"transition{s}.{i}.{j}.{off}"
    m = re.fullmatch(r"stage(\d)_(\d+)", p0)
    if m:
        base = f"stage{m.group(1)}.{m.group(2)}"
        p1 = path[1]
        mb = re.fullmatch(r"branch(\d+)_(\d+)", p1)
        if mb:
            blk = f"{base}.branches.{mb.group(1)}.{mb.group(2)}"
            if path[2] == "downsample":
                return f"{blk}.downsample.{0 if path[3] == 'conv' else 1}"
            return f"{blk}.{'conv' if path[3] == 'conv' else 'bn'}{path[2][2:]}"
        mf = re.fullmatch(r"fuse(\d+)_(\d+)(?:_(\d+))?", p1)
        if mf:
            i, j, k = mf.group(1), mf.group(2), mf.group(3)
            off = 0 if path[2] == "conv" else 1
            if k is None:
                return f"{base}.fuse_layers.{i}.{j}.{off}"
            return f"{base}.fuse_layers.{i}.{j}.{k}.{off}"
    raise KeyError(path)


def _decoder_prefix(path):
    """Decoders (mit_semseg/models/models.py:327-586)."""
    p0 = path[0]
    # C1 family: cbr / cbr_deepsup are conv3x3_bn_relu Sequentials.
    if p0 in ("cbr", "cbr_deepsup"):
        return f"{p0}.{0 if path[1] == 'conv' else 1}"
    if p0 in ("conv_last_deepsup",):
        return p0
    m = re.fullmatch(r"ppm_(\d+)", p0)
    if m:
        # PPM branch Sequential: AdaptiveAvgPool2d(0), Conv(1), BN(2).
        return f"ppm.{m.group(1)}.{1 if path[2] == 'conv' else 2}"
    m = re.fullmatch(r"ppm_conv_(\d+)", p0)
    if m:  # UPerNet: ppm_conv.{i} = Sequential(Conv(0), BN(1)).
        return f"ppm_conv.{m.group(1)}.{0 if path[1] == 'conv' else 1}"
    if p0 == "ppm_last_conv":
        return f"ppm_last_conv.{0 if path[1] == 'conv' else 1}"
    m = re.fullmatch(r"fpn_in_(\d+)", p0)
    if m:
        return f"fpn_in.{m.group(1)}.{0 if path[1] == 'conv' else 1}"
    m = re.fullmatch(r"fpn_out_(\d+)", p0)
    if m:  # fpn_out.{i} = Sequential(conv3x3_bn_relu) -> extra .0 level.
        return f"fpn_out.{m.group(1)}.0.{0 if path[1] == 'conv' else 1}"
    if p0 == "conv_last_cbr":
        # PPM: conv_last Sequential(Conv 0, BN 1, ReLU, Dropout, Conv 4);
        # UPerNet: conv_last Sequential(conv3x3_bn_relu 0, Conv 1).
        return ("_PPM_CONV_LAST_CBR", path[1])  # resolved by caller
    if p0 == "conv_last":
        return "_CONV_LAST"  # resolved by caller
    raise KeyError(path)


ENCODER_PREFIX_FN = {
    "resnet": _resnet_prefix,
    "mobilenet": _mobilenet_prefix,
    "hrnet": _hrnet_prefix,
}


def _encoder_family(arch: str) -> str:
    arch = arch.lower()
    if arch.startswith("mobilenet"):
        return "mobilenet"
    if arch.startswith("hrnet"):
        return "hrnet"
    return "resnet"


def _decoder_torch_prefix(path, arch: str):
    out = _decoder_prefix(path)
    is_upernet = arch.startswith("upernet")
    if isinstance(out, tuple) and out[0] == "_PPM_CONV_LAST_CBR":
        which = out[1]
        if is_upernet:
            return f"conv_last.0.{0 if which == 'conv' else 1}"
        return f"conv_last.{0 if which == 'conv' else 1}"
    if out == "_CONV_LAST":
        if is_upernet:
            return "conv_last.1"
        if arch.startswith("ppm"):
            return "conv_last.4"
        return "conv_last"
    return out


# ---------------------------------------------------------------------------
# Conversion
# ---------------------------------------------------------------------------

#: Dict keys under which published checkpoints commonly nest the weights
#: (torch.save'd training dicts, mmcv/detectron-style exports).
_STATE_DICT_WRAPPER_KEYS = ("state_dict", "model_state", "model", "net")


def normalize_state_dict(state) -> Dict[str, np.ndarray]:
    """Normalize a loaded torch checkpoint object into ``{key: ndarray}``.

    Handles the formats found in the wild for the reference zoo
    (cf. /root/reference/mit_semseg/models/utils.py:10-18 and the
    DataParallel-trained checkpoints train.py:74-89 produces):

    * a full ``nn.Module`` (``.state_dict()`` is taken);
    * a wrapper dict ``{'state_dict': ...}`` / ``{'model': ...}`` etc.;
    * ``module.``-prefixed keys from ``nn.DataParallel``-wrapped saves;
    * tensor values → numpy (non-tensor metadata entries are dropped).

    Classifier extras (``fc.*`` / ``classifier.*``) are kept — the converter
    ignores torch keys it doesn't need, mirroring the reference builders'
    ``load_state_dict(strict=False)`` (mit_semseg/models/models.py:106-109).
    """
    if hasattr(state, "state_dict") and callable(state.state_dict):
        state = state.state_dict()
    if not isinstance(state, Mapping):
        raise TypeError(f"unsupported checkpoint object: {type(state)!r}")

    def _is_tensor_dict(d):
        return (
            isinstance(d, Mapping)
            and len(d) > 0
            and all(
                hasattr(v, "numpy") or isinstance(v, np.ndarray)
                for v in d.values()
            )
        )

    def _has_tensors(d):
        return isinstance(d, Mapping) and any(
            hasattr(v, "numpy") or isinstance(v, np.ndarray)
            for v in d.values()
        )

    if not _is_tensor_dict(state):
        for key in _STATE_DICT_WRAPPER_KEYS:
            inner = state.get(key)
            # _has_tensors, not _is_tensor_dict: wrapped state_dicts can
            # themselves carry metadata entries, e.g.
            # torch.save({'state_dict': {**sd, 'epoch': 3}}) — the
            # conversion loop drops the non-tensor entries.
            if _has_tensors(inner):
                state = inner
                break
        else:
            # A flat state_dict with non-tensor metadata mixed in (e.g.
            # torch.save({'epoch': 3, **model.state_dict()})): fall through
            # to the conversion loop, which drops the metadata entries.
            if not _has_tensors(state):
                raise KeyError(
                    "checkpoint is not a state_dict and has no recognized "
                    f"wrapper key (looked for {_STATE_DICT_WRAPPER_KEYS}); "
                    f"top-level keys: {sorted(state)[:10]}"
                )

    out: Dict[str, np.ndarray] = {}
    for k, v in state.items():
        if not (hasattr(v, "numpy") or isinstance(v, np.ndarray)):
            continue  # step counters / metadata alongside tensors
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into a flat ``{key: ndarray}`` dict.

    Accepts raw state_dicts, ``{'state_dict': ...}``-style wrappers, and
    ``module.``-prefixed DataParallel saves (see `normalize_state_dict`).
    """
    import logging
    import pickle

    import torch

    try:
        state = torch.load(path, map_location="cpu", weights_only=True)
    except (pickle.UnpicklingError, RuntimeError, AttributeError):
        # Older zoo files contain pickled nn.Module objects (or legacy
        # pre-zipfile formats) that weights_only rejects — the rejection
        # surfaces as UnpicklingError or RuntimeError depending on torch
        # version/format. Full unpickling executes code from the file —
        # retry loudly so the trust decision is visible.
        logging.getLogger("Logger").warning(
            "%s is not a weights-only checkpoint; falling back to full "
            "unpickling (only do this for files you trust)", path,
        )
        state = torch.load(path, map_location="cpu", weights_only=False)
    return normalize_state_dict(state)


def convert_component(
    state: Mapping[str, np.ndarray],
    variables,
    *,
    arch: str,
    component: str,  # 'encoder' | 'decoder'
):
    """Fill one component's params/batch_stats from a torch state_dict.

    ``variables`` is the template ``{'params': ..., 'batch_stats': ...}`` for
    the full SegmentationModel; returns an updated copy. Raises KeyError if a
    needed torch key is missing.
    """
    import jax

    prefix_fn = (
        (lambda p: _decoder_torch_prefix(p, arch.lower()))
        if component == "decoder"
        else ENCODER_PREFIX_FN[_encoder_family(arch)]
    )

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    new_leaves = []
    for keypath, leaf in flat:
        names = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        coll, names = names[0], names[1:]
        if names[0] != component:
            new_leaves.append(leaf)
            continue
        mod_path, leaf_name = names[1:-1], names[-1]
        if coll == "params":
            if leaf_name == "kernel":
                prefix = prefix_fn(mod_path + ("conv",)) if mod_path and mod_path[-1] not in ("conv",) else prefix_fn(mod_path)
                w = state[f"{prefix}.weight"]
                new_leaves.append(jnp.asarray(np.transpose(w, (2, 3, 1, 0))))
            elif leaf_name == "scale":
                prefix = prefix_fn(mod_path)
                new_leaves.append(jnp.asarray(state[f"{prefix}.weight"]))
            elif leaf_name == "bias":
                prefix = prefix_fn(mod_path)
                new_leaves.append(jnp.asarray(state[f"{prefix}.bias"]))
            else:
                raise KeyError((mod_path, leaf_name))
        elif coll == "batch_stats":
            prefix = prefix_fn(mod_path)
            if leaf_name == "mean":
                new_leaves.append(jnp.asarray(state[f"{prefix}.running_mean"]))
            elif leaf_name == "var":
                new_leaves.append(jnp.asarray(state[f"{prefix}.running_var"]))
            elif leaf_name == "iter":
                it = state.get(f"{prefix}._running_iter")
                # default float dtype: f32 normally, f64 under the x64 oracle
                new_leaves.append(
                    jnp.asarray(
                        it.reshape(()) if it is not None else 1.0,
                        jnp.result_type(float),
                    )
                )
            else:
                raise KeyError((mod_path, leaf_name))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def convert_checkpoints(
    variables,
    *,
    arch_encoder: str,
    arch_decoder: str,
    encoder_state: Mapping[str, np.ndarray] | None = None,
    decoder_state: Mapping[str, np.ndarray] | None = None,
):
    """Convert reference encoder/decoder state_dicts onto a variables tree."""
    if encoder_state is not None:
        variables = convert_component(
            encoder_state, variables, arch=arch_encoder, component="encoder"
        )
    if decoder_state is not None:
        variables = convert_component(
            decoder_state, variables, arch=arch_decoder, component="decoder"
        )
    return variables
