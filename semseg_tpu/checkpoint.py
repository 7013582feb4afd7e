"""Checkpoint save/restore (orbax) + torch-checkpoint interop.

The reference saves three files per epoch — ``encoder_epoch_N.pth``,
``decoder_epoch_N.pth``, ``history_epoch_N.pth`` (``/root/reference/
train.py:74-89``) — and does NOT checkpoint optimizer state (SURVEY.md §5).
This framework checkpoints the FULL train state (params, batch_stats,
optimizer state, step) with orbax, plus the history dict as JSON, so resume
is exact. Weight paths in configs may point at either:

* a native orbax checkpoint directory (``epoch_N/``), or
* a reference torch ``.pth`` pair, converted on the fly via
  ``semseg_tpu.models.convert``.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def resolve_reference_checkpoint(cfg, name: str) -> None:
    """Point ``cfg.MODEL.weights_*`` at checkpoint ``name`` under cfg.DIR.

    Shared by eval/test/export CLIs. Resolution mirrors the reference
    naming (``encoder_<name>`` / ``decoder_<name>`` .pth pair,
    eval.py:183-188), falling back to the native orbax directory
    ``<name minus .pth>/``. A missing checkpoint raises, as the
    reference's ``assert os.path.exists(...)`` does. No-op when ``name``
    is empty or explicit weight paths are already set.
    """
    if not name or cfg.MODEL.weights_encoder:
        return
    enc = os.path.join(cfg.DIR, "encoder_" + name)
    native = os.path.join(cfg.DIR, name.replace(".pth", ""))
    if os.path.exists(enc):
        cfg.MODEL.weights_encoder = enc
        cfg.MODEL.weights_decoder = os.path.join(cfg.DIR, "decoder_" + name)
    elif os.path.isdir(native):
        cfg.MODEL.weights_encoder = native
    else:
        raise FileNotFoundError(
            f"checkpoint {name!r}: neither {enc} nor {native} exists"
        )


def save_train_state(ckpt_dir: str, epoch: int, state, history: Optional[dict] = None):
    """Save params/batch_stats/opt_state/step under ``ckpt_dir/epoch_N``.

    Multi-host: EVERY process must call this — orbax coordinates the
    distributed write internally (each process contributes its addressable
    shards and joins the commit barrier; a primary-only call would hang on
    that barrier). The history JSON is written by the primary alone.
    """
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch_{epoch}"))
    tree = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    if history is not None and jax.process_index() == 0:
        with open(os.path.join(ckpt_dir, f"history_epoch_{epoch}.json"), "w") as f:
            json.dump(history, f)


class AsyncSaver:
    """Background checkpoint writer for the training loop.

    ``save()`` snapshots the train state ON DEVICE (a cheap HBM-to-HBM
    copy) and returns immediately; the device→host fetch and the orbax
    write run on a single worker thread, overlapping the next epoch's
    steps. The snapshot is what makes this safe: the live state's buffers
    are donated to the next jitted step (train CLI), so a background save
    reading them directly would hit deleted arrays.

    The reference blocks its train loop on three torch.save calls per
    epoch (/root/reference/train.py:74-89); here the loop only pays the
    HBM copy. Worker errors surface at the NEXT ``save()``/``wait()`` —
    call ``wait()`` after the final epoch (the train CLI does).

    Fetches from the worker thread are plain D2H transfers, not
    collectives, so they cannot interleave with the step's collective
    launch order (the invariant documented on ``device_prefetch``).
    """

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor

        import jax.numpy as jnp

        self._pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-save"
        )
        self._pending = []
        # jnp.copy lowers to a copy HLO, so the jit cannot alias its
        # (non-donated) inputs — the outputs are genuinely new buffers.
        self._fused_copy = jax.jit(
            lambda tree: jax.tree.map(jnp.copy, tree)
        )

    def save(self, ckpt_dir: str, epoch: int, state, history=None):
        import copy

        self.wait()  # surface a prior failure before queueing more work
        # The caller keeps appending to history during the next epoch while
        # the worker serializes it — snapshot host-side state too.
        history = copy.deepcopy(history)
        # ONE jitted program for the whole-tree copy: per-leaf jnp.copy
        # costs a dispatch round-trip each (~14 s for the flagship's ~300
        # leaves over the tunneled link); fused it is a single dispatch.
        tree = (state.step, state.params, state.batch_stats, state.opt_state)
        step, params, stats, opt = self._fused_copy(tree)
        snap = state.replace(
            step=step, params=params, batch_stats=stats, opt_state=opt
        )
        # Multi-host: EVERY process runs the snapshot (a jit over the
        # globally-replicated state is an SPMD computation) AND submits the
        # write — orbax coordinates the distributed commit across processes
        # (see save_train_state); its barrier rides the coordination
        # service, not device collectives, so it is worker-thread-safe
        # under the same lockstep-sequence invariant as device_prefetch's
        # canvas exchange.
        self._pending.append(
            self._pool.submit(save_train_state, ckpt_dir, epoch, snap, history)
        )

    def wait(self):
        """Block until every queued save has committed; re-raise failures."""
        pending, self._pending = self._pending, []
        for fut in pending:
            fut.result()

    def close(self):
        try:
            self.wait()
        finally:
            self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def restore_train_state(ckpt_dir: str, epoch: int, state):
    """Restore a full TrainState saved by ``save_train_state``."""
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch_{epoch}"))
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=template)
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )


def save_variables(path: str, variables):
    """Save inference variables ({'params', 'batch_stats'}) standalone."""
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), dict(variables), force=True)


def restore_tree(path: str):
    """Restore a checkpoint as host numpy arrays without a template."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(path).item_metadata
        tree = meta.tree if hasattr(meta, "tree") else meta
        restore_args = jax.tree.map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree
        )
        return ckptr.restore(path, restore_args=restore_args)


def restore_variables(path: str, variables_template):
    """Restore inference variables from either a standalone variables
    checkpoint or a full train-state checkpoint directory."""
    restored = restore_tree(path)
    if "params" not in restored:
        raise ValueError(f"No params in checkpoint {path}")
    out = dict(variables_template)
    out["params"] = restored["params"]
    if "batch_stats" in restored:
        out["batch_stats"] = restored["batch_stats"]
    return out


def load_weights(
    variables,
    *,
    arch_encoder: str,
    arch_decoder: str,
    weights_encoder: str = "",
    weights_decoder: str = "",
    pretrained_encoder: bool = False,
):
    """Load encoder/decoder weights from native or torch checkpoints.

    Mirrors the reference builders' ``weights`` handling
    (models.py:106-109, 153-156). With ``pretrained_encoder`` and no
    explicit ``weights_encoder``, the encoder initializes from the
    published ImageNet backbone (downloaded + converted) — the reference's
    ``pretrained = len(weights) == 0`` default (models.py:65); offline it
    warns and keeps random init instead of crashing.
    """
    from semseg_tpu.models.convert import convert_checkpoints, load_torch_checkpoint

    enc_state = dec_state = None
    if pretrained_encoder and not weights_encoder:
        from semseg_tpu.models.utils import imagenet_backbone

        path = imagenet_backbone(arch_encoder)
        if path:
            enc_state = load_torch_checkpoint(path)
    for which, path in (("enc", weights_encoder), ("dec", weights_decoder)):
        if not path:
            continue
        if os.path.isdir(path):
            variables = restore_variables(path, variables)
        elif path.endswith((".pth", ".pth.tar", ".pt")):
            state = load_torch_checkpoint(path)
            if which == "enc":
                enc_state = state
            else:
                dec_state = state
        else:
            raise ValueError(f"Unrecognized checkpoint: {path!r}")
    if enc_state is not None or dec_state is not None:
        variables = convert_checkpoints(
            variables,
            arch_encoder=arch_encoder,
            arch_decoder=arch_decoder,
            encoder_state=enc_state,
            decoder_state=dec_state,
        )
    return variables
