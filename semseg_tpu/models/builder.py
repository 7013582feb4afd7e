"""ModelBuilder: string-keyed encoder/decoder factories.

Mirrors the reference's ``ModelBuilder``
(``/root/reference/mit_semseg/models/models.py:50-157``): the same
architecture keys build the same networks. Differences forced by the
functional paradigm: builders return flax modules; parameters are created
with ``init_variables`` and weights are loaded explicitly (torch ``.pth``
checkpoints via ``semseg_tpu.models.convert``, native checkpoints via
orbax) instead of mutating a module in place.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import decoders as dec
from . import hrnet as hrnet_mod
from . import mobilenet as mobilenet_mod
from . import resnet as resnet_mod
from .segmentation import SegmentationModel

# Stage output channels per encoder arch (for UPerNet fpn_inplanes and the
# deep-supervision branch which reads conv_out[-2]).
ENCODER_CHANNELS = {
    "mobilenetv2dilated": (24, 32, 64, 160, 320),
    "resnet18": (64, 128, 256, 512),
    "resnet18dilated": (64, 128, 256, 512),
    "resnet50": (256, 512, 1024, 2048),
    "resnet50dilated": (256, 512, 1024, 2048),
    "resnet101": (256, 512, 1024, 2048),
    "resnet101dilated": (256, 512, 1024, 2048),
    "resnext101": (256, 512, 1024, 2048),
    "hrnetv2": (720,),
}


class ModelBuilder:
    @staticmethod
    def build_encoder(
        arch: str = "resnet50dilated",
        fc_dim: int = 512,
        weights: str = "",
        *,
        dtype: Any = jnp.float32,
        axis_name: Optional[str] = None,
        remat: bool = False,
    ):
        """Build an encoder module by architecture key (models.py:63-110)."""
        arch = arch.lower()
        kw = dict(dtype=dtype, axis_name=axis_name)
        if arch == "mobilenetv2dilated":
            return mobilenet_mod.mobilenetv2dilated(**kw)
        kw_res = dict(kw, remat=remat)
        if arch == "resnet18":
            return resnet_mod.resnet18(**kw_res)
        if arch == "resnet18dilated":
            return resnet_mod.resnet18(dilate_scale=8, **kw_res)
        if arch in ("resnet34", "resnet34dilated"):
            raise NotImplementedError(arch)
        if arch == "resnet50":
            return resnet_mod.resnet50(**kw_res)
        if arch == "resnet50dilated":
            return resnet_mod.resnet50(dilate_scale=8, **kw_res)
        if arch == "resnet101":
            return resnet_mod.resnet101(**kw_res)
        if arch == "resnet101dilated":
            return resnet_mod.resnet101(dilate_scale=8, **kw_res)
        if arch == "resnext101":
            return resnet_mod.resnext101(**kw_res)
        if arch == "hrnetv2":
            return hrnet_mod.hrnetv2(**kw)
        raise ValueError(f"Architecture undefined: {arch!r}")

    @staticmethod
    def build_decoder(
        arch: str = "ppm_deepsup",
        fc_dim: int = 512,
        num_class: int = 150,
        weights: str = "",
        use_softmax: bool = False,  # accepted for API parity; inference mode
        *,                          # is selected per-call via seg_size instead
        encoder_arch: Optional[str] = None,
        dtype: Any = jnp.float32,
        axis_name: Optional[str] = None,
    ):
        """Build a decoder module by architecture key (models.py:112-157)."""
        arch = arch.lower()
        kw = dict(num_class=num_class, fc_dim=fc_dim, dtype=dtype, axis_name=axis_name)
        if arch == "c1_deepsup":
            return dec.C1DeepSup(**kw)
        if arch == "c1":
            return dec.C1(**kw)
        if arch == "ppm":
            return dec.PPM(**kw)
        if arch == "ppm_deepsup":
            return dec.PPMDeepsup(**kw)
        if arch in ("upernet", "upernet_lite"):
            fpn_inplanes = ENCODER_CHANNELS.get(
                (encoder_arch or "resnet50").lower(), (256, 512, 1024, 2048)
            )
            return dec.UPerNet(
                fpn_inplanes=fpn_inplanes,
                fpn_dim=512 if arch == "upernet" else 256,
                **kw,
            )
        raise ValueError(f"Architecture undefined: {arch!r}")

    @staticmethod
    def build_model(cfg, *, dtype: Any = None, axis_name: Optional[str] = None):
        """Assemble the full SegmentationModel from a config node."""
        if dtype is None:
            dtype = jnp.dtype(cfg.TPU.compute_dtype) if "TPU" in cfg else jnp.float32
        encoder = ModelBuilder.build_encoder(
            cfg.MODEL.arch_encoder,
            cfg.MODEL.fc_dim,
            dtype=dtype,
            axis_name=axis_name,
            remat=bool(cfg.TPU.remat) if "TPU" in cfg else False,
        )
        decoder = ModelBuilder.build_decoder(
            cfg.MODEL.arch_decoder,
            fc_dim=cfg.MODEL.fc_dim,
            num_class=cfg.DATASET.num_class,
            encoder_arch=cfg.MODEL.arch_encoder,
            dtype=dtype,
            axis_name=axis_name,
        )
        deep_sup = (
            cfg.TRAIN.deep_sup_scale
            if cfg.MODEL.arch_decoder.endswith("deepsup") and "TRAIN" in cfg
            else None
        )
        return SegmentationModel(
            encoder=encoder,
            decoder=decoder,
            deep_sup_scale=deep_sup,
            fix_bn=bool(cfg.TRAIN.fix_bn) if "TRAIN" in cfg else False,
        )


def init_variables(
    model: SegmentationModel,
    *,
    seed: int = 0,
    image_size=(64, 64),
    label_downsample: int = None,
):
    """Initialize parameters and batch statistics with a dummy forward.

    ``label_downsample`` must equal the decoder's training output stride
    (cfg.DATASET.segm_downsampling_rate: 8 for dilated+PPM/C1 configs, 4 for
    UPerNet/HRNet); inferred from the decoder when omitted.
    """
    if label_downsample is None:
        # UPerNet fuses at 1/4; HRNet's C1 head also sits at 1/4.
        if isinstance(model.decoder, dec.UPerNet) or type(
            model.encoder
        ).__name__ == "HRNetV2":
            label_downsample = 4
        elif getattr(model.encoder, "dilate_scale", None) in (8, 16):
            label_downsample = model.encoder.dilate_scale
        else:
            label_downsample = 32  # undilated resnet + C1/PPM head
    img = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
    label = jnp.zeros(
        (1, image_size[0] // label_downsample, image_size[1] // label_downsample),
        jnp.int32,
    )

    def do_init():
        return model.init(
            {
                "params": jax.random.PRNGKey(seed),
                "dropout": jax.random.PRNGKey(seed + 1),
            },
            img,
            seg_label=label,
            train=True,
        )

    # Initialize on the CPU backend when available: param init is tiny
    # compute, but compiling the init program on a remote TPU costs minutes.
    # The result is then moved to the default (accelerator) device — CRITICAL,
    # since CPU-committed params would silently pin every later jit to CPU.
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None and jax.default_backend() != "cpu":
        # Bracket the CPU-side init with the persistent compilation cache
        # OFF: XLA:CPU executables serialized from an accelerator-backend
        # process carry LLVM *tuning* features (+prefer-no-gather/-scatter
        # on gather-slow Intel models) that the AOT loader's host-feature
        # check can never satisfy, so every reload fails with
        # cpu_aot_loader "machine feature not supported" spam and a forced
        # recompile — the cache can only ever cost time for these tiny
        # init programs (observed in the round-4 bench timeout).
        def _reset_cache_memo():
            # jax memoizes the cache-in-use decision at first compile
            # (compilation_cache.is_cache_used's _cache_checked global),
            # so flipping the config alone is a no-op once anything has
            # compiled; reset_cache() drops the memo so the new setting
            # actually takes effect (observed: RNG init programs kept
            # persisting despite the disable).
            try:
                from jax._src import compilation_cache as _cc

                _cc.reset_cache()
            except Exception:
                pass  # private API drifted: worst case is stderr spam

        prev = jax.config.jax_enable_compilation_cache
        jax.config.update("jax_enable_compilation_cache", False)
        _reset_cache_memo()
        try:
            with jax.default_device(cpu):
                variables = jax.tree.map(np.asarray, do_init())
        finally:
            jax.config.update("jax_enable_compilation_cache", prev)
            _reset_cache_memo()
        # local_devices, not devices: on a multi-host run the first GLOBAL
        # device belongs to process 0 and is not addressable elsewhere.
        return jax.device_put(variables, jax.local_devices()[0])
    return do_init()
