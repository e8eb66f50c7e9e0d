"""The SSL encoder module: segmentor + variant-specific projection heads.

Functional re-design of the reference's dual-encoder ``MODEL``
(builder.py:277-553).  The reference instantiates two stateful encoders
(query + EMA key); here there is ONE module definition and two parameter
trees (``params`` / ``ema_params``) in the train state — the key path is
the same pure function applied to the EMA tree under stop_gradient.

Forward modes (selected statically):
  * ``dense``    — full segmentor, contrast head output (CP2 path,
                   reference encoder_q(img) via the img_metas=None hook).
  * ``backbone`` — stage-4 backbone features (DenseCL/MoCo/BYOL input).
  * ``global``   — backbone -> flattened projector (MoCo/BYOL embedding).
  * ``densecl``  — backbone -> DenseCLNeck dict of projections.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from cp2_tpu.models.encoder_decoder import EncoderDecoder
from cp2_tpu.models.necks import DenseCLNeck, GlobalProjector
from cp2_tpu.models.layers import MLP
from cp2_tpu.models.unet import UNetEncoderOnly, UNetTruncated
from cp2_tpu.types import BackboneType, PretrainType


def output_stride_of(model_cfg: dict) -> int:
    """Static output stride from a segmentor config (stem /4 × stage strides).

    Replaces the reference's runtime probe with a dummy forward
    (builder.py:392-402).
    """
    strides = model_cfg["backbone"].get("strides", (1, 2, 2, 2))
    return 4 * int(math.prod(strides))


class SSLEncoder(nn.Module):
    model_cfg: dict = None
    pretrain_type: PretrainType = PretrainType.CP2
    backbone_type: BackboneType = BackboneType.DEEPLABV3
    dim: int = 128
    unet_truncated_dec_blocks: int = 2
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    def setup(self):
        if self.backbone_type == BackboneType.DEEPLABV3:
            head = (self.model_cfg or {}).get("decode_head", {})
            contrast_dim = head.get("contrast_dim", 128)
            if head.get("contrast", False) and contrast_dim != self.dim:
                # the dense queue is (K, dim); a mismatched projector width
                # would only surface later as an opaque einsum shape error
                # (the reference hard-codes dim=128 in both places,
                # main.py:404 + configs/config_pretrain.py contrast_dim)
                raise ValueError(
                    f"decode_head.contrast_dim={contrast_dim} must equal the "
                    f"SSL embedding dim={self.dim} (queue width)"
                )
            cfg = dict(self.model_cfg)
            cfg.pop("type", None)
            cfg.pop("dtype", None)
            cfg.pop("axis_name", None)
            self.encoder = EncoderDecoder(
                **cfg, dtype=self.dtype, axis_name=self.axis_name
            )
        elif self.backbone_type == BackboneType.UNET_ENCODER_ONLY:
            self.encoder = UNetEncoderOnly(projector_dim=self.dim, dtype=self.dtype)
        elif self.backbone_type == BackboneType.UNET_TRUNCATED:
            self.encoder = UNetTruncated(
                projector_dim=self.dim,
                num_decoder_blocks=self.unet_truncated_dec_blocks,
                dtype=self.dtype,
            )
        else:
            raise NotImplementedError(f"{self.backbone_type = }")

        if self.pretrain_type in (PretrainType.MOCO, PretrainType.BYOL):
            self.projector = GlobalProjector(
                hidden=2048,
                out=self.dim,
                use_bn=self.pretrain_type == PretrainType.BYOL,
                dtype=self.dtype,
            )
            self.predictor = MLP(
                hidden=2048,
                out=self.dim,
                use_bn=self.pretrain_type == PretrainType.BYOL,
                dtype=self.dtype,
            )
        if self.pretrain_type in (PretrainType.DENSECL, PretrainType.PROPOSED_V2):
            self.neck = DenseCLNeck(
                in_channels=2048, hid_channels=2048, out_channels=self.dim,
                dtype=self.dtype,
            )

    def __call__(self, img, *, train: bool = True):
        """Default path: dense embeddings (keeps init simple)."""
        return self.dense(img, train=train)

    def dense(self, img, *, train: bool = True):
        # every backbone type routes through its encoder's default forward
        # (EncoderDecoder contrast head / U-Net projector respectively)
        return self.encoder(img, train=train)

    def backbone_feats(self, img, *, train: bool = True):
        if self.backbone_type != BackboneType.DEEPLABV3:
            raise NotImplementedError("backbone features require DEEPLABV3")
        return self.encoder.extract_feat(img, train=train)[-1]

    def global_embed(self, img, *, train: bool = True):
        if self.backbone_type != BackboneType.DEEPLABV3:
            # parity: the reference's MoCo/BYOL forwards assume the
            # segmentor's ResNet + flat projector and crash on UNET_*
            # (builder.py:1015-1016 vs the conv projectors at :96-101)
            raise NotImplementedError("global embedding requires DEEPLABV3")
        feats = self.encoder.extract_feat(img, train=train)
        return self.projector(feats[-1], train=train)

    def predict(self, z, *, train: bool = True):
        return self.predictor(z, train=train)

    def densecl_embed(self, img, *, train: bool = True):
        if self.backbone_type != BackboneType.DEEPLABV3:
            raise NotImplementedError("DenseCL embedding requires DEEPLABV3")
        feats = self.encoder.extract_feat(img, train=train)
        return self.neck(feats[-1], train=train), feats[-1]

    def init_all(self, img):
        """Touch every branch the configured variant uses, so ``init``
        creates the full parameter tree (query and key share one tree)."""
        out = self.dense(img, train=False)
        if self.pretrain_type in (PretrainType.MOCO, PretrainType.BYOL):
            z = self.global_embed(img, train=False)
            self.predict(z, train=False)
        if self.pretrain_type in (PretrainType.DENSECL, PretrainType.PROPOSED_V2):
            self.densecl_embed(img, train=False)
        return out
