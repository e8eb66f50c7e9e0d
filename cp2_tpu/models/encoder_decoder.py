"""EncoderDecoder segmentor: backbone + decode head combinator.

TPU-native re-design of the reference segmentor
(``mmseg_/models/segmentors/encoder_decoder.py:13-310``).  The reference
has a dual-protocol forward (mmcv train/test protocol vs the raw
``img_metas=None`` hook the SSL layer uses, :137-145); here there is one
pure forward returning head output at feature resolution — segmentation
logits when the head classifies, dense embeddings when ``contrast=True``.
Whole-image and sliding-window inference (:181-243) live in
``cp2_tpu.train.inference`` as jitted wrappers.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from cp2_tpu.models.registry import SEGMENTORS, BACKBONES, HEADS, NECKS


@SEGMENTORS.register
class EncoderDecoder(nn.Module):
    backbone: dict = None
    decode_head: dict = None
    neck: Optional[dict] = None
    auxiliary_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    def setup(self):
        # param-tree keys are named explicitly ("backbone", "decode_head", …)
        # so checkpoints have clean stable paths for the conversion matrix
        bb = dict(self.backbone)
        bb.setdefault("dtype", self.dtype)
        bb.setdefault("axis_name", self.axis_name)
        bb.pop("init_cfg", None)  # checkpoint loading is external param surgery
        self.backbone_mod = BACKBONES.build(bb, name="backbone")

        head = dict(self.decode_head)
        head.setdefault("dtype", self.dtype)
        head.setdefault("axis_name", self.axis_name)
        self.decode_head_mod = HEADS.build(head, name="decode_head")

        self.neck_mod = None
        if self.neck is not None:
            nk = dict(self.neck)
            nk.setdefault("dtype", self.dtype)
            self.neck_mod = NECKS.build(nk, name="neck_mod")

        self.aux_head_mod = None
        if self.auxiliary_head is not None:
            aux = dict(self.auxiliary_head)
            aux.setdefault("dtype", self.dtype)
            aux.setdefault("axis_name", self.axis_name)
            self.aux_head_mod = HEADS.build(aux, name="auxiliary_head")

    def extract_feat(self, img, *, train: bool = True):
        """Backbone stage features (tuple), optionally through the neck."""
        feats = self.backbone_mod(img, train=train)
        if self.neck_mod is not None:
            feats = self.neck_mod(feats, train=train)
        return feats

    def __call__(self, img, *, train: bool = True, with_aux: bool = False):
        """Head output at feature resolution (OS=8/16/32 depending on config)."""
        feats = self.extract_feat(img, train=train)
        out = self.decode_head_mod(feats, train=train)
        if with_aux and self.aux_head_mod is not None:
            return out, self.aux_head_mod(feats, train=train)
        return out
