"""Vision Transformer backbone (mmseg-compatible surface).

Parity with the reference's registered-but-optional ViT
(``mmseg_/models/backbones/vit.py:207-472``): patch embedding, learned
position embeddings with bilinear resize for mismatched input sizes
(:371-431), pre-norm encoder blocks, selected-layer outputs reshaped to
NHWC feature maps.  Attention runs as one batched matmul per head group —
ideal MXU shape; sequence lengths here (e.g. 14x14+1) are tiny so no
flash-attention machinery is needed.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cp2_tpu.models.registry import BACKBONES

Dtype = Any


class TransformerBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        dim = x.shape[-1]
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            deterministic=not train,
            dropout_rate=self.drop_rate,
            name="attn",
        )(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        y = nn.Dense(int(dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(dim, dtype=self.dtype, name="fc2")(y)
        if self.drop_rate > 0:
            y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
        return x + y


@BACKBONES.register
class VisionTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    embed_dims: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (11,)
    drop_rate: float = 0.0
    with_cls_token: bool = True
    final_norm: bool = True
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = True) -> Tuple[jax.Array, ...]:
        n, h, w, _ = x.shape
        p = self.patch_size
        x = nn.Conv(
            self.embed_dims, (p, p), strides=(p, p), dtype=self.dtype,
            name="patch_embed",
        )(x.astype(self.dtype))
        gh, gw = x.shape[1], x.shape[2]
        tokens = x.reshape(n, gh * gw, self.embed_dims)

        base_grid = self.img_size // p
        pos_len = base_grid * base_grid + (1 if self.with_cls_token else 0)
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, pos_len, self.embed_dims),
        )
        if self.with_cls_token:
            cls = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, self.embed_dims)
            )
            cls_pos, grid_pos = pos_embed[:, :1], pos_embed[:, 1:]
        else:
            cls = None
            cls_pos, grid_pos = None, pos_embed

        # bilinear pos-embed resize for non-default input sizes (vit.py:371-431)
        if (gh, gw) != (base_grid, base_grid):
            grid_pos = jax.image.resize(
                grid_pos.reshape(1, base_grid, base_grid, self.embed_dims),
                (1, gh, gw, self.embed_dims),
                method="bilinear",
            ).reshape(1, gh * gw, self.embed_dims)

        tokens = tokens + grid_pos.astype(self.dtype)
        if cls is not None:
            cls_tok = jnp.broadcast_to(
                cls + cls_pos, (n, 1, self.embed_dims)
            ).astype(self.dtype)
            tokens = jnp.concatenate([cls_tok, tokens], axis=1)
        if self.drop_rate > 0:
            tokens = nn.Dropout(self.drop_rate, deterministic=not train)(tokens)

        outs = []
        for i in range(self.num_layers):
            tokens = TransformerBlock(
                self.num_heads, self.mlp_ratio, self.drop_rate,
                dtype=self.dtype, name=f"block_{i}",
            )(tokens, train=train)
            if i in self.out_indices:
                y = tokens
                if i == self.num_layers - 1 and self.final_norm:
                    y = nn.LayerNorm(dtype=jnp.float32, name="final_norm")(y)
                grid = y[:, 1:] if self.with_cls_token else y
                outs.append(
                    grid.reshape(n, gh, gw, self.embed_dims).astype(self.dtype)
                )
        return tuple(outs)
