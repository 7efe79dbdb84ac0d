"""ResNet grid encoder for the image branch (reference: ModifiedResnet,
image_model.py:14-124).

The reference reshapes torchvision's layer4 output into a 7x7=49-slot grid,
projects it with a bias-free Linear to the transformer width, and adds a
learned 49-slot location embedding (image_model.py:35-41, 107-115). Same
design here, in NHWC (TPU-native conv layout) flax:

    images [B, 224, 224, 3] -> grid [B, 49, embed_dim]

Depth map follows the reference CLI contract (--img-depth, image_model.py:85-98):
1=resnet18, 2=resnet34, 3=resnet50, 4=resnet101, 5=resnet152, 6=resnext101_32x8d.

BatchNorm runs in inference mode by default (use_running_average=True);
the captioning train step passes train=True and threads the batch_stats
collection. Weight freezing (--freeze, image_model.py:104-105) is implemented
with stop_gradient at the call site, not parameter surgery.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any

DEPTHS = {
    1: ("basic", (2, 2, 2, 2), 1, 64),      # resnet18
    2: ("basic", (3, 4, 6, 3), 1, 64),      # resnet34
    3: ("bottleneck", (3, 4, 6, 3), 1, 64),  # resnet50
    4: ("bottleneck", (3, 4, 23, 3), 1, 64),  # resnet101
    5: ("bottleneck", (3, 8, 36, 3), 1, 64),  # resnet152
    6: ("bottleneck", (3, 4, 23, 3), 32, 8),  # resnext101_32x8d
}


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    groups: int = 1
    width_per_group: int = 64
    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = self.norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    groups: int = 1
    width_per_group: int = 64
    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        residual = x
        width = int(self.filters * (self.width_per_group / 64.0)) * self.groups
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(width, (3, 3), (self.strides, self.strides), padding=1,
                    use_bias=False, feature_group_count=self.groups,
                    name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetGrid(nn.Module):
    embed_dim: int
    depth: int = 1
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False,
                 deterministic: bool = True):
        """images: [B, 224, 224, 3] normalized NHWC. Returns [B, 49, embed_dim]."""
        block_kind, stage_sizes, groups, wpg = DEPTHS[self.depth]
        block_cls = BasicBlock if block_kind == "basic" else Bottleneck
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)

        x = images.astype(self.dtype)
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for i, num_blocks in enumerate(stage_sizes):
            for j in range(num_blocks):
                strides = 2 if i > 0 and j == 0 else 1
                x = block_cls(64 * 2 ** i, strides=strides, groups=groups,
                              width_per_group=wpg, norm=norm,
                              name=f"layer{i + 1}_{j}")(x)

        B = x.shape[0]
        grid = x.reshape(B, -1, x.shape[-1])             # [B, 49, C]
        grid = nn.Dropout(self.dropout)(grid, deterministic=deterministic)
        grid = nn.Dense(self.embed_dim, use_bias=False, name="fc")(grid)
        loc = self.param("location_embedding",
                         nn.initializers.normal(0.02),
                         (grid.shape[1], self.embed_dim))
        out = grid + loc[None, :, :].astype(grid.dtype)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out.astype(self.dtype)
