"""UNet document-cleaning preprocessor in flax.linen.

Structural parity with reference `models/model_unet.py:7-109`: 4 encoder
levels from `init_features=32` doubling each level, a bottleneck, transposed
-conv upsampling with skip concats, and a 1x1 conv + sigmoid single-channel
output. Each block is conv3x3(no bias) -> BatchNorm -> ReLU, twice.

TPU-first: NHWC layout, bfloat16 compute / float32 params, channels rounded
to MXU-friendly sizes already (32..512).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class UNetBlock(nn.Module):
    features: int
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for _ in range(2):
            x = nn.Conv(
                self.features, (3, 3), padding="SAME", use_bias=False,
                dtype=self.compute_dtype, param_dtype=self.param_dtype,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                dtype=self.compute_dtype, param_dtype=self.param_dtype,
            )(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    """4-level UNet; `__call__` takes NCHW (B, 1, H, W), returns same shape
    sigmoid output in float32. H and W must be divisible by 16."""

    out_channels: int = 1
    init_features: int = 32
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False   # rematerialize blocks in backward: ~1.3x FLOPs
                          # for O(levels) less activation HBM — unlocks
                          # larger document batches

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.compute_dtype)  # NHWC
        f = self.init_features
        blk_cls = (nn.remat(UNetBlock, static_argnums=(2,))
                   if self.remat else UNetBlock)
        block = lambda feat, name: blk_cls(
            feat, compute_dtype=self.compute_dtype, param_dtype=self.param_dtype,
            name=name,
        )
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))
        upconv = lambda feat, name: nn.ConvTranspose(
            feat, (2, 2), strides=(2, 2),
            dtype=self.compute_dtype, param_dtype=self.param_dtype, name=name,
        )

        enc1 = block(f, "enc1")(x, train)
        enc2 = block(f * 2, "enc2")(pool(enc1), train)
        enc3 = block(f * 4, "enc3")(pool(enc2), train)
        enc4 = block(f * 8, "enc4")(pool(enc3), train)
        bottleneck = block(f * 16, "bottleneck")(pool(enc4), train)

        dec4 = upconv(f * 8, "upconv4")(bottleneck)
        dec4 = block(f * 8, "dec4")(jnp.concatenate([dec4, enc4], -1), train)
        dec3 = upconv(f * 4, "upconv3")(dec4)
        dec3 = block(f * 4, "dec3")(jnp.concatenate([dec3, enc3], -1), train)
        dec2 = upconv(f * 2, "upconv2")(dec3)
        dec2 = block(f * 2, "dec2")(jnp.concatenate([dec2, enc2], -1), train)
        dec1 = upconv(f, "upconv1")(dec2)
        dec1 = block(f, "dec1")(jnp.concatenate([dec1, enc1], -1), train)

        out = nn.Conv(
            self.out_channels, (1, 1),
            dtype=self.compute_dtype, param_dtype=self.param_dtype,
        )(dec1)
        out = jax.nn.sigmoid(out.astype(jnp.float32))
        return jnp.transpose(out, (0, 3, 1, 2))  # back to NCHW
