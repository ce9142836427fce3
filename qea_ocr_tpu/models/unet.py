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

from qea_ocr_tpu.ops.s2d import (
    depth_to_space,
    pack_conv1x1_kernel,
    pack_conv3x3_kernel,
    pack_convT2x2_kernel,
    packed_conv,
    parity_max,
    space_to_depth,
)


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


# ---------------------------------------------------------------------------
# Space-to-depth packed twins of the shallow modules. Parameter NAMES and
# SHAPES are identical to the vanilla path (same initializer distributions),
# so checkpoints are interchangeable between `mxu_packed` settings; only the
# compute layout differs (see qea_ocr_tpu/ops/s2d.py for the math).
# ---------------------------------------------------------------------------
class PackedConv3x3(nn.Module):
    """3x3 SAME conv evaluated in packed space. `in_splits` > 1 when the
    packed input is a channel-concat of separately-packed tensors (decoder
    skip concats): each split's kernel slice packs independently."""
    features: int
    in_splits: int = 1
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1] // 4
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), self.param_dtype)
        split = cin // self.in_splits
        packed = jnp.concatenate(
            [pack_conv3x3_kernel(kernel[:, :, i * split:(i + 1) * split])
             for i in range(self.in_splits)], axis=2)
        return packed_conv(x.astype(self.compute_dtype),
                           packed.astype(self.compute_dtype))


class PackedParityBatchNorm(nn.Module):
    """BatchNorm over the ORIGINAL channel axis, evaluated on a packed
    tensor: statistics pool over batch, space, AND the four parities, so
    train/eval behavior matches vanilla `nn.BatchNorm(momentum=0.9)` on the
    un-packed layout. Params/stats keep the vanilla (C,) shapes."""
    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32).reshape(-1, 4, c)
            mean = xf.mean(axis=(0, 1))
            var = (xf * xf).mean(axis=(0, 1)) - mean * mean
            if not self.is_initializing() and \
                    self.is_mutable_collection("batch_stats"):
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        mul = (scale * jax.lax.rsqrt(var + self.epsilon))
        add = bias - mean * mul
        mul4 = jnp.tile(mul, 4).astype(self.compute_dtype)
        add4 = jnp.tile(add, 4).astype(self.compute_dtype)
        return x.astype(self.compute_dtype) * mul4 + add4


class PackedUNetBlock(nn.Module):
    """conv-BN-relu x2 in packed space (names match vanilla UNetBlock)."""
    features: int
    in_splits: int = 1
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kw = dict(compute_dtype=self.compute_dtype,
                  param_dtype=self.param_dtype)
        for i, splits in enumerate((self.in_splits, 1)):
            x = PackedConv3x3(self.features, in_splits=splits,
                              name=f"Conv_{i}", **kw)(x)
            x = PackedParityBatchNorm(
                self.features, name=f"BatchNorm_{i}", **kw)(
                x, use_running_average=not train)
            x = nn.relu(x)
        return x


class PackedUpconv(nn.Module):
    """Stride-2 2x2 ConvTranspose, UNPACKED input -> PACKED output, as a
    1x1 conv emitting all four parities (names/shapes match ConvTranspose)."""
    features: int
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (2, 2, cin, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        k1 = pack_convT2x2_kernel(kernel).astype(self.compute_dtype)
        y = packed_conv(x.astype(self.compute_dtype), k1)
        return y + jnp.tile(bias, 4).astype(self.compute_dtype)


class PackedFinalConv(nn.Module):
    """1x1 output conv in packed space (parity-block-diagonal kernel)."""
    features: int
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1] // 4
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, cin, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        k4 = pack_conv1x1_kernel(kernel).astype(self.compute_dtype)
        y = packed_conv(x.astype(self.compute_dtype), k4)
        return y + jnp.tile(bias, 4).astype(self.compute_dtype)


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
    mxu_packed: bool = False  # space-to-depth packing of the two shallow
                              # levels (exact math, MXU-aligned channels;
                              # see ops/s2d.py). Checkpoint-compatible with
                              # the vanilla layout either way.

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.compute_dtype)  # NHWC
        f = self.init_features
        kw = dict(compute_dtype=self.compute_dtype,
                  param_dtype=self.param_dtype)
        blk_cls = (nn.remat(UNetBlock, static_argnums=(2,))
                   if self.remat else UNetBlock)
        block = lambda feat, name: blk_cls(feat, name=name, **kw)
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))
        upconv = lambda feat, name: nn.ConvTranspose(
            feat, (2, 2), strides=(2, 2),
            dtype=self.compute_dtype, param_dtype=self.param_dtype, name=name,
        )

        pblk_cls = (nn.remat(PackedUNetBlock, static_argnums=(2,))
                    if self.remat else PackedUNetBlock)
        if self.mxu_packed:
            # levels 1-2 in packed space; deep levels (>=4f channels) vanilla
            e1p = pblk_cls(f, name="enc1", **kw)(
                space_to_depth(x), train)                  # (H/2,W/2,4f)
            pool1 = parity_max(e1p)                        # == pool(enc1)
            e2p = pblk_cls(f * 2, name="enc2", **kw)(
                space_to_depth(pool1), train)              # (H/4,W/4,8f)
            pool2 = parity_max(e2p)                        # == pool(enc2)
        else:
            enc1 = block(f, "enc1")(x, train)
            pool1 = pool(enc1)
            enc2 = block(f * 2, "enc2")(pool1, train)
            pool2 = pool(enc2)

        enc3 = block(f * 4, "enc3")(pool2, train)
        enc4 = block(f * 8, "enc4")(pool(enc3), train)
        bottleneck = block(f * 16, "bottleneck")(pool(enc4), train)

        dec4 = upconv(f * 8, "upconv4")(bottleneck)
        dec4 = block(f * 8, "dec4")(jnp.concatenate([dec4, enc4], -1), train)
        dec3 = upconv(f * 4, "upconv3")(dec4)
        dec3 = block(f * 4, "dec3")(jnp.concatenate([dec3, enc3], -1), train)

        if self.mxu_packed:
            up2 = PackedUpconv(f * 2, name="upconv2", **kw)(dec3)
            d2p = pblk_cls(f * 2, in_splits=2, name="dec2", **kw)(
                jnp.concatenate([up2, e2p], -1), train)    # (H/4,W/4,8f)
            up1 = PackedUpconv(f, name="upconv1", **kw)(
                depth_to_space(d2p))
            d1p = pblk_cls(f, in_splits=2, name="dec1", **kw)(
                jnp.concatenate([up1, e1p], -1), train)    # (H/2,W/2,4f)
            out = PackedFinalConv(self.out_channels, name="Conv_0", **kw)(d1p)
            out = jax.nn.sigmoid(out.astype(jnp.float32))
            out = depth_to_space(out)
        else:
            dec2 = upconv(f * 2, "upconv2")(dec3)
            dec2 = block(f * 2, "dec2")(
                jnp.concatenate([dec2, enc2], -1), train)
            dec1 = upconv(f, "upconv1")(dec2)
            dec1 = block(f, "dec1")(
                jnp.concatenate([dec1, enc1], -1), train)
            out = nn.Conv(
                self.out_channels, (1, 1),
                dtype=self.compute_dtype, param_dtype=self.param_dtype,
            )(dec1)
            out = jax.nn.sigmoid(out.astype(jnp.float32))
        return jnp.transpose(out, (0, 3, 1, 2))  # back to NCHW
