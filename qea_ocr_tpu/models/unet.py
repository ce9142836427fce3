"""UNet document-cleaning preprocessor in flax.linen.

Structural parity with reference `models/model_unet.py:7-109`: 4 encoder
levels from `init_features=32` doubling each level, a bottleneck, transposed
-conv upsampling with skip concats, and a 1x1 conv + sigmoid single-channel
output. Each block is conv3x3(no bias) -> BatchNorm -> ReLU, twice.

TPU-first: NHWC layout, bfloat16 compute / float32 params, channels rounded
to MXU-friendly sizes already (32..512).

Three interchangeable compute layouts for the SHALLOW levels (enc1, enc2,
dec2, dec1 — the 32/64-channel convs that underfill the MXU's 128-lane axis
under XLA's NHWC lowering), all with IDENTICAL parameter names/shapes so
checkpoints are interchangeable:
  * vanilla NHWC `nn.Conv` (always available, any backend/shape);
  * `mxu_packed` space-to-depth twins (`ops/s2d.py`) — wins at serving
    batch sizes; serving auto-selects it in the measured 16-48
    per-device-batch window, `QEA_MXU_PACKED=0/1` forces either way;
  * channel-major padded-flat Pallas blocks (`ops/pallas/conv_cmajor.py`)
    — the implicit-GEMM kernel that puts the full image plane on the
    128-lane axis; OPT-IN via `QEA_CONV_IMPL=cmajor` (`auto` resolves to
    XLA — see below).

Why cmajor is opt-in, not default (both directions measured on a v5e,
D=96, (400,512) docs):
  * integrated FORWARD: 204.8 ms unfused / 182.9 ms with the BN+ReLU
    epilogue folded into the kernel, vs XLA's 81.2 ms — the kernel's
    isolated 1.6-2.7x per-conv win is swamped by the flat layout's glue
    (pad_flat passes, parity-interleave upconvs, multi-GB skip concats,
    custom-call boundary copies), which the NHWC path never pays
    (benchmarks/unet_eval_probe.py).
  * GRAD at document batches: OOM — the fused training step needs 27.6G
    of 15.75G HBM (saved padded-flat activations for every conv plus XLA
    layout copies at the custom-call boundaries), so even under the
    opt-in the trainers/bench construct the grad-path UNet with
    conv_impl="xla" and route the opt-in through a param-compatible twin
    for the no-grad forwards only (`train/patch_steps.make_steps`).
"""

from __future__ import annotations

import os
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


# ---------------------------------------------------------------------------
# Channel-major padded-flat twins of the shallow modules (the Pallas
# implicit-GEMM conv kernel, ops/pallas/conv_cmajor.py). Activations live as
# (B, C, (H+2)*W) bf16 with the whole image plane on the MXU's 128-lane axis;
# the one-row halo top+bottom makes every vertical conv tap a lane-offset
# view. Parameter NAMES and SHAPES match the vanilla NHWC path exactly.
# ---------------------------------------------------------------------------
class FlatConv3x3(nn.Module):
    """3x3 SAME conv on a padded-flat channel-major tensor. Output halo
    lanes are zeros (the kernel writes them), so a FlatBatchNorm directly
    downstream can reduce over all lanes with the real element count."""
    features: int
    height: int
    width: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xf: jax.Array, mul: jax.Array | None = None,
                 add: jax.Array | None = None) -> jax.Array:
        from qea_ocr_tpu.ops.pallas.conv_cmajor import (
            conv_flat_bn_relu, conv_flat_vjp)
        cin = xf.shape[1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), self.param_dtype)
        xf = xf.astype(jnp.bfloat16)
        w = kernel.astype(jnp.bfloat16)
        if cin < 16 and jax.default_backend() == "tpu":
            # zero-pad the contraction axis to the MXU's bf16 granularity
            # (enc1's first conv has cin=1); mathematically a no-op, and
            # autodiff slices dW back through the pad's transpose.
            pad = 16 - cin
            xf = jnp.pad(xf, ((0, 0), (0, pad), (0, 0)))
            w = jnp.pad(w, ((0, 0), (0, 0), (0, pad), (0, 0)))
        if mul is not None:
            # eval-mode BN + ReLU folded into the kernel epilogue (no-grad
            # path; the fused call has no vjp by design).
            return conv_flat_bn_relu(xf, w, mul, add,
                                     self.height, self.width)
        return conv_flat_vjp(xf, w, self.height, self.width)


class FlatBatchNorm(nn.Module):
    """BatchNorm over the channel axis of a padded-flat tensor.

    The input MUST be a FlatConv3x3 output: its pad lanes are zeros, so
    summing ALL lanes and dividing by the REAL element count (B*H*W) gives
    exact vanilla `nn.BatchNorm(momentum=0.9)` statistics without a mask
    pass. The output's pad lanes become `bias - mean*mul` (nonzero) — a
    don't-care for the next conv (it re-zeroes fetched halos) but NOT for
    any other consumer. Params/stats keep the vanilla (C,) shapes."""
    features: int
    height: int
    width: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xf: jax.Array | None, use_running_average: bool,
                 fold: bool = False):
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
            assert not fold, "fold requires running statistics (eval mode)"
            n = xf.shape[0] * self.height * self.width  # REAL elements
            xs = xf.astype(jnp.float32)
            mean = xs.sum(axis=(0, 2)) / n
            var = (xs * xs).sum(axis=(0, 2)) / n - mean * mean
            if not self.is_initializing() and \
                    self.is_mutable_collection("batch_stats"):
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        add = bias - mean * mul
        if fold:
            # hand (mul, add) f32 to the caller for the conv-epilogue fold
            # (FlatConv3x3's fused path) instead of applying them here.
            return mul.astype(jnp.float32), add.astype(jnp.float32)
        return (xf.astype(self.compute_dtype)
                * mul[None, :, None].astype(self.compute_dtype)
                + add[None, :, None].astype(self.compute_dtype))


class FlatUNetBlock(nn.Module):
    """conv-BN-relu x2 staying in the padded-flat layout (names match
    vanilla UNetBlock).

    EVAL mode fuses the BN (pure scale+bias under running stats) and ReLU
    into the conv kernel's epilogue — the BN scale folds into the conv
    weights, the shift+clamp ride the kernel's f32 accumulator — so the
    whole block is two kernel launches with ZERO interleaved elementwise
    HBM round trips, and its output pad lanes are clean zeros.
    `QEA_CMAJOR_FUSED=0` (trace-time) forces the unfused chain for A/B
    measurement; TRAIN mode is always unfused (batch statistics need the
    materialized conv output) and leaves post-ReLU garbage on the pad
    lanes: consumers must be another flat conv (immune) or `unflat`."""
    features: int
    height: int
    width: int
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xf: jax.Array, train: bool = False) -> jax.Array:
        fuse = not train and os.environ.get(
            "QEA_CMAJOR_FUSED", "1").strip().lower() not in (
            "0", "false", "no", "off")
        for i in range(2):
            conv = FlatConv3x3(self.features, self.height, self.width,
                               name=f"Conv_{i}",
                               param_dtype=self.param_dtype)
            bn = FlatBatchNorm(
                self.features, self.height, self.width,
                name=f"BatchNorm_{i}", compute_dtype=self.compute_dtype,
                param_dtype=self.param_dtype)
            if fuse:
                mul, add = bn(None, use_running_average=True, fold=True)
                xf = conv(xf, mul, add)
            else:
                xf = nn.relu(bn(conv(xf), use_running_average=not train))
        return xf


class CMUpconv(nn.Module):
    """Stride-2 2x2 ConvTranspose in channel-major layout: four (Cout,Cin)
    GEMMs over the flattened spatial axis + one parity-interleave relayout.
    Matches `nn.ConvTranspose(f, (2,2), strides=(2,2))` exactly:
    y[2h+dy, 2w+dx] = sum_c K[1-dy, 1-dx, c, o] x[h, w, c] + b[o]
    (names/shapes match ConvTranspose)."""
    features: int
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, c, h, w = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (2, 2, c, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        k = kernel[::-1, ::-1].reshape(4, c, self.features)
        t = jnp.einsum("pco,bchw->bpohw", k.astype(self.compute_dtype),
                       x.astype(self.compute_dtype))
        t = t.reshape(b, 2, 2, self.features, h, w)
        t = jnp.transpose(t, (0, 3, 4, 1, 5, 2)).reshape(
            b, self.features, 2 * h, 2 * w)
        return t + bias.astype(self.compute_dtype)[None, :, None, None]


class CMFinalConv(nn.Module):
    """1x1 output conv in channel-major layout (names/shapes match the
    vanilla `nn.Conv(out, (1, 1))`)."""
    features: int
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, cin, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        y = jnp.einsum("co,bchw->bohw",
                       kernel[0, 0].astype(self.compute_dtype),
                       x.astype(self.compute_dtype))
        return y + bias.astype(self.compute_dtype)[None, :, None, None]


def _flat_pool(xf: jax.Array, height: int, width: int) -> jax.Array:
    """Padded-flat (B,C,(H+2)W) -> channel-major 2x2 max-pooled
    (B,C,H/2,W/2) (drops the halo; exact `nn.max_pool` parity)."""
    b, c, _ = xf.shape
    x = xf.reshape(b, c, height + 2, width)[:, :, 1:-1]
    return x.reshape(b, c, height // 2, 2, width // 2, 2).max(axis=(3, 5))


def cmajor_supported(height: int, width: int, init_features: int) -> bool:
    """Whether the channel-major kernel covers this document geometry:
    lane-aligned widths at levels 1-2 and a tileable height at the widest
    input channel count of each level (dec1: 2f, dec2: 4f)."""
    from qea_ocr_tpu.ops.pallas.conv_cmajor import default_tile_h
    f = init_features
    if width % 128 or (width // 2) % 128 or height % 4:
        return False
    return (default_tile_h(height, width, 2 * f) is not None
            and default_tile_h(height // 2, width // 2, 4 * f) is not None)


def resolve_conv_impl(conv_impl: str, height: int, width: int,
                      init_features: int) -> str:
    """`auto` (per `QEA_CONV_IMPL`, read at trace time like
    `QEA_GATHER_IMPL`) resolves to XLA NHWC: the channel-major kernel wins
    1.6-2.7x per isolated conv but LOSES integrated — the full eval
    forward measured 182.9 ms (BN+ReLU epilogue fused into the kernel)
    vs XLA's 81.2 ms at D=96 on a v5e; the flat layout's glue (pad_flat
    passes, upconv interleaves, skip concats, custom-call boundary
    copies) dominates (benchmarks/RESULTS.md "Kernel-level notes"). The
    kernel therefore stays opt-in (`QEA_CONV_IMPL=cmajor`), and the
    trainers route even the opt-in to no-grad forwards only (its grad at
    document batches OOMs; see the module docstring).

    The ENV opt-in (`conv_impl="auto"` + `QEA_CONV_IMPL=cmajor`) is
    best-effort: it falls back to XLA with a warning when more than one
    device is visible (GSPMD cannot partition the pallas_call over the
    data axis) or when the geometry is outside the kernel's coverage —
    a process-wide env var must not abort whichever model in the process
    happens to trace an unsupported shape. An EXPLICIT constructor
    `conv_impl="cmajor"` still asserts (tests/probes want the kernel or
    an error, never a silent reroute)."""
    impl = conv_impl
    from_env = False
    if impl == "auto":
        impl = os.environ.get("QEA_CONV_IMPL", "auto")
        from_env = True
    if impl == "xla" or impl == "auto":
        return "xla"
    assert impl == "cmajor", f"unknown conv_impl {impl!r}"
    if from_env:
        import warnings

        import jax
        if len(jax.devices()) > 1:
            warnings.warn(
                "QEA_CONV_IMPL=cmajor ignored: >1 device visible and GSPMD "
                "cannot partition the pallas_call — using XLA NHWC convs")
            return "xla"
        if not cmajor_supported(height, width, init_features):
            warnings.warn(
                f"QEA_CONV_IMPL=cmajor ignored for doc {(height, width)} at "
                f"f={init_features} (unsupported geometry) — using XLA")
            return "xla"
    assert cmajor_supported(height, width, init_features), (
        f"conv_impl='cmajor' unsupported for doc "
        f"{(height, width)} at f={init_features}")
    return "cmajor"


class UNet(nn.Module):
    """4-level UNet; `__call__` takes NCHW (B, 1, H, W), returns same shape
    sigmoid output in float32. H and W must be divisible by 16."""

    out_channels: int = 1
    init_features: int = 32
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: Any = False    # rematerialize blocks in backward. True/"full":
                          # every block (measured WORSE on HBM at D=96 —
                          # the checkpoint barriers defeat XLA's
                          # elementwise-into-conv fusion, RESULTS.md).
                          # "shallow": only the full-resolution enc1/dec1
                          # blocks (vanilla layout), whose HxWx32ch
                          # activations dominate the liveset — the
                          # selective probe for unlocking D>96 batches.
    mxu_packed: bool = False  # space-to-depth packing of the two shallow
                              # levels (exact math, MXU-aligned channels;
                              # see ops/s2d.py). Checkpoint-compatible with
                              # the vanilla layout either way.
    conv_impl: str = "auto"   # shallow-level conv layout: "cmajor" runs
                              # enc1/enc2/dec2/dec1 + upconvs + final 1x1 in
                              # channel-major padded-flat via the Pallas
                              # implicit-GEMM kernel; "xla" forces vanilla
                              # NHWC; "auto" defers to QEA_CONV_IMPL (trace-
                              # time) and resolves to XLA unless =cmajor is
                              # set (measured slower integrated — module
                              # docstring). Checkpoint-compatible across
                              # all values.

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        f = self.init_features
        kw = dict(compute_dtype=self.compute_dtype,
                  param_dtype=self.param_dtype)
        def block(feat, name):
            r = (self.remat in (True, "full")
                 or (self.remat == "shallow" and name in ("enc1", "dec1")))
            cls = (nn.remat(UNetBlock, static_argnums=(2,))
                   if r else UNetBlock)
            return cls(feat, name=name, **kw)
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))
        upconv = lambda feat, name: nn.ConvTranspose(
            feat, (2, 2), strides=(2, 2),
            dtype=self.compute_dtype, param_dtype=self.param_dtype, name=name,
        )
        use_cmajor = (not self.mxu_packed and resolve_conv_impl(
            self.conv_impl, x.shape[2], x.shape[3], f) == "cmajor")
        if use_cmajor:
            from qea_ocr_tpu.ops.pallas.conv_cmajor import pad_flat, unflat
            H, W = x.shape[2], x.shape[3]
            fblk_cls = (nn.remat(FlatUNetBlock, static_argnums=(2,))
                        if self.remat else FlatUNetBlock)
            fblk = lambda feat, h, w, name: fblk_cls(feat, h, w, name=name,
                                                     **kw)
            e1f = fblk(f, H, W, "enc1")(pad_flat(x), train)
            pool1f = _flat_pool(e1f, H, W)            # (B, f, H/2, W/2)
            e2f = fblk(f * 2, H // 2, W // 2, "enc2")(pad_flat(pool1f), train)
            pool2 = jnp.transpose(                    # NHWC for deep levels
                _flat_pool(e2f, H // 2, W // 2), (0, 2, 3, 1))
        else:
            x = jnp.transpose(x, (0, 2, 3, 1)).astype(
                self.compute_dtype)  # NHWC

        pblk_cls = (nn.remat(PackedUNetBlock, static_argnums=(2,))
                    if self.remat else PackedUNetBlock)
        if use_cmajor:
            pass
        elif self.mxu_packed:
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

        if use_cmajor:
            u2 = CMUpconv(f * 2, name="upconv2", **kw)(
                jnp.transpose(dec3, (0, 3, 1, 2)))     # (B, 2f, H/2, W/2)
            d2f = fblk(f * 2, H // 2, W // 2, "dec2")(
                pad_flat(jnp.concatenate(
                    [u2, unflat(e2f, H // 2, W // 2)], 1)), train)
            u1 = CMUpconv(f, name="upconv1", **kw)(
                unflat(d2f, H // 2, W // 2))           # (B, f, H, W)
            # e1f's pad lanes hold post-ReLU garbage — a don't-care for the
            # flat conv (edge-tile halos re-zeroed on fetch in VMEM).
            d1f = fblk(f, H, W, "dec1")(
                jnp.concatenate([pad_flat(u1), e1f], 1), train)
            out = CMFinalConv(self.out_channels, name="Conv_0", **kw)(
                unflat(d1f, H, W))
            return jax.nn.sigmoid(out.astype(jnp.float32))  # NCHW already
        elif self.mxu_packed:
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
