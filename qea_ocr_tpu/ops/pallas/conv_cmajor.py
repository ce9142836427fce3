"""Channel-major 3x3 SAME conv as a transposed implicit GEMM (Pallas, TPU).

Why this exists: XLA's NHWC conv lowering puts OUTPUT CHANNELS on the
MXU's 128-lane axis, so the UNet's shallow 32/64-channel convs fill only
32/128 (64/128) lanes — the measured ~49 TF/s ceiling documented in
benchmarks/RESULTS.md ("Where the milliseconds go"). The space-to-depth
repack (`ops/s2d.py`) buys lanes at 4x nominal FLOPs (a wash at training
batches). This kernel instead TRANSPOSES the implicit GEMM:

    Y^T (Cout, spatial)  =  sum_dy  W_dy (Cout, Cin) @ X_dy (Cin, spatial)

so the huge spatial extent rides the 128-lane axis (always full), Cin
rides the contraction axis, and Cout streams through the MXU as the M
dimension — same FLOPs as the direct conv, none of the s2d inflation.

Measured design rules (benchmarks/conv_cmajor_{stages,dma_probe}.py on
one v5e):
- Activations live PADDED-FLAT as (D, C, (H+2)*W) with the whole image
  plane on the LANE axis. A row band is then a 128-aligned *lane* slice
  (W % 128 == 0): the double-buffered HBM->VMEM DMA needs no sublane-
  aligned over-fetch (in-stream measured ~530 GB/s), and each vertical
  tap dy is a lane-offset view `xb[:, dy*W : dy*W + TH*W]` consumable by
  the MXU directly — no im2col copy, no operand relayout (an explicit
  (3Cin, THW) im2col buffer measured ~4 us/tile of pure relayout).
- The per-conv jnp.pad pass measured ~12 ms at dec1 shape — half the
  kernel's wall clock — so padding happens ONCE per layout entry
  (`pad_flat`), kernels write the +W lane offset directly (manual output
  DMA), and edge-tile halo lanes of the INPUT are zeroed in VMEM on
  fetch, which makes the input's HBM pad lanes don't-cares: interleaved
  XLA elementwise ops (BN, ReLU) may freely corrupt them without
  affecting any conv output.
- The OUTPUT's halo lanes are written as zeros, so a tensor is
  halo-clean immediately downstream of a conv (flat reductions like
  BatchNorm statistics can sum all lanes and divide by the REAL element
  count). The zero guarantee holds only until the next interleaved
  elementwise op touches the pad lanes (e.g. a BN bias + ReLU leaves
  `relu(bias)` there); the next conv in the chain is immune (see above),
  but any other consumer must go through `unflat` first.
- The three horizontal taps (dx) are folded in by single-lane rolls of
  the (Cout, TH*W) partial outputs with document-edge masks (rolling the
  output is Cin/Cout times cheaper than shifting the operand).

bf16 MXU compute, f32 accumulation — same numerics as the XLA conv at
bf16 inputs with preferred_element_type=f32.

Used by `models/unet.py`'s channel-major UNet path (`FlatUNetBlock` /
`CMUpconv`), OPT-IN via `QEA_CONV_IMPL=cmajor` (`auto` resolves to XLA).
Off-TPU the kernel runs in Pallas interpret mode (tests).

Integration verdict (measured, v5e, D=96, twice): the isolated per-conv
wins above do NOT survive the full model. Unfused, the flat UNet eval
forward measured 204.8 ms vs XLA's 82.0 ms — XLA cannot fuse the
interleaved BN/ReLU elementwise chains into a custom-call, so each became
its own HBM round trip over the (D,C,(H+2)W) activations. The eval-mode
BN+ReLU epilogue was then FOLDED INTO THIS KERNEL (`conv_flat_bn_relu`:
the BN scale rides the weights, the shift+ReLU ride the f32 accumulator)
and re-measured: 182.9 ms — still 2.25x XLA's 81.2 ms, because the
remaining tax is the flat layout's glue (pad_flat passes at level
entries, CMUpconv parity-interleave relayouts, multi-GB decoder skip
concats, the cin=1->16 pad, custom-call boundary copies), which the NHWC
path never pays (benchmarks/unet_eval_probe.py; RESULTS.md
"Kernel-level notes"). Differentiating the flat layout at document
batches additionally OOMs (27.6G vs 15.75G HBM — saved padded-flat
activations plus layout copies). Even under the opt-in, trainers route
the kernel to NO-GRAD forwards only
(`train/patch_steps.make_steps`'s `prep_eval_model`).
Reference semantics: `models/model_unet.py:7-109` (3x3 SAME convs inside
UNet._block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pad_flat(x: jax.Array) -> jax.Array:
    """(D, C, H, W) -> padded-flat (D, C, (H+2)*W) bf16 (one-row zero halo
    top+bottom, image plane on the lane axis)."""
    d_, c, h_, w_ = x.shape
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, 0), (1, 1), (0, 0)))
    return xp.reshape(d_, c, (h_ + 2) * w_)


def unflat(xf: jax.Array, height: int, width: int) -> jax.Array:
    """Padded-flat (D, C, (H+2)*W) -> (D, C, H, W) (drops the halo rows)."""
    d_, c, _ = xf.shape
    return xf.reshape(d_, c, height + 2, width)[:, :, 1:-1, :]


def _kernel(a_ref, *refs, cin: int, cout: int, tile_h: int, width: int,
            n_tiles: int, n_steps: int, out_f32: bool, fuse: bool):
    if fuse:
        # Fused BN+ReLU epilogue: the BN *scale* is folded into the conv
        # weights by the caller (conv is linear in W), so the kernel only
        # adds the per-channel shift and clamps — zero extra HBM traffic.
        (b_ref, x_hbm, out_hbm, xbuf, ybuf, zbuf, isems, osems,
         zsem) = refs
    else:
        x_hbm, out_hbm, xbuf, ybuf, zbuf, isems, osems, zsem = refs
    g = pl.program_id(0)
    d, t = g // n_tiles, jax.lax.rem(g, n_tiles)
    thw = tile_h * width
    fetch = thw + 2 * width  # TH rows + 1-row halo each side, in lanes

    def in_copy(step, slot):
        dd, tt = step // n_tiles, jax.lax.rem(step, n_tiles)
        return pltpu.make_async_copy(
            x_hbm.at[dd, :, pl.ds(tt * thw, fetch)],
            xbuf.at[slot],
            isems.at[slot],
        )

    @pl.when(g == 0)
    def _():
        in_copy(g, jax.lax.rem(g, 2)).start()

    @pl.when(g + 1 < n_steps)
    def _():
        in_copy(g + 1, jax.lax.rem(g + 1, 2)).start()

    slot = jax.lax.rem(g, 2)
    in_copy(g, slot).wait()
    xb = xbuf.at[slot]  # (Cin, fetch): doc rows t*TH-1 .. t*TH+TH (padded)

    # The halo rows of edge tiles are the layout's pad lanes, whose HBM
    # content is a don't-care (interleaved elementwise ops may corrupt
    # them) — zero them in VMEM so SAME-padding semantics hold.
    @pl.when(t == 0)
    def _():
        xb[:, :width] = jnp.zeros((cin, width), jnp.bfloat16)

    @pl.when(t == n_tiles - 1)
    def _():
        xb[:, fetch - width:] = jnp.zeros((cin, width), jnp.bfloat16)

    def partial_dx(dx):
        # P_dx = sum_dy W[dy,dx]^T @ X rows shifted by dy — each operand a
        # 128-aligned lane-offset view of the SAME fetched buffer.
        p = None
        for dy in range(3):
            prod = jnp.dot(a_ref[dx, dy],
                           xb[:, dy * width: dy * width + thw],
                           preferred_element_type=jnp.float32)
            p = prod if p is None else p + prod
        return p

    # dx = 1 (center tap), then the two shifted taps folded in by output
    # rolls: Y[w] = P0[w-1] + P1[w] + P2[w+1], document-edge columns
    # zero-filled (SAME padding) — the roll wraps across flattened row
    # boundaries, so every lane w % W == 0 (resp. W-1) is masked.
    y = partial_dx(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (cout, thw), 1)
    lane_w = jax.lax.rem(lane, width)
    y = y + jnp.where(lane_w == 0, 0.0, pltpu.roll(partial_dx(0), 1, 1))
    # left-roll by 1 == right-roll by thw-1 (pltpu.roll wants shift >= 0)
    y = y + jnp.where(lane_w == width - 1, 0.0,
                      pltpu.roll(partial_dx(2), thw - 1, 1))
    if fuse:
        # BN shift + ReLU on the f32 accumulator (scale already in W).
        y = jnp.maximum(y + b_ref[...].astype(jnp.float32), 0.0)

    # Zero the output's halo rows so chained consumers (BN/ReLU grads,
    # elementwise reductions) see zeros — not recycled-buffer garbage —
    # on the pad lanes. Two small blocking DMAs per document.
    @pl.when(t == 0)
    def _():
        zbuf[...] = jnp.zeros_like(zbuf)
        zc = pltpu.make_async_copy(
            zbuf, out_hbm.at[d, :, pl.ds(0, width)], zsem)
        zc.start()
        zc.wait()

    @pl.when(t == n_tiles - 1)
    def _():
        zc = pltpu.make_async_copy(
            zbuf, out_hbm.at[d, :, pl.ds((n_tiles * tile_h + 1) * width,
                                         width)], zsem)
        zc.start()
        zc.wait()

    # Manual output DMA at the +W lane offset (padded-flat layout for the
    # next conv in the chain): wait for this slot's previous flight, fill,
    # send; drain both slots on the last step.
    @pl.when(g >= 2)
    def _():
        pltpu.make_async_copy(ybuf.at[slot], ybuf.at[slot],
                              osems.at[slot]).wait()
    ybuf[slot] = y.astype(ybuf.dtype)
    out_copy = pltpu.make_async_copy(
        ybuf.at[slot],
        out_hbm.at[d, :, pl.ds(width + t * thw, thw)],
        osems.at[slot],
    )
    out_copy.start()

    @pl.when(g == n_steps - 1)
    def _():
        out_copy.wait()

        @pl.when(n_steps >= 2)
        def _():
            pltpu.make_async_copy(
                ybuf.at[1 - slot], ybuf.at[1 - slot],
                osems.at[1 - slot]).wait()


@functools.partial(jax.jit, static_argnames=("height", "width", "tile_h",
                                              "out_f32", "fuse"))
def _conv_flat(xf: jax.Array, w: jax.Array, bias: jax.Array | None,
               height: int, width: int, tile_h: int,
               out_f32: bool = False, fuse: bool = False) -> jax.Array:
    """Padded-flat conv: xf (D, Cin, (H+2)*W) bf16, w (3, 3, Cin, Cout)
    HWIO -> padded-flat (D, Cout, (H+2)*W). Output halo lanes are written
    as zeros, so flat tensors stay halo-clean through conv chains. With
    `fuse`, `bias` is a (Cout, 1) f32 per-channel shift applied with a
    ReLU clamp inside the kernel (eval-mode BN epilogue — the BN scale
    folds into `w` outside)."""
    d_, cin, hw2 = xf.shape
    assert hw2 == (height + 2) * width, (xf.shape, height, width)
    kh, kw, wcin, cout = w.shape
    assert (kh, kw) == (3, 3) and wcin == cin, (w.shape, xf.shape)
    assert width % 128 == 0, f"W={width} must be a lane multiple of 128"
    assert height % tile_h == 0, (height, tile_h)
    assert fuse == (bias is not None)
    n_tiles = height // tile_h
    n_steps = d_ * n_tiles

    # A[dx, dy, cout, cin] = w[dy, dx, cin, cout]
    a = jnp.transpose(w.astype(jnp.bfloat16), (1, 0, 3, 2))
    out_dtype = jnp.float32 if out_f32 else jnp.bfloat16

    operands = (a, bias, xf) if fuse else (a, xf)
    return pl.pallas_call(
        functools.partial(
            _kernel, cin=cin, cout=cout, tile_h=tile_h, width=width,
            n_tiles=n_tiles, n_steps=n_steps, out_f32=out_f32, fuse=fuse),
        # interpret mode emulates the DMA path off-TPU (CPU tests)
        interpret=jax.default_backend() != "tpu",
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # A (3, 3, Cout, Cin)
        ] + ([pl.BlockSpec(memory_space=pltpu.VMEM)] if fuse else [])  # bias
        + [
            pl.BlockSpec(memory_space=pl.ANY),       # X flat, stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((d_, cout, hw2), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, cin, (tile_h + 2) * width), jnp.bfloat16),
            pltpu.VMEM((2, cout, tile_h * width), out_dtype),
            pltpu.VMEM((cout, width), out_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True),
    )(*operands)


def default_tile_h(h: int, w: int, cin: int) -> int | None:
    """Largest divisor of H keeping the fetched band (Cin x (TH+2) x W
    bf16, double-buffered) comfortably in VMEM."""
    budget = 6 * 1024 * 1024  # bytes for both xbuf slots
    for th in (64, 32, 16, 8, 4, 2):
        if h % th == 0 and 2 * cin * (th + 2) * w * 2 <= budget:
            return th
    return None


def conv_flat(xf: jax.Array, w: jax.Array, height: int, width: int,
              tile_h: int | None = None) -> jax.Array:
    if tile_h is None:
        tile_h = default_tile_h(height, width, xf.shape[1])
    assert tile_h is not None, f"no usable tile for H={height}"
    return _conv_flat(xf, w, None, height, width, tile_h)


def conv_flat_bn_relu(xf: jax.Array, w: jax.Array, mul: jax.Array,
                      add: jax.Array, height: int, width: int,
                      tile_h: int | None = None) -> jax.Array:
    """Padded-flat conv with the eval-mode BN + ReLU folded in:
    `relu(conv(xf, w) * mul + add)` per output channel, in ONE kernel pass
    — the elementwise chain that costs the unfused flat path an HBM round
    trip per op (the 204.8 ms vs 82.0 ms integration loss above). The BN
    scale rides the weights (conv is linear in W, so `conv(x, w)*mul ==
    conv(x, w*mul)`); the shift+clamp ride the kernel's f32 accumulator.
    Output halo lanes stay ZEROS (the shift is not applied to halo DMAs),
    so fused-block outputs are halo-clean — stronger than the unfused
    chain, whose BN+ReLU leave `relu(add)` on the pad lanes.

    No vjp on purpose: train-mode BN needs batch statistics of the conv
    output (not foldable pre-hoc), and the grad path pins conv_impl="xla"
    anyway (OOM — module docstring)."""
    if tile_h is None:
        tile_h = default_tile_h(height, width, xf.shape[1])
    assert tile_h is not None, f"no usable tile for H={height}"
    cout = w.shape[-1]
    assert mul.shape == add.shape == (cout,), (mul.shape, add.shape, cout)
    w2 = (w.astype(jnp.float32) * mul.astype(jnp.float32)).astype(
        jnp.bfloat16)
    bias = add.astype(jnp.float32).reshape(cout, 1)
    return _conv_flat(xf, w2, bias, height, width, tile_h, fuse=True)


def supports(x_shape, w_shape) -> bool:
    """True when this kernel can handle the given conv (3x3 SAME, lane-
    aligned width, tileable height)."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    d_, cin, h_, w_ = x_shape
    if tuple(w_shape[:2]) != (3, 3) or w_shape[2] != cin:
        return False
    return w_ % 128 == 0 and default_tile_h(h_, w_, cin) is not None


def conv3x3_cmajor(x: jax.Array, w: jax.Array,
                   tile_h: int | None = None) -> jax.Array:
    """Drop-in channel-major 3x3 SAME conv: (D, Cin, H, W) @ (3,3,Cin,Cout)
    HWIO -> (D, Cout, H, W). Pays the pad/unflat layout passes — chains of
    convs should stay in the padded-flat layout via `conv_flat` instead."""
    d_, cin, h_, w_ = x.shape
    if tile_h is None:
        tile_h = default_tile_h(h_, w_, cin)
    assert tile_h is not None, f"no usable tile for {x.shape}"
    yf = _conv_flat(pad_flat(x), w, None, h_, w_, tile_h)
    return unflat(yf, h_, w_).astype(x.dtype)


def _dw_xla(x: jax.Array, g: jax.Array) -> jax.Array:
    """Kernel gradient via the standard conv-as-correlation trick:
    dW[dy,dx,cin,cout] = sum_{d,h,w} Xpad[d,cin,h+dy,w+dx] * g[d,cout,h,w]
    == conv(lhs=X^T (Cin,D,H,W), rhs=g^T (Cout,D,H,W)) with the batch dim
    as the contraction feature. XLA lowers this with the full (huge)
    spatial extent as the GEMM K dimension, which tiles fine."""
    out = jax.lax.conv_general_dilated(
        jnp.transpose(x, (1, 0, 2, 3)).astype(jnp.bfloat16),
        jnp.transpose(g, (1, 0, 2, 3)).astype(jnp.bfloat16),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )  # (Cin, Cout, 3, 3)
    return jnp.transpose(out, (2, 3, 0, 1))  # (3, 3, Cin, Cout)


def _rot_w(w: jax.Array) -> jax.Array:
    """rot180 + in/out channel swap: the dX-backprop kernel."""
    return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_flat_vjp(xf: jax.Array, w: jax.Array, height: int,
                  width: int) -> jax.Array:
    """Differentiable padded-flat conv. Cotangents arriving on the output
    pad lanes are ignored (the kernel zeroes edge halos in VMEM), and the
    returned dXf has zeroed pad lanes (the kernel writes them), so halo
    garbage can never leak into chained elementwise/BN gradients."""
    return conv_flat(xf, w, height, width)


def _cf_fwd(xf, w, height, width):
    return conv_flat(xf, w, height, width), (xf, w)


def _cf_bwd(height, width, res, gf):
    xf, w = res
    # dX = conv(g, rot180(W)^T) — the same channel-major kernel.
    dxf = conv_flat(gf.astype(jnp.bfloat16), _rot_w(w), height, width)
    dw = _dw_xla(unflat(xf, height, width),
                 unflat(gf, height, width)).astype(w.dtype)
    return dxf.astype(xf.dtype), dw


conv_flat_vjp.defvjp(_cf_fwd, _cf_bwd)


@jax.custom_vjp
def conv3x3_cmajor_vjp(x: jax.Array, w: jax.Array) -> jax.Array:
    return conv3x3_cmajor(x, w)


def _fwd(x, w):
    return conv3x3_cmajor(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    dx = conv3x3_cmajor(g.astype(jnp.bfloat16), _rot_w(w)).astype(x.dtype)
    dw = _dw_xla(x, g).astype(w.dtype)
    return dx, dw


conv3x3_cmajor_vjp.defvjp(_fwd, _bwd)
