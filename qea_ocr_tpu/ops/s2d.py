"""Space-to-depth conv packing: exact-math MXU alignment for shallow convs.

The UNet's full-resolution levels (32/64 channels at 400x512 / 200x256) run
at <10% MXU utilization as plain convs — the 128-wide MXU lane dimension
holds the channel axis, so C=32 uses a quarter of the lanes at best
(measured ~7-9 TF/s on a v5e vs ~100 TF/s for the deep >=128-channel
convs). Packing a 2x2 spatial block into channels turns every
(H, W, C) conv into an (H/2, W/2, 4C) conv with 4C>=128 channels — the
SAME mathematical operator, with the kernel rearranged:

  y[2i+di, 2j+dj, co] = sum_{u,v,ci} x[2i+di+u-1, 2j+dj+v-1, ci] K[u,v,ci,co]

becomes a 3x3 conv over the packed grid with kernel

  K'[m, n, (p,q,ci), (di,dj,co)] = K[2m+p-di-1, 2n+q-dj-1, ci, co]

(entries with the index outside [0,2] are zero; the structured zeros ride
the MXU for free, trading 4x nominal FLOPs for ~8x better utilization).
SAME zero-padding in packed space reproduces SAME padding in the original
space exactly. Stride-2 2x2 ConvTranspose packs even better: it becomes a
1x1 conv producing all four output parities at once (flax's ConvTranspose
applies the kernel flipped: out[2i+p, 2j+q] = in[i, j] @ K[1-p, 1-q]).
2x2/2 max-pooling in packed space is a max over the four parity channels.

No reference counterpart (the reference runs cuDNN convs as-is,
`models/model_unet.py:7-109`); this is pure TPU-first engineering.

When it pays: isolated shallow convs run at 7-9 TF/s vs ~100 TF/s for the
deep ones, but inside the fully-fused UNet graph XLA recovers much of the
gap at large batch. Measured end-to-end on a v5e: packed wins 1.27x at
32-doc batches and ~7% at 8, loses at 1 (overhead) and at the 96-doc
training sweet spot (4x nominal FLOPs dominate once vanilla reaches ~45%
MFU). Hence: training defaults vanilla; serving (which knows its fixed
compiled batch) auto-packs inside the measured 16-48 per-device-batch win
window on TPU; `QEA_MXU_PACKED` forces either way — see
`utils/platform.py default_mxu_packed`.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

__all__ = [
    "space_to_depth", "depth_to_space", "parity_max",
    "pack_conv3x3_kernel", "pack_convT2x2_kernel", "pack_conv1x1_kernel",
    "packed_conv",
]


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel index = (p*2+q)*C + c for
    spatial parity (p, q).

    Implemented as four strided slices + channel concat (NOT the textbook
    6-D reshape/transpose): on TPU the 6-D intermediates put tiny dims in
    the minor tiling positions and blow memory up 32-64x in padding
    (measured: a 78 MB tensor padded to 4.6 GB). Slices stay 4-D NHWC."""
    return jnp.concatenate(
        [x[:, p::2, q::2, :] for p in (0, 1) for q in (0, 1)], axis=-1)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `space_to_depth`, as an identity stride-2 transposed conv
    (pure data movement through the conv unit — keeps every intermediate a
    well-tiled 4-D NHWC tensor; see space_to_depth for why not reshapes).

    lax.conv_transpose with stride 2 and a 2x2 kernel applies the kernel
    flipped: out[2i+p, 2j+q, co] = sum_ci x[i, j, ci] K[1-p, 1-q, ci, co]."""
    B, H, W, C4 = x.shape
    C = C4 // 4
    k = np.zeros((2, 2, C4, C), np.float32)
    for p in range(2):
        for q in range(2):
            par = ((1 - p) * 2 + (1 - q)) * C
            k[p, q, par:par + C, :] = np.eye(C, dtype=np.float32)
    return lax.conv_transpose(
        x, jnp.asarray(k, x.dtype), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def parity_max(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max-pool of the un-packed image, computed in packed space:
    (B, H', W', 4C) -> (B, H', W', C) max over the four parity channels
    (channel slices, not a 5-D reshape — same TPU tiling rationale)."""
    C = x.shape[-1] // 4
    return jnp.maximum(
        jnp.maximum(x[..., :C], x[..., C:2 * C]),
        jnp.maximum(x[..., 2 * C:3 * C], x[..., 3 * C:]))


# A[m, p, u, di] = 1 iff u == 2(m-1) + p - di + 1, the (input-offset m,
# input-parity p) slot that original kernel tap u hits for output parity di.
_A = np.zeros((3, 2, 3, 2), np.float32)
for _m in range(3):
    for _p in range(2):
        for _di in range(2):
            _u = 2 * (_m - 1) + _p - _di + 1
            if 0 <= _u <= 2:
                _A[_m, _p, _u, _di] = 1.0


def pack_conv3x3_kernel(K: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (3, 3, 4Cin, 4Cout) packed-space kernel."""
    Cin, Cout = K.shape[2], K.shape[3]
    A = jnp.asarray(_A, K.dtype)
    T = jnp.einsum("mpud,nqve,uvio->mnpqideo", A, A, K)
    return T.reshape(3, 3, 4 * Cin, 4 * Cout)


def pack_convT2x2_kernel(K: jnp.ndarray) -> jnp.ndarray:
    """flax ConvTranspose (2, 2, Cin, Cout) stride-2 kernel -> (1, 1, Cin,
    4Cout) kernel mapping an UNPACKED input to the PACKED upsampled output."""
    Cin, Cout = K.shape[2], K.shape[3]
    Kf = K[::-1, ::-1]                               # out parity (p,q) <- K[1-p,1-q]
    return Kf.transpose(2, 0, 1, 3).reshape(1, 1, Cin, 4 * Cout)


def pack_conv1x1_kernel(K: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, Cin, Cout) -> (1, 1, 4Cin, 4Cout) parity-block-diagonal."""
    Cin, Cout = K.shape[2], K.shape[3]
    eye = jnp.eye(4, dtype=K.dtype)
    K4 = jnp.einsum("ab,io->aibo", eye, K[0, 0])
    return K4.reshape(1, 1, 4 * Cin, 4 * Cout)


def packed_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Plain NHWC SAME conv (stride 1) used by all packed paths."""
    return lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
