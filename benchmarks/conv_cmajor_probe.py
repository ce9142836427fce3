"""Decision-gate probe for the channel-major conv kernel.

Correctness vs lax.conv_general_dilated at a small shape, then host-synced
timing at the UNet's lane-starved conv shapes (D=96 training batch) against
the XLA NHWC conv the model currently uses. Run on the real TPU:

    python benchmarks/conv_cmajor_probe.py [--bwd]

Prints one line per shape: cmajor ms vs XLA ms and the speedup. The
integration gate (see benchmarks/RESULTS.md roofline): >=1.8x on dec1
forward, else the kernel stays a probe.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from qea_ocr_tpu.ops.pallas.conv_cmajor import (  # noqa: E402
    conv3x3_cmajor, conv3x3_cmajor_vjp, conv_flat, pad_flat)


def xla_conv_nchw(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def xla_conv_nhwc(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def check_correctness():
    rng = np.random.default_rng(0)
    d, cin, cout, h, w_ = 2, 8, 16, 32, 128
    x = jnp.asarray(rng.standard_normal((d, cin, h, w_)), jnp.float32)
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cout)), jnp.float32)
    got = conv3x3_cmajor(x, w, tile_h=8)
    ref = xla_conv_nchw(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    err = float(jnp.max(jnp.abs(got - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    print(f"correctness: max abs err {err:.3e} (scale {scale:.2f})")
    assert err / scale < 2e-2, err

    # gradient parity vs XLA conv (same bf16 compute)
    gt = jnp.asarray(rng.standard_normal(got.shape), jnp.float32)

    def loss_k(x, w):
        return jnp.vdot(conv3x3_cmajor_vjp(x, w), gt)

    def loss_r(x, w):
        # pure f32 reference (mixing bf16 + preferred_element_type trips
        # the conv vjp's dtype check); kernel grads are bf16-computed so
        # tolerance is the bf16 mantissa, not exactness
        return jnp.vdot(xla_conv_nchw(x, w), gt)

    gx_k, gw_k = jax.grad(loss_k, (0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_r, (0, 1))(x, w)
    ex = float(jnp.max(jnp.abs(gx_k - gx_r)) / (jnp.max(jnp.abs(gx_r)) + 1e-9))
    ew = float(jnp.max(jnp.abs(gw_k - gw_r)) / (jnp.max(jnp.abs(gw_r)) + 1e-9))
    print(f"grad parity: dX rel {ex:.3e}, dW rel {ew:.3e}")
    assert ex < 5e-2 and ew < 5e-2, (ex, ew)


def _sync(out):
    # block_until_ready does NOT flush on the tunneled platform — a host
    # scalar fetch is the only reliable barrier (see CLAUDE.md).
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.reshape(-1)[:8]).astype(jnp.float32))


def timeit(fn, *args, iters=20):
    _sync(fn(*args))   # compile + warm, fully flushed
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


SHAPES = [
    # name, D, Cin, Cout, H, W  (UNet at (400,512) docs, training D=96)
    ("dec1.conv1", 96, 64, 32, 400, 512),
    ("dec1.conv2", 96, 32, 32, 400, 512),
    ("enc1.conv2", 96, 32, 32, 400, 512),
    ("dec2.conv1", 96, 128, 64, 200, 256),
    ("dec2.conv2", 96, 64, 64, 200, 256),
    ("enc2.conv1", 96, 32, 64, 200, 256),
    ("enc2.conv2", 96, 64, 64, 200, 256),
]


def main():
    bwd = "--bwd" in sys.argv
    print(f"device: {jax.devices()[0].device_kind}")
    check_correctness()
    rng = np.random.default_rng(0)
    total_k = total_x = 0.0
    for name, d, cin, cout, h, w_ in SHAPES:
        x = jnp.asarray(rng.standard_normal((d, cin, h, w_)), jnp.bfloat16)
        xh = jnp.transpose(x, (0, 2, 3, 1))  # NHWC for the XLA baseline
        w = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cout)),
                        jnp.bfloat16)
        flops = 2 * d * h * w_ * 9 * cin * cout
        if not bwd:
            xf = jax.jit(pad_flat)(x)
            k = jax.jit(functools.partial(conv_flat, height=h, width=w_))
            r = jax.jit(xla_conv_nhwc)
            ms_k = timeit(k, xf, w)
            ms_r = timeit(r, xh, w)
        else:
            gt = jnp.asarray(rng.standard_normal((d, cout, h, w_)),
                             jnp.bfloat16)
            gth = jnp.transpose(gt, (0, 2, 3, 1))

            def fk(x, w):
                return jnp.sum(conv3x3_cmajor_vjp(x, w).astype(jnp.float32)
                               * gt.astype(jnp.float32))

            def fr(xh, w):
                return jnp.sum(xla_conv_nhwc(xh, w).astype(jnp.float32)
                               * gth.astype(jnp.float32))

            k = jax.jit(jax.grad(fk, (0, 1)))
            r = jax.jit(jax.grad(fr, (0, 1)))
            ms_k = timeit(k, x, w)
            ms_r = timeit(r, xh, w)
            flops *= 3
        tf_k, tf_r = flops / ms_k / 1e9, flops / ms_r / 1e9
        total_k += ms_k
        total_x += ms_r
        print(f"{name:11s} D={d} {cin:3d}->{cout:3d} @{h}x{w_}: "
              f"cmajor {ms_k:6.2f} ms ({tf_k:5.1f} TF/s)  "
              f"xla {ms_r:6.2f} ms ({tf_r:5.1f} TF/s)  "
              f"speedup {ms_r / ms_k:4.2f}x")
    print(f"TOTAL {'fwd+bwd' if bwd else 'fwd'}: cmajor {total_k:.2f} ms "
          f"vs xla {total_x:.2f} ms ({total_x / total_k:.2f}x)")


if __name__ == "__main__":
    main()
