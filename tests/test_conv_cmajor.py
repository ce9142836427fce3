"""Channel-major implicit-GEMM conv kernel: XLA parity + halo contract.

Interpret mode runs the kernel (including its manual DMA path) on CPU; the
same code compiles on TPU. The reference for numerics is exact f32 math on
the same bf16-quantized operands, so tolerances are bf16 rounding
(eps ~ 3.9e-3), not implementation slack.

Covers the advisor-flagged gaps: the output-halo zero guarantee for
n_tiles == 1 (both edge `pl.when` branches fire in one grid step) and
n_tiles > 1, and the VJP contract that garbage cotangents on the pad lanes
can never leak into dX (reference semantics being accelerated:
`models/model_unet.py:7-109` 3x3 SAME convs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qea_ocr_tpu.ops.pallas import conv_cmajor as cc

D, CIN, COUT, W = 2, 6, 5, 128


def _operands(rng, h):
    x = jnp.asarray(rng.standard_normal((D, CIN, h, W)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, CIN, COUT))
                    .astype(np.float32)).astype(jnp.bfloat16)
    return x, w


def _xla_f32(x, w):
    """Exact f32 conv on the same bf16-quantized values."""
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"))


@pytest.mark.parametrize("h", [8, 24])  # n_tiles == 1 and n_tiles == 3
def test_forward_matches_xla(h):
    x, w = _operands(np.random.default_rng(0), h)
    got = cc.conv3x3_cmajor(x, w).astype(jnp.float32)
    ref = _xla_f32(x, w)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 6e-3, rel


@pytest.mark.parametrize("h", [8, 24])
def test_output_halo_lanes_are_zero(h):
    x, w = _operands(np.random.default_rng(1), h)
    out = np.asarray(cc.conv_flat(cc.pad_flat(x), w, h, W))
    assert np.all(out[:, :, :W] == 0)
    assert np.all(out[:, :, (h + 1) * W:] == 0)


@pytest.mark.parametrize("h", [8, 24])
def test_vjp_matches_xla_and_ignores_cotangent_halo_garbage(h):
    rng = np.random.default_rng(2)
    x, w = _operands(rng, h)
    xf32, wf32 = x.astype(jnp.float32), w.astype(jnp.float32)
    g = jnp.asarray(rng.standard_normal((D, COUT, h, W)).astype(np.float32))

    def loss_kernel(a, b):
        yf = cc.conv_flat_vjp(cc.pad_flat(a.astype(jnp.bfloat16)),
                              b.astype(jnp.bfloat16), h, W)
        return jnp.sum(cc.unflat(yf, h, W).astype(jnp.float32) * g)

    def loss_xla(a, b):
        return jnp.sum(_xla_f32(a, b) * g)

    dxk, dwk = jax.grad(loss_kernel, argnums=(0, 1))(xf32, wf32)
    dxx, dwx = jax.grad(loss_xla, argnums=(0, 1))(xf32, wf32)
    for got, ref in ((dxk, dxx), (dwk, dwx)):
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 6e-3, rel

    # Garbage cotangents on the pad lanes must not reach dXf, and dXf's own
    # pad lanes are written as zeros (chained flat-BN/ReLU grads rely on
    # flowing through the conv without a mask pass).
    xf = cc.pad_flat(x)
    yf, vjp = jax.vjp(lambda a: cc.conv_flat_vjp(a, w, h, W), xf)
    gt_clean = np.zeros((D, COUT, (h + 2) * W), np.float32)
    gt_clean[:, :, W:-W] = np.asarray(g).reshape(D, COUT, h * W)
    gt_garbage = gt_clean.copy()
    gt_garbage[:, :, :W] = 1e4
    gt_garbage[:, :, (h + 1) * W:] = -1e4
    dx_clean, = vjp(jnp.asarray(gt_clean).astype(jnp.bfloat16))
    dx_garbage, = vjp(jnp.asarray(gt_garbage).astype(jnp.bfloat16))
    np.testing.assert_array_equal(np.asarray(dx_clean),
                                  np.asarray(dx_garbage))
    dx = np.asarray(dx_clean)
    assert np.all(dx[:, :, :W] == 0)
    assert np.all(dx[:, :, (h + 1) * W:] == 0)


@pytest.mark.parametrize("h", [8, 24])
def test_fused_bn_relu_epilogue(h):
    """`conv_flat_bn_relu` == relu(conv * mul + add) on the real lanes
    (bf16-rounding tolerance: the scale folds into the weights), and the
    output halo lanes stay ZEROS even with a nonzero shift (the epilogue
    is not applied to the halo DMAs)."""
    rng = np.random.default_rng(3)
    x, w = _operands(rng, h)
    mul = jnp.asarray(0.5 + rng.random(COUT, dtype=np.float32))
    add = jnp.asarray(rng.standard_normal(COUT).astype(np.float32))

    out = np.asarray(cc.conv_flat_bn_relu(cc.pad_flat(x), w, mul, add, h, W))
    ref = np.maximum(
        np.asarray(_xla_f32(x, w)) * np.asarray(mul)[None, :, None, None]
        + np.asarray(add)[None, :, None, None], 0.0)

    got = out[:, :, W:-W].reshape(D, COUT, h, W).astype(np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 6e-3, rel
    assert np.all(out[:, :, :W] == 0)          # halo stays zero-clean
    assert np.all(out[:, :, (h + 1) * W:] == 0)


def test_supports_and_tiling():
    assert cc.default_tile_h(24, W, CIN) == 8
    assert cc.supports((D, CIN, 24, 128), (3, 3, CIN, COUT))
    assert not cc.supports((D, CIN, 24, 100), (3, 3, CIN, COUT))  # lanes
    assert not cc.supports((D, CIN, 24, 128), (5, 5, CIN, COUT))  # 3x3 only
