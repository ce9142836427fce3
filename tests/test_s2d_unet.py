"""Space-to-depth packed UNet: exact parity with the vanilla layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qea_ocr_tpu.models import UNet
from qea_ocr_tpu.ops.s2d import (
    depth_to_space,
    pack_conv3x3_kernel,
    packed_conv,
    space_to_depth,
)

F32 = dict(compute_dtype=jnp.float32)


def test_s2d_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 8, 6, 3), dtype=np.float32))
    assert jnp.array_equal(depth_to_space(space_to_depth(x)), x)


def test_packed_conv3x3_matches_direct():
    from jax import lax
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 12, 5)).astype(np.float32))
    K = jnp.asarray(rng.standard_normal((3, 3, 5, 7)).astype(np.float32))
    direct = lax.conv_general_dilated(
        x, K, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    packed = depth_to_space(packed_conv(space_to_depth(x),
                                        pack_conv3x3_kernel(K)))
    np.testing.assert_allclose(np.asarray(direct), np.asarray(packed),
                               rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def models_and_vars():
    vanilla = UNet(init_features=8, **F32)
    packed = UNet(init_features=8, mxu_packed=True, **F32)
    x = jnp.zeros((1, 1, 32, 48))
    v_vars = vanilla.init(jax.random.PRNGKey(0), x, train=False)
    p_vars = packed.init(jax.random.PRNGKey(0), x, train=False)
    return vanilla, packed, v_vars, p_vars


def test_param_trees_identical(models_and_vars):
    _, _, v_vars, p_vars = models_and_vars
    v_shapes = jax.tree_util.tree_map(jnp.shape, v_vars)
    p_shapes = jax.tree_util.tree_map(jnp.shape, p_vars)
    assert v_shapes == p_shapes  # same names, same shapes -> checkpoints swap


def test_eval_forward_parity(models_and_vars):
    vanilla, packed, v_vars, _ = models_and_vars
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 1, 32, 48), dtype=np.float32))
    y_v = vanilla.apply(v_vars, x, train=False)
    y_p = packed.apply(v_vars, x, train=False)   # SAME variables
    np.testing.assert_allclose(np.asarray(y_v), np.asarray(y_p),
                               rtol=2e-5, atol=2e-5)


def test_train_forward_and_batch_stats_parity(models_and_vars):
    vanilla, packed, v_vars, _ = models_and_vars
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 1, 32, 48), dtype=np.float32))
    y_v, upd_v = vanilla.apply(v_vars, x, train=True, mutable=["batch_stats"])
    y_p, upd_p = packed.apply(v_vars, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_v), np.asarray(y_p),
                               rtol=2e-5, atol=2e-5)
    flat_v = jax.tree_util.tree_leaves_with_path(upd_v["batch_stats"])
    flat_p = dict(jax.tree_util.tree_leaves_with_path(upd_p["batch_stats"]))
    for path, leaf_v in flat_v:
        np.testing.assert_allclose(
            np.asarray(leaf_v), np.asarray(flat_p[path]),
            rtol=2e-5, atol=2e-5, err_msg=str(path))


def test_gradients_parity(models_and_vars):
    vanilla, packed, v_vars, _ = models_and_vars
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((2, 1, 32, 48), dtype=np.float32))

    def loss(model, params):
        out = model.apply(
            {"params": params, "batch_stats": v_vars["batch_stats"]},
            x, train=False)
        return jnp.mean((out - 1.0) ** 2)

    g_v = jax.grad(lambda p: loss(vanilla, p))(v_vars["params"])
    g_p = jax.grad(lambda p: loss(packed, p))(v_vars["params"])
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_p))
    for path, leaf_v in jax.tree_util.tree_leaves_with_path(g_v):
        np.testing.assert_allclose(
            np.asarray(leaf_v), np.asarray(flat_p[path]),
            rtol=1e-4, atol=1e-5, err_msg=str(path))
