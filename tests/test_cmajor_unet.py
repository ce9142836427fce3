"""Channel-major (padded-flat Pallas) UNet path: parity with vanilla.

The cmajor path reroutes enc1/enc2/dec2/dec1 + upconvs + the final 1x1 conv
through `ops/pallas/conv_cmajor.py` (interpret mode on CPU). Parameters are
name/shape-identical to the vanilla NHWC layout, so a single checkpoint
serves both; numerics agree to bf16 rounding (the kernel is bf16-only MXU
compute). Reference topology: `models/model_unet.py:7-109`.
"""

import jax
import jax.numpy as jnp
import jax.tree_util as tu
import numpy as np
import pytest

from qea_ocr_tpu.models import UNet
from qea_ocr_tpu.models.unet import (
    FlatBatchNorm,
    cmajor_supported,
    resolve_conv_impl,
)

F = 4  # init_features; W must satisfy W%128==0 and (W/2)%128==0 -> 256


@pytest.fixture(scope="module")
def models_and_vars():
    vanilla = UNet(init_features=F, conv_impl="xla")
    cmajor = UNet(init_features=F, conv_impl="cmajor")
    x = jnp.asarray(np.random.default_rng(0).random((2, 1, 16, 256),
                                                    dtype=np.float32))
    v_vars = vanilla.init(jax.random.PRNGKey(0), x, train=False)
    return vanilla, cmajor, v_vars, x


def test_param_trees_identical(models_and_vars):
    vanilla, cmajor, v_vars, x = models_and_vars
    c_vars = cmajor.init(jax.random.PRNGKey(0), x, train=False)
    v_shapes = tu.tree_map(jnp.shape, v_vars)
    c_shapes = tu.tree_map(jnp.shape, c_vars)
    assert tu.tree_structure(v_shapes) == tu.tree_structure(c_shapes)
    assert tu.tree_all(tu.tree_map(lambda a, b: a == b, v_shapes, c_shapes))


def test_eval_forward_parity(models_and_vars):
    """Eval mode (running stats) exercises every cmajor module — conv
    chains, upconv interleave, skip concats, final conv — so an indexing
    bug shows as O(1) error; observed agreement is ~1e-4."""
    vanilla, cmajor, v_vars, x = models_and_vars
    yv = vanilla.apply(v_vars, x, train=False)
    yc = cmajor.apply(v_vars, x, train=False)
    assert yc.shape == yv.shape == x.shape
    assert float(jnp.max(jnp.abs(yv - yc))) < 2e-3


def test_train_forward_and_stats_parity(models_and_vars):
    """Train mode adds live batch statistics; bf16 normalization rounding
    compounds through 8 BNs, so the tolerance is looser but still far below
    any structural error."""
    vanilla, cmajor, v_vars, x = models_and_vars
    yv, mv = vanilla.apply(v_vars, x, train=True, mutable=["batch_stats"])
    yc, mc = cmajor.apply(v_vars, x, train=True, mutable=["batch_stats"])
    assert float(jnp.max(jnp.abs(yv - yc))) < 0.08
    diffs = tu.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))), mv, mc)
    assert max(tu.tree_leaves(diffs)) < 5e-3


def test_grads_flow_and_are_finite(models_and_vars):
    """Bitwise grad parity is impossible across layouts (bf16 summation
    order); kernel-level dX/dW parity lives in test_conv_cmajor.py. Here:
    every parameter receives a finite, nonzero gradient through the full
    cmajor graph (custom_vjp wiring, flat-BN reductions, remat of the
    pallas_call)."""
    vanilla, cmajor, v_vars, x = models_and_vars
    cm_remat = UNet(init_features=F, conv_impl="cmajor", remat=True)

    def loss(params, model):
        y, _ = model.apply(
            {"params": params, "batch_stats": v_vars["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.sum(y * y)

    for model in (cmajor, cm_remat):
        g = jax.grad(loss)(v_vars["params"], model)
        for path, leaf in tu.tree_flatten_with_path(g)[0]:
            arr = np.asarray(leaf, np.float64)
            assert np.all(np.isfinite(arr)), path
            assert np.abs(arr).max() > 0, path


def test_flat_batchnorm_exact_vs_flax_f32():
    """With zero pad lanes (the FlatConv output contract) and f32 compute,
    FlatBatchNorm reproduces `nn.BatchNorm(momentum=0.9)` exactly."""
    from flax import linen as nn
    B, C, H, W = 3, 5, 8, 16
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    xf = np.zeros((B, C, (H + 2) * W), np.float32)
    xf[:, :, W:-W] = x.reshape(B, C, H * W)
    xf = jnp.asarray(xf)
    xh = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    fbn = FlatBatchNorm(C, H, W, compute_dtype=jnp.float32)
    vbn = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       dtype=jnp.float32)
    fv = fbn.init(jax.random.PRNGKey(0), xf, use_running_average=False)
    vv = vbn.init(jax.random.PRNGKey(0), xh)
    yf, mf = fbn.apply(fv, xf, use_running_average=False,
                       mutable=["batch_stats"])
    yv, mv = vbn.apply(vv, xh, mutable=["batch_stats"])
    got = np.asarray(yf)[:, :, W:-W].reshape(B, C, H, W)
    ref = np.transpose(np.asarray(yv), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, atol=2e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(mf["batch_stats"][k]),
                                   np.asarray(mv["batch_stats"][k]),
                                   atol=1e-6)


def test_fused_eval_matches_unfused(models_and_vars, monkeypatch):
    """The default eval path fuses BN+ReLU into the conv epilogue (the BN
    scale folds into the weights); QEA_CMAJOR_FUSED=0 forces the unfused
    chain. Both must agree to bf16 weight-fold rounding — and both with
    vanilla (test_eval_forward_parity covers fused-vs-vanilla)."""
    vanilla, cmajor, v_vars, x = models_and_vars
    y_fused = cmajor.apply(v_vars, x, train=False)
    monkeypatch.setenv("QEA_CMAJOR_FUSED", "0")
    y_unfused = cmajor.apply(v_vars, x, train=False)
    assert float(jnp.max(jnp.abs(y_fused - y_unfused))) < 2e-3


def test_resolve_conv_impl():
    assert cmajor_supported(16, 256, F)
    assert not cmajor_supported(16, 192, F)      # W/2 not lane-aligned
    assert not cmajor_supported(18, 256, F)      # H % 4
    # production geometry at f=32
    assert cmajor_supported(400, 512, 32)
    assert cmajor_supported(512, 512, 32)
    # explicit settings win; auto always resolves xla (kernel is opt-in)
    assert resolve_conv_impl("xla", 16, 256, F) == "xla"
    assert resolve_conv_impl("cmajor", 16, 256, F) == "cmajor"
    assert resolve_conv_impl("auto", 16, 256, F) == "xla"  # CPU backend
    with pytest.raises(AssertionError):
        resolve_conv_impl("cmajor", 16, 192, F)


def test_make_steps_prep_eval_model_parity():
    """Production split (`train/patch_steps.make_steps(prep_eval_model=)`):
    the no-grad forwards (prep_extract, val_forward) run through the eval
    twin; outputs must match the single-model factory bit-for-layout-
    tolerance, and the twin must share the grad model's params verbatim."""
    from qea_ocr_tpu.models import CRNN
    from qea_ocr_tpu.train.patch_steps import make_steps
    from qea_ocr_tpu.train.state import ModelState, adam_l2
    from qea_ocr_tpu.utils.charmap import CharMap

    cm = CharMap.default()
    H, W, D, S = 16, 256, 2, 2
    vanilla = UNet(init_features=F, conv_impl="xla")
    cmajor = UNet(init_features=F, conv_impl="cmajor")
    crnn = CRNN(vocab_size=cm.vocab_size, lstm_hidden=16)
    x = jnp.asarray(np.random.default_rng(1).random((D, 1, H, W),
                                                    dtype=np.float32))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    prep_state = ModelState.create(
        vanilla.init(k1, x[:1], train=False), adam_l2(1e-4, 0.0))
    crnn_state = ModelState.create(
        crnn.init(k2, jnp.zeros((1, 1, 32, 128)), train=False),
        adam_l2(1e-4, 0.0))
    bboxes = np.zeros((D, S, 4), np.int32)
    bboxes[..., 2], bboxes[..., 3] = 64, 12      # x2,y2
    bboxes = jnp.asarray(bboxes)

    ref_steps = make_steps(vanilla, crnn, cm)
    split_steps = make_steps(vanilla, crnn, cm, prep_eval_model=cmajor)
    doc_ref, strips_ref = ref_steps.prep_extract(prep_state, x, bboxes)
    doc_spl, strips_spl = split_steps.prep_extract(prep_state, x, bboxes)
    assert doc_spl.shape == doc_ref.shape
    np.testing.assert_allclose(np.asarray(doc_spl), np.asarray(doc_ref),
                               atol=5e-2)   # bf16 MXU vs XLA rounding
    np.testing.assert_allclose(np.asarray(strips_spl),
                               np.asarray(strips_ref), atol=5e-2)

    gt_labels = jnp.zeros((D, S, cm.max_len), jnp.int32)
    gt_lengths = jnp.ones((D, S), jnp.int32)
    strip_mask = jnp.ones((D, S), bool)
    out_ref = ref_steps.val_forward(prep_state, crnn_state, x, bboxes,
                                    strip_mask, gt_labels, gt_lengths)
    out_spl = split_steps.val_forward(prep_state, crnn_state, x, bboxes,
                                      strip_mask, gt_labels, gt_lengths)
    np.testing.assert_allclose(np.asarray(out_spl[0]),
                               np.asarray(out_ref[0]), atol=5e-2)
    assert np.isfinite(float(out_spl[4]))
