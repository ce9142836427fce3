"""Pallas strip-gather kernel vs the reference XLA gather path.

Interpreter mode makes the kernel run on CPU; the same code path compiles
on TPU. Parity must hold for forward values AND the VJP into the document
(the preprocessor's gradients flow through the extraction)."""

import numpy as np
import jax
import jax.numpy as jnp

from qea_ocr_tpu.ops.pallas.gather_pallas import text_stack_pallas
from qea_ocr_tpu.ops.text_stack import get_text_stack


def _xla_batch(docs, bboxes):
    return jax.vmap(lambda d, b: get_text_stack(d, b, 32, 128))(docs, bboxes)


def _random_boxes(rng, D, S, H, W):
    b = np.zeros((D, S, 4), np.int32)
    b[..., 0] = rng.integers(0, W - 130, (D, S))
    b[..., 1] = rng.integers(0, H - 34, (D, S))
    b[..., 2] = b[..., 0] + rng.integers(1, 127, (D, S))
    b[..., 3] = b[..., 1] + rng.integers(1, 31, (D, S))
    return b


class TestGatherPallasParity:
    def test_forward_matches_xla(self):
        rng = np.random.default_rng(0)
        D, S, H, W = 3, 5, 96, 256
        docs = jnp.asarray(rng.random((D, 1, H, W), dtype=np.float32))
        bboxes = jnp.asarray(_random_boxes(rng, D, S, H, W))
        got = text_stack_pallas(docs, bboxes)
        ref = _xla_batch(docs, bboxes)[:, :, 0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-6)

    def test_edge_boxes(self):
        """Crops hugging every document border (window clipping paths)."""
        H, W = 64, 256
        rng = np.random.default_rng(1)
        docs = jnp.asarray(rng.random((1, 1, H, W), dtype=np.float32))
        boxes = np.array([[
            [0, 0, 100, 20],            # top-left corner
            [W - 100, H - 20, W, H],    # bottom-right corner
            [0, 30, 5, 33],             # tiny crop at left edge
            [W - 5, 0, W, 31],          # tall crop at right edge
            [10, 10, 11, 11],           # 1x1 crop
        ]], np.int32)
        got = text_stack_pallas(docs, jnp.asarray(boxes))
        ref = _xla_batch(docs, jnp.asarray(boxes))[:, :, 0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-6)

    def test_degenerate_dummy_box_is_white(self):
        docs = jnp.zeros((1, 1, 64, 256), jnp.float32)
        boxes = jnp.asarray(np.array([[[0, 0, 0, 0]]], np.int32))
        got = text_stack_pallas(docs, boxes)
        np.testing.assert_allclose(np.asarray(got), 1.0)

    def test_vjp_matches_xla(self):
        rng = np.random.default_rng(2)
        D, S, H, W = 2, 4, 96, 256
        docs = jnp.asarray(rng.random((D, 1, H, W), dtype=np.float32))
        # include overlapping boxes: the bwd scatter must ACCUMULATE
        b = _random_boxes(rng, D, S, H, W)
        b[:, 1] = b[:, 0]  # strip 1 overlaps strip 0 exactly
        bboxes = jnp.asarray(b)
        cot = jnp.asarray(rng.random((D, S, 32, 128), dtype=np.float32))

        def f_pallas(d):
            return jnp.sum(text_stack_pallas(d, bboxes) * cot)

        def f_xla(d):
            return jnp.sum(_xla_batch(d, bboxes)[:, :, 0] * cot)

        g_pallas = jax.grad(f_pallas)(docs)
        g_xla = jax.grad(f_xla)(docs)
        np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                                   rtol=0, atol=1e-5)
        assert float(jnp.abs(g_pallas).sum()) > 0

    def test_jit_and_grad_compose(self):
        rng = np.random.default_rng(3)
        docs = jnp.asarray(rng.random((2, 1, 64, 256), dtype=np.float32))
        bboxes = jnp.asarray(_random_boxes(rng, 2, 3, 64, 256))

        @jax.jit
        def step(d):
            out = text_stack_pallas(d, bboxes)
            return jnp.mean(out ** 2)

        v, g = jax.jit(jax.value_and_grad(step))(docs), None
        assert np.isfinite(float(v[0] if isinstance(v, tuple) else v))


def test_supports_gate():
    from qea_ocr_tpu.ops.pallas.gather_pallas import supports
    assert supports(400, 512) and supports(512, 512) and supports(96, 256)
    assert not supports(96, 160)   # lane dim not a multiple of 128
    assert not supports(100, 512)  # sublane dim not a multiple of 8
    assert not supports(32, 512)   # shorter than the oversized window


def test_dispatch_env_forcing_and_bf16_fallback(monkeypatch):
    """Dispatch routing is decided at TRACE time (`get_text_stack_batch` is
    jitted), so each sub-check uses a DISTINCT doc shape to force a fresh
    trace, and a spy on the kernel entry point records whether the Pallas
    path was actually taken — value-comparing two calls of the same jit
    would just hit the compile cache and compare the kernel to itself."""
    from qea_ocr_tpu.ops.pallas import gather_pallas
    from qea_ocr_tpu.ops.text_stack import get_text_stack_batch
    calls = []
    real = gather_pallas.text_stack_pallas
    monkeypatch.setattr(gather_pallas, "text_stack_pallas",
                        lambda d, b: calls.append(d.dtype) or real(d, b))
    rng = np.random.default_rng(5)
    bboxes = jnp.asarray(_random_boxes(rng, 2, 3, 96, 256))

    monkeypatch.setenv("QEA_GATHER_IMPL", "pallas")
    docs = jnp.asarray(rng.random((2, 1, 96, 256), dtype=np.float32))
    forced = get_text_stack_batch(docs, bboxes, 32, 128)
    assert len(calls) == 1  # pallas path traced
    ref = jax.vmap(lambda d, b: get_text_stack(d, b, 32, 128))(docs, bboxes)
    np.testing.assert_allclose(np.asarray(forced), np.asarray(ref),
                               rtol=0, atol=1e-6)

    monkeypatch.setenv("QEA_GATHER_IMPL", "xla")
    docs2 = jnp.asarray(rng.random((3, 1, 96, 256), dtype=np.float32))
    get_text_stack_batch(docs2, bboxes[:1].repeat(3, 0), 32, 128)
    assert len(calls) == 1  # forcing xla: kernel NOT traced

    monkeypatch.setenv("QEA_GATHER_IMPL", "pallas")
    bf = get_text_stack_batch(
        jnp.asarray(rng.random((4, 1, 96, 256), dtype=np.float32),
                    jnp.bfloat16),
        bboxes[:1].repeat(4, 0), 32, 128)
    assert len(calls) == 1  # bf16: falls back to XLA even when forced
    assert bf.dtype == jnp.bfloat16
