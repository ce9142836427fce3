"""Shape/geometry/gradient tests for CRNN, UNet, HistoryAttention.

The CRNN geometry contract (31 timesteps from a (32,128) strip) is the
load-bearing parity requirement — CTC pred_size depends on it
(reference `models/model_crnn.py:47-55`, SURVEY.md §3.5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qea_ocr_tpu.models import CRNN, UNet, HistoryAttention

VOCAB = 95


@pytest.fixture(scope="module")
def crnn_vars():
    model = CRNN(vocab_size=VOCAB)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 1, 32, 128)), train=False)
    return model, v


class TestCRNN:
    def test_output_geometry(self, crnn_vars):
        model, v = crnn_vars
        x = jnp.zeros((3, 1, 32, 128))
        out = model.apply(v, x, train=False)
        assert out.shape == (31, 3, VOCAB)  # (T, B, V)

    def test_log_softmax_normalized(self, crnn_vars):
        model, v = crnn_vars
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 32, 128))
        out = model.apply(v, x, train=False)
        sums = jnp.exp(out).sum(axis=-1)
        np.testing.assert_allclose(np.asarray(sums), 1.0, atol=1e-3)

    def test_train_mode_updates_batch_stats(self, crnn_vars):
        model, v = crnn_vars
        x = jax.random.uniform(jax.random.PRNGKey(2), (2, 1, 32, 128))
        out, updates = model.apply(
            v, x, train=True, mutable=["batch_stats"]
        )
        assert out.shape == (31, 2, VOCAB)
        # running stats changed
        old = jax.tree_util.tree_leaves(v["batch_stats"])
        new = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
        )

    def test_gradients_finite(self, crnn_vars):
        model, v = crnn_vars
        x = jax.random.uniform(jax.random.PRNGKey(3), (2, 1, 32, 128))

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, x, train=False
            )
            return jnp.sum(out ** 2)

        g = jax.grad(loss_fn)(v["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)


class TestUNet:
    def test_shape_preserving_sigmoid(self):
        model = UNet()
        x = jnp.zeros((1, 1, 64, 64))
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(v, x, train=False)
        assert out.shape == x.shape
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_nonsquare_doc_shape(self):
        # Full (400, 512) doc geometry runs on TPU in bench; keep the CPU
        # suite fast with a smaller 16-divisible non-square shape.
        model = UNet()
        x = jnp.zeros((1, 1, 96, 128))
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(v, x, train=False)
        assert out.shape == (1, 1, 96, 128)

    @pytest.mark.parametrize("remat", [True, "shallow"])
    def test_remat_variants_param_and_output_identical(self, remat):
        """remat (full or enc1/dec1-only 'shallow') changes the backward
        schedule, never the math or the checkpoint tree."""
        import numpy as np
        vanilla = UNet(compute_dtype=jnp.float32)
        rm = UNet(compute_dtype=jnp.float32, remat=remat)
        x = jnp.asarray(np.random.default_rng(0).random((2, 1, 64, 64),
                                                        dtype=np.float32))
        v = vanilla.init(jax.random.PRNGKey(0), x, train=False)
        # identical param tree: checkpoints interchange freely
        assert (jax.tree_util.tree_structure(v) ==
                jax.tree_util.tree_structure(
                    rm.init(jax.random.PRNGKey(0), x, train=False)))
        np.testing.assert_allclose(
            np.asarray(vanilla.apply(v, x, train=False)),
            np.asarray(rm.apply(v, x, train=False)), rtol=1e-6, atol=1e-6)

        def loss(m, params):
            return jnp.sum(m.apply({"params": params,
                                    "batch_stats": v["batch_stats"]},
                                   x, train=False) ** 2)

        g0 = jax.grad(lambda p: loss(vanilla, p))(v["params"])
        g1 = jax.grad(lambda p: loss(rm, p))(v["params"])
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


class TestHistoryAttention:
    @pytest.mark.parametrize("activation", ["sigmoid", "softmax", "relu"])
    def test_weight_shapes_and_ranges(self, activation):
        W, L = 3, 10
        model = HistoryAttention(
            char_vocab_size=VOCAB, emb_size=32, query_dim=8,
            window_size=W, activation=activation,
        )
        x = jnp.zeros((4, W, L), dtype=jnp.int32)
        v = model.init(jax.random.PRNGKey(0), x)
        w = model.apply(v, x)
        assert w.shape == (4, W)
        assert float(w.min()) >= 0.0
        if activation == "softmax":
            np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-4)
        elif activation == "relu":
            # normalized to 1 unless everything was clipped to zero
            assert float(w.sum(-1).max()) <= 1.0 + 1e-4

    def test_pad_embedding_row_zero(self):
        model = HistoryAttention(
            char_vocab_size=VOCAB, emb_size=16, query_dim=8, window_size=2
        )
        x = jnp.zeros((1, 2, 5), dtype=jnp.int32)
        v = model.init(jax.random.PRNGKey(0), x)
        emb = v["constants"]["embedding"]
        assert float(jnp.abs(emb[VOCAB]).max()) == 0.0
        assert float(jnp.abs(emb[:VOCAB]).max()) > 0.0
