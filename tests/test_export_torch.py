"""JAX->torch checkpoint export: inverse of import_torch.

Forward parity: a randomly-initialized (stats-randomized) flax model saved
as an orbax checkpoint, exported to the reference state_dict schema
(`models/model_crnn.py:5-56` key names), loaded into this repo's
independent torch twin (`benchmarks/torch_baseline.py`), must reproduce
the flax forward pass. Round-trip: export -> import_torch.convert must be
the identity on the flax pytree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from benchmarks.torch_baseline import build_models
from qea_ocr_tpu import config as C
from qea_ocr_tpu.models import CRNN, UNet
from qea_ocr_tpu.tools.export_torch import (
    export_crnn,
    load_into_twin_crnn,
    state_dict_from_crnn,
    state_dict_from_unet,
)
from qea_ocr_tpu.tools.import_torch import convert_crnn, convert_unet
from qea_ocr_tpu.train.state import ModelState, adam_l2
from qea_ocr_tpu.utils.io import save_checkpoint


def _randomized_variables(model, example, seed=0):
    """init + noise on params AND batch stats (mean shifted, var kept >0)
    so the BN stat conversion is actually exercised."""
    variables = model.init(jax.random.PRNGKey(seed), example, train=False)
    rng = np.random.default_rng(seed)

    def _noise(a):
        a = np.asarray(a, np.float32)
        return a + rng.normal(0, 0.3, a.shape).astype(np.float32)

    params = jax.tree_util.tree_map(_noise, dict(variables["params"]))
    stats = dict(variables.get("batch_stats", {}))

    def _stat(path_is_var):
        def f(a):
            a = np.asarray(a, np.float32)
            r = rng.normal(0, 0.3, a.shape).astype(np.float32)
            return np.abs(a + r) + 0.5 if path_is_var else a + r
        return f

    out_stats = {}
    for blk, sub in stats.items():
        out_stats[blk] = jax.tree_util.tree_map_with_path(
            lambda p, a: _stat("var" in jax.tree_util.keystr(p))(a), sub)
    return {"params": params, "batch_stats": out_stats}


def _assert_trees_equal(tree_a, tree_b):
    ks = jax.tree_util.keystr
    flat_a = {ks(p): a for p, a
              in jax.tree_util.tree_leaves_with_path(tree_a)}
    flat_b = {ks(p): a for p, a
              in jax.tree_util.tree_leaves_with_path(tree_b)}
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_allclose(np.asarray(flat_a[k]),
                                   np.asarray(flat_b[k]), atol=1e-6,
                                   err_msg=k)


def test_crnn_export_forward_parity_and_roundtrip(tmp_path):
    V = 23
    model = CRNN(vocab_size=V, compute_dtype=jnp.float32)
    variables = _randomized_variables(
        model, jnp.zeros((1, 1, *C.INPUT_SIZE)))

    sd = state_dict_from_crnn(variables)
    assert "convo.conv1.weight" in sd
    assert sd["lstm.weight_ih_l1_reverse"].shape == (1024, 512)

    # round-trip through the import converter is the identity
    back = convert_crnn(sd)
    _assert_trees_equal(variables["params"], back["params"])

    # forward parity against the torch twin
    _, tw = build_models(vocab_size=V)
    load_into_twin_crnn(tw, sd)
    tw.eval()
    x = np.random.default_rng(1).random((2, 1, *C.INPUT_SIZE), np.float32)
    with torch.no_grad():
        want = tw(torch.tensor(x)).numpy()
    got = np.asarray(model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False))
    assert got.shape == want.shape == (31, 2, V)
    assert np.abs(got - want).max() < 2e-3


def test_unet_export_roundtrip(tmp_path):
    model = UNet(init_features=8, compute_dtype=jnp.float32)
    variables = _randomized_variables(model, jnp.zeros((1, 1, 64, 64)))
    sd = state_dict_from_unet(variables)
    assert "encoder1.enc1conv1.weight" in sd and "upconv4.bias" in sd
    back = convert_unet(sd)
    for col in ("params", "batch_stats"):
        _assert_trees_equal(variables[col], back[col])


def test_export_cli_from_orbax(tmp_path):
    """export_crnn reads a real orbax checkpoint and writes a torch-loadable
    state_dict pickle."""
    from qea_ocr_tpu.utils.charmap import CharMap
    V = CharMap.default().vocab_size
    model = CRNN(vocab_size=V, compute_dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 1, *C.INPUT_SIZE)), train=False)
    state = ModelState.create(variables, adam_l2(1e-4))
    ckpt = str(tmp_path / "crnn_ckpt")
    save_checkpoint(ckpt, state)

    out = str(tmp_path / "CRNN_model_sd.pt")
    export_crnn(ckpt, out)
    sd = torch.load(out, map_location="cpu", weights_only=False)
    assert sd["linear.weight"].shape[0] == V
    _, tw = build_models(vocab_size=V)
    load_into_twin_crnn(tw, {k: v.numpy() for k, v in sd.items()})
