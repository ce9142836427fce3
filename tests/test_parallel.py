"""2-D (data x model) mesh: tensor-parallel sharding of the two-phase step.

A PartitionSpec constrains layout, not math, so the TP-sharded step must
reproduce the single-device step numerically (same compiled graph semantics;
GSPMD inserts the collectives). Runs on the 8-virtual-device CPU platform
(tests/conftest.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qea_ocr_tpu import config as C
from qea_ocr_tpu.models import CRNN, UNet
from qea_ocr_tpu.parallel import (
    make_mesh_2d, put_batch_2d, put_tp, tp_spec,
)
from qea_ocr_tpu.tracking import decaying_weights
from qea_ocr_tpu.train.patch_steps import make_steps
from qea_ocr_tpu.train.state import ModelState, adam_l2
from qea_ocr_tpu.utils.charmap import CharMap

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _world(doc_size=(64, 64), D=4, S=2, W=1):
    cm = CharMap.default()
    L = cm.max_len
    prep = UNet(init_features=4)
    crnn = CRNN(vocab_size=cm.vocab_size, lstm_hidden=16)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    prep_state = ModelState.create(
        prep.init(k1, jnp.zeros((1, 1, *doc_size)), train=False),
        adam_l2(1e-4, 5e-4))
    crnn_state = ModelState.create(
        crnn.init(k2, jnp.zeros((1, 1, *C.INPUT_SIZE)), train=False),
        adam_l2(1e-4, 5e-4))
    steps = make_steps(prep, crnn, cm)

    rng = np.random.default_rng(0)
    N = D * S
    batch = dict(
        images=jnp.asarray(rng.random((D, 1, *doc_size), dtype=np.float32)),
        bboxes=None, strip_mask=jnp.ones((D, S), bool),
        gt_labels=None, gt_lengths=jnp.full((D, S), 3, jnp.int32),
        strip_ids=jnp.arange(N, dtype=jnp.int32).reshape(D, S))
    bboxes = np.zeros((D, S, 4), np.int32)
    bboxes[..., 0] = rng.integers(0, 20, (D, S))
    bboxes[..., 1] = rng.integers(0, 30, (D, S))
    bboxes[..., 2] = bboxes[..., 0] + rng.integers(10, 40, (D, S))
    bboxes[..., 3] = bboxes[..., 1] + rng.integers(8, 20, (D, S))
    batch["bboxes"] = jnp.asarray(bboxes)
    gt = np.full((D, S, L), cm.pad_id, np.int32)
    gt[..., :3] = rng.integers(1, cm.vocab_size, (D, S, 3))
    batch["gt_labels"] = jnp.asarray(gt)
    hist = dict(
        hist_labels=jnp.broadcast_to(batch["gt_labels"].reshape(N, 1, L),
                                     (N, W, L)),
        hist_lengths=jnp.full((N, W), 3, jnp.int32),
        hist_valid=jnp.ones((N, W), bool),
        lw=decaying_weights(0.7, W),
        bb_mask=jnp.ones((N,), bool))
    return cm, steps, prep_state, crnn_state, batch, hist


def _run_two_phase(steps, prep_state, crnn_state, batch, hist, N):
    _, strips = steps.prep_extract(prep_state, batch["images"],
                                   batch["bboxes"])
    crnn_state, loss_a = steps.phase_a(
        crnn_state, strips, hist["bb_mask"], hist["hist_labels"],
        hist["hist_lengths"], hist["hist_valid"], hist["lw"],
        strips[None], hist["hist_labels"][:, 0][None],
        hist["hist_lengths"][:, 0][None],
        decaying=True, inner_limit_skip=True)
    cer_table = jnp.ones((N,), jnp.float32)
    ent_table = jnp.ones((N,), jnp.float32)
    prep_state, crnn_state, _, metrics, cer_table, _ = steps.phase_b(
        prep_state, crnn_state, batch["images"], batch["bboxes"],
        batch["strip_mask"], batch["gt_labels"], cer_table, ent_table,
        batch["gt_lengths"], batch["strip_ids"], update_crnn=False)
    return float(loss_a), float(metrics["loss"]), np.asarray(cer_table)


def test_tp_spec_rules():
    n_model = 2
    # conv kernel: shard cout
    assert tp_spec(np.zeros((3, 3, 16, 32)), n_model)[-1] == "model"
    # dense kernel: shard out
    assert tp_spec(np.zeros((128, 64)), n_model)[-1] == "model"
    # odd vocab head: replicate
    assert tp_spec(np.zeros((128, 95)), n_model) == jax.sharding.PartitionSpec()
    # scalar: replicate
    assert tp_spec(np.float32(1.0), n_model) == jax.sharding.PartitionSpec()
    # tiny vector below min_shard (2 elems / 2 devices = 1 < 2): replicate
    assert tp_spec(np.zeros((2,)), n_model, min_shard=2) == \
        jax.sharding.PartitionSpec()
    # large divisible vector: sharded
    assert tp_spec(np.zeros((64,)), n_model)[-1] == "model"


def test_two_phase_step_on_2d_mesh_matches_single_device():
    cm, steps, prep_state, crnn_state, batch, hist = _world()
    N = batch["strip_ids"].size
    ref = _run_two_phase(steps, prep_state, crnn_state, batch, hist, N)

    # fresh states (phase_a/b donate their inputs)
    cm, steps, prep_state, crnn_state, batch, hist = _world()
    mesh = make_mesh_2d(4, 2)
    with mesh:
        prep_sh = put_tp(prep_state, mesh)
        crnn_sh = put_tp(crnn_state, mesh)
        batch_sh = put_batch_2d(batch, mesh)
        hist_sh = {k: (put_batch_2d(v, mesh) if getattr(v, "ndim", 0) > 0
                       and v.shape[:1] == (N,) else v)
                   for k, v in hist.items()}
        got = _run_two_phase(steps, prep_sh, crnn_sh, batch_sh, hist_sh, N)

    assert np.isfinite(got[0]) and np.isfinite(got[1])
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-4)
    np.testing.assert_allclose(got[1], ref[1], rtol=2e-4)
    np.testing.assert_allclose(got[2], ref[2], rtol=1e-4, atol=1e-5)


def test_put_tp_distributes_large_kernels():
    cm, steps, prep_state, crnn_state, batch, hist = _world()
    mesh = make_mesh_2d(4, 2)
    crnn_sh = put_tp(crnn_state, mesh)
    # find a conv kernel leaf and confirm it is sharded over model
    leaves = jax.tree_util.tree_leaves_with_path(crnn_sh.params)
    sharded = [
        (jax.tree_util.keystr(p), x) for p, x in leaves
        if getattr(x, "ndim", 0) >= 2 and x.shape[-1] % 2 == 0
    ]
    assert sharded, "expected at least one shardable kernel"
    for name, x in sharded:
        spec = x.sharding.spec
        assert spec[-1] == "model", f"{name} not model-sharded: {spec}"
