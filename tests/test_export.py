"""StableHLO export: serialize a trained prep model, reload, compare."""

import jax
import jax.numpy as jnp
import numpy as np

from qea_ocr_tpu.models import UNet
from qea_ocr_tpu.train.state import ModelState, adam_l2
from qea_ocr_tpu.utils.io import save_checkpoint

DOC = (64, 64)


def test_export_roundtrip(tmp_path):
    from qea_ocr_tpu.tools.export_model import export_prep

    model = UNet(init_features=4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, *DOC)), train=False)
    state = ModelState.create(variables, adam_l2(1e-4))
    ckpt = str(tmp_path / "prep")
    save_checkpoint(ckpt, state)

    out = str(tmp_path / "prep.stablehlo")
    info = export_prep(ckpt, out, batch_size=2, doc_size=DOC,
                       unet_features=4, mxu_packed=False)
    assert info["bytes"] > 0 and info["input_shape"] == [2, 1, *DOC]

    from jax import export as jexport
    fn = jexport.deserialize(open(out, "rb").read())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 1, *DOC), dtype=np.float32))
    got = np.asarray(fn.call(x))
    want = np.asarray(model.apply(variables, x, train=False))
    # the UNet computes in bfloat16; the deserialized artifact is AOT-
    # compiled with different machine features, so reassociation noise is
    # bf16-scale, not f32-scale
    assert np.abs(got - want).max() < 2e-2
    assert np.abs(got - want).mean() < 2e-3


def test_export_cli(tmp_path, capsys):
    from qea_ocr_tpu.tools.export_model import main

    model = UNet(init_features=4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, *DOC)), train=False)
    save_checkpoint(str(tmp_path / "prep"),
                    ModelState.create(variables, adam_l2(1e-4)))
    main(["--prep_path", str(tmp_path / "prep"),
          "--out", str(tmp_path / "m.stablehlo"),
          "--batch_size", "1", "--doc_size", str(DOC[0]), str(DOC[1]),
          "--unet_features", "4"])
    import json
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (tmp_path / "m.stablehlo").stat().st_size == info["bytes"]
