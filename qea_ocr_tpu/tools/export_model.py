"""Export a trained preprocessor as a serialized StableHLO artifact.

Deployment path beyond Python: `jax.export` serializes the jitted cleaning
function (params baked in) to a portable StableHLO bytes blob that any
JAX-compatible runtime (C++ PJRT, another Python process without this
package, a later JAX version) can deserialize and call. No reference
counterpart — the reference ships whole-module torch pickles
(`train_nn_patch.py:441`) that require the exact class code to unpickle.

Run: python -m qea_ocr_tpu.tools.export_model --prep_path <ckpt> \
       --out prep.stablehlo [--batch_size 8] [--doc_size 400 512]

Load elsewhere:
    from jax import export
    fn = export.deserialize(open("prep.stablehlo", "rb").read())
    cleaned = fn.call(images)   # (B, 1, H, W) float32 in [0, 1]
"""

from __future__ import annotations

import argparse
import json


def export_prep(prep_path: str, out_path: str, *, batch_size: int = 8,
                doc_size=None, unet_features: int = 32,
                mxu_packed: bool | None = None) -> dict:
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from qea_ocr_tpu import config as C
    from qea_ocr_tpu.models import UNet
    from qea_ocr_tpu.train.state import ModelState, adam_l2
    from qea_ocr_tpu.utils.io import load_checkpoint
    from qea_ocr_tpu.utils.platform import default_mxu_packed

    doc_size = tuple(doc_size or C.DOC_SIZE)
    if mxu_packed is None:
        mxu_packed = default_mxu_packed()
    model = UNet(init_features=unet_features, mxu_packed=mxu_packed)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, *doc_size)), train=False)
    state = load_checkpoint(prep_path, ModelState.create(variables,
                                                         adam_l2(1e-4)))
    var_const = jax.tree_util.tree_map(jnp.asarray, state.variables)

    def clean(images):
        return model.apply(var_const, images, train=False)

    spec = jax.ShapeDtypeStruct((batch_size, 1, *doc_size), jnp.float32)
    exported = jexport.export(jax.jit(clean))(spec)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    return {
        "out": out_path,
        "bytes": len(blob),
        "input_shape": [batch_size, 1, *doc_size],
        "platforms": list(exported.platforms),
        "mxu_packed": mxu_packed,
    }


def main(argv=None):
    from qea_ocr_tpu.utils.platform import setup_platform
    setup_platform()
    p = argparse.ArgumentParser(
        description="Export a trained prep model to StableHLO")
    p.add_argument("--prep_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--doc_size", type=int, nargs=2, default=None,
                   metavar=("H", "W"))
    p.add_argument("--unet_features", type=int, default=32)
    args = p.parse_args(argv)
    info = export_prep(args.prep_path, args.out, batch_size=args.batch_size,
                       doc_size=args.doc_size,
                       unet_features=args.unet_features)
    print(json.dumps(info))


if __name__ == "__main__":
    main()
