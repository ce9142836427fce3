"""Export this framework's orbax checkpoints to reference-schema PyTorch
state_dicts — the inverse of ``tools/import_torch.py``.

A user migrating OFF the reference repo imports its pickles with
``import_torch``; this tool closes the loop the other way: models trained
here can be handed back to any consumer of the reference's checkpoint
schema (``models/model_unet.py:7-109``, ``models/model_crnn.py:5-56`` —
``encoder1.enc1conv1.weight``, ``convo.conv1.weight``, ``lstm.weight_ih_l0``,
``linear.weight``). The output is a plain ``state_dict`` pickle
(``torch.save(OrderedDict)``), loadable without this package installed.

Layout conversions are the exact inverses of the import side (verified by
round-trip + forward-parity tests in ``tests/test_export_torch.py``):

* flax ``kernel`` (kH, kW, I, O) -> ``Conv2d.weight`` (O, I, kH, kW)
* flax ``ConvTranspose`` kernel -> ``ConvTranspose2d.weight`` (I, O, kH, kW),
  spatially flipped back
* params scale/bias + batch_stats mean/var -> ``BatchNorm2d``
  weight/bias/running_mean/running_var (+ ``num_batches_tracked = 0``)
* per-gate ``OptimizedLSTMCell`` Dense kernels -> fused ``nn.LSTM``
  ``weight_ih_l{k}[_reverse]`` (4H rows, i,f,g,o); the single flax
  hidden-side bias becomes ``bias_hh`` with ``bias_ih`` zeroed (torch adds
  them, so the sum is preserved)
* ``Dense.kernel`` (in, out) -> ``Linear.weight`` (out, in)
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict

import numpy as np

from qea_ocr_tpu.tools.import_torch import _UNET_BLOCKS

# reference key prefix -> benchmarks/torch_baseline twin key prefix
_CRNN_TWIN_MAP = [
    ("convo.conv1", "conv.net1.0"),
    ("convo.conv2", "conv.net2.0"),
    ("convo.conv3", "conv.net3.0"),
    ("convo.conv4", "conv.net4.0"),
    ("convo.conv5", "conv.net5.0"),
    ("convo.batchnorm1", "conv.net5.1"),
    ("convo.conv6", "conv.net6.0"),
    ("convo.batchnorm2", "conv.net6.1"),
    ("convo.conv7", "conv.net7"),
    ("lstm", "rnn"),
    ("linear", "head"),
]


# ------------------------------------------------------------------ transforms
def _conv_weight(k: np.ndarray) -> np.ndarray:
    """flax HWIO kernel -> Conv2d (O, I, kH, kW)."""
    return np.ascontiguousarray(np.transpose(k, (3, 2, 0, 1)))


def _convT_weight(k: np.ndarray) -> np.ndarray:
    """flax ConvTranspose kernel -> ConvTranspose2d (I, O, kH, kW),
    un-flipping the spatial axes (see import side)."""
    return np.ascontiguousarray(np.transpose(k[::-1, ::-1], (2, 3, 0, 1)))


def _bn_out(sd: "OrderedDict[str, np.ndarray]", prefix: str,
            params: dict, stats: dict) -> None:
    sd[prefix + ".weight"] = np.asarray(params["scale"])
    sd[prefix + ".bias"] = np.asarray(params["bias"])
    sd[prefix + ".running_mean"] = np.asarray(stats["mean"])
    sd[prefix + ".running_var"] = np.asarray(stats["var"])
    sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)


def _lstm_out(sd: "OrderedDict[str, np.ndarray]", cell_fwd: dict,
              cell_bwd: dict, layer: int) -> None:
    for cell, sfx in ((cell_fwd, f"l{layer}"), (cell_bwd, f"l{layer}_reverse")):
        wih = np.concatenate(
            [np.asarray(cell["i" + g]["kernel"]).T for g in "ifgo"], axis=0)
        whh = np.concatenate(
            [np.asarray(cell["h" + g]["kernel"]).T for g in "ifgo"], axis=0)
        bias = np.concatenate(
            [np.asarray(cell["h" + g]["bias"]) for g in "ifgo"], axis=0)
        sd[f"lstm.weight_ih_{sfx}"] = np.ascontiguousarray(wih)
        sd[f"lstm.weight_hh_{sfx}"] = np.ascontiguousarray(whh)
        sd[f"lstm.bias_ih_{sfx}"] = np.zeros_like(bias)
        sd[f"lstm.bias_hh_{sfx}"] = bias


# ------------------------------------------------------------------ converters
def state_dict_from_unet(variables: Dict[str, dict]) -> "OrderedDict[str, np.ndarray]":
    """flax UNet `{'params', 'batch_stats'}` -> reference-schema state_dict
    (inverse of ``import_torch.convert_unet``)."""
    params, stats = variables["params"], variables["batch_stats"]
    sd: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for ref, inner, flax_name in _UNET_BLOCKS:
        blk_p, blk_s = params[flax_name], stats[flax_name]
        for j in (1, 2):
            sd[f"{ref}.{inner}conv{j}.weight"] = _conv_weight(
                np.asarray(blk_p[f"Conv_{j - 1}"]["kernel"]))
            _bn_out(sd, f"{ref}.{inner}norm{j}",
                    blk_p[f"BatchNorm_{j - 1}"], blk_s[f"BatchNorm_{j - 1}"])
    for lvl in (4, 3, 2, 1):
        up = params[f"upconv{lvl}"]
        sd[f"upconv{lvl}.weight"] = _convT_weight(np.asarray(up["kernel"]))
        sd[f"upconv{lvl}.bias"] = np.asarray(up["bias"])
    sd["conv.weight"] = _conv_weight(np.asarray(params["Conv_0"]["kernel"]))
    sd["conv.bias"] = np.asarray(params["Conv_0"]["bias"])
    return sd


def state_dict_from_crnn(variables: Dict[str, dict]) -> "OrderedDict[str, np.ndarray]":
    """flax CRNN `{'params', 'batch_stats'}` -> reference-schema state_dict
    (inverse of ``import_torch.convert_crnn``)."""
    params = variables["params"]
    conv_p = params["ConvStack_0"]
    conv_s = variables["batch_stats"]["ConvStack_0"]
    sd: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for j in range(1, 8):
        c = conv_p[f"Conv_{j - 1}"]
        sd[f"convo.conv{j}.weight"] = _conv_weight(np.asarray(c["kernel"]))
        sd[f"convo.conv{j}.bias"] = np.asarray(c["bias"])
    for j in (1, 2):
        _bn_out(sd, f"convo.batchnorm{j}",
                conv_p[f"BatchNorm_{j - 1}"], conv_s[f"BatchNorm_{j - 1}"])
    n_cells = sum(1 for k in params if k.startswith("OptimizedLSTMCell_"))
    for layer in range(n_cells // 2):
        _lstm_out(sd, params[f"OptimizedLSTMCell_{2 * layer}"],
                  params[f"OptimizedLSTMCell_{2 * layer + 1}"], layer)
    sd["linear.weight"] = np.ascontiguousarray(
        np.asarray(params["Dense_0"]["kernel"]).T)
    sd["linear.bias"] = np.asarray(params["Dense_0"]["bias"])
    return sd


def to_twin_keys(sd: Dict[str, np.ndarray], kind: str) -> "OrderedDict[str, np.ndarray]":
    """Rename a reference-schema CRNN state_dict to this repo's independent
    torch twin (``benchmarks/torch_baseline.ProxyCRNN``) key names, so the
    quality-parity harnesses can start from an exported proxy."""
    if kind != "crnn":
        raise ValueError("only the crnn twin mapping is defined")
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for k, v in sd.items():
        for ref_p, twin_p in _CRNN_TWIN_MAP:
            if k.startswith(ref_p + "."):
                out[twin_p + k[len(ref_p):]] = v
                break
        else:
            raise KeyError(f"unmapped reference key {k!r}")
    return out


def load_into_twin_crnn(crnn, sd: Dict[str, np.ndarray]) -> None:
    """Load a reference-schema state_dict into a ``ProxyCRNN`` instance."""
    import torch

    twin = OrderedDict((k, torch.tensor(np.asarray(v)))
                       for k, v in to_twin_keys(sd, "crnn").items())
    crnn.load_state_dict(twin, strict=True)


# ------------------------------------------------------------------ entry API
def _load_state(ckpt_path: str, model, example_shape):
    import jax
    import jax.numpy as jnp
    from qea_ocr_tpu.train.state import ModelState, adam_l2
    from qea_ocr_tpu.utils.io import load_checkpoint

    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 1, *example_shape)), train=False)
    state = load_checkpoint(
        ckpt_path, ModelState.create(template, adam_l2(1e-4)))
    return {"params": jax.tree_util.tree_map(np.asarray, dict(state.params)),
            "batch_stats": jax.tree_util.tree_map(
                np.asarray, dict(state.batch_stats))}


def export_prep(ckpt_path: str, out_path: str,
                unet_features: int = 32) -> "OrderedDict[str, np.ndarray]":
    """Orbax UNet checkpoint (``--prep_model``) -> reference ``Prep_model_*``
    state_dict pickle."""
    import torch
    from qea_ocr_tpu.models import UNet

    variables = _load_state(ckpt_path, UNet(init_features=unet_features),
                            (64, 64))
    sd = state_dict_from_unet(variables)
    torch.save(OrderedDict((k, torch.tensor(v)) for k, v in sd.items()),
               out_path)
    return sd


def export_crnn(ckpt_path: str, out_path: str, vocab_size: int | None = None,
                lstm_hidden: int = 256) -> "OrderedDict[str, np.ndarray]":
    """Orbax CRNN checkpoint (``--crnn_model``) -> reference ``CRNN_model_*``
    state_dict pickle."""
    import torch
    from qea_ocr_tpu import config as C
    from qea_ocr_tpu.models import CRNN
    from qea_ocr_tpu.utils.charmap import CharMap

    if vocab_size is None:
        vocab_size = CharMap.default().vocab_size
    variables = _load_state(
        ckpt_path, CRNN(vocab_size=vocab_size, lstm_hidden=lstm_hidden),
        C.INPUT_SIZE)
    sd = state_dict_from_crnn(variables)
    torch.save(OrderedDict((k, torch.tensor(v)) for k, v in sd.items()),
               out_path)
    return sd


def main(argv=None):
    import argparse

    from qea_ocr_tpu.utils.platform import setup_platform

    p = argparse.ArgumentParser(
        description="Convert orbax checkpoints to reference-schema PyTorch "
                    "state_dict pickles (inverse of import_torch).")
    p.add_argument("--kind", choices=("prep", "crnn"), required=True)
    p.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    p.add_argument("--out", required=True, help="state_dict pickle to write")
    p.add_argument("--unet_features", type=int, default=32)
    p.add_argument("--lstm_hidden", type=int, default=256)
    args = p.parse_args(argv)
    setup_platform()
    if args.kind == "prep":
        export_prep(args.ckpt, args.out, unet_features=args.unet_features)
    else:
        export_crnn(args.ckpt, args.out, lstm_hidden=args.lstm_hidden)
    print(f"[export_torch] wrote {args.out}")


if __name__ == "__main__":
    main()
