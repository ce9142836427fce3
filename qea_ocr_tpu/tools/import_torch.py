"""Import reference-trained PyTorch checkpoints into the JAX models.

The reference saves whole-module pickles — ``torch.save(self.prep_model, ...)``
(reference ``train_nn_patch.py:441``) of ``models/model_unet.py:UNet`` and
``models/model_crnn.py:CRNN`` — so a user migrating from the reference repo
arrives with trained ``Prep_model_{epoch}_{acc}`` / ``CRNN_model_{epoch}``
artifacts. This tool loads those (WITHOUT the reference package being
importable: a stub unpickler reconstructs the module tree from the pickle's
``_modules``/``_parameters`` state) or plain ``state_dict`` pickles, converts
the weights into this framework's flax parameter pytrees, and saves an orbax
checkpoint loadable via ``--prep_model`` / ``--crnn_model``.

Layout conversions (verified numerically in ``tests/test_import_torch.py``):

* ``Conv2d.weight``   (O, I, kH, kW)  -> flax ``kernel`` (kH, kW, I, O)
* ``ConvTranspose2d`` (I, O, kH, kW)  -> flax ``kernel`` (kH, kW, I, O)
  **spatially flipped** (flax ``nn.ConvTranspose`` is a fractionally-strided
  conv with the kernel as-is; torch computes the conv gradient)
* ``BatchNorm2d`` weight/bias/running_mean/running_var ->
  params scale/bias + batch_stats mean/var (same eps 1e-5, momentum 0.1/0.9)
* fused ``nn.LSTM`` ``weight_ih_l{k}[_reverse]`` (4H rows in i,f,g,o order)
  -> per-gate ``OptimizedLSTMCell`` Dense kernels (transposed); the two torch
  biases sum into the hidden-side flax bias
* ``Linear.weight`` (out, in) -> ``Dense.kernel`` (in, out)

Reference key schema (``model_unet.py:7-109``, ``model_crnn.py:5-56``):
``encoder1.enc1conv1.weight``, ``upconv4.weight``, ``conv.weight``;
``convo.conv1.weight`` (optionally ``convo.module.conv1...`` under
``nn.DataParallel``), ``convo.batchnorm1.*``, ``lstm.weight_ih_l0``,
``linear.weight``.
"""

from __future__ import annotations

import io
import pickle
from collections import OrderedDict
from typing import Dict

import numpy as np

# (reference block attr, inner name prefix, flax module name)
_UNET_BLOCKS = [
    ("encoder1", "enc1", "enc1"),
    ("encoder2", "enc2", "enc2"),
    ("encoder3", "enc3", "enc3"),
    ("encoder4", "enc4", "enc4"),
    ("bottleneck", "bottleneck", "bottleneck"),
    ("decoder4", "dec4", "dec4"),
    ("decoder3", "dec3", "dec3"),
    ("decoder2", "dec2", "dec2"),
    ("decoder1", "dec1", "dec1"),
]


# --------------------------------------------------------------- torch loading
class _Stub:
    """Placeholder for classes whose module is not importable (the reference
    repo's model classes inside whole-module pickles)."""

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:  # pragma: no cover - exotic __reduce__ protocols
            self.__dict__["_pickle_state"] = state


def _stub_unpickler_module():
    """A pickle-module shim whose Unpickler falls back to `_Stub` subclasses
    for unimportable classes, for `torch.load(pickle_module=...)`."""
    import types

    class StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (_Stub,), {"__module__": module})

    shim = types.ModuleType("qea_stub_pickle")
    shim.Unpickler = StubUnpickler
    shim.load = lambda f, **kw: StubUnpickler(f, **kw).load()
    shim.loads = lambda b, **kw: StubUnpickler(io.BytesIO(b), **kw).load()
    return shim


def _flatten_module(obj, prefix: str, out: "OrderedDict[str, np.ndarray]"):
    """Recursively flatten a (possibly stubbed) nn.Module object graph into a
    state_dict-ordered {dotted_name: ndarray}."""
    d = getattr(obj, "__dict__", {})
    for name, p in (d.get("_parameters") or {}).items():
        if p is not None:
            out[prefix + name] = np.asarray(p.detach().cpu().numpy()
                                            if hasattr(p, "detach") else p)
    for name, b in (d.get("_buffers") or {}).items():
        if b is not None:
            out[prefix + name] = np.asarray(b.detach().cpu().numpy()
                                            if hasattr(b, "detach") else b)
    for name, m in (d.get("_modules") or {}).items():
        if m is not None:
            _flatten_module(m, prefix + name + ".", out)


def _normalize_key(key: str) -> str:
    """Drop `nn.DataParallel` wrapper segments (`convo.module.conv1` ->
    `convo.conv1`; reference `model_crnn.py:11-12`)."""
    parts = [p for p in key.split(".") if p != "module"]
    return ".".join(parts)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint — whole-module pickle OR state_dict — into
    a flat {name: float32 ndarray} with DataParallel prefixes stripped."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False,
                     pickle_module=_stub_unpickler_module())
    flat: "OrderedDict[str, np.ndarray]" = OrderedDict()
    if isinstance(obj, (dict, OrderedDict)):
        for k, v in obj.items():
            if hasattr(v, "detach"):
                flat[k] = np.asarray(v.detach().cpu().numpy())
            else:
                flat[k] = np.asarray(v)
    else:
        _flatten_module(obj, "", flat)
    out = OrderedDict()
    for k, v in flat.items():
        if k.endswith("num_batches_tracked"):
            continue
        out[_normalize_key(k)] = (v.astype(np.float32)
                                  if v.dtype.kind == "f" else v)
    if not out:
        raise ValueError(f"no tensors found in {path!r}")
    return out


# ------------------------------------------------------------------ transforms
def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """Conv2d (O, I, kH, kW) -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _convT_kernel(w: np.ndarray) -> np.ndarray:
    """ConvTranspose2d (I, O, kH, kW) -> flax (kH, kW, I, O), spatially
    flipped (see module docstring)."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def _bn(sd: Dict[str, np.ndarray], prefix: str):
    params = {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}
    stats = {"mean": sd[prefix + ".running_mean"],
             "var": sd[prefix + ".running_var"]}
    return params, stats


def _lstm_cell(sd: Dict[str, np.ndarray], layer: int, reverse: bool):
    """One direction of torch fused-LSTM layer -> OptimizedLSTMCell params."""
    sfx = f"l{layer}" + ("_reverse" if reverse else "")
    wih, whh = sd[f"lstm.weight_ih_{sfx}"], sd[f"lstm.weight_hh_{sfx}"]
    bih, bhh = sd[f"lstm.bias_ih_{sfx}"], sd[f"lstm.bias_hh_{sfx}"]
    H = whh.shape[1]
    cell = {}
    for gi, g in enumerate("ifgo"):
        sl = slice(gi * H, (gi + 1) * H)
        cell["i" + g] = {"kernel": np.ascontiguousarray(wih[sl].T)}
        cell["h" + g] = {"kernel": np.ascontiguousarray(whh[sl].T),
                         "bias": bih[sl] + bhh[sl]}
    return cell


# ------------------------------------------------------------------ converters
def convert_unet(sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    """Reference UNet state -> flax `{'params': ..., 'batch_stats': ...}`
    (vanilla layout; the `mxu_packed` twin shares names/shapes)."""
    params: dict = {}
    stats: dict = {}
    for ref, inner, flax_name in _UNET_BLOCKS:
        blk_p, blk_s = {}, {}
        for j in (1, 2):
            blk_p[f"Conv_{j - 1}"] = {
                "kernel": _conv_kernel(sd[f"{ref}.{inner}conv{j}.weight"])}
            bn_p, bn_s = _bn(sd, f"{ref}.{inner}norm{j}")
            blk_p[f"BatchNorm_{j - 1}"] = bn_p
            blk_s[f"BatchNorm_{j - 1}"] = bn_s
        params[flax_name] = blk_p
        stats[flax_name] = blk_s
    for lvl in (4, 3, 2, 1):
        params[f"upconv{lvl}"] = {
            "kernel": _convT_kernel(sd[f"upconv{lvl}.weight"]),
            "bias": sd[f"upconv{lvl}.bias"]}
    params["Conv_0"] = {"kernel": _conv_kernel(sd["conv.weight"]),
                        "bias": sd["conv.bias"]}
    return {"params": params, "batch_stats": stats}


def convert_crnn(sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    """Reference CRNN state -> flax `{'params': ..., 'batch_stats': ...}`."""
    conv_p: dict = {}
    conv_s: dict = {}
    for j in range(1, 8):
        conv_p[f"Conv_{j - 1}"] = {
            "kernel": _conv_kernel(sd[f"convo.conv{j}.weight"]),
            "bias": sd[f"convo.conv{j}.bias"]}
    for j in (1, 2):
        bn_p, bn_s = _bn(sd, f"convo.batchnorm{j}")
        conv_p[f"BatchNorm_{j - 1}"] = bn_p
        conv_s[f"BatchNorm_{j - 1}"] = bn_s
    params = {"ConvStack_0": conv_p}
    n_layers = 1 + max(
        int(k.split("_l")[-1].split("_")[0]) for k in sd
        if k.startswith("lstm.weight_ih_l"))
    # Cell param names: the LSTM cells are created inline in CRNN.__call__,
    # so flax auto-names them `OptimizedLSTMCell_{2k}` (layer-k forward) and
    # `OptimizedLSTMCell_{2k+1}` (layer-k backward) at the CRNN's top level.
    for layer in range(n_layers):
        params[f"OptimizedLSTMCell_{2 * layer}"] = _lstm_cell(
            sd, layer, reverse=False)
        params[f"OptimizedLSTMCell_{2 * layer + 1}"] = _lstm_cell(
            sd, layer, reverse=True)
    params["Dense_0"] = {"kernel": np.ascontiguousarray(sd["linear.weight"].T),
                         "bias": sd["linear.bias"]}
    return {"params": params, "batch_stats": {"ConvStack_0": conv_s}}


def _check_against_template(converted: dict, template: dict, kind: str):
    """Shape/structure check against a freshly-initialized model's variables
    so a wrong-capacity import fails loudly, not at apply time."""
    import jax

    for col in ("params", "batch_stats"):
        want = jax.tree_util.tree_map(
            lambda a: tuple(a.shape), dict(template.get(col, {})))
        got = jax.tree_util.tree_map(
            lambda a: tuple(a.shape), converted.get(col, {}))
        if want != got:
            raise ValueError(
                f"{kind}: converted torch checkpoint does not match the "
                f"model's {col} tree.\n  expected: {want}\n  got: {got}")


# ------------------------------------------------------------------ entry API
def import_prep(torch_path: str, out_path: str, unet_features: int = 32,
                doc_size=(64, 64)) -> dict:
    """Reference `Prep_model_*` pickle/state_dict -> orbax checkpoint for
    `--prep_model`. Returns the converted variables."""
    import jax
    import jax.numpy as jnp
    from qea_ocr_tpu.models import UNet
    from qea_ocr_tpu.train.state import ModelState, adam_l2
    from qea_ocr_tpu.utils.io import save_checkpoint

    sd = load_torch_state_dict(torch_path)
    converted = convert_unet(sd)
    model = UNet(init_features=unet_features)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 1, *doc_size)), train=False)
    _check_against_template(converted, template, "prep/UNet")
    state = ModelState.create(converted, adam_l2(1e-4))
    save_checkpoint(out_path, state)
    return converted


def import_crnn(torch_path: str, out_path: str, vocab_size: int | None = None,
                lstm_hidden: int = 256) -> dict:
    """Reference `CRNN_model_*` pickle/state_dict -> orbax checkpoint for
    `--crnn_model`. Returns the converted variables."""
    import jax
    import jax.numpy as jnp
    from qea_ocr_tpu import config as C
    from qea_ocr_tpu.models import CRNN
    from qea_ocr_tpu.train.state import ModelState, adam_l2
    from qea_ocr_tpu.utils.charmap import CharMap

    from qea_ocr_tpu.utils.io import save_checkpoint

    sd = load_torch_state_dict(torch_path)
    converted = convert_crnn(sd)
    if vocab_size is None:
        vocab_size = int(sd["linear.weight"].shape[0])
    if vocab_size != CharMap.default().vocab_size:
        print(f"[import_torch] note: checkpoint vocab {vocab_size} != "
              f"default charset vocab {CharMap.default().vocab_size}")
    model = CRNN(vocab_size=vocab_size, lstm_hidden=lstm_hidden)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 1, *C.INPUT_SIZE)), train=False)
    _check_against_template(converted, template, "proxy/CRNN")
    state = ModelState.create(converted, adam_l2(1e-4))
    save_checkpoint(out_path, state)
    return converted


def main(argv=None):
    import argparse

    from qea_ocr_tpu.utils.platform import setup_platform

    p = argparse.ArgumentParser(
        description="Convert reference PyTorch checkpoints (whole-module "
                    "pickles or state_dicts) to orbax checkpoints.")
    p.add_argument("--kind", choices=("prep", "crnn"), required=True)
    p.add_argument("--torch_path", required=True,
                   help="reference Prep_model_*/CRNN_model_* pickle")
    p.add_argument("--out", required=True, help="orbax checkpoint dir to write")
    p.add_argument("--unet_features", type=int, default=32)
    p.add_argument("--lstm_hidden", type=int, default=256)
    args = p.parse_args(argv)
    setup_platform()
    if args.kind == "prep":
        import_prep(args.torch_path, args.out,
                    unet_features=args.unet_features)
    else:
        import_crnn(args.torch_path, args.out, lstm_hidden=args.lstm_hidden)
    print(f"[import_torch] wrote {args.out}")


if __name__ == "__main__":
    main()
