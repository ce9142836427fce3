"""Torch->JAX checkpoint import: forward parity against real torch modules.

Builds this repo's independent torch twins (benchmarks/torch_baseline.py),
re-registers their layers under the REFERENCE's module/key names
(`models/model_unet.py:7-109`, `models/model_crnn.py:5-56` — e.g.
`encoder1.enc1conv1.weight`, `convo.conv1.weight`, `lstm.weight_ih_l0`),
saves them the way the reference does (whole-module pickles,
`train_nn_patch.py:441`) with the defining module made UNIMPORTABLE before
load — exercising the stub unpickler — and asserts the converted flax
models reproduce the torch forward pass.
"""

import sys
import types
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from benchmarks.torch_baseline import build_models
from qea_ocr_tpu.tools.import_torch import (
    convert_crnn,
    convert_unet,
    import_crnn,
    import_prep,
    load_torch_state_dict,
)

_FAKE_MOD = "qea_fake_reference_models"


def _ephemeral_class(name):
    """An nn.Module subclass living in a throwaway module, so the pickle's
    class reference is unimportable at load time (like the reference repo's
    classes on a machine that doesn't have it installed)."""
    mod = types.ModuleType(_FAKE_MOD)
    cls = type(name, (torch.nn.Module,), {"__module__": _FAKE_MOD})
    setattr(mod, name, cls)
    sys.modules[_FAKE_MOD] = mod
    return cls


def _save_unimportable(module, path):
    torch.save(module, path)
    del sys.modules[_FAKE_MOD]


def _ref_named_unet(tw):
    """Re-register the twin PrepUNet's layers under the reference UNet's
    names (same underlying weight tensors)."""
    nn = torch.nn

    def blk(seq, name):
        return nn.Sequential(OrderedDict([
            (f"{name}conv1", seq[0]), (f"{name}norm1", seq[1]),
            (f"{name}relu1", seq[2]),
            (f"{name}conv2", seq[3]), (f"{name}norm2", seq[4]),
            (f"{name}relu2", seq[5]),
        ]))

    holder = _ephemeral_class("UNet")()
    holder.add_module("encoder1", blk(tw.e1, "enc1"))
    holder.add_module("pool1", nn.MaxPool2d(2, 2))
    holder.add_module("encoder2", blk(tw.e2, "enc2"))
    holder.add_module("pool2", nn.MaxPool2d(2, 2))
    holder.add_module("encoder3", blk(tw.e3, "enc3"))
    holder.add_module("pool3", nn.MaxPool2d(2, 2))
    holder.add_module("encoder4", blk(tw.e4, "enc4"))
    holder.add_module("pool4", nn.MaxPool2d(2, 2))
    holder.add_module("bottleneck", blk(tw.bott, "bottleneck"))
    holder.add_module("upconv4", tw.u4)
    holder.add_module("decoder4", blk(tw.d4, "dec4"))
    holder.add_module("upconv3", tw.u3)
    holder.add_module("decoder3", blk(tw.d3, "dec3"))
    holder.add_module("upconv2", tw.u2)
    holder.add_module("decoder2", blk(tw.d2, "dec2"))
    holder.add_module("upconv1", tw.u1)
    holder.add_module("decoder1", blk(tw.d1, "dec1"))
    holder.add_module("conv", tw.out)
    return holder


def _ref_named_crnn(tw):
    """Twin ProxyCRNN layers under the reference CRNN's names."""
    convo = _ephemeral_class("Convolutional")()
    convo.add_module("conv1", tw.conv.net1[0])
    convo.add_module("conv2", tw.conv.net2[0])
    convo.add_module("conv3", tw.conv.net3[0])
    convo.add_module("conv4", tw.conv.net4[0])
    convo.add_module("conv5", tw.conv.net5[0])
    convo.add_module("batchnorm1", tw.conv.net5[1])
    convo.add_module("conv6", tw.conv.net6[0])
    convo.add_module("batchnorm2", tw.conv.net6[1])
    convo.add_module("conv7", tw.conv.net7)
    holder = type(convo)()
    holder.add_module("lstm", tw.rnn)
    holder.add_module("linear", tw.head)
    holder.add_module("convo", convo)
    return holder


def _randomize_bn(module, rng):
    """Give BN layers non-trivial affine params + running stats so the
    parity check actually exercises the stat conversion."""
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            c = m.num_features
            with torch.no_grad():
                m.weight.copy_(torch.tensor(
                    0.5 + rng.random(c, dtype=np.float32)))
                m.bias.copy_(torch.tensor(
                    rng.standard_normal(c).astype(np.float32) * 0.1))
                m.running_mean.copy_(torch.tensor(
                    rng.standard_normal(c).astype(np.float32) * 0.2))
                m.running_var.copy_(torch.tensor(
                    0.5 + rng.random(c, dtype=np.float32)))


def test_unet_whole_module_import_forward_parity(tmp_path):
    from qea_ocr_tpu.models import UNet

    tw, _ = build_models()
    tw = type(tw)(f=8)
    rng = np.random.default_rng(0)
    _randomize_bn(tw, rng)
    tw.eval()

    path = str(tmp_path / "Prep_model_7_81.54")
    _save_unimportable(_ref_named_unet(tw), path)

    sd = load_torch_state_dict(path)
    assert "encoder1.enc1conv1.weight" in sd
    assert not any("num_batches_tracked" in k for k in sd)
    variables = convert_unet(sd)

    x = rng.random((2, 1, 64, 64), np.float32)
    with torch.no_grad():
        want = tw(torch.tensor(x)).numpy()
    model = UNet(init_features=8, compute_dtype=jnp.float32)
    got = np.asarray(model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False))
    assert np.abs(got - want).max() < 1e-4


def test_crnn_whole_module_import_forward_parity(tmp_path):
    from qea_ocr_tpu.models import CRNN

    V = 23
    _, tw = build_models(vocab_size=V)
    rng = np.random.default_rng(1)
    _randomize_bn(tw, rng)
    tw.eval()

    path = str(tmp_path / "CRNN_model_7")
    _save_unimportable(_ref_named_crnn(tw), path)

    sd = load_torch_state_dict(path)
    assert "convo.conv1.weight" in sd and "lstm.weight_ih_l1_reverse" in sd
    variables = convert_crnn(sd)

    x = rng.random((2, 1, 32, 128), np.float32)
    with torch.no_grad():
        want = tw(torch.tensor(x)).numpy()          # (31, B, V) log-probs
    model = CRNN(vocab_size=V, compute_dtype=jnp.float32)
    got = np.asarray(model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False))
    assert got.shape == want.shape == (31, 2, V)
    assert np.abs(got - want).max() < 2e-3
    # greedy argmax agreement — what CTC decode consumes
    assert (got.argmax(-1) == want.argmax(-1)).mean() > 0.999


def test_dataparallel_prefix_and_state_dict_path(tmp_path):
    """state_dict pickle (not whole-module) with nn.DataParallel's
    `convo.module.` prefix (reference `model_crnn.py:11-12`)."""
    V = 23
    _, tw = build_models(vocab_size=V)
    ref = _ref_named_crnn(tw)
    sd = OrderedDict()
    for k, v in ref.state_dict().items():
        if k.startswith("convo."):
            k = "convo.module." + k[len("convo."):]
        sd[k] = v
    del sys.modules[_FAKE_MOD]
    path = str(tmp_path / "crnn_sd.pt")
    torch.save(sd, path)

    flat = load_torch_state_dict(path)
    assert "convo.conv1.weight" in flat       # prefix stripped
    variables = convert_crnn(flat)
    assert variables["params"]["Dense_0"]["kernel"].shape == (512, V)


def test_import_cli_roundtrip_orbax(tmp_path):
    """import_prep writes an orbax checkpoint the trainers can restore."""
    from qea_ocr_tpu.models import UNet
    from qea_ocr_tpu.train.state import ModelState, adam_l2
    from qea_ocr_tpu.utils.io import load_checkpoint

    tw, _ = build_models()
    tw = type(tw)(f=8)
    rng = np.random.default_rng(2)
    _randomize_bn(tw, rng)
    tw.eval()
    path = str(tmp_path / "Prep_model_3_63.36")
    _save_unimportable(_ref_named_unet(tw), path)

    out = str(tmp_path / "prep_ckpt")
    import_prep(path, out, unet_features=8)

    model = UNet(init_features=8, compute_dtype=jnp.float32)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 1, 64, 64)), train=False)
    state = load_checkpoint(
        out, ModelState.create(template, adam_l2(1e-4)))
    x = rng.random((1, 1, 64, 64), np.float32)
    with torch.no_grad():
        want = tw(torch.tensor(x)).numpy()
    got = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), train=False))
    assert np.abs(got - want).max() < 1e-4


def test_wrong_capacity_fails_loudly(tmp_path):
    tw, _ = build_models()
    tw = type(tw)(f=8)
    path = str(tmp_path / "prep8")
    _save_unimportable(_ref_named_unet(tw), path)
    with pytest.raises(ValueError, match="params tree"):
        import_prep(path, str(tmp_path / "out"), unet_features=16)
