"""Environment shims for running the REFERENCE code verbatim.

The parity oracle (`benchmarks/reference_verbatim.py`,
`tests/test_reference_verbatim.py`) drives `/root/reference`'s own
`train_nn_patch.py` / `train_crnn.py` / dataset classes unmodified. This
image lacks several of the reference's dependencies (tesserocr, easyocr,
google-cloud-vision, optuna, wandb, unidecode, torchvision), so this module
installs `sys.modules` shims BEFORE the reference modules import them:

  * `tesserocr` / `easyocr` — the behavioral stub engines the backends'
    hermetic tests already use (`qea_ocr_tpu/ocr/stub_engines.py`): the
    reference's `TessHelper`/`EocrHelper` code paths execute verbatim,
    with recognition provided by the same deterministic `FakeOcrBackend`
    template matcher the rebuild's FakeOCR uses — both sides of a
    head-to-head see the *same* black box.
  * `torchvision` — functional minimal `transforms.ToTensor/ToPILImage/
    PILToTensor/Resize/Compose` + `utils.make_grid` (the only pieces the
    reference's patch path touches, `utils.py:43-46`,
    `datasets/patch_dataset.py:47,53`, `ocr_helper/tess_helper.py:4`).
    `ToPILImage` reproduces torchvision's float path (`mul(255)` +
    truncation to uint8).
  * `wandb` — records `wandb.log(...)` dicts in `wandb.logged` so the
    harness can read the reference's own per-epoch metrics/ledger
    (`train_nn_patch.py:401-420`); `save`/`init`/`run.summary` are no-ops.
  * `optuna` — `TrialPruned` only (`utils.py:233-237` touches optuna only
    when a trial is passed).
  * `unidecode` — NFKD-ascii fold; identity on the ASCII synthetic world
    (the reference applies it via `get_ununicode`, `utils.py:57-71`).
  * `google.cloud.vision` — import-time placeholder (the gvision helper
    is imported by `utils.py` but never constructed here).

One behavior shim on torch itself: `torch.load` is wrapped to default
`weights_only=False`, because the reference predates torch>=2.6's
safe-load default and loads whole-module pickles
(`train_nn_patch.py:93/99`). Semantics are unchanged.

None of this touches `/root/reference` on disk, and nothing here is
imported by production code paths.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_DIR = os.environ.get("QEA_REFERENCE_DIR", "/root/reference")


# --------------------------------------------------------------------------
# torchvision
# --------------------------------------------------------------------------
def _make_stub_torchvision() -> dict:
    import numpy as np
    import torch
    from PIL import Image

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic, dtype=np.uint8)
            if arr.ndim == 2:
                arr = arr[None]
            else:
                arr = arr.transpose(2, 0, 1)
            return torch.from_numpy(arr.astype(np.float32) / 255.0)

    class PILToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic, dtype=np.uint8)
            arr = arr[None] if arr.ndim == 2 else arr.transpose(2, 0, 1)
            return torch.from_numpy(arr.copy())

    class ToPILImage:
        def __call__(self, pic):
            t = pic.detach().cpu()
            if t.ndim == 3:
                t = t[0] if t.shape[0] == 1 else t.permute(1, 2, 0)
            if t.is_floating_point():
                # torchvision's float path: mul(255) then byte() truncation
                t = t.mul(255).byte()
            arr = t.numpy().astype(np.uint8)
            return Image.fromarray(arr, mode="L" if arr.ndim == 2 else "RGB")

    class Resize:
        def __init__(self, size):
            self.size = size  # (h, w), torchvision convention

        def __call__(self, pic):
            h, w = (self.size, self.size) if isinstance(self.size, int) \
                else self.size
            return pic.resize((w, h), Image.BILINEAR)

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    def make_grid(images, nrow=8, padding=2):
        imgs = images.detach().cpu()
        if imgs.ndim == 3:
            imgs = imgs[None]
        b, c, h, w = imgs.shape
        ncol = min(nrow, b)
        nr = (b + ncol - 1) // ncol
        grid = torch.ones(c, nr * (h + padding) + padding,
                          ncol * (w + padding) + padding)
        for i in range(b):
            r, col = divmod(i, ncol)
            grid[:, padding + r * (h + padding):padding + r * (h + padding) + h,
                 padding + col * (w + padding):padding + col * (w + padding) + w] \
                = imgs[i]
        return grid

    tv = types.ModuleType("torchvision")
    tfm = types.ModuleType("torchvision.transforms")
    for cls in (ToTensor, PILToTensor, ToPILImage, Resize, Compose):
        setattr(tfm, cls.__name__, cls)
    tvu = types.ModuleType("torchvision.utils")
    tvu.make_grid = make_grid
    tvio = types.ModuleType("torchvision.io")
    tv.transforms = tfm
    tv.utils = tvu
    tv.io = tvio
    return {"torchvision": tv, "torchvision.transforms": tfm,
            "torchvision.utils": tvu, "torchvision.io": tvio}


# --------------------------------------------------------------------------
# wandb / optuna / unidecode / google.cloud.vision
# --------------------------------------------------------------------------
def _make_stub_wandb() -> types.ModuleType:
    wandb = types.ModuleType("wandb")
    wandb.logged = []

    class _Summary(dict):
        def update(self, d):  # type: ignore[override]
            dict.update(self, d)

    wandb.run = types.SimpleNamespace(summary=_Summary(), mode="disabled")
    wandb.init = lambda *a, **k: wandb.run
    wandb.log = lambda d, **k: wandb.logged.append(dict(d))
    wandb.save = lambda *a, **k: None
    wandb.Artifact = lambda *a, **k: types.SimpleNamespace(
        add_file=lambda *aa, **kk: None)
    return wandb


def _make_stub_optuna() -> types.ModuleType:
    optuna = types.ModuleType("optuna")

    class TrialPruned(Exception):
        pass

    optuna.TrialPruned = TrialPruned
    return optuna


def _make_stub_unidecode() -> types.ModuleType:
    import unicodedata

    mod = types.ModuleType("unidecode")
    mod.unidecode = lambda s: unicodedata.normalize("NFKD", s).encode(
        "ascii", "ignore").decode("ascii")
    return mod


def _make_stub_gcloud() -> dict:
    """Seed `google.cloud(.vision)` ONLY — never `google` itself, which is
    a real namespace package here (protobuf lives under it; replacing it
    broke `google.protobuf` for tensorboard)."""
    vision = types.ModuleType("google.cloud.vision")
    vision.ImageAnnotatorClient = None  # constructed only by GcloudHelper
    out = {"google.cloud.vision": vision}
    try:
        import google.cloud as cloud  # may exist without vision
    except ImportError:
        cloud = types.ModuleType("google.cloud")
        cloud.__path__ = []  # package-like so submodule imports resolve
        out["google.cloud"] = cloud
    cloud.vision = vision
    return out


# --------------------------------------------------------------------------
_INSTALLED: list = []   # stub module names this process injected


def remove_reference_shims() -> None:
    """Pop exactly the stub modules `install_reference_shims` injected, so
    later code probing for the real deps (e.g. `sweeps/sweep.py`'s optuna
    gate) sees honest ImportErrors again. Reference modules already
    imported keep their bound references and continue to work."""
    for name in _INSTALLED:
        sys.modules.pop(name, None)
    _INSTALLED.clear()


def install_reference_shims() -> None:
    """Install every missing-dependency shim (idempotent; never overrides a
    real installed module)."""
    stubs: dict = {}
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            stubs.update(_make_stub_torchvision())
    for name, maker in (("wandb", _make_stub_wandb),
                        ("optuna", _make_stub_optuna),
                        ("unidecode", _make_stub_unidecode)):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                stubs[name] = maker()
    try:
        from google.cloud import vision  # noqa: F401
    except ImportError:
        stubs.update(_make_stub_gcloud())
    for name in ("tesserocr", "easyocr"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                from qea_ocr_tpu.ocr.stub_engines import (
                    make_stub_easyocr, make_stub_tesserocr)
                stubs[name] = (make_stub_tesserocr() if name == "tesserocr"
                               else make_stub_easyocr())
    sys.modules.update(stubs)
    _INSTALLED.extend(k for k in stubs if k not in _INSTALLED)

    import torch
    if not getattr(torch.load, "_qea_weights_only_shim", False):
        _orig_load = torch.load

        def _load(*a, **k):
            k.setdefault("weights_only", False)
            return _orig_load(*a, **k)

        _load._qea_weights_only_shim = True
        torch.load = _load


def enter_reference(ref_dir: str | None = None) -> str:
    """Put the reference repo first on `sys.path` and chdir into it (its
    `utils.py` inserts the RELATIVE path "datasets", and nothing in the
    reference writes to its own tree — experiment output goes to the
    absolute `exp_base_path` the harness passes). Returns the previous cwd
    so tests can chdir back."""
    ref_dir = ref_dir or REFERENCE_DIR
    prev = os.getcwd()
    install_reference_shims()
    os.chdir(ref_dir)
    if ref_dir in sys.path:
        sys.path.remove(ref_dir)
    sys.path.insert(0, ref_dir)
    return prev
