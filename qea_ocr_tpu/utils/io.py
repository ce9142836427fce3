"""Experiment directories, JSON side-state, checkpointing.

Counterpart of reference `utils.py:191-231` (create_dirs / save_json /
save_all_jsons) and the whole-module-pickle checkpoints
(`train_nn_patch.py:440-459`). Checkpoints here are orbax pytrees of
{params, batch_stats, opt_state, step} (+ msgpack fallback), not pickles.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict

import jax
import numpy as np


@dataclasses.dataclass
class ExpDirs:
    """Experiment directory layout parity: ckpts/, cers/, tracked_labels/,
    selected_samples/, img_out/."""
    base: str

    @property
    def ckpts(self): return os.path.join(self.base, "ckpts")
    @property
    def cers(self): return os.path.join(self.base, "cers")
    @property
    def tracked_labels(self): return os.path.join(self.base, "tracked_labels")
    @property
    def selected_samples(self): return os.path.join(self.base, "selected_samples")
    @property
    def img_out(self): return os.path.join(self.base, "img_out")

    def create(self) -> "ExpDirs":
        for d in (self.base, self.ckpts, self.cers, self.tracked_labels,
                  self.selected_samples, self.img_out):
            os.makedirs(d, exist_ok=True)
        return self


def save_json(obj: Any, path: str) -> None:
    with open(path, "w") as f:
        json.dump(obj, f)


def load_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


def resolve_side_shard(path: str, process_index: int) -> str:
    """Resolve a side-state JSON path to this process's per-host shard.

    Multi-process trainers shard label-history/selection/CER side-state per
    host with a ``.pN`` suffix before the extension (``tracked_labels.p1.json``
    — `PatchTrainer._save_side_jsons`). Resume accepts the unsuffixed name on
    every worker and prefers the worker's own shard when one exists, so a pod
    restart uses one flag value across hosts. Falls back to ``path`` verbatim
    (single-process runs, or a shard recorded for a different topology).
    """
    base, ext = os.path.splitext(path)
    shard = f"{base}.p{process_index}{ext}"
    return shard if os.path.exists(shard) else path


def save_image_png(img: np.ndarray, path: str) -> None:
    """Save a (H, W) or (1, H, W) image as PNG — float [0,1] or uint8."""
    from PIL import Image
    img = np.asarray(img)
    if img.ndim == 3:
        img = img[0]
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(img, "L").save(path)


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8,
                    pad: int = 2) -> None:
    """Tile a batch (B, 1, H, W) or (B, H, W) into a grid PNG (reference
    `save_img` / torchvision make_grid analogue, `utils.py:43-46`)."""
    images = np.asarray(images)
    if images.ndim == 4:
        images = images[:, 0]
    B, H, W = images.shape
    ncol = min(nrow, B)
    nr = (B + ncol - 1) // ncol
    canvas = np.ones((nr * (H + pad) + pad, ncol * (W + pad) + pad), np.float32)
    for i in range(B):
        r, c = divmod(i, ncol)
        y = pad + r * (H + pad)
        x = pad + c * (W + pad)
        canvas[y:y + H, x:x + W] = images[i]
    save_image_png(canvas, path)


# ---------------------------------------------------------------- checkpoints
def _state_to_pytree(state) -> Dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(path: str, state) -> None:
    """Orbax save of a ModelState's arrays (tx excluded — rebuild at load)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree_util.tree_map(np.asarray, _state_to_pytree(state)),
               force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, state, restore_opt: bool = False):
    """Restore into an existing ModelState template (same tx/shapes).

    `restore_opt=False` (default) loads only params + batch stats and keeps a
    FRESH optimizer — parity with the reference's `torch.load(model)` warm
    starts, where optimizer state is only resumed via the explicit
    `--optim_*_path` flags (`train_nn_patch.py:153-156`). Restoring a
    converged run's Adam moments into a new training phase makes the first
    steps explosive (stale tiny second moments) — this collapsed the CRNN
    proxy until the default became False.
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree_util.tree_map(np.asarray, _state_to_pytree(state))
    restored = ckptr.restore(path, target=target)
    out = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
    )
    if restore_opt:
        out = out.replace(
            step=restored["step"],
            opt_state=jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(state.opt_state),
                jax.tree_util.tree_leaves(restored["opt_state"]),
            ),
        )
    return out
