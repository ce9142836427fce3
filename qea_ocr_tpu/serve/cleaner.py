"""Production serving path: batch document cleaning with a trained prep model.

The reference has no deployment story beyond `eval_prep.py` saving sample
images — to *use* a trained preprocessor you had to run the evaluator. This
module is the missing serving surface: stream arbitrary document images
through the UNet at a fixed compiled shape, write cleaned images (original
geometry restored), and optionally transcribe the cleaned output with any
OCR backend.

TPU-first design:
  * one jitted forward at a single static (batch, doc_size) shape — no
    per-image recompiles; ragged inputs are white-padded (shrunk when
    larger, same geometry as `PatchDocuments`, reference
    `datasets/patch_dataset.py:36-55`) and cropped back on the way out;
  * double-buffered host/device overlap: JAX async dispatch means the
    host prepares + writes batch k while the device cleans batch k+1 —
    the fetch of result k happens after dispatch of k+1;
  * bfloat16 compute via the UNet's own dtype policy.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

from qea_ocr_tpu import config as C
from qea_ocr_tpu.data.datasets import load_gray
from qea_ocr_tpu.models import UNet
from qea_ocr_tpu.train.state import ModelState, adam_l2
from qea_ocr_tpu.utils.io import load_checkpoint, save_image_png


@dataclasses.dataclass
class _Geometry:
    """How an input was fitted into the fixed processing shape."""
    top: int
    left: int
    h: int          # content height inside the canvas (possibly shrunk)
    w: int


class DocumentCleaner:
    """Fixed-shape batched UNet inference for document cleaning."""

    def __init__(self, prep_path: str, *, unet_features: int = 32,
                 doc_size: Tuple[int, int] = C.DOC_SIZE, batch_size: int = 8,
                 mxu_packed: bool | None = None, data_parallel: bool = False):
        import jax
        import jax.numpy as jnp

        self.doc_size = tuple(doc_size)
        self.batch_size = int(batch_size)
        if mxu_packed is None:
            # serving knows its fixed compiled batch, so the conv layout
            # auto-selects from the measured win window (utils/platform.py:
            # packed +26% at batch 32, wash at 8, loss at 96); training
            # paths call default_mxu_packed() with no hint and stay vanilla.
            from qea_ocr_tpu.utils.platform import default_mxu_packed
            per_dev = self.batch_size
            if data_parallel:
                per_dev = max(1, -(-self.batch_size
                                   // jax.local_device_count()))
            mxu_packed = default_mxu_packed(batch_hint=per_dev)
        self.model = UNet(init_features=unet_features, mxu_packed=mxu_packed)
        variables = self.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, *self.doc_size)),
            train=False)
        state = ModelState.create(variables, adam_l2(1e-4))
        self.state = load_checkpoint(prep_path, state)

        # Data-parallel serving: replicate the params over all local chips
        # and shard the batch's document axis; the SAME jitted forward runs
        # single- or multi-chip (XLA partitions it from the shardings).
        # batch_size rounds UP to a device multiple so every chip always
        # has rows — tail batches are white-padded anyway.
        self.mesh = None
        if data_parallel:
            from qea_ocr_tpu.parallel import make_mesh, put_replicated
            self.mesh = make_mesh()
            n_dev = len(self.mesh.devices.flat)
            self.batch_size = -(-self.batch_size // n_dev) * n_dev
            self.state = put_replicated(self.state, self.mesh)

        @jax.jit
        def fwd(state, images):
            # both transfer directions are uint8: the host link (tunneled
            # TPUs especially) is the serving bottleneck — uint8 moves 4x
            # less than float32 each way, is lossless for 8-bit image
            # sources, and is what the PNG encoder wants anyway.
            # Normalization/quantization happen on device.
            out = self.model.apply(state.variables,
                                   images.astype(jnp.float32) / 255.0,
                                   train=False)
            return jnp.round(out * 255.0).clip(0, 255).astype(jnp.uint8)

        self._fwd = fwd
        self._pool = None   # lazy PNG-writer thread pool

    # ------------------------------------------------------------------
    def _fit(self, img: np.ndarray) -> Tuple[np.ndarray, _Geometry]:
        """White-pad `img` (H, W) into the processing canvas; shrink
        aspect-preserving when larger (same `pad_white` geometry the
        datasets use)."""
        from qea_ocr_tpu.data.datasets import pad_white
        canvas, geom = pad_white(np.asarray(img, np.float32), *self.doc_size,
                                 return_geometry=True)
        return canvas, _Geometry(*geom)

    def clean_arrays(self, images: Sequence[np.ndarray]) -> List[np.ndarray]:
        """Clean a list of (H, W) float [0,1] grayscale images. Returns the
        cleaned content regions (float [0,1]) at processing resolution
        (shrunk inputs stay shrunk — the model was trained at `doc_size`)."""
        out: List[np.ndarray] = []
        for batch, geoms in self._batches(iter(images)):
            cleaned = np.asarray(self._dispatch(batch))
            out.extend(c.astype(np.float32) / 255.0
                       for c in self._crop(cleaned, geoms))
        return out

    # ------------------------------------------------------------------
    def _batches(self, it: Iterable[np.ndarray]):
        batch, geoms = [], []
        for img in it:
            canvas, geom = self._fit(np.asarray(img, np.float32))
            batch.append(canvas)
            geoms.append(geom)
            if len(batch) == self.batch_size:
                yield batch, geoms
                batch, geoms = [], []
        if batch:
            yield batch, geoms

    def _dispatch(self, batch: List[np.ndarray]):
        """Pad the batch to the static batch size and run the jitted fwd.
        Uploads uint8 (host-side quantization of the float [0,1] canvases
        — exact for images that came from 8-bit files)."""
        import jax.numpy as jnp
        n = len(batch)
        arr = np.round(np.stack(batch)[:, None] * 255.0).clip(0, 255) \
                .astype(np.uint8)                         # (n, 1, H, W)
        if n < self.batch_size:
            arr = np.concatenate(
                [arr, np.full((self.batch_size - n, 1, *self.doc_size),
                              255, np.uint8)])
        if self.mesh is not None:
            from qea_ocr_tpu.parallel import put_batch
            dev_arr = put_batch(jnp.asarray(arr), self.mesh)
        else:
            dev_arr = jnp.asarray(arr)
        return self._fwd(self.state, dev_arr)[:n]

    @staticmethod
    def _crop(cleaned: np.ndarray, geoms: List[_Geometry]) -> List[np.ndarray]:
        return [cleaned[i, 0, g.top:g.top + g.h, g.left:g.left + g.w]
                for i, g in enumerate(geoms)]

    # ------------------------------------------------------------------
    def clean_dir(self, input_dir: str, output_dir: str, *,
                  ocr=None, transcripts_path: Optional[str] = None,
                  exts=("png", "jpg", "jpeg")) -> dict:
        """Clean every image under `input_dir` into `output_dir`. Output
        names mirror the input-relative path with '/' flattened to '__'
        (so `sub1/page.png` and `sub2/page.png` cannot clobber each other).
        With an OCR backend, each cleaned document is transcribed
        (whole-image word list), keyed by its input-relative path; the dict
        is returned in the result ("transcriptions") and also written to
        `transcripts_path` when given.

        Double-buffered: result k is fetched only after batch k+1 is
        dispatched, so host PNG-encode/OCR overlaps device compute."""
        from qea_ocr_tpu.data.datasets import find_images

        paths = find_images(input_dir, exts=exts)
        os.makedirs(output_dir, exist_ok=True)
        transcripts: dict = {}
        n_done = 0

        pending = None  # (device_result, geoms, paths) awaiting fetch
        for i in range(0, len(paths), self.batch_size):
            chunk = paths[i:i + self.batch_size]
            fitted = [self._fit(load_gray(p)) for p in chunk]
            dev = self._dispatch([c for c, _ in fitted])
            if pending is not None:
                n_done += self._finish(pending, input_dir, output_dir, ocr,
                                       transcripts)
            pending = (dev, [g for _, g in fitted], chunk)
        if pending is not None:
            n_done += self._finish(pending, input_dir, output_dir, ocr,
                                   transcripts)

        if ocr is not None and transcripts_path:
            with open(transcripts_path, "w") as f:
                json.dump(transcripts, f, indent=1)
        result = {"num_documents": n_done, "output_dir": output_dir,
                  "transcripts": transcripts_path if ocr is not None else None}
        if ocr is not None:
            result["transcriptions"] = transcripts
        return result

    def _finish(self, pending, input_dir, output_dir, ocr,
                transcripts) -> int:
        from concurrent.futures import ThreadPoolExecutor
        dev, geoms, chunk_paths = pending
        cleaned = self._crop(np.asarray(dev), geoms)      # uint8 crops

        def write(args):
            path, img = args
            rel = os.path.relpath(path, input_dir)
            stem = os.path.splitext(rel)[0].replace(os.sep, "__")
            save_image_png(img, os.path.join(output_dir, stem + ".png"))
            if ocr is not None:
                transcripts[rel] = ocr.get_string(
                    img.astype(np.float32) / 255.0)

        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=4)
        list(self._pool.map(write, zip(chunk_paths, cleaned)))
        return len(cleaned)
