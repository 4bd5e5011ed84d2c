"""Training input pipeline: Custom-Diffusion dataset with random-scale paste
augmentation.

Rebuild of ``concept_training/diffusers_data_pipeline_xl.py``:

* per-concept instance/class image lists from a ``concepts_list``
  (reference :96-117);
* instance images: optional hflip, aspect-preserving thumbnail to a random
  scale in [size//3, size], pasted at a random offset on a black size²
  canvas, with a latent-res (size/8) validity mask shrunk by one latent
  pixel per side (reference :155-176 and ``preprocess`` :18-22);
* class/prior rows: optional hflip, shorter-side resize to ``size``, then a
  random crop (center crop with ``center_crop=True``) and an all-ones mask —
  the reference's ``image_transforms`` (:118-128, :207-213);
* ``latent_factor`` generalizes the reference's hardcoded /8 to the VAE's
  actual downscale factor (tiny test VAEs use 2);
* collate concatenates instance rows then class rows so prior preservation
  needs a single forward pass (``collate_fn`` :24-50).

The resize/paste/normalize inner loop runs in the native C++ kernel
(tweediemix_tpu/native/augment.cpp) with a numpy fallback. Output layout is
NHWC float32 (TPU-native), masks [B, h, w, 1].
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from tweediemix_tpu.native.build import paste_augment, resize_crop_normalize, resized_dims


@dataclasses.dataclass
class ConceptSpec:
    instance_data_dir: str
    instance_prompt: str
    class_data_dir: Optional[str] = None
    class_prompt: Optional[str] = None


def _list_images(d: str) -> List[str]:
    exts = {".png", ".jpg", ".jpeg", ".webp", ".bmp"}
    return sorted(
        str(p) for p in Path(d).iterdir() if p.is_file() and p.suffix.lower() in exts
    )


class CustomDiffusionDataset:
    def __init__(
        self,
        concepts: List[ConceptSpec],
        tokenizer_one,
        tokenizer_two,
        size: int = 512,
        with_prior_preservation: bool = True,
        num_class_images: int = 200,
        hflip: bool = False,
        center_crop: bool = False,
        seed: int = 0,
        latent_factor: int = 8,
    ):
        self.size = size
        self.latent_factor = latent_factor
        self.with_prior = with_prior_preservation
        self.tok1 = tokenizer_one
        self.tok2 = tokenizer_two
        self.hflip = hflip
        self.center_crop = center_crop
        self.rng = np.random.default_rng(seed)

        self.instance = []
        self.cls = []
        for c in concepts:
            for p in _list_images(c.instance_data_dir):
                self.instance.append((p, c.instance_prompt))
            if with_prior_preservation and c.class_data_dir and os.path.isdir(c.class_data_dir):
                for p in _list_images(c.class_data_dir)[:num_class_images]:
                    self.cls.append((p, c.class_prompt))
        self.rng.shuffle(self.instance)
        self._length = max(len(self.instance), len(self.cls), 1)

    def __len__(self):
        return self._length

    def _load(self, path: str) -> np.ndarray:
        from PIL import Image

        img = Image.open(path)
        if img.mode != "RGB":
            img = img.convert("RGB")
        return np.asarray(img, np.uint8)

    def example(self, index: int) -> Dict[str, np.ndarray]:
        path, prompt = self.instance[index % len(self.instance)]
        img = self._load(path)
        if self.hflip and self.rng.random() < 0.5:
            img = img[:, ::-1]

        # aspect-preserving thumbnail to a random scale (never enlarges)
        scale = int(self.rng.integers(self.size // 3, self.size + 1))
        ih, iw = img.shape[:2]
        factor = min(scale / max(iw, 1), scale / max(ih, 1), 1.0)
        th, tw = max(1, round(ih * factor)), max(1, round(iw * factor))
        oy = int(self.rng.integers(0, self.size - th + 1))
        ox = int(self.rng.integers(0, self.size - tw + 1))
        canvas, mask = paste_augment(img, th, tw, oy, ox, self.size, self.size // self.latent_factor)

        out = {
            "pixel_values": canvas,
            "mask": mask,
            "ids_one": np.asarray(self.tok1(prompt)[0], np.int32),
            "ids_two": np.asarray(self.tok2(prompt)[0], np.int32),
        }
        if self.with_prior and self.cls:
            cpath, cprompt = self.cls[index % len(self.cls)]
            cimg = self._load(cpath)
            if self.hflip and self.rng.random() < 0.5:
                cimg = cimg[:, ::-1]
            th, tw = resized_dims(cimg.shape[0], cimg.shape[1], self.size)
            if self.center_crop:
                cy, cx = (th - self.size) // 2, (tw - self.size) // 2
            else:
                cy = int(self.rng.integers(0, th - self.size + 1))
                cx = int(self.rng.integers(0, tw - self.size + 1))
            out["class_pixel_values"] = resize_crop_normalize(cimg, self.size, cy, cx)
            out["class_mask"] = np.ones_like(mask)
            out["class_ids_one"] = np.asarray(self.tok1(cprompt)[0], np.int32)
            out["class_ids_two"] = np.asarray(self.tok2(cprompt)[0], np.int32)
        return out

    def batches(self, batch_size: int, steps: int):
        """Yields collated batches: instance rows first, then class rows
        (reference collate_fn), with ``is_prior`` flags."""
        idx = 0
        for _ in range(steps):
            rows = [self.example(i) for i in range(idx, idx + batch_size)]
            idx += batch_size
            yield collate(rows, self.with_prior and bool(self.cls))


def collate(rows: List[Dict[str, np.ndarray]], with_prior: bool) -> Dict[str, np.ndarray]:
    pixels = [r["pixel_values"] for r in rows]
    masks = [r["mask"] for r in rows]
    ids1 = [r["ids_one"] for r in rows]
    ids2 = [r["ids_two"] for r in rows]
    n_inst = len(rows)
    if with_prior:
        pixels += [r["class_pixel_values"] for r in rows]
        masks += [r["class_mask"] for r in rows]
        ids1 += [r["class_ids_one"] for r in rows]
        ids2 += [r["class_ids_two"] for r in rows]
    b = len(pixels)
    return {
        "pixel_values": np.stack(pixels),  # [B, size, size, 3]
        "mask": np.stack(masks)[..., None],  # [B, size/8, size/8, 1]
        "ids_one": np.stack(ids1),
        "ids_two": np.stack(ids2),
        "is_prior": np.concatenate(
            [np.zeros(n_inst, np.float32), np.ones(b - n_inst, np.float32)]
        ),
    }


def prefetch_batches(batches, depth: int = 2):
    """Run a batch iterator on a background thread, ``depth`` batches ahead.

    The reference gets this from torch ``DataLoader(num_workers=...)``;
    here a single daemon thread decodes/augments/tokenizes the next batches
    while the device executes the current step (PIL decode + the C++
    augment kernel release the GIL, and jax device execution does too, so
    one thread is enough to hide the host work). Exceptions on the worker
    re-raise at the consuming ``next()``; iteration order is unchanged.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    def put(item) -> bool:
        # bounded put so an abandoned consumer (exception/break in the
        # train loop) can't leave the worker blocked forever holding the
        # dataset and `depth` decoded batches alive
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for b in batches:
                if not put(b):
                    return
            put(_END)
        except BaseException as e:  # propagate to the consumer
            put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
