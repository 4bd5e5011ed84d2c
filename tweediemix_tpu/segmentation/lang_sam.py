"""LangSAM: text → boxes → masks, in process.

The reference's ``text_segment/lang_sam/lang_sam.py:153-159`` contract:
``predict(image, text, box_threshold=0.20, text_threshold=0.20) → (masks,
boxes, phrases, logits)``, with GroundingDINO boxes feeding SAM. Here the
detector is the TPU-native TextBoxDetector and SAM is the Flax port; both
run on-device and the masks never touch the filesystem.

``HeuristicSegmenter`` provides a weights-free fallback (saliency split by
luminance/position clustering) so the full fusion pipeline runs end to end
in environments without model weights — the production path is the model
segmenter.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from tweediemix_tpu.segmentation.detector import (
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    DetectorConfig,
    TextBoxDetector,
)
from tweediemix_tpu.segmentation.expand import expand_masks
from tweediemix_tpu.segmentation.sam import SAM, SAMConfig

# segment-anything's pixel statistics (0-255 scale), sam/modeling/sam.py
SAM_PIXEL_MEAN = (123.675, 116.28, 103.53)
SAM_PIXEL_STD = (58.395, 57.12, 57.375)


class LangSAM:
    def __init__(self, sam_cfg: SAMConfig, sam_params, det_cfg: DetectorConfig = None,
                 det_params=None, tokenizer=None, box_threshold: float = 0.20,
                 dino=None):
        self.sam = SAM(sam_cfg)
        self.sam_params = sam_params
        # detector backend: OWL-ViT (the SURVEY §7.5 default swap) or the
        # reference's own GroundingDINO (models/dino.py::DinoDetector)
        self.dino = dino
        if dino is None:
            self.detector = TextBoxDetector(det_cfg)
            self.det_params = det_params
            self._detect = jax.jit(
                lambda p, img, ids: self.detector.apply({"params": p}, img, ids)
            )
        self.tokenizer = tokenizer
        self.box_threshold = box_threshold
        self._segment = jax.jit(
            lambda p, img, boxes: self.sam.apply({"params": p}, img, boxes)
        )

    @classmethod
    def from_pretrained(cls, sam_checkpoint: str, detector_dir: str,
                        box_threshold: float = 0.20, detector: str = "auto"):
        """Real-weights LangSAM from local checkpoints.

        ``sam_checkpoint``: a segment-anything ``.pth``/safetensors file or
        dir (ViT-H); ``detector_dir``: an HF-layout OWL-ViT detection dir
        (``google/owlvit-base-patch32``), OR a GroundingDINO checkpoint —
        the reference's shipped ``groundingdino_swinb_cogcoor.pth`` or an
        HF ``grounding-dino-*`` dir (needs ``vocab.txt`` beside it).
        ``detector``: "owlvit" | "dino" | "auto" (sniff the checkpoint).
        Mirrors the reference's ``text_segment/lang_sam/lang_sam.py:20-24``
        model pair, loaded from disk instead of the hub."""
        import os

        from tweediemix_tpu.models.convert import load_sam_params

        sam_cfg = SAMConfig.vit_h()
        sam_params = load_sam_params(sam_checkpoint)

        if detector == "auto":
            detector = "owlvit"
            if os.path.isfile(detector_dir):
                detector = "dino"  # a single .pth = the groundingdino ckpt
            else:
                cfg_path = os.path.join(detector_dir, "config.json")
                if os.path.exists(cfg_path):
                    import json

                    with open(cfg_path) as f:
                        if "grounding" in json.load(f).get("model_type", ""):
                            detector = "dino"

        if detector == "dino":
            from tweediemix_tpu.models.convert import load_dino_params
            from tweediemix_tpu.models.dino import DinoConfig, DinoDetector
            from tweediemix_tpu.utils.tokenizer import BertWordPieceTokenizer

            dino_params = load_dino_params(detector_dir)
            tok_dir = (os.path.dirname(detector_dir)
                       if os.path.isfile(detector_dir) else detector_dir)
            tokenizer = BertWordPieceTokenizer.from_dir(tok_dir)
            dino = DinoDetector(DinoConfig.swin_b(), dino_params, tokenizer)
            return cls(sam_cfg, sam_params, box_threshold=box_threshold,
                       dino=dino)

        from tweediemix_tpu.models.convert import load_detector_params
        from tweediemix_tpu.utils.tokenizer import CLIPBPETokenizer

        det_cfg = DetectorConfig.owlvit_base_patch32()
        det_params = load_detector_params(detector_dir)
        tok_dir = detector_dir
        if not os.path.exists(os.path.join(tok_dir, "vocab.json")):
            tok_dir = os.path.join(detector_dir, "tokenizer")
        tokenizer = CLIPBPETokenizer.from_dir(
            tok_dir, max_length=det_cfg.text.max_positions
        )
        return cls(sam_cfg, sam_params, det_cfg, det_params, tokenizer,
                   box_threshold=box_threshold)

    @classmethod
    def random_init(cls, key, sam_cfg=None, det_cfg=None, tokenizer=None):
        """Random-weights instance (tiny presets) for offline smoke runs."""
        from tweediemix_tpu.utils.tokenizer import HashTokenizer

        sam_cfg = sam_cfg or SAMConfig.tiny()
        det_cfg = det_cfg or DetectorConfig.tiny()
        tokenizer = tokenizer or HashTokenizer(det_cfg.text.vocab_size)
        img = jnp.zeros((1, sam_cfg.image_size, sam_cfg.image_size, 3))
        det_img = jnp.zeros((1, det_cfg.vision.image_size, det_cfg.vision.image_size, 3))
        ids = jnp.zeros((1, 16), jnp.int32)
        boxes = jnp.zeros((det_cfg.max_boxes, 4))
        sam_params = jax.jit(SAM(sam_cfg).init)(key, img, boxes)["params"]
        det_params = jax.jit(TextBoxDetector(det_cfg).init)(
            jax.random.fold_in(key, 1), det_img, ids
        )["params"]
        return cls(sam_cfg, sam_params, det_cfg, det_params, tokenizer)

    def predict(self, image: jnp.ndarray, text: str,
                box_threshold: Optional[float] = None):
        """image [H, W, 3] in [0,1] → (masks [K, H, W] bool, boxes, scores).

        Mirrors lang_sam.py:153-159: detect boxes for the phrase, keep those
        above the threshold, run SAM on each.
        """
        thr = box_threshold if box_threshold is not None else self.box_threshold
        h, w = image.shape[:2]
        if self.dino is not None:
            boxes, scores = self.dino(image, text, thr)
        else:
            det_size = self.detector.config.vision.image_size
            det_img = jax.image.resize(image, (det_size, det_size, 3), "bilinear")[None]
            det_img = (det_img - jnp.asarray(CLIP_IMAGE_MEAN)) / jnp.asarray(CLIP_IMAGE_STD)
            max_len = self.detector.config.text.max_positions
            ids = jnp.asarray(self.tokenizer([text]), jnp.int32)[:, :max_len]
            boxes, scores = self._detect(self.det_params, det_img, ids)

        sam_size = self.sam.config.image_size
        sam_img = jax.image.resize(image, (sam_size, sam_size, 3), "bilinear")[None]
        sam_img = (sam_img * 255.0 - jnp.asarray(SAM_PIXEL_MEAN)) / jnp.asarray(SAM_PIXEL_STD)
        mask_logits, iou = self._segment(self.sam_params, sam_img, boxes)
        masks = jax.image.resize(
            mask_logits, (mask_logits.shape[0], h, w), "bilinear"
        ) > 0.0
        valid = scores > thr
        return masks, boxes, scores, valid


@dataclasses.dataclass
class HeuristicSegmenter:
    """Weights-free fallback: split the image into K vertical saliency
    bands by luminance-weighted x-position. Keeps the segment_fn contract
    (image → fg masks) without any model."""

    n_concepts: int

    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        img = image[0] if image.ndim == 4 else image
        h, w = img.shape[:2]
        n = self.n_concepts
        edges = jnp.linspace(0, w, n + 1)
        xs = jnp.arange(w)
        masks = []
        for i in range(n):
            band = ((xs >= edges[i]) & (xs < edges[i + 1])).astype(jnp.float32)
            masks.append(jnp.tile(band[None, :], (h, 1)))
        return jnp.stack(masks)


def make_model_segment_fn(lang_sam: LangSAM, seg_concepts: str) -> Callable:
    """Build the fusion-sampler segment_fn: decode-preview image → fg masks
    via detect→segment→rect-expand→blackout→overlap-resolve
    (text_segment/run_expand.py semantics, pure jnp post-processing).

    No-detection contract: when no box clears ``box_threshold`` for a
    concept, the reference crashes (``lang_sam.py:95-106`` → ``masks[0]``
    IndexError on the empty tensor). Here we instead fall back to the
    top-scoring box — but loudly: a warning names the concept, and the
    returned ``segment_fn`` records the miss in its ``no_detections``
    attribute (list of (concept, top_score) for the most recent call).
    """
    concepts: List[str] = seg_concepts.split("+")

    def predict_best(img, text):
        masks, boxes, scores, valid = lang_sam.predict(img, text)
        if not bool(jnp.any(valid)):
            top = float(scores[0])
            segment_fn.no_detections.append((text, top))
            import warnings

            warnings.warn(
                f"segmentation: no box cleared box_threshold="
                f"{lang_sam.box_threshold} for concept {text!r} "
                f"(top score {top:.4f}); falling back to the top-scoring "
                f"box (the reference crashes here)",
                stacklevel=2,
            )
        best = jnp.argmax(jnp.where(valid, scores, -jnp.inf))
        return masks[best].astype(jnp.float32)

    def segment_fn(preview_image: jnp.ndarray) -> jnp.ndarray:
        segment_fn.no_detections = []
        img = preview_image[0] if preview_image.ndim == 4 else preview_image
        return expand_masks(predict_best, img, concepts)

    segment_fn.no_detections = []
    return segment_fn
