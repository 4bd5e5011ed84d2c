"""Mask/box visualization helpers (``text_segment/lang_sam/utils.py``).

The reference draws detections with the ``supervision`` package
(``draw_image``) and loads images via PIL (``load_image``). Here the
overlay is pure numpy: per-mask color blending plus box outlines, so the
demo and CLIs have no extra dependencies.
"""

from __future__ import annotations

import numpy as np

# distinct overlay colors (RGB), cycled per detection
_PALETTE = np.array([
    [230, 57, 70], [29, 53, 87], [42, 157, 143], [233, 196, 106],
    [231, 111, 81], [69, 123, 157], [38, 70, 83], [244, 162, 97],
], np.float32)


def load_image(path: str) -> np.ndarray:
    """Image file → float RGB array in [0, 1] (utils.py:load_image)."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def draw_image(image: np.ndarray, masks, boxes=None, labels=None,
               alpha: float = 0.5, box_px: int = 2) -> np.ndarray:
    """Overlay masks (and optional xyxy boxes in [0,1]) on an image.

    image: [H, W, 3] float in [0,1]; masks: [K, H, W] bool/float;
    boxes: [K, 4] normalized xyxy. Returns [H, W, 3] float in [0,1].
    """
    img = np.array(image, np.float32, copy=True)
    h, w = img.shape[:2]
    masks = np.asarray(masks, np.float32)
    for i, m in enumerate(masks):
        color = _PALETTE[i % len(_PALETTE)] / 255.0
        m3 = np.clip(m, 0.0, 1.0)[..., None]
        img = img * (1.0 - alpha * m3) + color * (alpha * m3)
    if boxes is not None:
        for i, b in enumerate(np.asarray(boxes, np.float32)):
            color = _PALETTE[i % len(_PALETTE)] / 255.0
            x0, y0, x1, y1 = (b * np.array([w, h, w, h])).astype(int)
            x0, x1 = np.clip([x0, x1], 0, w - 1)
            y0, y1 = np.clip([y0, y1], 0, h - 1)
            img[y0:y0 + box_px, x0:x1 + 1] = color
            img[max(0, y1 - box_px + 1):y1 + 1, x0:x1 + 1] = color
            img[y0:y1 + 1, x0:x0 + box_px] = color
            img[y0:y1 + 1, max(0, x1 - box_px + 1):x1 + 1] = color
    return np.clip(img, 0.0, 1.0)


MIN_AREA = 100  # drop speck contours (utils.py:8)


def mask_contours(mask: np.ndarray, min_area: float = MIN_AREA):
    """Binary mask [H, W] → list of [P, 2] float32 contour point arrays
    (``utils.py:get_contours``; external contours, area-filtered)."""
    import cv2

    m = np.squeeze(np.asarray(mask))
    assert m.ndim == 2, m.shape
    m = (m > 0.5).astype(np.uint8) * 255
    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    return [
        c.reshape(len(c), -1).astype(np.float32)
        for c in contours
        if cv2.contourArea(c) > min_area
    ]


def generate_labelme_json(binary_masks, labels, image_size, image_path=None):
    """Binary masks [N, H, W] + labels → LabelMe-format dict
    (``text_segment/lang_sam/utils.py:generate_labelme_json``: same schema,
    polygon shapes from external contours)."""
    binary_masks = np.asarray(binary_masks)
    json_dict = {
        "version": "4.5.6",
        "imageHeight": int(image_size[0]),
        "imageWidth": int(image_size[1]),
        "imagePath": image_path,
        "flags": {},
        "shapes": [],
        "imageData": None,
    }
    for mask, label in zip(binary_masks, labels):
        for contour in mask_contours(mask):
            json_dict["shapes"].append({
                "label": label,
                "line_color": None,
                "fill_color": None,
                "points": [p.tolist() for p in contour],
                "shape_type": "polygon",
            })
    return json_dict
