"""Real regularization-image retrieval from the LAION knn index.

Feature-parity rebuild of ``concept_training/retrieve.py``: queries
``knn.laion.ai`` (laion_400m, aesthetic weight 0.1) with a growing result
budget until ``2 * num_class_images`` unique URLs are collected, downloads
the images, and writes ``images/``, ``caption.txt``, ``urls.txt``,
``images.txt`` next to them (reference :14-76). Degrades gracefully when
offline (this build environment has zero egress): raises RuntimeError so
the trainer falls back to generated class images.
"""

from __future__ import annotations

import json
import os
import urllib.request
from typing import List


KNN_URL = "https://knn.laion.ai/knn-service"


def _query(text: str, num: int, indice: str = "laion_400m") -> List[dict]:
    payload = json.dumps({
        "text": text,
        "image": None,
        "image_url": None,
        "embedding_input": None,
        "modality": "image",
        "num_images": num,
        "indice_name": indice,
        "num_result_ids": num,
        "use_mclip": False,
        "deduplicate": True,
        "use_safety_model": True,
        "use_violence_detector": True,
        "aesthetic_score": "9",
        "aesthetic_weight": "0.1",
    }).encode()
    req = urllib.request.Request(KNN_URL, data=payload,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def retrieve(class_prompt: str, class_data_dir: str, num_class_images: int) -> int:
    """Returns the number of images written. Raises RuntimeError offline."""
    target = 2 * num_class_images
    os.makedirs(os.path.join(class_data_dir, "images"), exist_ok=True)
    seen, entries = set(), []
    budget = target
    try:
        while len(entries) < target and budget <= 8 * target:
            for item in _query(class_prompt, budget):
                url = item.get("url")
                cap = item.get("caption", class_prompt)
                if url and url not in seen:
                    seen.add(url)
                    entries.append((url, cap))
            budget *= 2
    except OSError as e:
        raise RuntimeError(f"LAION retrieval unavailable (offline?): {e}") from e

    images, captions, urls = [], [], []
    count = 0
    for url, cap in entries:
        if count >= num_class_images:
            break
        path = os.path.join(class_data_dir, "images", f"{count:05d}.jpg")
        try:
            urllib.request.urlretrieve(url, path)
        except OSError:
            continue
        images.append(path)
        captions.append(cap)
        urls.append(url)
        count += 1

    with open(os.path.join(class_data_dir, "caption.txt"), "w") as f:
        f.write("\n".join(captions))
    with open(os.path.join(class_data_dir, "urls.txt"), "w") as f:
        f.write("\n".join(urls))
    with open(os.path.join(class_data_dir, "images.txt"), "w") as f:
        f.write("\n".join(images))
    return count
