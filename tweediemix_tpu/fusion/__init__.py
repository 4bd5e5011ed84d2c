from tweediemix_tpu.fusion.masks import (
    binarize_and_resize_mask,
    build_region_masks,
    rect_expand,
    resolve_overlap_pair,
    sequential_blackout,
)

__all__ = [
    "binarize_and_resize_mask",
    "build_region_masks",
    "rect_expand",
    "resolve_overlap_pair",
    "sequential_blackout",
]
