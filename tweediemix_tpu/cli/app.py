"""Interactive text-segmentation demo — ``text_segment/app.py`` parity.

The reference serves a gradio UI (SAM preset dropdown, box threshold,
image, text prompt → detection overlay). Here ``predict`` is a plain
function (headless-testable) and ``main`` wraps it in gradio when the
package is available; environments without gradio get a clean error
pointing at ``cli/segment.py`` for the headless path.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def make_predict_fn(preset: str = "sam-random", sam_checkpoint=None,
                    detector_dir=None):
    """Build predict(image [H,W,3] float01, text, box_threshold) → overlay."""
    from tweediemix_tpu.segmentation import LangSAM
    from tweediemix_tpu.segmentation.viz import draw_image

    if preset == "sam":
        lang_sam = LangSAM.from_pretrained(sam_checkpoint, detector_dir)
    else:
        import jax

        lang_sam = LangSAM.random_init(jax.random.PRNGKey(0))

    def predict(image: np.ndarray, text_prompt: str, box_threshold: float = 0.3):
        import jax.numpy as jnp

        masks, boxes, scores, valid = lang_sam.predict(
            jnp.asarray(image, jnp.float32), text_prompt,
            box_threshold=box_threshold,
        )
        keep = np.asarray(valid)
        return draw_image(
            np.asarray(image, np.float32),
            np.asarray(masks, np.float32)[keep],
            np.asarray(boxes)[keep],
        )

    return predict


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="sam", choices=["sam", "sam-random"])
    p.add_argument("--sam_checkpoint", type=str, default=None)
    p.add_argument("--detector_dir", type=str, default=None)
    p.add_argument("--port", type=int, default=7860)
    opt = p.parse_args(argv)

    try:
        import gradio as gr
    except ImportError:
        print(
            "gradio is not installed in this environment; use "
            "`python -m tweediemix_tpu.cli.segment` for the headless path",
            file=sys.stderr,
        )
        return 1

    predict = make_predict_fn(opt.preset, opt.sam_checkpoint, opt.detector_dir)

    def gr_predict(box_threshold, image, text_prompt):
        return predict(np.asarray(image, np.float32) / 255.0, text_prompt,
                       box_threshold)

    demo = gr.Interface(
        fn=gr_predict,
        inputs=[
            gr.Slider(0, 1, value=0.3, label="Box threshold"),
            gr.Image(type="numpy", label="Image"),
            gr.Textbox(lines=1, label="Text Prompt"),
        ],
        outputs=gr.Image(type="numpy", label="Output Image"),
        title="TweedieMix-TPU text segmentation",
    )
    demo.launch(server_port=opt.port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
