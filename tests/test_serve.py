"""Serving CLI: one warm pipeline, JSONL requests in, JSONL responses out.

The second request must report warm=True (compiled-trajectory reuse — the
whole point of the server) and a bad request must produce an error line
without killing the server.
"""

import io
import json


def test_serve_jsonl_roundtrip(tmp_path):
    from tweediemix_tpu.cli.serve import main

    out1 = tmp_path / "o1"
    out2 = tmp_path / "o2"
    reqs = [
        {"id": "a", "seed": 3, "output_path": str(out1)},
        {"id": "bad", "prompt": "only one concept", "output_path": str(out1)},
        {"id": "b", "seed": 4, "output_path": str(out2),
         "prompt_orig": "a cat and a dog sitting"},
    ]
    stdin = io.StringIO("\n".join(json.dumps(r) for r in reqs) + "\n")
    stdout = io.StringIO()
    rc = main([
        "--model_preset", "tiny",
        "--prompt", "photo of a cat running+photo of a dog running+mountain background",
        "--prompt_orig", "photo of a cat and a dog running",
        "--concepts", "cat+dog+mountain",
        "--modifier_token", "<cat1>+<dog1>+<mountain1>",
        "--seg_concepts", "a cat+a dog",
        "--seg_preset", "heuristic",
        "--output_path", str(tmp_path / "default"),
        "--n_timesteps", "4", "--t_cond", "0.5",
        "--resampling_steps", "0", "--jumping_steps", "1",
        "--resolution_h", "128", "--resolution_w", "128",
    ], stdin=stdin, stdout=stdout)
    assert rc == 0
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert [l["id"] for l in lines] == ["a", "bad", "b"]
    assert lines[0]["status"] == "ok" and lines[0]["warm"] is False
    assert lines[0]["files"] and all(f.endswith(".png") for f in lines[0]["files"])
    # malformed prompt (wrong '+' count) errors without killing the server
    assert lines[1]["status"] == "error" and "3" in lines[1]["error"]
    # same geometry → compiled trajectory reused. warm=True is the reuse
    # proof; the latency comparison keeps generous slack because wall-clock
    # on a shared 1-core CI host is noisy (a strict `<` was flaky)
    assert lines[2]["status"] == "ok" and lines[2]["warm"] is True
    assert lines[2]["latency_s"] < 2.0 * lines[0]["latency_s"]
    import os

    assert os.path.basename(lines[2]["files"][0]).startswith("a cat and a dog sitting")


def test_warm_flag_is_per_trace_geometry(tmp_path):
    """A request with a new num_seeds pays a fresh XLA compile and must
    report warm=False even after earlier successful requests; repeating
    that geometry is then warm. Uses a stub pipeline so the keying logic
    is tested without heavy compiles."""
    import argparse

    import numpy as np

    from tweediemix_tpu.cli.serve import handle_request

    class StubPipe:
        def prepare_text_embeds(self, *a, **k):
            return None

        def sample(self, embeds, seed, fg_masks, num_seeds, mesh_devices):
            return np.zeros((num_seeds, 8, 8, 3), np.float32)

    opt = argparse.Namespace(
        prompt="p", prompt_orig="orig", negative_prompt="", seed=1,
        num_seeds=1, output_path=str(tmp_path), mask_dir=None,
        concepts="c", modifier_token="<c1>", seg_concepts="a c",
        resolution_h=8, resolution_w=8, mesh_devices=None,
    )
    compiled = set()
    r1 = handle_request(StubPipe(), opt, {"num_seeds": 1}, compiled)
    r2 = handle_request(StubPipe(), opt, {"num_seeds": 1}, compiled)
    r3 = handle_request(StubPipe(), opt, {"num_seeds": 2}, compiled)
    r4 = handle_request(StubPipe(), opt, {"num_seeds": 2}, compiled)
    assert [r["warm"] for r in (r1, r2, r3, r4)] == [False, True, False, True]
