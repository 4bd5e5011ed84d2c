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
