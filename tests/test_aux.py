"""Auxiliary-subsystem tests: metrics logging, phase timing, LAION
retrieval offline behavior (SURVEY §5 equivalents)."""

import json
import os
from unittest import mock

import pytest


def test_metrics_logger_jsonl(tmp_path):
    from tweediemix_tpu.utils.logging import MetricsLogger

    lg = MetricsLogger(str(tmp_path), run_name="t")
    lg.log(1, {"loss": 0.5, "lr": 1e-5})
    lg.log(2, {"loss": 0.25})
    lg.close()
    lines = open(tmp_path / "t.metrics.jsonl").read().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["step"] == 1 and rec["loss"] == 0.5 and "time" in rec
    assert json.loads(lines[1])["loss"] == 0.25
    # disabled logger is a no-op
    MetricsLogger(None).log(1, {"x": 1.0})


def test_phase_timer(tmp_path):
    from tweediemix_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    rep = t.report()
    assert set(rep) == {"a", "b"} and rep["a"] >= 0
    p = tmp_path / "phases.json"
    t.dump(str(p))
    assert set(json.loads(p.read_text())) == {"a", "b"}


def test_retrieve_offline_raises(tmp_path):
    """Zero-egress environment: retrieve must raise RuntimeError (the
    trainer then falls back to generated class images) and must not leave
    partial output files."""
    from tweediemix_tpu.training import retrieve as R

    with mock.patch.object(
        R.urllib.request, "urlopen", side_effect=OSError("no route")
    ):
        with pytest.raises(RuntimeError, match="offline"):
            R.retrieve("photo of a cat", str(tmp_path / "cls"), 4)
    assert not os.path.exists(tmp_path / "cls" / "caption.txt")


def test_retrieve_writes_reference_file_contract(tmp_path):
    """With the network mocked, retrieve writes the reference's exact file
    set: images/, caption.txt, urls.txt, images.txt (retrieve.py:14-76)."""
    from tweediemix_tpu.training import retrieve as R

    items = [{"url": f"http://x/{i}.jpg", "caption": f"cap {i}"} for i in range(8)]

    def fake_query(text, num, indice="laion_400m"):
        return items

    def fake_retrieve_url(url, path):
        with open(path, "wb") as f:
            f.write(b"\xff\xd8fake")

    with mock.patch.object(R, "_query", fake_query), mock.patch.object(
        R.urllib.request, "urlretrieve", fake_retrieve_url
    ):
        n = R.retrieve("photo of a cat", str(tmp_path), 3)
    assert n == 3
    caps = open(tmp_path / "caption.txt").read().splitlines()
    urls = open(tmp_path / "urls.txt").read().splitlines()
    imgs = open(tmp_path / "images.txt").read().splitlines()
    assert len(caps) == len(urls) == len(imgs) == 3
    assert urls[0] == "http://x/0.jpg"
    assert all(os.path.exists(p) for p in imgs)


def test_compile_cache_enable_and_disable(tmp_path):
    """enable_compile_cache points jax at a persistent on-disk cache (and a
    compiled executable actually lands there); the env kill-switch disables
    it and explicit dirs win over the repo default."""
    import jax

    from tweediemix_tpu.utils.compile_cache import enable_compile_cache

    cache = tmp_path / "jaxcache"
    with mock.patch.dict(os.environ, {"TWEEDIEMIX_COMPILE_CACHE": "off"}):
        assert enable_compile_cache(str(cache)) is None

    # default-on is TPU-only: XLA:CPU caches AOT host machine code that may
    # come from the remote compile service (SIGILL hazard) — on the CPU test
    # backend the no-arg call must be a no-op
    with mock.patch.dict(os.environ, clear=False):
        os.environ.pop("TWEEDIEMIX_COMPILE_CACHE", None)
        assert enable_compile_cache() is None

    try:
        got = enable_compile_cache(str(cache))
        assert got == str(cache)
        assert os.path.isdir(got)
        assert jax.config.jax_compilation_cache_dir == str(cache)
        # threshold must be low enough that even tiny CPU jits persist
        assert jax.config.jax_persistent_cache_min_entry_size_bytes == 0

        import jax.numpy as jnp

        with mock.patch.dict(
            os.environ, {"JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0"}
        ):
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
            jax.jit(lambda x: x * 2 + 1)(jnp.ones((4,))).block_until_ready()
        assert any(cache.iterdir()), "no executable persisted to the cache dir"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)

    # boolean-style enable: TWEEDIEMIX_COMPILE_CACHE=1/on means "use the
    # default dir" (symmetric with the repo's other 0/1 knobs), not a
    # directory literally named "1"
    from tweediemix_tpu.utils import compile_cache as cc

    try:
        with mock.patch.dict(os.environ, {"TWEEDIEMIX_COMPILE_CACHE": "1"}), \
                mock.patch.object(cc, "default_cache_dir",
                                  return_value=str(tmp_path / "defdir")):
            got = cc.enable_compile_cache()
            assert got == str(tmp_path / "defdir")
            assert not (tmp_path / "1").exists()
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
