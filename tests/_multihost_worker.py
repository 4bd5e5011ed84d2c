"""Worker for the real 2-process --multihost tests (test_parallel.py).

Runs ONE deterministic Custom-Diffusion train step on an 8-device dp mesh
and writes the resulting loss + full flattened parameter vector to an npz,
in one of two modes:

* ``single``: one process, 8 virtual CPU devices — the ground truth.
* ``dist``: one of two coordinator-connected processes
  (``jax.distributed.initialize``), 4 virtual CPU devices each, feeding
  only its own half of the global batch through
  ``place_global_batch`` — the reference's accelerate-DDP layout
  (diffusers_training_xl_new.py:503-508) on real process boundaries.

The compiled module is identical in both modes (same global mesh shape),
so the dist result must match the single-process result bit-for-bit; any
divergence means the cross-process batch assembly, replication, or grad
reduction seam is broken.

Launched as: python tests/_multihost_worker.py single OUT.npz
         or: python tests/_multihost_worker.py dist OUT.npz COORD PID
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


HW, CTX_LEN, GLOBAL_B = 8, 16, 16


def full_batch(ucfg):
    import numpy as np

    r = np.random.RandomState(0)
    b = GLOBAL_B
    return {
        "latents": r.randn(b, HW, HW, 4).astype(np.float32),
        "mask": np.ones((b, HW, HW, 1), np.float32),
        "ctx": 0.1 * r.randn(b, CTX_LEN, ucfg.cross_attention_dim).astype(np.float32),
        "pooled": 0.1 * r.randn(b, ucfg.pooled_projection_dim).astype(np.float32),
        "time_ids": np.tile(np.array([[64, 64, 0, 0, 64, 64]], np.float32), (b, 1)),
        "is_prior": np.tile(np.array([0.0, 1.0], np.float32), b // 2),
    }


def main(mode: str, out_path: str, coord: str | None = None, pid: int = 0) -> None:
    if mode == "dist":
        jax.distributed.initialize(coord, num_processes=2, process_id=pid)
        assert jax.process_count() == 2, jax.process_count()
        assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 8, jax.device_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig
    from tweediemix_tpu.parallel.mesh import (
        make_mesh,
        place_global_batch,
        replicate,
        shard_batch,
    )
    from tweediemix_tpu.schedulers.ddim import training_alphas_cumprod
    from tweediemix_tpu.training.custom_diffusion import (
        TrainConfig,
        init_state,
        make_optimizer,
        make_train_step,
        trainable_mask,
    )

    ucfg = UNetConfig.micro()
    model = UNet2DConditionModel(ucfg)
    full = full_batch(ucfg)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(full["latents"][:2]), jnp.int32(1),
        jnp.asarray(full["ctx"][:2]), jnp.asarray(full["pooled"][:2]),
        jnp.asarray(full["time_ids"][:2]),
    )["params"]

    tcfg = TrainConfig()
    mask = trainable_mask(params, tcfg.freeze_model)
    opt = make_optimizer(tcfg, mask)
    state = init_state(params, opt)
    train_step = make_train_step(model, tcfg, training_alphas_cumprod(), opt)

    mesh = make_mesh({"dp": 8})
    state = replicate(mesh, state)
    if mode == "dist":
        # each host contributes ONLY its disjoint half of the global rows —
        # the DCN data layout cli/train.py uses under --multihost
        half = GLOBAL_B // 2
        local = {k: v[pid * half : (pid + 1) * half] for k, v in full.items()}
        batch = place_global_batch(mesh, local)
        # cross-process assembly check: all-gather the dp-sharded latents
        # back to a replicated array and compare with the known global order
        gathered = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(
            batch["latents"]
        )
        np.testing.assert_array_equal(np.asarray(gathered), full["latents"])
    else:
        batch = shard_batch(mesh, jax.tree.map(jnp.asarray, full))

    step = jax.jit(
        train_step,
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("dp")),
                      NamedSharding(mesh, P())),
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
    )
    state2, metrics = step(state, batch, replicate(mesh, jax.random.PRNGKey(7)))
    jax.block_until_ready(metrics)

    flat = np.concatenate(
        [np.asarray(l, np.float32).ravel() for l in jax.tree.leaves(state2.params)]
    )
    np.savez(out_path, loss=np.float64(float(metrics["loss"])), params=flat)
    print(f"WORKER_OK mode={mode} pid={pid} loss={float(metrics['loss']):.6f}")


if __name__ == "__main__":
    main(
        sys.argv[1],
        sys.argv[2],
        sys.argv[3] if len(sys.argv) > 3 else None,
        int(sys.argv[4]) if len(sys.argv) > 4 else 0,
    )
