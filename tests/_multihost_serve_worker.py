"""Worker for the real 2-process --multihost SERVING test (test_parallel.py).

Runs the full micro fusion trajectory with 4 seeds sharded over an 8-device
dp mesh (the BASELINE "8 seeds in parallel" v5e-8 serving layout, scaled
down), in one of two modes:

* ``single``: one process, 8 virtual CPU devices — the ground truth.
* ``dist``: one of two coordinator-connected processes with 4 virtual CPU
  devices each. Every process computes the deterministic inputs (params,
  embeds, fg masks, seed latents) locally, stamps them globally replicated
  via ``parallel/mesh.py::globalize``, and the jitted scans reshard the
  batch rows over the GLOBAL axis (``seed_sharded_unet_fn``) — so each
  host computes only its half of the seed rows and the cross-host seams
  ride the same collectives a TPU pod would use. Outputs come back through
  ``host_gather`` (DCN allgather) and the npz write is process-0-gated on
  the serving side (both processes write here so the test can check the
  hosts agree bitwise).

The compiled module is identical in both modes (same global mesh shape),
so dist must match single bit-for-bit modulo cross-host reduction order.

Launched as: python tests/_multihost_serve_worker.py single OUT.npz
         or: python tests/_multihost_serve_worker.py dist OUT.npz COORD PID
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main(mode: str, out_path: str, coord: str | None = None, pid: int = 0) -> None:
    if mode == "dist":
        jax.distributed.initialize(coord, num_processes=2, process_id=int(pid))

    import jax.numpy as jnp
    import numpy as np

    from tweediemix_tpu.fusion.sampler import FusionConfig, FusionSampler, TextEmbeds
    from tweediemix_tpu.models.unet2d import UNet2DConditionModel, UNetConfig
    from tweediemix_tpu.parallel.mesh import (
        globalize,
        host_gather,
        is_primary_process,
        make_mesh,
        seed_sharded_unet_fn,
    )
    from tweediemix_tpu.schedulers.ddim import DDIMTable

    mesh = make_mesh({"dp": 8})
    key = jax.random.PRNGKey(0)
    hw, ctx_len, n_seeds = 8, 16, 4

    scfg = UNetConfig.micro(concept_slots=4)
    model = UNet2DConditionModel(scfg)
    fus = FusionConfig(n_timesteps=4, guidance_scale=0.8, t_cond=0.3,
                       resampling_steps=1, jumping_steps=1,
                       height=8 * hw, width=8 * hw, num_concepts=3)
    tids1 = jnp.array([[64, 64, 0, 0, 64, 64]], jnp.float32)

    def unet_fn(params, x, t, c, p, idx):
        return model.apply({"params": params}, x, t, c, p,
                           jnp.tile(tids1, (x.shape[0], 1)), idx)

    # deterministic params: seeded init (identical on every process)
    params = jax.jit(model.init)(
        key, jnp.zeros((2, hw, hw, 4)), jnp.int32(1),
        jnp.zeros((2, ctx_len, scfg.cross_attention_dim)),
        jnp.zeros((2, scfg.pooled_projection_dim)), jnp.zeros((2, 6)),
        jnp.zeros((2,), jnp.int32),
    )["params"]

    def erows(k, n):
        return (0.1 * jax.random.normal(k, (n, ctx_len, scfg.cross_attention_dim)),
                0.1 * jax.random.normal(jax.random.fold_in(k, 9),
                                        (n, scfg.pooled_projection_dim)))

    jc, jp = erows(jax.random.fold_in(key, 11), 2)
    sc, sp = erows(jax.random.fold_in(key, 12), 2)
    cc, cp = erows(jax.random.fold_in(key, 13), 4)
    fg = jnp.zeros((2, fus.height, fus.width)).at[0, :, : fus.width // 2].set(1.0)
    fg = fg.at[1, :, fus.width // 2:].set(1.0)

    sampler = FusionSampler(
        DDIMTable.create(n_steps=fus.n_timesteps), fus,
        seed_sharded_unet_fn(mesh, unet_fn), unet_params=globalize(mesh, params),
    )
    embeds = TextEmbeds(*globalize(mesh, (jc, jp, sc, sp, cc, cp)))
    x0 = globalize(mesh, sampler.init_latent(jax.random.PRNGKey(3), n_seeds))
    fg = globalize(mesh, fg)

    xs = sampler.run(embeds, jax.random.PRNGKey(3), fg_masks=fg,
                     num_seeds=n_seeds, x_init=x0)
    out = host_gather(xs)
    assert out.shape == (n_seeds, hw, hw, 4), out.shape
    np.savez(out_path, x=out)
    print(f"WORKER_OK mode={mode} primary={is_primary_process()} "
          f"processes={jax.process_count()}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *sys.argv[3:])
