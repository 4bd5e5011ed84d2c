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
def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
