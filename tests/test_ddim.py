"""Golden tests for the DDIM table against the reference conventions
(fusion_generation/fusion_sampling.py:212-218,305-307,385,428,430 and
video_gen/pipeline_i2vgen_xl.py:707-719)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tweediemix_tpu.schedulers.ddim import (
    DDIMTable,
    add_noise,
    cfg,
    make_betas,
    rescale_noise_cfg,
    training_alphas_cumprod,
    video_rotation_step,
)


@pytest.fixture(scope="module")
def table():
    return DDIMTable.create(n_steps=50)


def test_timesteps_sdxl_convention(table):
    # leading spacing, steps_offset=1: 981, 961, ..., 21, 1
    ts = np.asarray(table.timesteps)
    assert ts[0] == 981 and ts[-1] == 1
    assert len(ts) == 50
    assert np.all(np.diff(ts) == -20)
    assert table.skip == 20


def test_alpha_table_shift(table):
    # alphas_cumprod is prepended with 1.0: alpha(0) == 1, alpha(t) == ā_{t-1}
    betas = make_betas()
    acp = np.cumprod(1.0 - betas)
    assert float(table.alpha(jnp.int32(0))) == pytest.approx(1.0)
    assert float(table.alpha(jnp.int32(1))) == pytest.approx(acp[0], rel=1e-6)
    assert float(table.alpha(jnp.int32(981))) == pytest.approx(acp[980], rel=1e-6)
    # t < 0 falls back to final_alpha_cumprod = ā_0 (set_alpha_to_one=False)
    assert float(table.alpha(jnp.int32(-19))) == pytest.approx(acp[0], rel=1e-6)


def test_final_step_next_alpha_is_one_free(table):
    # last timestep t=1: next_t = -19 → final alpha; ref instead returns the
    # tweedie directly (fusion_sampling.py:471-472) which our sampler mirrors.
    t = table.timesteps[-1]
    assert int(t) == 1
    at_next = table.alpha(t - table.skip)
    assert float(at_next) == pytest.approx(float(table.final_alpha_cumprod))


def test_tweedie_renoise_roundtrip(table):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 4, 8, 8))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, 8, 8))
    at = table.alpha(jnp.int32(501))
    x0 = table.tweedie(x, eps, at)
    x_rt = table.renoise(x0, eps, at)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_cfg():
    u = jnp.ones((2, 3))
    c = 3.0 * jnp.ones((2, 3))
    out = cfg(u, c, 0.5)
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_rescale_noise_cfg_identity_at_zero():
    key = jax.random.PRNGKey(2)
    a = jax.random.normal(key, (2, 4, 4, 4))
    b = jax.random.normal(jax.random.fold_in(key, 1), (2, 4, 4, 4))
    out = rescale_noise_cfg(a, b, guidance_rescale=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(a), rtol=1e-6)


def test_video_rotation_step_identity_when_alpha_unchanged(table):
    # The angle-rotation step is a pure rotation: at_next == at → x unchanged.
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 4, 8, 8))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (2, 4, 8, 8))
    at = table.alpha(jnp.int32(701))
    out = video_rotation_step(x, eps, at, at)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_add_noise_training_convention():
    acp = training_alphas_cumprod()
    x0 = jnp.ones((2, 4, 4, 4))
    noise = jnp.full((2, 4, 4, 4), 2.0)
    t = jnp.array([0, 999])
    out = add_noise(x0, noise, t, acp)
    a0, a999 = float(acp[0]), float(acp[999])
    np.testing.assert_allclose(
        np.asarray(out[0]), np.sqrt(a0) + 2.0 * np.sqrt(1 - a0), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out[1]), np.sqrt(a999) + 2.0 * np.sqrt(1 - a999), rtol=1e-5
    )


def test_table_is_pytree(table):
    # must flow through jit/scan as data
    leaves = jax.tree_util.tree_leaves(table)
    assert len(leaves) == 3

    @jax.jit
    def f(tbl, t):
        return tbl.alpha(t)

    assert float(f(table, jnp.int32(1))) == pytest.approx(float(table.alpha(jnp.int32(1))))
