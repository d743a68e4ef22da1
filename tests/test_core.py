"""Unit tests for core utilities: coords, EMA, SN regularizer, config, mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddmi_tpu.core.config import Config, config_from_dict, load_config
from ddmi_tpu.core.coords import (
    coord_grid_2d,
    linear_kl_coeff,
    multiscale_image_transform,
    pixel_center_grid,
    symmetrize,
    unsymmetrize,
)
from ddmi_tpu.core.ema import ema_decay_schedule, ema_update
from ddmi_tpu.core.sn_reg import init_sn_state, norm_scale_loss, spectral_norm_loss


def test_coord_grid_matches_reference_convention():
    g = coord_grid_2d(3, 5, -1, 1, -1, 1)
    assert g.shape == (1, 3, 5, 2)
    # channel 0 = x varies along W, channel 1 = y varies along H
    np.testing.assert_allclose(np.asarray(g[0, 0, :, 0]), np.linspace(-1, 1, 5))
    np.testing.assert_allclose(np.asarray(g[0, :, 0, 1]), np.linspace(-1, 1, 3))


def test_pixel_center_grid_range():
    g = pixel_center_grid(256)
    assert float(g.min()) == pytest.approx(-255 / 256)
    assert float(g.max()) == pytest.approx(255 / 256)


def test_symmetrize_roundtrip():
    x = jnp.array([0.0, 0.5, 1.0])
    np.testing.assert_allclose(np.asarray(unsymmetrize(symmetrize(x))), np.asarray(x))


def test_linear_kl_coeff_clamps():
    # matches general_utils.py:218-219 clamping behavior
    assert float(linear_kl_coeff(0, 100, 10, 1e-4, 0.5)) == pytest.approx(1e-4)
    assert float(linear_kl_coeff(1000, 100, 10, 1e-4, 0.5)) == pytest.approx(0.5)
    mid = float(linear_kl_coeff(60, 100, 10, 0.0, 1.0))
    assert mid == pytest.approx(0.5)


def test_multiscale_transform_shapes(np_rng):
    x = jnp.asarray(np_rng.uniform(-1, 1, (2, 512, 512, 3)).astype(np.float32))
    for seed in range(3):
        target, coords, scale, y = multiscale_image_transform(
            x, jax.random.PRNGKey(seed), 256, True
        )
        assert target.shape == (2, 256, 256, 3)
        assert coords.shape == (1, 256, 256, 2)
        assert float(scale) in (1.0, 1 / 1.5, 0.5)
        assert y.shape == (2, 256, 256, 3)
    # jits cleanly
    jitted = jax.jit(lambda xx, r: multiscale_image_transform(xx, r, 256, True))
    target, coords, scale, y = jitted(x, jax.random.PRNGKey(9))
    assert target.shape == (2, 256, 256, 3)


def test_ema_decay_schedule():
    assert float(ema_decay_schedule(jnp.float32(0))) == 0.0
    assert float(ema_decay_schedule(jnp.float32(1e9))) == pytest.approx(0.9999)
    # monotone
    d = [float(ema_decay_schedule(jnp.float32(t))) for t in [1, 10, 100, 1000]]
    assert d == sorted(d)


def test_ema_update_semantics():
    params = {"w": jnp.ones((2,))}
    ema = {"w": jnp.zeros((2,))}
    # step before update_after_step with step%update_every==0: copy-through
    out = ema_update(ema, params, jnp.int32(0), update_every=10, update_after_step=100)
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0)
    # off-cycle step: unchanged
    out = ema_update(ema, params, jnp.int32(5), update_every=10, update_after_step=100)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.0)
    # late step on-cycle: blend with decay close to beta
    out = ema_update(
        ema, params, jnp.int32(100000), update_every=10, update_after_step=100
    )
    v = float(out["w"][0])
    assert 0 < v < 0.01  # mostly keeps ema (0) with decay ~0.999


def test_sn_reg_estimates_singular_values(np_rng):
    # one "conv" kernel whose top singular value we know
    u = np_rng.standard_normal((8, 1))
    v = np_rng.standard_normal((1, 9))
    mat = (u / np.linalg.norm(u)) @ (v / np.linalg.norm(v)) * 5.0  # rank-1, sigma=5
    kernel = jnp.asarray(
        mat.T.reshape(3, 3, 1, 8).astype(np.float32)
    )  # (kh,kw,in,out) with out=8
    params = {"conv": {"kernel": kernel}}
    state = init_sn_state(params, jax.random.PRNGKey(0))
    loss, new_state = spectral_norm_loss(params, state)
    true_sigma = np.linalg.svd(mat.T.reshape(9, 8).T, compute_uv=False)[0]
    assert float(loss) == pytest.approx(float(true_sigma), rel=1e-3)


def test_sn_reg_no_gradient_through_uv(np_rng):
    kernel = jnp.asarray(np_rng.standard_normal((3, 3, 2, 4)).astype(np.float32))
    params = {"conv": {"kernel": kernel}}
    state = init_sn_state(params, jax.random.PRNGKey(0))

    def loss_fn(p):
        l, _ = spectral_norm_loss(p, state)
        return l

    g = jax.grad(loss_fn)(params)
    assert np.isfinite(np.asarray(g["conv"]["kernel"])).all()


def test_norm_scale_loss():
    params = {"GroupNorm_0": {"scale": jnp.array([0.5, -2.0]), "bias": jnp.zeros(2)}}
    assert float(norm_scale_loss(params)) == pytest.approx(2.0)


def test_config_roundtrip(tmp_path):
    cfg = load_config("configs/ldm/celebahq.yaml")
    assert cfg.model.embed_dim == 64
    assert cfg.model.unetconfig.model_channels == 256
    assert cfg.model.unetconfig.attention_resolutions == (8, 4, 2)
    assert cfg.model.ddconfig.hdbf_resolutions == (128, 64)
    assert cfg.model.ddpmconfig.sampling_timesteps == 50
    assert cfg.model.ddpmconfig.ddim_sampling_eta == 0
    assert cfg.data.domain == "image"

    cfg1 = load_config("configs/d2c-vae/celebahq.yaml")
    assert cfg1.model.lossconfig.multiscale is True
    assert cfg1.model.lossconfig.sn_reg_weight_decay == pytest.approx(0.1)


def test_config_extra_keys_preserved():
    cfg = config_from_dict(
        {"model": {"lr": 1e-3, "novel_flag": True}, "data": {"domain": "image"}}
    )
    assert cfg.model.extra["novel_flag"] is True


def test_checkpoint_overwrite_is_write_then_swap(tmp_path):
    """overwrite=True must never delete the existing step before the
    replacement is durably written (ADVICE r1): the new copy lands in a temp
    dir first, then swaps in; the restored state is the replacement."""
    import jax.numpy as jnp

    from ddmi_tpu.core.checkpoint import CheckpointManager

    m = CheckpointManager(str(tmp_path), prefix="stage1")
    m.save(5, {"w": jnp.ones((4,))}, force=True)
    m.wait()
    m.save(5, {"w": jnp.full((4,), 2.0)}, force=True, overwrite=True)
    m.wait()
    r = m.restore({"w": jnp.zeros((4,))}, step=5)
    np.testing.assert_allclose(np.asarray(r["w"]), 2.0)
    assert m.latest_step() == 5
    m.close()


def test_mesh_shapes():
    from ddmi_tpu.parallel.mesh import MeshSpec, make_mesh, shard_params_fsdp

    mesh = make_mesh(MeshSpec(data=4, fsdp=2))
    assert mesh.shape == {"data": 4, "fsdp": 2, "model": 1}
    params = {"w": jnp.zeros((16, 3)), "b": jnp.zeros((5,))}
    sh = shard_params_fsdp(mesh, params)
    assert "fsdp" in str(sh["w"].spec)
    assert sh["b"].spec == jax.sharding.PartitionSpec()  # 5 not divisible by 2
