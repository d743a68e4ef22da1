"""Encoder-propagation sampling (arXiv:2312.09608 "Faster Diffusion").

Four guarantees:
  1. the UNet encode/decode split is EXACT: reuse with a cache computed at
     the same (x, t) reproduces the full forward bit-for-bit;
  2. ddim_sample_encoder_reuse(reuse=1) == ddim_sample bit-for-bit;
  3. reuse=2 strictly reduces compiled FLOPs (the point of the method) and
     produces finite samples close to the exact trajectory;
  4. the pipeline honors ddpmconfig.extra.encoder_reuse.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddmi_tpu.core.config import UNetConfig
from ddmi_tpu.diffusion.process import (
    GaussianDiffusion,
    ddim_sample,
    ddim_sample_encoder_reuse,
)
from ddmi_tpu.diffusion.schedule import make_schedule
from ddmi_tpu.nn.unet import UNet


def _tiny_unet():
    cfg = UNetConfig(
        image_size=8, in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16,
    )
    m = UNet(cfg)
    p = m.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 4)),
        jnp.zeros((2,), jnp.int32),
    )["params"]
    # zero-init output/proj convs (ADM convention) would make every output
    # identically zero — randomize all leaves so the tests are non-trivial
    leaves, treedef = jax.tree_util.tree_flatten(p)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    p = jax.tree_util.tree_unflatten(
        treedef,
        [0.05 * jax.random.normal(k, l.shape, l.dtype)
         for k, l in zip(keys, leaves)],
    )
    return m, p


def _gd(nfe):
    return GaussianDiffusion(
        schedule=make_schedule("linear", 20, 0.0015, 0.0195),
        sampling_timesteps=nfe,
        mixed_prediction=False,
    )


def test_split_exact():
    m, p = _tiny_unet()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([3, 7], jnp.int32)
    full = m.apply({"params": p}, x, t)
    out, cache = m.apply({"params": p}, x, t, return_cache=True)
    reused = m.apply({"params": p}, x, t, cache=cache)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(out))
    np.testing.assert_array_equal(np.asarray(full), np.asarray(reused))


def test_reuse_with_other_emb_differs():
    # the cache carries x-dependence; the timestep embedding must stay live
    m, p = _tiny_unet()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([3, 3], jnp.int32)
    _, cache = m.apply({"params": p}, x, t, return_cache=True)
    a = m.apply({"params": p}, x, t, cache=cache)
    b = m.apply({"params": p}, x, jnp.array([15, 15], jnp.int32), cache=cache)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def _fns(m, p):
    full_fn = lambda x, t: m.apply({"params": p}, x, t, return_cache=True)
    reuse_fn = lambda x, t, c: m.apply({"params": p}, x, t, cache=c)
    model_fn = lambda x, t: m.apply({"params": p}, x, t)
    return full_fn, reuse_fn, model_fn


def test_reuse1_equals_ddim_sample():
    m, p = _tiny_unet()
    gd = _gd(6)
    full_fn, reuse_fn, model_fn = _fns(m, p)
    shape = (2, 8, 8, 4)
    rng = jax.random.PRNGKey(5)
    ref = ddim_sample(gd, model_fn, None, shape, rng)
    got = ddim_sample_encoder_reuse(gd, full_fn, reuse_fn, None, shape, rng, 1)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("nfe,reuse", [(6, 2), (7, 3)])  # 7%3=1: tail path
def test_reuse_k_runs_and_saves_flops(nfe, reuse):
    m, p = _tiny_unet()
    gd = _gd(nfe)
    full_fn, reuse_fn, model_fn = _fns(m, p)
    shape = (2, 8, 8, 4)
    rng = jax.random.PRNGKey(5)

    ref_c = jax.jit(
        lambda: ddim_sample(gd, model_fn, None, shape, rng)
    ).lower().compile()
    turbo_c = jax.jit(
        lambda: ddim_sample_encoder_reuse(
            gd, full_fn, reuse_fn, None, shape, rng, reuse
        )
    ).lower().compile()
    # XLA cost_analysis counts a lax.scan body ONCE (not x trip count):
    # ref_flops ~= one full DDIM step; turbo_flops ~= one group body
    # (1 key + reuse-1 decoder-only steps) plus the unrolled NFE%reuse
    # tail of full steps.  The group must beat the same number of full
    # steps — that is the entire point of encoder propagation.
    ref_flops = ref_c.cost_analysis()["flops"]
    turbo_flops = turbo_c.cost_analysis()["flops"]
    equiv_full_steps = reuse + nfe % reuse
    assert turbo_flops < 0.97 * equiv_full_steps * ref_flops, (
        turbo_flops, ref_flops, equiv_full_steps,
    )

    out = turbo_c()
    assert np.isfinite(np.asarray(out)).all()
    # the approximation must stay in the ballpark of the exact trajectory
    # (a tiny random-weight UNet drifts little across adjacent steps)
    ref = ref_c()
    rel = float(
        jnp.linalg.norm(out - ref) / jnp.maximum(jnp.linalg.norm(ref), 1e-6)
    )
    assert rel < 0.5, rel


def test_pipeline_wiring(tmp_path):
    import yaml

    from ddmi_tpu.core.config import load_config
    from ddmi_tpu.domains.image import ImagePipeline

    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_cli_smoke import _base_cfg

    cfg_d = _base_cfg(str(tmp_path / "run"))
    cfg_d["model"]["params"]["ddpmconfig"]["extra"] = {"encoder_reuse": 2}
    pth = tmp_path / "c.yaml"
    pth.write_text(yaml.safe_dump(cfg_d))
    cfg = load_config(str(pth))
    assert cfg.model.ddpmconfig.extra["encoder_reuse"] == 2
    pipe = ImagePipeline(cfg)
    s1 = pipe.init_stage1_params(jax.random.PRNGKey(0))
    s2 = pipe.init_stage2_params(jax.random.PRNGKey(1))
    imgs = pipe.sample_images(
        s2, s1, jax.random.PRNGKey(2), batch=2, resolution=16
    )
    assert imgs.shape[0] == 2 and np.isfinite(np.asarray(imgs)).all()


def test_occupancy_sample_latents_turbo():
    """occupancy/NeRF share the cached-split UNet; the extra routes them
    through the encoder-reuse scan too (domains/{occupancy,nerf}.py)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_occupancy import tiny_occ_config
    from ddmi_tpu.domains.occupancy import OccupancyPipeline

    cfg = tiny_occ_config()
    cfg.model.ddpmconfig.extra["encoder_reuse"] = 2
    pipe = OccupancyPipeline(cfg)
    state = pipe.init_stage2(jax.random.PRNGKey(0), 1)
    z = pipe.sample_latents(state.params, jax.random.PRNGKey(1), batch=2)
    assert np.isfinite(np.asarray(z)).all()


def test_triplane_unet_split_exact():
    """TriplaneUNet (video) supports the same cache split, exactly."""
    from ddmi_tpu.nn.unet_triplane import TriplaneUNet

    cfg = UNetConfig(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=16,
        triplane=True, plane_sizes=((8, 8), (4, 8), (4, 8)),
    )
    m = TriplaneUNet(cfg)
    n = 8 * 8 + 2 * 4 * 8
    x0 = jnp.zeros((2, n, 4))
    p = m.init(jax.random.PRNGKey(0), x0, jnp.zeros((2,), jnp.int32))["params"]
    leaves, treedef = jax.tree_util.tree_flatten(p)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    p = jax.tree_util.tree_unflatten(
        treedef,
        [0.05 * jax.random.normal(k, l.shape, l.dtype)
         for k, l in zip(keys, leaves)],
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, n, 4))
    t = jnp.array([3, 7], jnp.int32)
    full = m.apply({"params": p}, x, t)
    out, cache = m.apply({"params": p}, x, t, return_cache=True)
    reused = m.apply({"params": p}, x, t, cache=cache)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(out))
    np.testing.assert_array_equal(np.asarray(full), np.asarray(reused))
    # timestep embedding stays live on the reuse path
    other = m.apply({"params": p}, x, jnp.array([15, 15], jnp.int32),
                    cache=cache)
    assert not np.allclose(np.asarray(full), np.asarray(other))


def test_video_sample_turbo():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_video import tiny_video_config
    from ddmi_tpu.domains.video import VideoPipeline

    cfg = tiny_video_config()
    cfg.model.ddpmconfig.extra["encoder_reuse"] = 2
    pipe = VideoPipeline(cfg)
    s1 = pipe.init_stage1_params(jax.random.PRNGKey(0))
    s2 = pipe.init_stage2_params(jax.random.PRNGKey(1))
    vids = pipe.sample_videos(s2, s1, jax.random.PRNGKey(2), batch=1)
    assert np.isfinite(np.asarray(vids)).all()
