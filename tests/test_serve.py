"""Serving layer (ddmi_tpu.serve): batching sampler service + HTTP frontend.

Beyond-reference component (the reference has no serving layer, SURVEY.md
§1); built on the same jitted sample_images program as bench.py."""

import io
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest
import yaml

from ddmi_tpu.core.checkpoint import CheckpointManager
from ddmi_tpu.core.config import load_config


@pytest.fixture(scope="module")
def served_cfg(tmp_path_factory):
    """Tiny image config + freshly-initialized stage1/stage2 checkpoints."""
    tmp = tmp_path_factory.mktemp("serve")
    save = str(tmp / "save")
    cfg_yaml = {
        "model": {
            "DiT": False, "pretrained": True, "resume": False,
            "use_fp16": False, "amp": False, "lr": 1e-4, "embed_dim": 4,
            "params": {
                "lossconfig": {"epochs": 1, "warmup_epochs": 0,
                               "save_and_sample_every": 1,
                               "gradient_accumulate_every": 1},
                "ddconfig": {
                    "double_z": True, "z_channels": 8, "resolution": 16,
                    "in_channels": 3, "out_ch": 4, "ch": 32,
                    "ch_mult": [1, 1, 2], "num_res_blocks": 1,
                    "attn_resolutions": [], "hdbf_resolutions": [4, 8],
                },
                "mlpconfig": {"in_ch": 2, "out_ch": 3, "ch": 32,
                              "latent_dim": 4},
                "unetconfig": {
                    "image_size": 4, "in_channels": 4, "model_channels": 32,
                    "out_channels": 4, "num_res_blocks": 1,
                    "attention_resolutions": [2], "channel_mult": [1, 2],
                    "num_head_channels": 16,
                },
                "ddpmconfig": {"timesteps": 20, "image_size": 4,
                               "channels": 4, "sampling_timesteps": 4},
            },
        },
        "data": {
            "domain": "image", "mode": "gen", "dataset": "synthetic",
            "data_dir": "/tmp/none", "test_data_dir": "/tmp/none",
            "save_pth": save, "batch_size": 2, "test_batch_size": 2,
            "test_resolution": 16,
        },
    }
    cfg_path = tmp / "tiny_serve.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_yaml))
    cfg = load_config(str(cfg_path))

    from ddmi_tpu.domains.image import ImagePipeline

    pipe = ImagePipeline(cfg)
    c1 = CheckpointManager(save, prefix="stage1")
    c1.save(0, jax.device_get(pipe.init_stage1(jax.random.PRNGKey(0), 1)),
            force=True)
    c2 = CheckpointManager(save, prefix="stage2")
    c2.save(0, jax.device_get(pipe.init_stage2(jax.random.PRNGKey(1), 1)),
            force=True)
    c1.wait()
    c2.wait()
    return cfg


@pytest.fixture(scope="module")
def service(served_cfg):
    from ddmi_tpu.serve import SamplerService

    svc = SamplerService(
        served_cfg, service_batch=2, resolution=16, linger_ms=30.0,
        bf16=False,
    )
    svc.warmup()
    yield svc
    svc.close()


def test_generate_shapes_and_coalescing(service):
    """Two concurrent 1-sample requests coalesce into one device batch."""
    results = {}

    def call(name, seed):
        results[name] = service.generate(n=1, seed=seed, timeout=120)

    t1 = threading.Thread(target=call, args=("a", 1))
    t2 = threading.Thread(target=call, args=("b", 2))
    t1.start(); t2.start(); t1.join(); t2.join()
    for r in results.values():
        assert r.shape == (1, 16, 16, 3) and r.dtype == np.uint8


def test_generate_deterministic_per_seed(service):
    a = service.generate(n=1, seed=7, timeout=120)
    b = service.generate(n=1, seed=7, timeout=120)
    np.testing.assert_array_equal(a, b)
    c = service.generate(n=1, seed=8, timeout=120)
    assert not np.array_equal(a, c)


def test_timed_out_request_is_cancelled(service):
    """A request whose caller timed out must not consume a device batch:
    generate(timeout→0) marks it cancelled and removes it from the queue, so
    a following live request is unaffected (ADVICE r1)."""
    with pytest.raises(TimeoutError):
        service.generate(n=1, seed=99, timeout=1e-6)
    # queue must not retain the abandoned request
    with service._cond:
        assert all(not r.cancelled for r in service._queue)
        assert len(service._queue) == 0
    # service still serves live traffic afterwards
    out = service.generate(n=1, seed=100, timeout=120)
    assert out.shape == (1, 16, 16, 3)


def test_generate_validates_n(service):
    with pytest.raises(ValueError):
        service.generate(n=0)
    with pytest.raises(ValueError):
        service.generate(n=3)  # > service_batch


def test_http_frontend(service):
    from ddmi_tpu.serve import make_http_server

    server = make_http_server(service, host="127.0.0.1", port=0)
    port = server.server_address[1]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["resolution"] == 16

        req = urllib.request.Request(
            base + "/generate",
            data=json.dumps({"n": 2, "seed": 3, "format": "npy"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            imgs = np.load(io.BytesIO(r.read()))
        assert imgs.shape == (2, 16, 16, 3) and imgs.dtype == np.uint8

        req = urllib.request.Request(
            base + "/generate",
            data=json.dumps({"n": 2, "seed": 3, "format": "png"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            png = r.read()
        from PIL import Image

        im = Image.open(io.BytesIO(png))
        assert im.size == (32, 16)  # 2-wide grid of 16x16

        # bad request -> 400
        req = urllib.request.Request(
            base + "/generate",
            data=json.dumps({"n": 99}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        server.shutdown()
        server.server_close()


@pytest.fixture(scope="module")
def served_video_cfg(tmp_path_factory):
    """Tiny video config + freshly-initialized checkpoints."""
    tmp = tmp_path_factory.mktemp("serve_vid")
    save = str(tmp / "save")
    cfg_yaml = {
        "model": {
            "DiT": False, "pretrained": True, "resume": False,
            "use_fp16": False, "amp": False, "lr": 1e-4, "embed_dim": 8,
            "params": {
                "lossconfig": {"epochs": 1, "warmup_epochs": 0,
                               "save_and_sample_every": 1,
                               "gradient_accumulate_every": 1},
                "ddconfig": {
                    "double_z": True, "timesformer_channels": 32,
                    "splits": 1, "patch_size": 8, "resolution": 16,
                    "z_channels": 16, "in_channels": 3, "out_ch": 4,
                    "ch": 32, "ch_mult": [1, 1, 1, 1], "num_res_blocks": 1,
                    "attn_resolutions": [], "hdbf_resolutions": [4, 8],
                    "inter_attn_resolutions": [2, 8],
                    "attn_type": "vanilla-multihead",
                },
                "mlpconfig": {"in_ch": 2, "out_ch": 3, "ch": 32,
                              "latent_dim": 4},
                "unetconfig": {
                    "triplane": True,
                    "plane_sizes": [[2, 2], [4, 2], [4, 2]],
                    "image_size": 2, "in_channels": 8, "model_channels": 32,
                    "out_channels": 8, "num_res_blocks": 1,
                    "attention_resolutions": [2], "channel_mult": [1, 2],
                    "num_head_channels": 16,
                },
                "ddpmconfig": {"timesteps": 20, "image_size": 2,
                               "channels": 8, "sampling_timesteps": 4,
                               "mixed_prediction": True, "mixed_init": -6},
            },
        },
        "data": {
            "domain": "video", "mode": "gen", "dataset": "synthetic",
            "data_dir": "/tmp/none", "test_data_dir": "/tmp/none",
            "save_pth": save, "batch_size": 2, "test_batch_size": 2,
            "frames": 4, "test_resolution": 16,
        },
    }
    cfg_path = tmp / "tiny_serve_video.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_yaml))
    cfg = load_config(str(cfg_path))

    from ddmi_tpu.domains.video import VideoPipeline

    pipe = VideoPipeline(cfg)
    c1 = CheckpointManager(save, prefix="stage1")
    c1.save(0, jax.device_get(pipe.init_stage1(jax.random.PRNGKey(0), 1)),
            force=True)
    c2 = CheckpointManager(save, prefix="stage2")
    c2.save(0, jax.device_get(pipe.init_stage2(jax.random.PRNGKey(1), 1)),
            force=True)
    c1.wait()
    c2.wait()
    return cfg


def test_video_serving_npy_and_gif(served_video_cfg):
    from ddmi_tpu.serve import SamplerService, make_http_server

    svc = SamplerService(
        served_video_cfg, service_batch=2, resolution=16, linger_ms=10.0,
        bf16=False,
    )
    try:
        vids = svc.generate(n=1, seed=4, timeout=300)
        assert vids.shape == (1, 4, 16, 16, 3) and vids.dtype == np.uint8

        server = make_http_server(svc, host="127.0.0.1", port=0)
        port = server.server_address[1]
        th = threading.Thread(target=server.serve_forever, daemon=True)
        th.start()
        try:
            base = f"http://127.0.0.1:{port}"
            with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
                assert json.loads(r.read())["domain"] == "video"
            req = urllib.request.Request(
                base + "/generate",
                data=json.dumps({"n": 2, "seed": 5, "format": "gif"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                gif = r.read()
            from PIL import Image

            im = Image.open(io.BytesIO(gif))
            assert im.format == "GIF" and im.size == (32, 16)  # 2 tiled
            assert getattr(im, "n_frames", 1) == 4
        finally:
            server.shutdown()
            server.server_close()
    finally:
        svc.close()


@pytest.fixture(scope="module")
def served_occ_cfg(tmp_path_factory):
    """Tiny occupancy config + freshly-initialized checkpoints."""
    from ddmi_tpu.core.config import (
        Config, DDConfig, DDPMConfig, DataConfig, LossConfig, MLPConfig,
        ModelConfig, UNetConfig,
    )
    from ddmi_tpu.domains.occupancy import OccupancyPipeline

    tmp = tmp_path_factory.mktemp("serve_occ")
    save = str(tmp / "save")
    dd = DDConfig(
        double_z=True, z_channels=32, resolution=32, in_channels=8, out_ch=8,
        ch=32, ch_mult=(1, 2, 4), num_res_blocks=1, attn_resolutions=(),
        hdbf_resolutions=(8, 16), inter_attn_resolutions=(32, 16),
        attn_type="vanilla",
    )
    unet = UNetConfig(
        image_size=8, in_channels=24, model_channels=32, out_channels=24,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16,
    )
    ddpm = DDPMConfig(timesteps=20, image_size=8, channels=24,
                      sampling_timesteps=4, mixed_init=-6.0)
    model = ModelConfig(
        embed_dim=8, use_fp16=False,
        lossconfig=LossConfig(epochs=1, warmup_epochs=0,
                              gradient_accumulate_every=1),
        ddconfig=dd,
        mlpconfig=MLPConfig(in_ch=3, out_ch=1, ch=64, latent_dim=8),
        unetconfig=unet, ddpmconfig=ddpm,
        extra={"pointnet": {"c_dim": 8, "hidden_dim": 32,
                            "plane_resolution": 32, "n_blocks": 3}},
    )
    cfg = Config(model=model,
                 data=DataConfig(domain="occupancy", batch_size=2,
                                 save_pth=save))
    pipe = OccupancyPipeline(cfg)
    c1 = CheckpointManager(save, prefix="stage1")
    c1.save(0, jax.device_get(pipe.init_stage1(jax.random.PRNGKey(0), 1)),
            force=True)
    c2 = CheckpointManager(save, prefix="stage2")
    c2.save(0, jax.device_get(pipe.init_stage2(jax.random.PRNGKey(1), 1)),
            force=True)
    c1.wait()
    c2.wait()
    return cfg


def test_occupancy_serving_obj_and_npz(served_occ_cfg):
    from ddmi_tpu.serve import SamplerService, make_http_server

    svc = SamplerService(
        served_occ_cfg, service_batch=2, linger_ms=10.0, bf16=False,
        mesh_kwargs={"resolution0": 16, "upsampling_steps": 0,
                     "points_batch_size": 4096},
    )
    try:
        assert svc.res == 16
        meshes = svc.generate(n=2, seed=11, timeout=600)
        assert len(meshes) == 2
        for verts, faces in meshes:
            assert verts.ndim == 2 and verts.shape[1] == 3
            assert faces.ndim == 2 and faces.shape[1] == 3
        # deterministic per seed
        again = svc.generate(n=2, seed=11, timeout=600)
        np.testing.assert_allclose(meshes[0][0], again[0][0], atol=1e-5)

        server = make_http_server(svc, host="127.0.0.1", port=0)
        port = server.server_address[1]
        th = threading.Thread(target=server.serve_forever, daemon=True)
        th.start()
        try:
            base = f"http://127.0.0.1:{port}"
            with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
                assert json.loads(r.read())["domain"] == "occupancy"
            req = urllib.request.Request(
                base + "/generate",
                data=json.dumps({"n": 1, "seed": 3,
                                 "format": "obj"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                obj = r.read().decode()
            assert obj.startswith("o mesh_0")
            assert "\nv " in obj and "\nf " in obj

            req = urllib.request.Request(
                base + "/generate",
                data=json.dumps({"n": 2, "seed": 3,
                                 "format": "npz"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                arc = np.load(io.BytesIO(r.read()))
            assert set(arc.files) == {"verts_0", "faces_0", "verts_1",
                                      "faces_1"}

            # png is invalid for occupancy -> 400
            req = urllib.request.Request(
                base + "/generate",
                data=json.dumps({"n": 1, "format": "png"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=60)
            assert ei.value.code == 400
        finally:
            server.shutdown()
            server.server_close()
    finally:
        svc.close()


@pytest.fixture(scope="module")
def served_nerf_cfg(tmp_path_factory):
    """Tiny NeRF config + freshly-initialized checkpoints."""
    from ddmi_tpu.core.config import (
        Config, DDConfig, DDPMConfig, DataConfig, LossConfig, MLPConfig,
        ModelConfig, UNetConfig,
    )
    from ddmi_tpu.domains.nerf import NeRFPipeline

    tmp = tmp_path_factory.mktemp("serve_nerf")
    save = str(tmp / "save")
    dd = DDConfig(
        double_z=True, z_channels=32, resolution=16, in_channels=8, out_ch=8,
        ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
        hdbf_resolutions=(), inter_attn_resolutions=(16,),
        attn_type="vanilla",
    )
    unet = UNetConfig(
        image_size=8, in_channels=24, model_channels=32, out_channels=24,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16,
    )
    ddpm = DDPMConfig(timesteps=20, image_size=8, channels=24,
                      sampling_timesteps=4, mixed_init=-6.0)
    mlp = MLPConfig(
        in_ch=3, out_ch=4, ch=32, latent_dim=8,
        extra={"D": 2, "W": 32, "skips": (1,), "multires": 4,
               "multires_views": 2, "N_samples": 8, "N_rand": 64,
               "white_bkgd": True},
    )
    model = ModelConfig(
        embed_dim=8, use_fp16=False,
        lossconfig=LossConfig(epochs=1, warmup_epochs=0,
                              gradient_accumulate_every=1),
        ddconfig=dd, mlpconfig=mlp, unetconfig=unet, ddpmconfig=ddpm,
        extra={"pointnet": {"c_dim": 8, "hidden_dim": 32,
                            "plane_resolution": 16, "n_blocks": 2}},
    )
    cfg = Config(model=model,
                 data=DataConfig(domain="nerf", batch_size=1, save_pth=save))
    pipe = NeRFPipeline(cfg)
    c1 = CheckpointManager(save, prefix="stage1")
    c1.save(0, jax.device_get(pipe.init_stage1(jax.random.PRNGKey(0), 1)),
            force=True)
    c2 = CheckpointManager(save, prefix="stage2")
    c2.save(0, jax.device_get(pipe.init_stage2(jax.random.PRNGKey(1), 1)),
            force=True)
    c1.wait()
    c2.wait()
    return cfg


def test_nerf_serving_npy_and_gif(served_nerf_cfg):
    from ddmi_tpu.serve import SamplerService, make_http_server

    svc = SamplerService(
        served_nerf_cfg, service_batch=1, resolution=16, linger_ms=10.0,
        bf16=False, n_views=3,
    )
    try:
        views = svc.generate(n=1, seed=2, timeout=600)
        assert views.shape == (1, 3, 16, 16, 3) and views.dtype == np.uint8

        server = make_http_server(svc, host="127.0.0.1", port=0)
        port = server.server_address[1]
        th = threading.Thread(target=server.serve_forever, daemon=True)
        th.start()
        try:
            base = f"http://127.0.0.1:{port}"
            with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
                assert json.loads(r.read())["domain"] == "nerf"
            req = urllib.request.Request(
                base + "/generate",
                data=json.dumps({"n": 1, "seed": 5,
                                 "format": "gif"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                gif = r.read()
            from PIL import Image

            im = Image.open(io.BytesIO(gif))
            assert im.format == "GIF" and im.size == (16, 16)
            assert getattr(im, "n_frames", 1) == 3
        finally:
            server.shutdown()
            server.server_close()
    finally:
        svc.close()


def test_turbo_serving(served_cfg):
    """--turbo K routes serving through the encoder-reuse sampler
    (cli/serve.py sets ddpmconfig.extra.encoder_reuse)."""
    from ddmi_tpu.serve import SamplerService

    served_cfg.model.ddpmconfig.extra["encoder_reuse"] = 2
    try:
        svc = SamplerService(
            served_cfg, service_batch=2, resolution=16, linger_ms=5.0,
            bf16=False,
        )
        out = svc.generate(n=1, seed=3, timeout=180)
        assert out.shape == (1, 16, 16, 3) and out.dtype == np.uint8
        svc.close()
    finally:
        served_cfg.model.ddpmconfig.extra.pop("encoder_reuse", None)


def test_allow_init_serves_without_checkpoints(served_cfg, tmp_path):
    """allow_init=True serves untrained params when save_pth is empty
    (latency benchmarking / smoke deployment); default still raises."""
    import dataclasses

    from ddmi_tpu.serve import SamplerService

    cfg = dataclasses.replace(
        served_cfg,
        data=dataclasses.replace(served_cfg.data, save_pth=str(tmp_path / "empty")),
    )
    with pytest.raises(FileNotFoundError):
        SamplerService(cfg, service_batch=2, resolution=16, bf16=False)

    with pytest.warns(UserWarning, match="UNTRAINED"):
        svc = SamplerService(
            cfg, service_batch=2, resolution=16, linger_ms=5.0,
            bf16=False, allow_init=True,
        )
    assert svc.initialized is True
    out = svc.generate(n=1, seed=0, timeout=180)
    assert out.shape == (1, 16, 16, 3) and out.dtype == np.uint8
    svc.close()
