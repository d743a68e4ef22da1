"""Cross-framework END-TO-END golden-sample test for the VIDEO domain.

Companion to tests/test_golden_reference.py (image): imports the ACTUAL
reference video modules from /root/reference
(models/d2c_vae/autoencoder_vit.py::VITAutoencoder,
models/d2c_vae/mlp.py::MLPVideo,
models/ldm/modules/diffusionmodules/openaimodel.py::UNetModel_Triplane,
diffusion/ddpm.py::DDPM), builds a tiny random-init pipeline, converts its
checkpoint with ddmi_tpu.interop.reference_ckpt, and feeds BIT-IDENTICAL
initial noise to

  reference: DDPM.sample (ddim_sample) -> VITAutoencoder.decode ->
             MLPVideo(coords, hdbf) (tools/ldm/video.py:214-237 generate)
  ours:      domains/video.py::VideoPipeline.sample_videos (one jitted
             program: lax.scan DDIM + triplane decode + per-frame INR render)

and asserts the FINAL VIDEOS agree.  This is the test that pins down the
video coordinate convention: the reference passes PIXEL-CENTER endpoints
±(n-1)/n (±255/256 for 256 px, ±15/16 for 16 frames) to
convert_to_coord_format_3d at train and eval time
(tools/d2c_vae/video.py:167, tools/ldm/video.py:207-210), not the
function's [-1,1] defaults — domains/video.py::video_axes must match.

Import shims (test-only):
  * torchvision stubbed as in test_golden_reference.py.
  * xformers stubbed with EXACT attention math: make_attn
    (autoencoder_unet.py:556-606) hard-requires xformers for the
    'vanilla-1d-multihead-expand' cross-plane blocks the video decoder uses
    (raises ValueError without it), and the xformers classes are what the
    reference runs in production — scale = head_dim**-0.5
    (MemoryEfficientAttnBlock1D[_expand], autoencoder_unet.py:404-536),
    which is what ddmi_tpu.nn.attention1d implements.  The stub computes
    softmax(q k^T / sqrt(hd)) v densely on (B*H, M, K) tensors.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def _memory_efficient_attention(q, k, v, attn_bias=None, op=None):
    """Exact math of xformers.ops.memory_efficient_attention on
    (B*H, M, K): softmax(q k^T * K**-0.5) v."""
    assert attn_bias is None
    scale = q.shape[-1] ** -0.5
    attn = torch.softmax(q @ k.transpose(-2, -1) * scale, dim=-1)
    return attn @ v


@pytest.fixture(scope="module")
def ref():
    """Import the actual reference video modules with CPU shims installed."""
    stubs = {}

    tv = types.ModuleType("torchvision")
    tv_utils = types.ModuleType("torchvision.utils")
    tv_utils.make_grid = lambda *a, **k: a[0]
    tv_utils.save_image = lambda *a, **k: None
    tv_tr = types.ModuleType("torchvision.transforms")
    tv_trf = types.ModuleType("torchvision.transforms.functional")
    tv.utils, tv.transforms, tv_tr.functional = tv_utils, tv_tr, tv_trf
    stubs.update({
        "torchvision": tv,
        "torchvision.utils": tv_utils,
        "torchvision.transforms": tv_tr,
        "torchvision.transforms.functional": tv_trf,
    })

    xf = types.ModuleType("xformers")
    xf_ops = types.ModuleType("xformers.ops")
    xf_ops.memory_efficient_attention = _memory_efficient_attention
    xf.ops = xf_ops
    stubs.update({"xformers": xf, "xformers.ops": xf_ops})

    # models.d2c_vae.op compiles CUDA at import; reuse the image golden
    # test's CPU-exact equivalents (same spec as tests/test_upfirdn.py).
    from tests.test_golden_reference import (
        _FusedLeakyReLU,
        _fused_leaky_relu,
        _upfirdn2d,
    )

    op = types.ModuleType("models.d2c_vae.op")
    op.FusedLeakyReLU = _FusedLeakyReLU
    op.fused_leaky_relu = _fused_leaky_relu
    op.upfirdn2d = _upfirdn2d
    stubs["models.d2c_vae.op"] = op

    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF)
    try:
        from models.d2c_vae.autoencoder_vit import VITAutoencoder
        from models.d2c_vae.mlp import MLPVideo
        from models.ldm.modules.diffusionmodules.openaimodel import (
            UNetModel_Triplane,
        )
        from diffusion.ddpm import DDPM
        from utils.general_utils import (
            convert_to_coord_format_3d,
            unsymmetrize_image_data,
        )

        yield types.SimpleNamespace(
            VITAutoencoder=VITAutoencoder,
            MLPVideo=MLPVideo,
            UNetModel_Triplane=UNetModel_Triplane,
            DDPM=DDPM,
            convert_to_coord_format_3d=convert_to_coord_format_3d,
            unsymmetrize_image_data=unsymmetrize_image_data,
        )
    finally:
        sys.path.remove(REF)
        for k in list(sys.modules):
            if k.split(".")[0] in ("models", "diffusion", "utils", "losses",
                                   "evals", "tools", "exp", "convocc"):
                del sys.modules[k]
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


# ------------------------------------------------------------- tiny configs

RES = 32          # video resolution; latent planes RES//8 = 4
FRAMES = 4        # VITAutoencoder frames (splits=1)
EMBED = 8         # embed_dim == ddpm channels
PLANE = RES // 8  # 4
N_TOK = PLANE * PLANE + 2 * FRAMES * PLANE  # [xy | xt | yt] = 48
T, S = 20, 4      # diffusion timesteps / DDIM steps

DD = dict(
    double_z=True, z_channels=16, resolution=RES, in_channels=3, out_ch=4,
    ch=32, ch_mult=[1, 1, 1, 1], num_res_blocks=1, attn_resolutions=[],
    hdbf_resolutions=[8, 16], inter_attn_resolutions=[4, 16],
    attn_type="vanilla-multihead", timesformer_channels=32, patch_size=8,
    splits=1, dropout=0.0,
)
MLPC = dict(in_ch=3, latent_dim=4, out_ch=3, ch=32)
UN = dict(
    in_channels=EMBED, model_channels=32, out_channels=EMBED,
    num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
    num_head_channels=16, size1=PLANE, size2=PLANE, size3=FRAMES,
)
DP = dict(
    timesteps=T, sampling_timesteps=S, ddim_sampling_eta=0.0,
    image_size=PLANE, channels=EMBED, clip_denoised=False,
    linear_start=0.0015, linear_end=0.0195, mixed_prediction=True,
    mixed_init=-6.0, domain="video",
)


def _build_reference(ref, seed=0):
    torch.manual_seed(seed)
    vae = ref.VITAutoencoder(ddconfig=DD, embed_dim=EMBED, frames=FRAMES)
    mlp = ref.MLPVideo(**MLPC)
    unet = ref.UNetModel_Triplane(**UN)
    ddpm = ref.DDPM(model=unet, **DP)
    # Perturb every parameter so zero-init output projections are live.
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for mod in (vae, mlp, ddpm):
            for name, p in mod.named_parameters():
                p.add_(0.05 * torch.randn(p.shape, generator=g))
        # 50/50 model/mixing split so both mixed-prediction terms matter.
        ddpm.mixing_logit.fill_(0.0)
    vae.eval(), mlp.eval(), ddpm.eval()
    return vae, mlp, ddpm


def _our_config():
    from ddmi_tpu.core.config import (
        Config, DDConfig, DDPMConfig, DataConfig, LossConfig, MLPConfig,
        ModelConfig, UNetConfig,
    )

    return Config(
        model=ModelConfig(
            embed_dim=EMBED, use_fp16=False,
            lossconfig=LossConfig(gradient_accumulate_every=1),
            ddconfig=DDConfig(
                double_z=True, z_channels=16, resolution=RES, in_channels=3,
                out_ch=4, ch=32, ch_mult=(1, 1, 1, 1), num_res_blocks=1,
                attn_resolutions=(), hdbf_resolutions=(8, 16),
                inter_attn_resolutions=(4, 16), attn_type="vanilla-multihead",
                timesformer_channels=32, patch_size=8, splits=1,
            ),
            mlpconfig=MLPConfig(in_ch=3, out_ch=3, ch=32, latent_dim=4),
            unetconfig=UNetConfig(
                image_size=PLANE, in_channels=EMBED, model_channels=32,
                out_channels=EMBED, num_res_blocks=1,
                attention_resolutions=(2,), channel_mult=(1, 2),
                num_head_channels=16, triplane=True,
            ),
            ddpmconfig=DDPMConfig(
                timesteps=T, sampling_timesteps=S, ddim_sampling_eta=0.0,
                image_size=PLANE, channels=EMBED, clip_denoised=False,
                mixed_prediction=True, mixed_init=-6.0,
            ),
        ),
        data=DataConfig(domain="video", batch_size=2, test_batch_size=2,
                        test_resolution=RES, frames=FRAMES),
    )


# -------------------------------------------------------------------- tests


def test_golden_video_end_to_end_sample(ref):
    """Reference DDPM.sample -> VITAutoencoder.decode -> MLPVideo render vs
    our sample_videos on a converted checkpoint, bit-identical noise."""
    from ddmi_tpu.domains.video import VideoPipeline
    from ddmi_tpu.interop.reference_ckpt import (
        convert_stage1_video,
        convert_stage2_video,
    )

    vae, mlp, ddpm = _build_reference(ref)
    data = {
        "vaemodel": vae.state_dict(),
        "mlp": mlp.state_dict(),
        "diffusion": ddpm.state_dict(),
    }

    B = 2
    eps0 = np.random.RandomState(7).randn(B, EMBED, N_TOK).astype(np.float32)

    # --- reference leg (tools/ldm/video.py::generate protocol, CPU) ---
    with torch.no_grad():
        z_t = ddpm.sample(shape=[B, EMBED, N_TOK],
                          noise=torch.from_numpy(eps0))
        hdbf_t = vae.decode(z_t)  # (xy, yt, xt) — each 3 hdbf levels
        lin = (RES - 1) / RES
        tlin = (FRAMES - 1) / FRAMES
        coords = ref.convert_to_coord_format_3d(
            1, RES, RES, FRAMES, device="cpu",
            hstart=-lin, hend=lin, wstart=-lin, wend=lin,
            tstart=-tlin, tend=tlin,
        )
        vid_t = mlp(coords, hdbf_t)  # (B, 3, t, h, w)
        vid_t = ref.unsymmetrize_image_data(vid_t.clamp(-1.0, 1.0))
    ref_vid = vid_t.detach().numpy().transpose(0, 2, 3, 4, 1)  # -> NTHWC

    # --- our leg (one jitted program over the converted params) ---
    cfg = _our_config()
    pipe = VideoPipeline(cfg)
    s1 = convert_stage1_video(data, cfg.model.ddconfig)
    s2 = convert_stage2_video(data, cfg.model.unetconfig)
    s1 = jax.tree_util.tree_map(jnp.asarray, s1)
    s2 = jax.tree_util.tree_map(jnp.asarray, s2)

    # intermediate golden: the DDIM token latent itself must match tightly
    from ddmi_tpu.diffusion.process import ddim_sample_unet

    z_j = ddim_sample_unet(
        pipe.gd, pipe.unet, s2["unet"], s2["mixing_logit"],
        (B, N_TOK, EMBED), jax.random.PRNGKey(0),
        noise=jnp.asarray(eps0.transpose(0, 2, 1)),
    )
    z_ref = z_t.numpy().transpose(0, 2, 1)  # (B, N, C)
    assert np.max(np.abs(np.asarray(z_j) - z_ref)) < 5e-4, (
        "DDIM latent diverged from the reference sampler"
    )

    vids = pipe.sample_videos(
        s2, s1, jax.random.PRNGKey(1), batch=B,
        noise=jnp.asarray(eps0.transpose(0, 2, 1)),
    )
    got = np.asarray(vids)

    assert got.shape == ref_vid.shape == (B, FRAMES, RES, RES, 3)
    # sanity: comparison must not be trivially saturated at the clamp
    interior = (ref_vid > 1e-3) & (ref_vid < 1 - 1e-3)
    assert interior.mean() > 0.25, "golden video saturated; test is vacuous"
    diff = np.abs(got - ref_vid)
    assert diff.max() < 2e-3, f"golden video mismatch: max={diff.max():.2e}"
    assert diff.mean() < 2e-4
