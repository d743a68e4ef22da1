"""Cross-framework END-TO-END golden-sample test against the ACTUAL
reference implementation (round-3 VERDICT item 3).

Unlike tests/test_interop.py — which verifies converter layout conventions
against re-implemented torch fixtures — this test imports the reference's own
modules from /root/reference (models/d2c_vae/autoencoder_unet.py::Autoencoder,
models/d2c_vae/mlp.py::MLP, models/ldm/modules/diffusionmodules/
openaimodel.py::UNetModel, diffusion/ddpm.py::DDPM), builds a tiny random-init
pipeline, perturbs every parameter so no zero-init path is dead (the ADM UNet
zero-inits conv_out and every block's output projection), saves the reference
'ldm-last.pt' layout, converts it with ddmi_tpu.interop.reference_ckpt, and
feeds BIT-IDENTICAL initial noise to

  reference: DDPM.sample (ddim_sample, diffusion/ddpm.py:334-369)
             -> Autoencoder.decode -> MLP render (tools/ldm/image.py:226-249)
  ours:      domains/image.py::ImagePipeline.sample_images (one jitted program)

and asserts the FINAL IMAGES agree.  Determinism notes:
  * ddim_sampling_eta=0 on both sides (no in-loop noise; the only stochastic
    input is the initial latent, which we feed explicitly to both).
  * NoiseInjection weights (blocks.py:283-297) stay at their zero init — the
    perturbation pass skips them — so the StyleGAN render leg is
    deterministic on both sides.
  * scale injection anchored at ddconfig.resolution on both sides (the
    reference generate() hardcodes anchor 256 == its config resolution;
    utils/general_utils.py:204 takes anchor_res, so we call the reference's
    own function with the tiny config's resolution).

Import shims (test-only; the reference is CUDA/torchvision-flavored):
  * torchvision is stubbed (diffusion/ddpm.py:19 imports make_grid only;
    utils/general_utils.py imports transforms.functional it never touches on
    this path).
  * models.d2c_vae.op compiles CUDA at import (fused_act.py:10); we
    pre-register a CPU-equivalent module implementing the documented
    fused_leaky_relu / upfirdn2d semantics (same spec as tests/test_upfirdn.py).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


# ------------------------------------------------------- CPU op equivalents


def _fused_leaky_relu(x, bias, negative_slope=0.2, scale=2**0.5):
    """models/d2c_vae/op/fused_act.py semantics on CPU: bias-add along
    channel dim 1, leaky-relu, * sqrt(2)."""
    rest = [1] * (x.ndim - 2)
    return F.leaky_relu(
        x + bias.view(1, -1, *rest), negative_slope=negative_slope
    ) * scale


class _FusedLeakyReLU(torch.nn.Module):
    def __init__(self, channel, negative_slope=0.2, scale=2**0.5):
        super().__init__()
        self.bias = torch.nn.Parameter(torch.zeros(channel))
        self.negative_slope = negative_slope
        self.scale = scale

    def forward(self, x):
        return _fused_leaky_relu(x, self.bias, self.negative_slope, self.scale)


def _upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    """upfirdn2d_native semantics (zero-stuff -> pad -> conv(flipped k) ->
    stride) on NCHW torch tensors."""
    b, c, h, w = x.shape
    kh, kw = kernel.shape
    p0, p1 = pad
    x = x.reshape(b * c, 1, h, w)
    if up > 1:
        z = x.new_zeros(b * c, 1, h, up, w, up)
        z[:, :, :, 0, :, 0] = x.view(b * c, 1, h, 1, w, 1)[:, :, :, 0, :, 0]
        x = z.view(b * c, 1, h * up, w * up)
    x = F.pad(x, (max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)))
    if p0 < 0:
        x = x[:, :, -p0:, -p0:]
    if p1 < 0:
        x = x[:, :, : x.shape[2] + p1, : x.shape[3] + p1]
    w_k = torch.flip(kernel, [0, 1]).view(1, 1, kh, kw).to(x.dtype)
    x = F.conv2d(x, w_k, stride=down)
    return x.view(b, c, x.shape[2], x.shape[3])


# --------------------------------------------------------------- ref loader


@pytest.fixture(scope="module")
def ref():
    """Import the actual reference modules with CPU shims installed."""
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

    op = types.ModuleType("models.d2c_vae.op")
    op.FusedLeakyReLU = _FusedLeakyReLU
    op.fused_leaky_relu = _fused_leaky_relu
    op.upfirdn2d = _upfirdn2d
    stubs["models.d2c_vae.op"] = op

    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF)
    try:
        from models.d2c_vae.autoencoder_unet import Autoencoder
        from models.d2c_vae.mlp import MLP
        from models.ldm.modules.diffusionmodules.openaimodel import UNetModel
        from diffusion.ddpm import DDPM
        from utils.general_utils import (
            convert_to_coord_format_2d,
            get_scale_injection,
            unsymmetrize_image_data,
        )

        ns = types.SimpleNamespace(
            Autoencoder=Autoencoder,
            MLP=MLP,
            UNetModel=UNetModel,
            DDPM=DDPM,
            convert_to_coord_format_2d=convert_to_coord_format_2d,
            get_scale_injection=get_scale_injection,
            unsymmetrize_image_data=unsymmetrize_image_data,
        )
        yield ns
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

RES = 16          # ddconfig.resolution (anchor)
EMBED = 4         # Autoencoder embed_dim == ddpm channels
LAT = 8           # latent side = 16 / 2^(len(ch_mult)-1)  -> wait: computed below
T, S = 20, 4      # diffusion timesteps / DDIM steps

DD = dict(
    double_z=True, z_channels=8, resolution=RES, in_channels=3, out_ch=4,
    ch=32, ch_mult=[1, 1, 2], num_res_blocks=1, attn_resolutions=[],
    hdbf_resolutions=[4, 8], dropout=0.0,
)
MLPC = dict(in_ch=2, out_ch=3, ch=32, latent_dim=4)
UN = dict(
    image_size=4, in_channels=4, model_channels=32, out_channels=4,
    num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
    num_head_channels=16,
)
DP = dict(
    timesteps=T, sampling_timesteps=S, ddim_sampling_eta=0.0,
    image_size=4, channels=EMBED, clip_denoised=False,
    linear_start=0.0015, linear_end=0.0195, mixed_prediction=True,
    mixed_init=-6.0,
)


def _build_reference(ref, seed=0):
    torch.manual_seed(seed)
    vae = ref.Autoencoder(ddconfig=DD, embed_dim=EMBED)
    mlp = ref.MLP(**MLPC)
    unet = ref.UNetModel(**UN)
    ddpm = ref.DDPM(model=unet, **DP)
    # Make every path live: the ADM UNet zero-inits conv_out + block output
    # projections, so an unperturbed random init is the zero function and the
    # sampler would only exercise the mixing component.
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for mod in (vae, mlp, ddpm):
            for name, p in mod.named_parameters():
                if "noise.weight" in name:
                    continue  # keep NoiseInjection OFF -> deterministic
                p.add_(0.05 * torch.randn(p.shape, generator=g))
        # 50/50 model/mixing split so BOTH terms of the mixed prediction
        # influence the sample (at the -6 init the model weight is 0.25%).
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
                double_z=True, z_channels=8, resolution=RES, in_channels=3,
                out_ch=4, ch=32, ch_mult=(1, 1, 2), num_res_blocks=1,
                attn_resolutions=(), hdbf_resolutions=(4, 8),
            ),
            mlpconfig=MLPConfig(in_ch=2, out_ch=3, ch=32, latent_dim=4),
            unetconfig=UNetConfig(
                image_size=4, in_channels=4, model_channels=32,
                out_channels=4, num_res_blocks=1, attention_resolutions=(2,),
                channel_mult=(1, 2), num_head_channels=16,
            ),
            ddpmconfig=DDPMConfig(
                timesteps=T, sampling_timesteps=S, ddim_sampling_eta=0.0,
                image_size=4, channels=EMBED, clip_denoised=False,
                mixed_prediction=True, mixed_init=-6.0,
            ),
        ),
        data=DataConfig(domain="image", batch_size=2, test_batch_size=2,
                        test_resolution=RES),
    )


# -------------------------------------------------------------------- tests


def test_golden_end_to_end_sample(ref):
    """Reference DDPM.sample -> decode -> MLP render vs our sample_images on
    a converted checkpoint with bit-identical initial noise."""
    from ddmi_tpu.domains.image import ImagePipeline
    from ddmi_tpu.interop.reference_ckpt import (
        convert_stage1_image,
        convert_stage2_image,
    )

    vae, mlp, ddpm = _build_reference(ref)
    data = {
        "vaemodel": vae.state_dict(),
        "mlp": mlp.state_dict(),
        "diffusion": ddpm.state_dict(),
    }

    B = 2
    eps0 = np.random.RandomState(7).randn(B, EMBED, 4, 4).astype(np.float32)

    # --- reference leg (tools/ldm/image.py::generate, CPU) ---
    with torch.no_grad():
        z_t = ddpm.sample(shape=[B, EMBED, 4, 4], noise=torch.from_numpy(eps0))
        pe_t = vae.decode(z_t)
        lin = (RES - 1) / RES
        coords = ref.convert_to_coord_format_2d(
            1, RES, RES, device="cpu",
            hstart=-lin, hend=lin, wstart=-lin, wend=lin,
        )
        si = ref.get_scale_injection(RES, anchor_res=RES)
        img_t = mlp(coords, hdbf=pe_t, si=si)
        img_t = ref.unsymmetrize_image_data(img_t.clamp(-1.0, 1.0))
    ref_img = img_t.detach().numpy().transpose(0, 2, 3, 1)  # -> NHWC

    # --- our leg (one jitted program over the converted params) ---
    cfg = _our_config()
    pipe = ImagePipeline(cfg)
    s1 = convert_stage1_image(
        data, cfg.model.ddconfig, cfg.model.mlpconfig, vae_key="vaemodel"
    )
    s2 = convert_stage2_image(data, cfg.model.unetconfig)
    s2 = jax.tree_util.tree_map(jnp.asarray, s2)
    s1 = jax.tree_util.tree_map(jnp.asarray, s1)

    # intermediate golden: the DDIM latent itself must match tightly
    from ddmi_tpu.diffusion.process import ddim_sample_unet

    z_j = ddim_sample_unet(
        pipe.gd, pipe.unet, s2["unet"], s2["mixing_logit"],
        (B, 4, 4, EMBED), jax.random.PRNGKey(0),
        noise=jnp.asarray(eps0.transpose(0, 2, 3, 1)),
    )
    z_ref = z_t.numpy().transpose(0, 2, 3, 1)
    assert np.max(np.abs(np.asarray(z_j) - z_ref)) < 5e-4, (
        "DDIM latent diverged from the reference sampler"
    )

    imgs = pipe.sample_images(
        s2, s1, jax.random.PRNGKey(1), batch=B, resolution=RES,
        noise=jnp.asarray(eps0.transpose(0, 2, 3, 1)),
    )
    got = np.asarray(imgs)

    assert got.shape == ref_img.shape == (B, RES, RES, 3)
    # sanity: the comparison must not be trivially saturated at the clamp
    interior = (ref_img > 1e-3) & (ref_img < 1 - 1e-3)
    assert interior.mean() > 0.25, "golden image saturated; test is vacuous"
    diff = np.abs(got - ref_img)
    assert diff.max() < 2e-3, f"golden sample mismatch: max={diff.max():.2e}"
    assert diff.mean() < 2e-4


def test_golden_stage1_reconstruction(ref):
    """Reference Autoencoder encode(mode)+decode+render vs ours on the same
    converted weights and a fixed input image (the stage-1 eval path,
    tools/d2c_vae/image.py)."""
    from ddmi_tpu.interop.reference_ckpt import convert_stage1_image
    from ddmi_tpu.nn.vae import Autoencoder as OurVAE
    from ddmi_tpu.nn.inr import INRImage

    vae, mlp, _ = _build_reference(ref, seed=3)
    data = {"vaemodel": vae.state_dict(), "mlp": mlp.state_dict()}

    cfg = _our_config()
    s1 = convert_stage1_image(
        data, cfg.model.ddconfig, cfg.model.mlpconfig, vae_key="vaemodel"
    )

    x = np.random.RandomState(11).rand(2, 3, RES, RES).astype(np.float32)
    x = 2 * x - 1  # symmetrized

    with torch.no_grad():
        post = vae.encode(torch.from_numpy(x))
        z = post.mode()  # deterministic: posterior mean
        pe_t = vae.decode(z)
        lin = (RES - 1) / RES
        coords = ref.convert_to_coord_format_2d(
            1, RES, RES, device="cpu",
            hstart=-lin, hend=lin, wstart=-lin, wend=lin,
        )
        out_t = mlp(coords, hdbf=pe_t, si=1.0)
    ref_out = out_t.detach().numpy().transpose(0, 2, 3, 1)

    our_vae = OurVAE(cfg.model.ddconfig, embed_dim=EMBED)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    posterior = our_vae.apply({"params": s1["vae"]}, xj, method=OurVAE.encode)
    hdbf = our_vae.apply(
        {"params": s1["vae"]}, posterior.mode(), method=OurVAE.decode
    )

    from ddmi_tpu.core.coords import pixel_center_grid

    grid = jnp.tile(pixel_center_grid(RES).reshape(1, -1, 2), (2, 1, 1))
    inr = INRImage(cfg.model.mlpconfig)
    out_j = inr.apply(
        {"params": s1["mlp"]}, grid, hdbf, 1.0,
        rngs={"noise": jax.random.PRNGKey(0)},
    ).reshape(2, RES, RES, 3)

    diff = np.abs(np.asarray(out_j) - ref_out)
    assert diff.max() < 1e-3, f"stage-1 recon mismatch: max={diff.max():.2e}"
