"""CLI end-to-end smokes (slow tier): every domain trains stage-1 + stage-2
through `ddmi_tpu.cli.main` with tiny synthetic configs, exercising config
loading, dataset dispatch, the generic Trainer, eval hooks, checkpoints, and
(for image) gen + eval modes — the flows a reference user drives."""

import json
import os

import pytest
import yaml

from ddmi_tpu.cli.main import main

pytestmark = pytest.mark.slow


def _base_cfg(save):
    return {
        "model": {
            "DiT": False, "pretrained": False, "resume": False,
            "use_fp16": False, "amp": False, "lr": 1e-4, "embed_dim": 8,
            "params": {
                "lossconfig": {
                    "epochs": 1, "warmup_epochs": 0,
                    "save_and_sample_every": 1,
                    "gradient_accumulate_every": 1, "sn_reg": True,
                    "multiscale": False,
                },
                "ddconfig": {
                    "double_z": True, "z_channels": 32, "resolution": 32,
                    "in_channels": 3, "out_ch": 16, "ch": 32,
                    "ch_mult": [1, 2, 4], "num_res_blocks": 1,
                    "attn_resolutions": [], "hdbf_resolutions": [8, 16],
                },
                "mlpconfig": {"in_ch": 2, "out_ch": 3, "ch": 64,
                              "latent_dim": 16},
                "unetconfig": {
                    "image_size": 8, "in_channels": 8, "model_channels": 32,
                    "out_channels": 8, "num_res_blocks": 1,
                    "attention_resolutions": [2], "channel_mult": [1, 2],
                    "num_head_channels": 16,
                },
                "ddpmconfig": {"timesteps": 20, "image_size": 8,
                               "channels": 8, "sampling_timesteps": 4},
            },
        },
        "data": {
            "domain": "image", "mode": "train", "dataset": "synthetic",
            "data_dir": "/tmp/none", "test_data_dir": "/tmp/none",
            "save_pth": save, "batch_size": 8, "test_batch_size": 2,
            "test_resolution": 16,
        },
    }


def _write(tmp_path, cfg, name):
    p = tmp_path / name
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_cli_image_train_gen_eval(tmp_path):
    save = str(tmp_path / "run")
    cfg = _base_cfg(save)
    path = _write(tmp_path, cfg, "img.yaml")
    main(["--exp", "d2c-vae", "--configs", path])
    main(["--exp", "ldm", "--configs", path])
    assert os.path.isdir(os.path.join(save, "stage1"))
    assert os.path.isdir(os.path.join(save, "stage2"))
    # sample dumps from the default eval hooks
    assert any(f.startswith("ep") for f in os.listdir(os.path.join(save, "recon")))
    assert any(f.startswith("ep") for f in os.listdir(os.path.join(save, "samples")))

    cfg["data"]["mode"] = "gen"
    main(["--exp", "ldm", "--configs", _write(tmp_path, cfg, "gen.yaml")])
    assert os.path.exists(os.path.join(save, "generation_0.png")) or \
        os.path.exists(os.path.join(save, "generation.npy"))

    cfg["data"]["mode"] = "eval"
    main(["--exp", "d2c-vae", "--configs", _write(tmp_path, cfg, "ev.yaml")])
    results = json.load(open(os.path.join(save, "eval.json")))
    assert "rfid" in results


def test_cli_occupancy_train_both_stages(tmp_path):
    save = str(tmp_path / "occ")
    cfg = _base_cfg(save)
    cfg["data"].update({"domain": "occupancy"})
    cfg["model"]["params"]["ddconfig"].update(
        {"in_channels": 8, "out_ch": 8,
         "inter_attn_resolutions": [32, 16]}
    )
    cfg["model"]["params"]["mlpconfig"].update({"in_ch": 3, "out_ch": 1})
    cfg["model"]["params"]["unetconfig"].update(
        {"in_channels": 24, "out_channels": 24}
    )
    cfg["model"]["params"]["ddpmconfig"].update({"channels": 24})
    cfg["model"]["extra"] = {
        "pointnet": {"c_dim": 8, "hidden_dim": 32,
                     "plane_resolution": 32, "n_blocks": 3}
    }
    path = _write(tmp_path, cfg, "occ.yaml")
    main(["--exp", "d2c-vae", "--configs", path])
    main(["--exp", "ldm", "--configs", path])
    # the stage-2 hook mesh-extracts through the C++ geometry lib
    assert any(
        f.endswith(".off")
        for f in os.listdir(os.path.join(save, "samples"))
    )

    # gen + eval modes drive the BATCHED lockstep MISE extraction
    # (generate_meshes_batched); eval's 3 meshes with mesh_batch=2
    # exercises the padded last group
    cfg["data"]["mode"] = "gen"
    main(["--exp", "ldm", "--configs", _write(tmp_path, cfg, "occ_gen.yaml")])
    assert os.path.exists(os.path.join(save, "generation", "mesh_0.off"))

    cfg["data"]["mode"] = "eval"
    cfg["data"]["extra"] = {"eval_samples": 3, "mesh_batch": 2}
    main(["--exp", "ldm", "--configs", _write(tmp_path, cfg, "occ_ev.yaml")])
    # evaluate() completed through the batched extractor (3 meshes,
    # group 2 -> padded last group).  A 1-epoch random-ish model usually
    # yields EMPTY meshes, so MMD/COV keys are data-dependent — the metric
    # math itself is covered by tests/test_mesh_generation; extraction
    # parity by tests/test_batched_meshgen.
    results = json.load(open(os.path.join(save, "eval.json")))
    assert isinstance(results, dict)
