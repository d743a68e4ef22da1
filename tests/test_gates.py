"""Quality-gate machinery (evals/gates.py + Trainer.evaluate wiring)."""

import pytest

from ddmi_tpu.evals.gates import check_gates


def test_min_metric_pass_and_fail():
    ok, d = check_gates({"fid": 7.30}, {"fid": {"published": 7.25,
                                                "tol_pct": 2.0}})
    assert ok and d["fid"]["passed"]
    ok, d = check_gates({"fid": 7.45}, {"fid": {"published": 7.25,
                                                "tol_pct": 2.0}})
    assert not ok and not d["fid"]["passed"]
    # beating the published number outright always passes
    ok, _ = check_gates({"fid": 5.0}, {"fid": {"published": 7.25}})
    assert ok


def test_max_metric_direction_default():
    # cov is higher-is-better by default
    ok, d = check_gates({"cov": 0.544}, {"cov": {"published": 0.55,
                                                 "tol_pct": 2.0}})
    assert ok and d["cov"]["direction"] == "max"
    ok, _ = check_gates({"cov": 0.50}, {"cov": {"published": 0.55,
                                                "tol_pct": 2.0}})
    assert not ok


def test_explicit_direction_override():
    # force a min interpretation onto a default-max name
    ok, d = check_gates(
        {"psnr": 10.0}, {"psnr": {"published": 9.0, "direction": "min"}}
    )
    assert not ok and d["psnr"]["direction"] == "min"


def test_bare_number_uses_default_tol():
    ok, _ = check_gates({"mmd": 1.01}, {"mmd": 1.0})
    assert ok
    ok, _ = check_gates({"mmd": 1.03}, {"mmd": 1.0})
    assert not ok


def test_null_published_is_loud():
    with pytest.raises(ValueError, match="2401.12517"):
        check_gates({"fid": 1.0}, {"fid": {"published": None}})


def test_missing_metric_is_failing_gate_not_exception():
    """A gated metric the eval legitimately skipped (e.g. occupancy MMD/COV
    with zero generated meshes) must FAIL the gate, not raise — so the
    caller still writes eval.json with the verdict (ADVICE r3)."""
    ok, d = check_gates({"fid": 1.0}, {"fvd": {"published": 100.0}})
    assert not ok
    assert d["fvd"]["passed"] is False
    assert "absent" in d["fvd"]["reason"]
    assert d["fvd"]["value"] is None


def test_bad_direction_is_loud():
    """A direction typo ('lower') must not silently invert gate semantics."""
    with pytest.raises(ValueError, match="direction"):
        check_gates(
            {"fid": 1.0}, {"fid": {"published": 2.0, "direction": "lower"}}
        )


def test_multi_gate_all_must_pass():
    res = {"mmd": 0.9, "cov": 0.6}
    gates = {"mmd": {"published": 1.0}, "cov": {"published": 0.55}}
    ok, d = check_gates(res, gates)
    assert ok and all(v["passed"] for v in d.values())
    res["cov"] = 0.1
    ok, d = check_gates(res, gates)
    assert not ok and d["mmd"]["passed"] and not d["cov"]["passed"]


def test_gate_config_ships_null_placeholder():
    """The shipped parity-gate config must carry a null published value
    (honesty contract: no from-memory paper numbers in the repo)."""
    import yaml

    cfg = yaml.safe_load(open("configs/eval/celebahq_parity_gate.yaml"))
    g = cfg["data"]["extra"]["quality_gates"]
    assert g["fid"]["published"] is None
    assert g["fid"]["tol_pct"] == 2.0


@pytest.mark.slow
def test_trainer_eval_gate_wiring(tmp_path):
    """mode: eval with gates: eval.json gains gates/gates_passed; a failing
    gate exits nonzero (SystemExit)."""
    import json

    import yaml

    from ddmi_tpu.cli.main import main

    save = str(tmp_path / "run")
    cfg = {
        "model": {
            "DiT": False, "pretrained": False, "resume": False,
            "use_fp16": False, "amp": False, "lr": 1e-4, "embed_dim": 8,
            "params": {
                "lossconfig": {"epochs": 1, "warmup_epochs": 0,
                               "save_and_sample_every": 1,
                               "gradient_accumulate_every": 1},
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
    p = tmp_path / "train.yaml"
    p.write_text(yaml.safe_dump(cfg))
    main(["--exp", "d2c-vae", "--configs", str(p)])

    # rfid with random init is huge; a generous gate passes, a tiny one fails
    cfg["data"]["mode"] = "eval"
    cfg["data"]["extra"] = {
        "eval_samples": 4,
        "quality_gates": {"rfid": {"published": 1e9, "tol_pct": 2.0}},
    }
    p2 = tmp_path / "gate_pass.yaml"
    p2.write_text(yaml.safe_dump(cfg))
    main(["--exp", "d2c-vae", "--configs", str(p2)])
    results = json.load(open(f"{save}/eval.json"))
    assert results["gates_passed"] is True
    assert results["gates"]["rfid"]["passed"] is True

    cfg["data"]["extra"]["quality_gates"]["rfid"]["published"] = 1e-6
    p3 = tmp_path / "gate_fail.yaml"
    p3.write_text(yaml.safe_dump(cfg))
    with pytest.raises(SystemExit):
        main(["--exp", "d2c-vae", "--configs", str(p3)])
    results = json.load(open(f"{save}/eval.json"))
    assert results["gates_passed"] is False
