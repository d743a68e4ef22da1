"""End-to-end smoke: 2-epoch stage-1 + stage-2 training through the generic
Trainer on synthetic data, checkpoint -> resume -> generate (SURVEY.md §4
item 5)."""

import os

import numpy as np
import pytest

# full two-stage train->checkpoint->resume->generate: the heaviest fixture
# in the suite; the same flow is driven faster through the CLI smokes
pytestmark = pytest.mark.slow

import jax

import sys

sys.path.insert(0, os.path.dirname(__file__))
from test_image_pipeline import tiny_config  # noqa: E402

from ddmi_tpu.core.config import DataConfig, replace
from ddmi_tpu.core.trainer import Trainer
from ddmi_tpu.data.synthetic import SyntheticImages
from ddmi_tpu.domains.image import ImagePipeline


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    save = str(tmp_path_factory.mktemp("e2e"))
    cfg = tiny_config()
    cfg = replace(cfg, data=replace(cfg.data, save_pth=save, test_resolution=16))
    pipe = ImagePipeline(cfg)
    data = SyntheticImages(batch_size=2, resolution=32, length=2)
    trainer = Trainer(cfg, pipe, data, save_dir=save)
    s1 = trainer.train_stage1(epochs=2)
    s2 = trainer.train_stage2(jax.device_get(s1).params, epochs=2)
    return trainer, save


def test_train_checkpoints_exist(trained):
    trainer, save = trained
    assert os.path.isdir(os.path.join(save, "stage1"))
    assert os.path.isdir(os.path.join(save, "stage2"))
    # metrics stream written
    assert os.path.getsize(os.path.join(save, "train.jsonl")) > 0


def test_restore_and_generate(trained):
    trainer, save = trained
    s1 = trainer.load_stage1()
    s2 = trainer.load_stage2()
    assert int(s1.step) > 0 and int(s2.step) > 0
    imgs = trainer.generate(n=2, resolution=16)
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(imgs).all()


def test_resume_continues_step(trained):
    trainer, save = trained
    cfg = trainer.cfg
    pipe = trainer.pipe
    data = SyntheticImages(batch_size=2, resolution=32, length=1)
    t2 = Trainer(cfg, pipe, data, save_dir=save)
    before = int(t2.load_stage1().step)
    state = t2.train_stage1(epochs=1, resume=True)
    assert int(jax.device_get(state).step) == before + 1
