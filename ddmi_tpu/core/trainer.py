"""Generic training engine.

One trainer drives every (stage x domain) cell through a small pipeline
protocol — collapsing the reference's 8 near-copy-paste Trainer classes
(SURVEY.md §2.1 note) into a single loop.  Responsibilities: jit the step with
mesh shardings, feed host batches (sharded over 'data'), run epochs, log
metrics, checkpoint, and fire eval/sample hooks.  No wait_for_everyone
barriers: SPMD keeps devices in lockstep inside the compiled step; host sync
only happens at checkpoint boundaries (handled by Orbax)."""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ddmi_tpu.core.checkpoint import CheckpointManager
from ddmi_tpu.core.config import Config
from ddmi_tpu.core.metrics import MetricsLogger
from ddmi_tpu.parallel.mesh import MeshSpec, make_mesh


class Trainer:
    def __init__(
        self,
        cfg: Config,
        pipeline,
        dataset,
        test_dataset=None,
        mesh=None,
        save_dir: Optional[str] = None,
    ):
        self.cfg = cfg
        self.pipe = pipeline
        self.data = dataset
        self.test_data = test_dataset
        self.mesh = mesh or make_mesh(
            MeshSpec(cfg.mesh.data, cfg.mesh.fsdp, cfg.mesh.model)
        )
        self.save_dir = save_dir or cfg.data.save_pth
        os.makedirs(self.save_dir, exist_ok=True)
        self.logger = MetricsLogger(self.save_dir)
        self.repl = NamedSharding(self.mesh, P())
        self.data_sh = NamedSharding(self.mesh, P("data"))

    def _put_batch(self, x):
        return jax.device_put(jnp.asarray(x), self.data_sh)

    def _steps_per_epoch(self) -> int:
        try:
            return max(1, len(self.data))
        except TypeError:
            return 1000

    # ---------------------------------------------------------------- stage 1

    def train_stage1(
        self,
        epochs: Optional[int] = None,
        eval_hook: Optional[Callable] = None,
        resume: bool = False,
    ):
        cfg = self.cfg
        spe = self._steps_per_epoch()
        state = self.pipe.init_stage1(jax.random.PRNGKey(cfg.seed), spe)
        tx = self.pipe.stage1_optimizer(spe)
        ckpt = CheckpointManager(self.save_dir, prefix="stage1")
        if resume and ckpt.latest_step() is not None:
            state = ckpt.restore(state)
            print(f"resumed stage1 from step {int(state.step)}")

        state = jax.device_put(state, self.repl)
        step_fn = jax.jit(
            lambda s, x, r: self.pipe.stage1_train_step(tx, s, x, r),
            in_shardings=(self.repl, self.data_sh, self.repl),
            out_shardings=(self.repl, self.repl),
            donate_argnums=(0,),
        )
        epochs = epochs or self.pipe.lc.epochs
        rng = jax.random.PRNGKey(cfg.seed + 1)
        save_every = self.pipe.lc.save_and_sample_every

        for epoch in range(epochs):
            for batch in self.data:
                rng, step_rng = jax.random.split(rng)
                state, metrics = step_fn(
                    state, self._put_batch(batch), jax.device_put(step_rng, self.repl)
                )
                self.logger.log(int(state.step), metrics, prefix="s1/")
            if epoch % save_every == 0 or epoch == epochs - 1:
                ckpt.save(int(state.step), jax.device_get(state))
                if eval_hook is not None:
                    eval_hook(self, state, epoch)
        ckpt.wait()
        return state

    # ---------------------------------------------------------------- stage 2

    def train_stage2(
        self,
        stage1_params: Any,
        epochs: Optional[int] = None,
        eval_hook: Optional[Callable] = None,
        resume: bool = False,
    ):
        cfg = self.cfg
        spe = self._steps_per_epoch()
        state = self.pipe.init_stage2(jax.random.PRNGKey(cfg.seed), spe)
        tx = self.pipe.stage2_optimizer()
        ckpt = CheckpointManager(self.save_dir, prefix="stage2")
        if resume and ckpt.latest_step() is not None:
            state = ckpt.restore(state)
            print(f"resumed stage2 from step {int(state.step)}")

        state = jax.device_put(state, self.repl)
        stage1_params = jax.device_put(stage1_params, self.repl)
        step_fn = jax.jit(
            lambda s, p1, x, r: self.pipe.stage2_train_step(tx, s, p1, x, r),
            in_shardings=(self.repl, self.repl, self.data_sh, self.repl),
            out_shardings=(self.repl, self.repl),
            donate_argnums=(0,),
        )
        epochs = epochs or self.pipe.lc.epochs
        rng = jax.random.PRNGKey(cfg.seed + 2)
        save_every = self.pipe.lc.save_and_sample_every

        for epoch in range(epochs):
            for batch in self.data:
                rng, step_rng = jax.random.split(rng)
                state, metrics = step_fn(
                    state,
                    stage1_params,
                    self._put_batch(batch),
                    jax.device_put(step_rng, self.repl),
                )
                self.logger.log(int(state.step), metrics, prefix="s2/")
            if epoch % save_every == 0 or epoch == epochs - 1:
                ckpt.save(int(state.step), jax.device_get(state))
                if eval_hook is not None:
                    eval_hook(self, state, epoch)
        ckpt.wait()
        return state

    # --------------------------------------------------------------- sampling

    def load_stage1(self):
        spe = self._steps_per_epoch()
        state = self.pipe.init_stage1(jax.random.PRNGKey(0), spe)
        ckpt = CheckpointManager(self.save_dir, prefix="stage1")
        return ckpt.restore(state)

    def load_stage2(self):
        spe = self._steps_per_epoch()
        state = self.pipe.init_stage2(jax.random.PRNGKey(0), spe)
        ckpt = CheckpointManager(self.save_dir, prefix="stage2")
        return ckpt.restore(state)

    def generate(self, n: Optional[int] = None, resolution: Optional[int] = None):
        """mode: gen — EMA DDIM sample -> decode -> render -> save
        (tools/ldm/image.py:226-249)."""
        s1 = self.load_stage1()
        s2 = self.load_stage2()
        n = n or self.cfg.data.test_batch_size
        res = resolution or self.cfg.data.test_resolution
        imgs = jax.jit(
            lambda lp, sp, r: self.pipe.sample_images(lp, sp, r, n, res)
        )(s2.ema_params, s1.params, jax.random.PRNGKey(self.cfg.seed))
        out = jax.device_get(imgs)
        self._save_images(out, os.path.join(self.save_dir, "generation"))
        return out

    @staticmethod
    def _save_images(imgs, prefix: str):
        import numpy as np

        try:
            from PIL import Image
        except ImportError:
            np.save(prefix + ".npy", imgs)
            return
        os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
        for i, im in enumerate(imgs):
            Image.fromarray((np.clip(im, 0, 1) * 255).astype("uint8")).save(
                f"{prefix}_{i}.png"
            )
