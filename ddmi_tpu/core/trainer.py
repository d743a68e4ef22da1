"""Generic training engine.

One trainer drives every (stage x domain) cell through a small pipeline
protocol — collapsing the reference's 8 near-copy-paste Trainer classes
(SURVEY.md §2.1 note) into a single loop.  Responsibilities: jit the step with
mesh shardings, feed host batches (sharded over 'data'), run epochs, log
metrics, checkpoint, fire eval/sample hooks, guard against NaNs, and (opt-in)
capture a jax.profiler trace.  No wait_for_everyone barriers: SPMD keeps
devices in lockstep inside the compiled step; host sync only happens at
checkpoint boundaries (handled by Orbax)."""

from __future__ import annotations

import os
import warnings
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ddmi_tpu.core.checkpoint import CheckpointManager
from ddmi_tpu.core.config import Config
from ddmi_tpu.core.metrics import MetricsLogger
from ddmi_tpu.parallel.mesh import MeshSpec, make_mesh


class NaNLossError(RuntimeError):
    """Raised when the training loss goes non-finite (failure detection,
    SURVEY.md §5 aux subsystems)."""


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
        self._warned_trim = False
        # NaN guard cadence: checking every step would force a host sync per
        # step; every `nan_check_every` steps keeps the device queue deep.
        self.nan_check_every = int(cfg.data.extra.get("nan_check_every", 50))
        self.profile_steps = int(cfg.data.extra.get("profile_steps", 0))

    # -------------------------------------------------------------- batching

    def _put_batch(self, batch):
        """Device-put a host batch (array OR pytree/dict of arrays) sharded
        over the 'data' axis.  Batches whose leading dim is not divisible by
        the data-axis size are padded by wrap-around repetition up to the next
        multiple so SPMD shapes stay static (duplicated samples slightly
        re-weight that step's mean loss; exact-multiple batches — every
        production config — are untouched)."""
        d = self.mesh.shape["data"]
        if jax.process_count() > 1:
            # Each process holds 1/process_count of the global batch; pad the
            # LOCAL slice to the local device count on the data axis.
            d = max(1, d // jax.process_count())

        def fix(x):
            x = jnp.asarray(x) if not isinstance(x, jnp.ndarray) else x
            b = x.shape[0]
            if b % d == 0:
                return x
            if not self._warned_trim:
                warnings.warn(
                    f"batch {b} not divisible by data axis {d}; padding by "
                    f"wrap-around to {b + (-b) % d}", stacklevel=3,
                )
                self._warned_trim = True
            reps = -(-(b + (-b) % d) // b)
            return jnp.concatenate([x] * reps, axis=0)[: b + (-b) % d]

        batch = jax.tree_util.tree_map(fix, batch)
        if jax.process_count() > 1:
            # Multi-host: each process's loader yields only its local shard
            # (ImageFolderDataset is process-sharded); assemble the global
            # array from per-process data — device_put cannot address other
            # hosts' devices.
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    self.data_sh, np.asarray(x)
                ),
                batch,
            )
        return jax.device_put(batch, self.data_sh)

    def _batches(self):
        """Iterate the dataset through a background prefetch thread (depth
        `data.extra.prefetch`, default 2; 0 disables): host-side batch
        construction (decode/augment) overlaps device compute.  Exceptions
        from the loader are re-raised in the training thread."""
        depth = int(self.cfg.data.extra.get("prefetch", 2))
        if depth <= 0:
            yield from self.data
            return
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=depth)
        sentinel, failure = object(), []

        def worker():
            try:
                for item in self.data:
                    q.put(item)
            except BaseException as e:  # surface loader errors
                failure.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if failure:
            raise failure[0]

    def _steps_per_epoch(self) -> int:
        try:
            return max(1, len(self.data))
        except TypeError:
            # Streaming datasets without __len__: warmup/cosine LR schedules
            # need an epoch length — configurable via data.extra, loudly
            # defaulted otherwise (a fictional 1000 would silently skew LR).
            spe = self.cfg.data.extra.get("steps_per_epoch")
            if spe is None:
                warnings.warn(
                    "dataset has no __len__ and data.extra.steps_per_epoch is "
                    "unset; assuming 1000 steps/epoch for LR scheduling"
                )
                return 1000
            return max(1, int(spe))

    def _state_shardings(self, state):
        """Per-leaf NamedShardings for the train state from cfg.mesh: full
        replication when fsdp=model=1 (DP — reference parity), ZeRO-3/TP
        sharding of params + EMA + optimizer moments otherwise
        (parallel/mesh.py::shard_state; docs/SCALING.md)."""
        if self.mesh.shape["fsdp"] * self.mesh.shape["model"] == 1:
            return jax.tree_util.tree_map(lambda _: self.repl, state)
        from ddmi_tpu.parallel.mesh import shard_state

        return shard_state(self.mesh, state)

    def _log_step(self, step: int, metrics, prefix: str) -> None:
        """Deferred logging + throttled NaN guard.  Metrics stay on-device
        until the periodic flush (ONE device_get per chunk) so the step loop
        never blocks on the device — `int(state.step)`/`float(loss)` per step
        would serialize dispatch and stall the device between steps."""
        self.logger.defer(step, metrics, prefix=prefix)
        if self.nan_check_every > 0 and step % self.nan_check_every == 0:
            rec = self.logger.flush()
            loss = (rec or {}).get(prefix + "loss")
            if loss is not None and not np.isfinite(loss):
                raise NaNLossError(f"non-finite loss at step {step}: {loss}")

    def _maybe_profile(self, step: int):
        """Capture a jax.profiler trace of steps [2, 2+profile_steps) when
        data.extra.profile_steps > 0 (SURVEY.md §5 profiling hooks)."""
        if self.profile_steps <= 0:
            return
        if step == 2:
            jax.profiler.start_trace(os.path.join(self.save_dir, "profile"))
        elif step == 2 + self.profile_steps:
            jax.profiler.stop_trace()
            self.profile_steps = 0

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

        state_sh = self._state_shardings(state)
        state = jax.device_put(state, state_sh)

        # LPIPS params flow in as a jit ARGUMENT (closed over they would be
        # embedded as ~59 MB of program constants — evals/lpips.py).
        pp = getattr(self.pipe, "perceptual_params", None)

        def _step(s, x, r, pp):
            kw = {} if pp is None else {"perceptual_params": pp}
            new_s, m = self.pipe.stage1_train_step(tx, s, x, r, **kw)
            # Pin the output state to the input layout so sharding stays
            # stable across steps (donation + GSPMD could otherwise drift).
            return jax.lax.with_sharding_constraint(new_s, state_sh), m

        jit_fn = jax.jit(_step, donate_argnums=(0,))
        step_fn = lambda s, x, r: jit_fn(s, x, r, pp)
        epochs = epochs or self.pipe.lc.epochs
        rng = jax.random.PRNGKey(cfg.seed + 1)
        save_every = self.pipe.lc.save_and_sample_every
        if eval_hook is None:
            eval_hook = default_stage1_eval_hook

        step = int(state.step)
        for epoch in range(epochs):
            for batch in self._batches():
                rng, step_rng = jax.random.split(rng)
                state, metrics = step_fn(
                    state, self._put_batch(batch), jax.device_put(step_rng, self.repl)
                )
                step += 1
                self._log_step(step, metrics, "s1/")
                self._maybe_profile(step)
            self.logger.flush()
            # Reconcile the host-side counter with the authoritative on-device
            # step at this (already-synchronizing) flush point — a pipeline
            # that ever skips apply_gradients cannot desync checkpoint names.
            step = int(state.step)
            if epoch % save_every == 0 or epoch == epochs - 1:
                # Orbax consumes (possibly sharded) jax.Arrays directly: the
                # foreground D2H copy happens inside save(), and multi-host
                # writes are coordinated — no host gather needed.
                ckpt.save(int(state.step), state)
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

        state_sh = self._state_shardings(state)
        state = jax.device_put(state, state_sh)
        # Frozen stage-1 params ride the same ZeRO rule when fsdp>1 — they
        # are read-only but still params-sized HBM.
        stage1_params = jax.device_put(
            stage1_params, self._state_shardings(stage1_params)
        )

        def _step(s, p1, x, r):
            new_s, m = self.pipe.stage2_train_step(tx, s, p1, x, r)
            return jax.lax.with_sharding_constraint(new_s, state_sh), m

        step_fn = jax.jit(_step, donate_argnums=(0,))
        epochs = epochs or self.pipe.lc.epochs
        rng = jax.random.PRNGKey(cfg.seed + 2)
        save_every = self.pipe.lc.save_and_sample_every
        if eval_hook is None:
            eval_hook = default_stage2_eval_hook
        self._stage1_params_for_eval = stage1_params

        step = int(state.step)
        for epoch in range(epochs):
            for batch in self._batches():
                rng, step_rng = jax.random.split(rng)
                state, metrics = step_fn(
                    state,
                    stage1_params,
                    self._put_batch(batch),
                    jax.device_put(step_rng, self.repl),
                )
                step += 1
                self._log_step(step, metrics, "s2/")
                self._maybe_profile(step)
            self.logger.flush()
            step = int(state.step)  # reconcile with on-device counter
            if epoch % save_every == 0 or epoch == epochs - 1:
                ckpt.save(int(state.step), state)
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

    def load_stage1_params(self):
        """Frozen stage-1 params only — the full state's optimizer/SN
        buffers (GBs at production scale) must not stay pinned in HBM while
        stage 2 trains or samples."""
        return self.load_stage1().params

    def load_stage2(self):
        spe = self._steps_per_epoch()
        state = self.pipe.init_stage2(jax.random.PRNGKey(0), spe)
        ckpt = CheckpointManager(self.save_dir, prefix="stage2")
        return ckpt.restore(state)

    def _sample_jit(self, fn, n: int):
        """jit a batch-parallel sampling program; when the mesh has a data
        axis > 1 (and the batch divides it) the OUTPUT batch axis is sharded
        over 'data' — GSPMD propagates that sharding back through the whole
        DDIM+decode+render program, so generation and protocol-scale eval
        (FID-10k) run data-parallel across the mesh with zero collectives
        (TPU-native replacement for the reference's single-GPU eval loops,
        evals/eval.py:187-248)."""
        d = self.mesh.shape["data"]
        if d > 1 and n % d == 0:
            jitted = jax.jit(fn, out_shardings=self.data_sh)

            def wrapped(*args):
                # Checkpoint-restored params live on one device; replicate
                # them over the mesh so the sharded-output jit can address
                # every device.
                args = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, self.repl)
                    if isinstance(x, jax.Array)
                    and not isinstance(x, jax.core.Tracer)
                    else x,
                    args,
                )
                return jitted(*args)

            return wrapped
        return jax.jit(fn)

    def generate(self, n: Optional[int] = None, resolution: Optional[int] = None):
        """mode: gen — EMA DDIM sample -> decode -> render/extract -> save.

        Per-domain dispatch matching the reference generate paths:
        image  tools/ldm/image.py:226-249   -> PNGs
        video  tools/ldm/video.py eval path -> per-frame PNGs (or .npy)
        occ    tools/ldm/occupancy.py:204-219 -> .off meshes
        nerf   tools/ldm/nerf.py:243-299    -> spherical-path view PNGs

        Sampling runs data-parallel over the mesh when cfg.mesh.data > 1
        (see _sample_jit)."""
        s1 = self.load_stage1()
        s2 = self.load_stage2()
        n = n or self.cfg.data.test_batch_size
        rng = jax.random.PRNGKey(self.cfg.seed)
        out_dir = os.path.join(self.save_dir, "generation")
        domain = self.cfg.data.domain

        if domain == "image":
            res = resolution or self.cfg.data.test_resolution
            imgs = self._sample_jit(
                lambda lp, sp, r: self.pipe.sample_images(lp, sp, r, n, res), n
            )(s2.ema_params, s1.params, rng)
            out = jax.device_get(imgs)
            self._save_images(out, out_dir)
            return out

        if domain == "video":
            vids = self._sample_jit(
                lambda lp, sp, r: self.pipe.sample_videos(lp, sp, r, n), n
            )(s2.ema_params, s1.params, rng)
            out = jax.device_get(vids)
            for i, vid in enumerate(out):
                self._save_images(vid, os.path.join(out_dir, f"video_{i}"))
            return out

        if domain == "occupancy":
            from ddmi_tpu.geometry.generation import (
                generate_meshes_batched,
                refine_mesh,
            )

            z = jax.jit(lambda lp, r: self.pipe.sample_latents(lp, r, n))(
                s2.ema_params, rng
            )
            os.makedirs(out_dir, exist_ok=True)
            gk = dict(getattr(self.pipe, "generation_kwargs", {}))
            refine_steps = int(gk.pop("refinement_step", 0) or 0)
            pyr = jax.jit(self.pipe.decode_pyramids)(s1.params, z)
            meshes = generate_meshes_batched(
                jax.jit(lambda pts: self.pipe.logits_from_pyramids(
                    s1.params, pts, pyr
                )),
                n, **gk,
            )
            # stable across the mesh loop: refine_mesh memoizes its compiled
            # scan on this callable; per-mesh pyramids ride in via ctx
            refine_fn = lambda pts, params, pyr_i: (
                self.pipe.logits_from_pyramids(params, pts, pyr_i)
            )
            for i, (verts, tris) in enumerate(meshes):
                if refine_steps > 0 and len(tris):
                    pyr_i = jax.tree_util.tree_map(
                        lambda a: a[i : i + 1], pyr
                    )
                    verts = refine_mesh(
                        verts, tris, refine_fn, ctx=(s1.params, pyr_i),
                        threshold=gk.get("threshold", 0.2),
                        steps=refine_steps,
                    )
                    meshes[i] = (verts, tris)
                _save_off(os.path.join(out_dir, f"mesh_{i}.off"), verts, tris)
            return meshes

        if domain == "nerf":
            res = resolution or 128
            views = self.pipe.sample_nerfs(
                s2.ema_params, s1.params, rng, n, H=res, W=res
            )
            out = jax.device_get(views)
            for i, vs in enumerate(out):
                self._save_images(vs, os.path.join(out_dir, f"nerf_{i}"))
            return out

        raise NotImplementedError(domain)

    # ------------------------------------------------------------------ eval

    def _image_scorer(self):
        """InceptionV3 FIDScorer; converted torch weights from
        data.extra.inception_pth when present, else random-init (values then
        NOT comparable to published FID — loudly warned)."""
        import jax.numpy as jnp

        from ddmi_tpu.evals.fid import FIDScorer
        from ddmi_tpu.evals.inception import InceptionV3

        model = InceptionV3()
        pth = self.cfg.data.extra.get("inception_pth")
        if pth and os.path.exists(pth):
            params = dict(np.load(pth, allow_pickle=True))["params"].item()
        else:
            warnings.warn(
                "no converted InceptionV3 weights (data.extra.inception_pth); "
                "rFID/FID computed with a random-init network"
            )
            params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
            )["params"]
        return FIDScorer(params)

    def evaluate(self, exp: str):
        """mode: eval — the reference's per-domain eval protocols
        (evals/eval.py test_rfid/test_fid_n/test_rfvd/psnr;
        tools/ldm/occupancy.py:204-219 mesh eval).  Sample counts are scaled
        by data.extra.eval_samples (default small; the reference uses 10k
        generated images / 5000 meshes)."""
        import jax.numpy as jnp

        domain = self.cfg.data.domain
        data = self.test_data if self.test_data is not None else self.data
        n_eval = int(self.cfg.data.extra.get("eval_samples", 64))
        # Reference protocol scales (evals/eval.py:187-248 FID-10k;
        # tools/ldm/occupancy.py:204-219 5000 meshes / 1355x1355 MMD pairs).
        # Smaller runs are legitimate for smoke/dev but must be LOUD.
        protocol = {"image": 10000, "video": 2048, "occupancy": 5000,
                    "nerf": 64}.get(domain, n_eval)
        if n_eval < protocol:
            print(
                f"eval: data.extra.eval_samples={n_eval} — REFERENCE "
                f"PROTOCOL IS {protocol} for domain '{domain}'; results are "
                f"not comparable to published numbers until raised"
            )
        results = {}
        s1 = self.load_stage1()

        if exp == "d2c-vae":
            if domain == "image":
                from ddmi_tpu.evals.fid import test_rfid

                recon = jax.jit(
                    lambda p, x: self.pipe.reconstruct(p, jnp.asarray(x))
                )
                results["rfid"] = test_rfid(
                    self._image_scorer(),
                    lambda x: recon(s1.params, x),
                    data,
                    max_batches=max(1, n_eval // self.cfg.data.batch_size),
                )
            elif domain == "video":
                from ddmi_tpu.evals.fvd import psnr

                recon = jax.jit(
                    lambda p, x: self.pipe.reconstruct(p, jnp.asarray(x))
                )
                results["psnr"] = psnr(
                    lambda x: recon(s1.params, x), data,
                    max_batches=max(1, n_eval // self.cfg.data.batch_size),
                )
            elif domain == "occupancy":
                ious, voxel_ious = [], []
                fn = jax.jit(self.pipe.occupancy_logits)
                for i, b in enumerate(data):
                    if i * self.cfg.data.batch_size >= n_eval:
                        break
                    logits = np.asarray(jax.device_get(fn(
                        s1.params, jnp.asarray(b["inputs"]),
                        jnp.asarray(b["points"]), jax.random.PRNGKey(i),
                    )))
                    occ = np.asarray(b["occ"]) > 0.5
                    pred = logits > 0
                    inter = np.logical_and(pred, occ).sum()
                    union = np.logical_or(pred, occ).sum()
                    ious.append(inter / max(union, 1))
                    if "voxels" in b:
                        # iou_voxels protocol: model queried at GT voxel cell
                        # centers (conv_onet/training.py:95-111); GT grids
                        # come from binvox via voxels_file
                        from ddmi_tpu.evals.metrics_3d import voxel_iou

                        inputs = jnp.asarray(b["inputs"])
                        for j in range(inputs.shape[0]):
                            voxel_ious.append(voxel_iou(
                                lambda pts, _j=j: fn(
                                    s1.params, inputs[_j : _j + 1],
                                    jnp.asarray(pts)[None],
                                    jax.random.PRNGKey(0),
                                )[0],
                                np.asarray(b["voxels"][j]),
                            ))
                results["iou"] = float(np.mean(ious))
                if voxel_ious:
                    results["iou_voxels"] = float(np.mean(voxel_ious))
            elif domain == "nerf":
                vals = []
                for i, b in enumerate(data):
                    if i >= 4:
                        break
                    z, _ = self.pipe.encode_planes(
                        s1.params, jnp.asarray(b["points"])[:1],
                        jax.random.PRNGKey(i),
                    )
                    planes = self.pipe.decode_planes(
                        {"vae": s1.params["vae"]}, z
                    )
                    img = np.asarray(b["image"])[0]
                    H, W = img.shape[:2]
                    rgb = jax.device_get(self.pipe.render_image(
                        s1.params, planes, jnp.asarray(b["pose"])[0], H, W,
                        jax.random.PRNGKey(i + 9),
                    ))
                    mse = float(np.mean((rgb - img) ** 2))
                    vals.append(-10 * np.log10(max(mse, 1e-12)))
                results["psnr"] = float(np.mean(vals))
        else:  # ldm
            s2 = self.load_stage2()
            if domain == "image":
                from ddmi_tpu.evals.fid import test_fid_n

                bs = self.cfg.data.test_batch_size
                res = min(self.cfg.data.test_resolution, 256)
                sample = self._sample_jit(
                    lambda lp, sp, r: self.pipe.sample_images(
                        lp, sp, r, bs, res
                    ),
                    bs,
                )
                reals = []
                for i, b in enumerate(data):
                    if i * self.cfg.data.batch_size >= n_eval:
                        break
                    reals.append(np.asarray(b))
                results["fid"] = test_fid_n(
                    self._image_scorer(),
                    lambda r: sample(s2.ema_params, s1.params, r),
                    reals, n_samples=n_eval, batch=bs,
                    protocol_n=protocol,
                )
            elif domain == "video":
                from ddmi_tpu.evals.fvd import FVDScorer, test_fvd_sample
                from ddmi_tpu.evals.i3d import I3D

                pth = self.cfg.data.extra.get("i3d_pth")
                model = I3D()
                if pth and os.path.exists(pth):
                    params = dict(np.load(pth, allow_pickle=True))[
                        "params"
                    ].item()
                else:
                    warnings.warn("no I3D weights; FVD uses random init")
                    params = model.init(
                        jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 224, 224, 3)),
                    )["params"]
                n_clip = max(1, self.mesh.shape["data"])
                sample = self._sample_jit(
                    lambda lp, sp, r: self.pipe.sample_videos(
                        lp, sp, r, n_clip
                    ),
                    n_clip,
                )
                reals = []
                for i, b in enumerate(data):
                    if i >= max(1, n_eval // 4):
                        break
                    reals.append(np.asarray(b))
                n_fvd = int(self.cfg.data.extra.get("fvd_samples", n_eval))
                print(
                    f"FVD: {n_fvd} generated clips vs {len(reals)} real "
                    f"batches (reference runs the full test loader, "
                    f"evals/eval.py:254-345)"
                )
                results["fvd"] = test_fvd_sample(
                    FVDScorer(params),
                    lambda r: sample(s2.ema_params, s1.params, r),
                    reals, n_samples=n_fvd,
                )
            elif domain == "occupancy":
                from ddmi_tpu.evals.metrics_3d import mmd_cov_1nna
                from ddmi_tpu.geometry.generation import (
                    generate_meshes_batched,
                    refine_mesh,
                    sample_surface_points,
                )

                k = n_eval  # no hidden cap: protocol is 5000 generated
                print(
                    f"occupancy eval: generating {k} meshes "
                    f"(reference protocol: 5000 generated, 1355x1355 MMD "
                    f"pairs — tools/ldm/occupancy.py:204-219)"
                )
                z = jax.jit(
                    lambda lp, r: self.pipe.sample_latents(lp, r, k)
                )(s2.ema_params, jax.random.PRNGKey(0))
                # Protocol-scale extraction: groups of `mesh_batch` meshes in
                # MISE lockstep, one batched device eval per round (the
                # reference extracts one mesh at a time).
                gk = dict(getattr(self.pipe, "generation_kwargs", {}))
                refine_steps = int(gk.pop("refinement_step", 0) or 0)
                group = max(1, min(
                    k, int(self.cfg.data.extra.get("mesh_batch", 8))
                ))
                eval_group = jax.jit(
                    lambda pyr, pts: self.pipe.logits_from_pyramids(
                        s1.params, pts, pyr
                    )
                )
                decode = jax.jit(self.pipe.decode_pyramids)
                # stable across all meshes: refine_mesh memoizes its
                # compiled scan on this callable (per-mesh pyramids via ctx)
                refine_fn = lambda pts, params, pyr_j: (
                    self.pipe.logits_from_pyramids(params, pts, pyr_j)
                )
                gen_pts = []
                for g0 in range(0, k, group):
                    zg = z[g0 : g0 + group]
                    real = int(zg.shape[0])
                    if real < group:  # last group: pad to the compiled shape
                        zg = jnp.concatenate(
                            [zg] + [zg[-1:]] * (group - real), axis=0
                        )
                    pyr = decode(s1.params, zg)
                    meshes = generate_meshes_batched(
                        lambda pts: eval_group(pyr, pts), group, **gk
                    )[:real]
                    for j, (verts, tris) in enumerate(meshes):
                        if not len(tris):
                            continue
                        if refine_steps > 0:
                            pyr_j = jax.tree_util.tree_map(
                                lambda a: a[j : j + 1], pyr
                            )
                            verts = refine_mesh(
                                verts, tris, refine_fn,
                                ctx=(s1.params, pyr_j),
                                threshold=gk.get("threshold", 0.2),
                                steps=refine_steps,
                            )
                        gen_pts.append(
                            sample_surface_points(verts, tris, 2048)
                        )
                    print(f"occupancy eval: mesh {min(g0 + group, k)}/{k}")
                ref_pts = []
                for i, b in enumerate(data):
                    if len(ref_pts) >= k:
                        break
                    for j in range(np.asarray(b["inputs"]).shape[0]):
                        ref_pts.append(np.asarray(b["inputs"])[j, :2048])
                if gen_pts and ref_pts:
                    m = mmd_cov_1nna(np.stack(ref_pts[:k]), np.stack(gen_pts))
                    results.update({k_: float(v) for k_, v in m.items()})
                else:
                    print(
                        f"occupancy eval: MMD/COV skipped — "
                        f"{len(gen_pts)} non-empty generated meshes, "
                        f"{len(ref_pts)} reference clouds"
                    )
            elif domain == "nerf":
                self.generate(n=1)
                results["generated"] = 1.0

        self.logger.log(0, results, prefix="eval/")

        # Quality-parity gates (data.extra.quality_gates): user-provided
        # published numbers (arXiv:2401.12517) -> pass/fail verdict in ONE
        # eval run.  evals/gates.py documents the config shape.  Attached
        # after metric logging (gate detail is nested, metrics are flat).
        gates = self.cfg.data.extra.get("quality_gates") or {}
        if gates:
            from ddmi_tpu.evals.gates import check_gates

            passed, detail = check_gates(results, gates)
            results["gates"] = detail
            results["gates_passed"] = passed
            verdict = "PASS" if passed else "FAIL"
            print(f"quality gates: {verdict}")
            for name, d in detail.items():
                if d["value"] is None:
                    print(f"  {name}: FAIL — {d['reason']}")
                    continue
                print(
                    f"  {name}: {d['value']:.6g} vs published "
                    f"{d['published']:.6g} (±{d['tol_pct']}%, "
                    f"{d['direction']}) -> "
                    f"{'pass' if d['passed'] else 'FAIL'}"
                )
        out = os.path.join(self.save_dir, "eval.json")
        import json

        with open(out, "w") as f:
            json.dump(results, f)
        print("eval results:", results)
        if gates and not results["gates_passed"]:
            raise SystemExit(
                "quality gates FAILED — see eval.json for detail"
            )
        return results

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


def _save_off(path: str, verts: np.ndarray, tris: np.ndarray) -> None:
    with open(path, "w") as f:
        f.write("OFF\n")
        f.write(f"{len(verts)} {len(tris)} 0\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in tris:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


def _first_test_batch(trainer: Trainer):
    data = trainer.test_data if trainer.test_data is not None else trainer.data
    for batch in data:
        return batch
    return None


def default_stage1_eval_hook(trainer: Trainer, state, epoch: int) -> None:
    """In-training stage-1 eval at every save_and_sample_every epoch
    (reference: tools/d2c_vae/image.py:256-265): reconstruct a test batch,
    log PSNR, dump reconstructions.  rFID/rFVD additionally when an
    InceptionV3/I3D weight file is configured (data.extra.inception_pth /
    i3d_pth) — the ports need converted torch weights to be meaningful."""
    batch = _first_test_batch(trainer)
    if batch is None:
        return
    domain = trainer.cfg.data.domain
    params = jax.device_get(state).params
    out_dir = os.path.join(trainer.save_dir, "recon")

    try:
        if domain == "image":
            x = jnp.asarray(batch)[:4]
            recon = jax.device_get(
                jax.jit(trainer.pipe.reconstruct)(params, x)
            )
            target = np.asarray(jax.device_get(x))  # datasets yield [0,1]
            if recon.shape == target.shape:
                mse = float(np.mean((recon - target) ** 2))
            else:
                mse = float("nan")
            trainer.logger.log(
                int(state.step),
                {"psnr": -10.0 * np.log10(max(mse, 1e-12))},
                prefix="eval/",
            )
            trainer._save_images(recon, os.path.join(out_dir, f"ep{epoch}"))
        elif domain == "video":
            x = jnp.asarray(batch)[:2]
            recon = jax.device_get(jax.jit(trainer.pipe.reconstruct)(params, x))
            target = np.asarray(jax.device_get(x))
            mse = float(np.mean((recon - target) ** 2))
            trainer.logger.log(
                int(state.step),
                {"psnr": -10.0 * np.log10(max(mse, 1e-12))},
                prefix="eval/",
            )
        elif domain == "occupancy":
            b = {k: jnp.asarray(v)[:1] for k, v in batch.items()}
            logits = jax.device_get(
                jax.jit(trainer.pipe.occupancy_logits)(
                    params, b["inputs"], b["points"], jax.random.PRNGKey(0)
                )
            )
            pred = logits > 0
            occ = np.asarray(jax.device_get(b["occ"])) > 0.5
            inter = np.logical_and(pred, occ).sum()
            union = np.logical_or(pred, occ).sum()
            trainer.logger.log(
                int(state.step),
                {"iou": float(inter) / max(float(union), 1.0)},
                prefix="eval/",
            )
        elif domain == "nerf":
            pass  # per-scene rendering is driven explicitly (pipelines.render_image)
    except Exception as e:  # pragma: no cover - eval must never kill training
        import traceback

        warnings.warn(
            f"stage1 eval hook failed: {e}\n{traceback.format_exc()}"
        )
        trainer.logger.log(epoch, {"eval_hook_failures": 1.0}, prefix="s1/")


def default_stage2_eval_hook(trainer: Trainer, state, epoch: int) -> None:
    """Stage-2 in-training sampling (reference: tools/ldm/image.py:204-219):
    EMA DDIM sample a small batch and dump it; mesh-extract for occupancy."""
    domain = trainer.cfg.data.domain
    s1_params = getattr(trainer, "_stage1_params_for_eval", None)
    if s1_params is None:
        return
    rng = jax.random.PRNGKey(trainer.cfg.seed + 100 + epoch)
    out_dir = os.path.join(trainer.save_dir, "samples")

    try:
        if domain == "image":
            res = min(trainer.cfg.data.test_resolution, 256)
            imgs = jax.device_get(
                trainer.pipe.sample_images(
                    state.ema_params, s1_params, rng, batch=2, resolution=res
                )
            )
            trainer._save_images(imgs, os.path.join(out_dir, f"ep{epoch}"))
        elif domain == "video":
            vids = jax.device_get(
                trainer.pipe.sample_videos(state.ema_params, s1_params, rng, 1)
            )
            trainer._save_images(
                vids[0], os.path.join(out_dir, f"ep{epoch}_video")
            )
        elif domain == "occupancy":
            from ddmi_tpu.geometry.generation import MeshGenerator

            z = trainer.pipe.sample_latents(state.ema_params, rng, 1)
            eval_fn = jax.jit(trainer.pipe.decode_logits_fn(s1_params, z))
            verts, tris = MeshGenerator(eval_fn, upsampling_steps=0,
                                        resolution0=32).generate()
            os.makedirs(out_dir, exist_ok=True)
            _save_off(os.path.join(out_dir, f"ep{epoch}.off"), verts, tris)
        elif domain == "nerf":
            pass
    except Exception as e:  # pragma: no cover
        import traceback

        warnings.warn(
            f"stage2 eval hook failed: {e}\n{traceback.format_exc()}"
        )
        trainer.logger.log(epoch, {"eval_hook_failures": 1.0}, prefix="s2/")
