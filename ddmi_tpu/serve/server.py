"""Batching inference service for trained DDMI models.

The reference has no serving layer (SURVEY.md §1: "no serving layer");
this is a beyond-reference production component built on the same jitted
sampling path the bench uses (domains/image.py sample_images: DDIM scan +
HDBF decode + INR render as ONE compiled program).

Design for TPU serving:
  * ONE compiled program, static shapes: the service compiles the sampler
    once for a fixed (service_batch, resolution) and never recompiles.
  * Micro-batching: concurrent requests are coalesced into full device
    batches (linger window, default 20 ms) — the DDIM scan costs the same
    for 1 or `service_batch` samples, so coalescing multiplies throughput.
  * Per-request determinism: each request's initial diffusion noise is
    derived host-side from its `seed` (np.random.default_rng), so the same
    seed reproduces the same sample for a solo request regardless of how
    earlier requests were batched.  (The INR render's NoiseInjection rng is
    keyed by the first seed in the batch — a documented approximation.)
  * bf16 weights on TPU (same memory discipline as bench.py); fp32 on CPU.

Usage:
    service = SamplerService(cfg)          # restores save_pth checkpoints
    imgs = service.generate(n=2, seed=7)   # (2, res, res, 3) uint8
    serve_http(service, port=8500)         # blocking HTTP frontend

HTTP API:
    GET  /healthz            -> {"ok": true, "domain": ..., ...}
    POST /generate {"n": 1, "seed": 0, "format": "npy"|"png"|"gif"|"obj"|"npz"}
         npy -> np.load-able bytes: (n, res, res, 3) uint8 for images,
                (n, t, res, res, 3) for video, (n, views, res, res, 3) NeRF
         png -> single PNG (a row-major grid when n > 1; image domain)
         gif -> animated GIF: videos tiled side-by-side (video domain) or
                the spherical camera path, scenes tiled (nerf domain)
         obj -> Wavefront OBJ text, one `o mesh_i` object per sample
                (occupancy domain)
         npz -> np.load-able archive with verts_i/faces_i arrays per sample
                (occupancy domain)
"""

from __future__ import annotations

import collections
import io
import json
import threading
import time
import warnings
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ddmi_tpu.core.checkpoint import CheckpointManager
from ddmi_tpu.core.config import Config


class _Request:
    __slots__ = ("n", "seed", "event", "result", "error", "cancelled")

    def __init__(self, n: int, seed: int):
        self.n = n
        self.seed = seed
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[Exception] = None
        # set (under the service lock) when the caller times out; the worker
        # drops cancelled entries instead of burning a device batch on them
        self.cancelled = False


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )


class SamplerService:
    """Restores stage-1/stage-2 checkpoints from `cfg.data.save_pth` and
    serves generation with request coalescing.  All four domains:
    image (uint8 frames), video (uint8 clips), nerf (uint8 camera-path
    views), occupancy (host-extracted (verts, faces) meshes)."""

    def __init__(
        self,
        cfg: Config,
        service_batch: int = 8,
        resolution: Optional[int] = None,
        linger_ms: float = 20.0,
        use_ema: bool = True,
        bf16: Optional[bool] = None,
        n_views: int = 8,
        mesh_kwargs: Optional[dict] = None,
        allow_init: bool = False,
    ):
        """allow_init: if no checkpoints exist under cfg.data.save_pth,
        serve freshly-initialized (untrained) params instead of raising —
        for latency benchmarking and smoke deployment only.  The fallback
        warns loudly and /healthz reports initialized=True."""
        self.domain = cfg.data.domain
        if self.domain == "image":
            from ddmi_tpu.domains.image import ImagePipeline

            pipe = ImagePipeline(cfg)
        elif self.domain == "video":
            from ddmi_tpu.domains.video import VideoPipeline

            pipe = VideoPipeline(cfg)
        elif self.domain == "occupancy":
            from ddmi_tpu.domains.occupancy import OccupancyPipeline

            pipe = OccupancyPipeline(cfg)
        elif self.domain == "nerf":
            from ddmi_tpu.domains.nerf import NeRFPipeline

            pipe = NeRFPipeline(cfg)
        else:
            raise ValueError(f"unknown domain {cfg.data.domain!r}")

        self.cfg = cfg
        self.batch = int(service_batch)
        self._linger = max(0.0, linger_ms) / 1000.0
        u = cfg.model.ddpmconfig
        if self.domain == "video":
            # video renders at the VAE's native resolution (sample_videos)
            self.res = int(pipe.res)
            self._noise_shape = (pipe.n_latent_tokens, u.channels)
        elif self.domain in ("occupancy", "nerf"):
            r = pipe.latent_res
            self._noise_shape = (r, r, u.channels)
            if self.domain == "nerf":
                self.res = int(resolution or 128)
            else:
                self.res = 0  # finalized below once mesh kwargs are merged
        else:
            self.res = int(resolution or cfg.data.test_resolution)
            self._noise_shape = (u.image_size, u.image_size, u.channels)

        # Init + restore on HOST memory: the restore template is the FULL
        # train state (params + EMA + Adam moments + SN buffers), which for
        # the big stage-2 configs does not fit a single chip's HBM
        # (docs/SCALING.md: celebahq stage-2 trains with fsdp: 2) — and
        # serving only needs params/EMA.  First bench_serve run OOM'd the
        # chip exactly here (round 5); only the serving params are moved to
        # the accelerator, below, after the bf16 cast halves them.
        _cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(_cpu):
            s1_init = pipe.init_stage1(jax.random.PRNGKey(0), 1)
            s2_init = pipe.init_stage2(jax.random.PRNGKey(0), 1)
        self.initialized = False  # True = serving untrained init params
        try:
            s1 = CheckpointManager(cfg.data.save_pth, prefix="stage1").restore(
                s1_init
            )
            s2 = CheckpointManager(cfg.data.save_pth, prefix="stage2").restore(
                s2_init
            )
        except FileNotFoundError:
            if not allow_init:
                raise
            warnings.warn(
                f"no checkpoints under {cfg.data.save_pth}; serving "
                "freshly-initialized (UNTRAINED) params because "
                "allow_init=True — outputs are noise, for latency "
                "benchmarking / smoke deployment only",
                stacklevel=2,
            )
            s1, s2 = s1_init, s2_init
            self.initialized = True
        del s1_init, s2_init
        ldm_params = s2.ema_params if use_ema else s2.params
        s1_params = s1.params
        self.step = int(s2.step)
        if bf16 is None:
            bf16 = jax.default_backend() not in ("cpu",)
        if bf16:
            ldm_params = {
                "unet": _bf16(ldm_params["unet"]),
                "mixing_logit": ldm_params["mixing_logit"],
            }
            s1_params = _bf16(s1_params)
        del s1, s2
        # move ONLY the serving params to the accelerator (init/restore
        # above live on host memory — see the OOM note)
        _dev = jax.devices()[0]
        ldm_params = jax.device_put(ldm_params, _dev)
        s1_params = jax.device_put(s1_params, _dev)

        batch = self.batch
        res = self.res
        # Params are threaded into every jitted program as ARGUMENTS, never
        # closed over: captured constants are embedded in the lowered
        # payload (~2.1 GB for the celebahq stage-2 weights), which bloats
        # compile memory and, on remote-compile setups, ships the weights
        # with every compile RPC — round 5's serve bench broke the compile
        # tunnel exactly this way (same lesson as evals/lpips.py round 4).
        if self.domain == "video":
            _sample_jit = jax.jit(
                lambda lp, sp, r, noise: pipe.sample_videos(
                    lp, sp, r, batch=batch, noise=noise
                )
            )
            self._sample = lambda r, noise: _sample_jit(
                ldm_params, s1_params, r, noise
            )
        elif self.domain == "occupancy":
            # device: DDIM latents only; mesh extraction stays host-side
            # (MISE octree <-> padded point batches through ONE compiled
            # eval program shared by every request)
            _lat_jit = jax.jit(
                lambda lp, r, noise: pipe.sample_latents(
                    lp, r, batch, noise=noise
                )
            )
            self._sample = lambda r, noise: _lat_jit(ldm_params, r, noise)
            _dec_jit = jax.jit(
                lambda sp, z1: pipe.decode_pyramids(sp, z1)
            )
            self._decode_pyr = lambda z1: _dec_jit(s1_params, z1)
            _eval_jit = jax.jit(
                lambda sp, pyr, pts: pipe.logits_from_pyramids(sp, pts, pyr)
            )
            self._eval_pts = lambda pyr, pts: _eval_jit(s1_params, pyr, pts)
            # stable (points, pyramids) adapter so refine_mesh's memoized
            # runner compiles once per server, not once per mesh
            self._refine_fn = lambda pts, pyr: self._eval_pts(pyr, pts)
            self._gen_kwargs = dict(getattr(pipe, "generation_kwargs", {}))
            if mesh_kwargs:
                self._gen_kwargs.update(mesh_kwargs)
            self.res = int(
                self._gen_kwargs.get("resolution0", 64)
                * 2 ** self._gen_kwargs.get("upsampling_steps", 2)
            )
        elif self.domain == "nerf":
            # jit BOTH programs once here (a fresh jit per request would
            # re-trace the renderer every call): DDIM latents for the whole
            # coalesced batch, then the per-scene camera-path render
            sample_lat = jax.jit(
                lambda lp, r, noise: pipe.sample_latents(
                    lp, r, batch, noise=noise
                )
            )
            render = jax.jit(pipe.render_camera_path, static_argnums=(4, 5))
            poses = pipe.spherical_poses(n_views)

            def _sample_nerf(r, noise):
                rs, rr = jax.random.split(r)
                z = sample_lat(ldm_params, rs, noise)
                return jnp.stack([
                    render(s1_params, z[b : b + 1], rr, poses, res, res)
                    for b in range(batch)
                ])

            self._sample = _sample_nerf
        else:
            _img_jit = jax.jit(
                lambda lp, sp, r, noise: pipe.sample_images(
                    lp, sp, r, batch=batch, resolution=res, noise=noise
                )
            )
            self._sample = lambda r, noise: _img_jit(
                ldm_params, s1_params, r, noise
            )

        self._queue: collections.deque = collections.deque()
        self._cond = threading.Condition()
        self._stop = False
        self._worker_thread = threading.Thread(target=self._worker, daemon=True)
        self._worker_thread.start()

    # ------------------------------------------------------------- public

    def warmup(self) -> None:
        """Compile + run one batch so the first real request is fast."""
        noise = jnp.zeros((self.batch,) + self._noise_shape, jnp.float32)
        np.asarray(self._sample(jax.random.PRNGKey(0), noise))

    def generate(self, n: int = 1, seed: Optional[int] = None,
                 timeout: Optional[float] = None):
        """Blocking.  Returns per domain: image (n, res, res, 3) uint8;
        video (n, t, res, res, 3) uint8; nerf (n, views, res, res, 3) uint8;
        occupancy a list of n (verts, faces) tuples.  Thread-safe;
        concurrent callers are coalesced into device batches."""
        if not (1 <= n <= self.batch):
            raise ValueError(f"n must be in [1, {self.batch}], got {n}")
        req = _Request(n, int(seed) if seed is not None else time.time_ns() % (1 << 31))
        with self._cond:
            if self._stop:
                raise RuntimeError("service closed")
            self._queue.append(req)
            self._cond.notify_all()
        if not req.event.wait(timeout):
            with self._cond:
                # Re-check under the lock: the worker may have completed the
                # request between wait() expiring and us acquiring the lock.
                if not req.event.is_set():
                    req.cancelled = True
                    try:
                        self._queue.remove(req)
                    except ValueError:
                        pass  # already dequeued by the worker
                    raise TimeoutError("generation timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def close(self) -> None:
        with self._cond:
            self._stop = True
            self._cond.notify_all()
        self._worker_thread.join(timeout=5)

    # ------------------------------------------------------------- worker

    def _worker(self) -> None:
        while True:
            with self._cond:
                while not self._queue and not self._stop:
                    self._cond.wait(0.25)
                if self._stop:
                    for r in self._queue:
                        r.error = RuntimeError("service closed")
                        r.event.set()
                    self._queue.clear()
                    return
                # linger to coalesce more requests into this device batch
                deadline = time.monotonic() + self._linger
                while sum(r.n for r in self._queue) < self.batch:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0 or self._stop:
                        break
                    self._cond.wait(remaining)
                take, count = [], 0
                while self._queue and count + self._queue[0].n <= self.batch:
                    r = self._queue.popleft()
                    if r.cancelled:
                        continue  # caller timed out; don't waste batch slots
                    take.append(r)
                    count += r.n
            if not take:
                continue
            try:
                self._run_batch(take, count)
            except Exception as e:  # report, don't kill the worker
                for r in take:
                    r.error = e
                    r.event.set()

    def _run_batch(self, take, count: int) -> None:
        rows = [
            np.random.default_rng(r.seed).standard_normal(
                (r.n,) + self._noise_shape, dtype=np.float32
            )
            for r in take
        ]
        if count < self.batch:  # pad to the compiled batch
            rows.append(
                np.random.default_rng(0xDD31).standard_normal(
                    (self.batch - count,) + self._noise_shape, dtype=np.float32
                )
            )
        noise = jnp.asarray(np.concatenate(rows, axis=0))
        rng = jax.random.PRNGKey(take[0].seed)
        out = np.asarray(self._sample(rng, noise))
        if self.domain == "occupancy":
            # out = latents (batch, r, r, C); extract meshes for the `count`
            # real samples (the compiled group shape is fixed, but padding
            # slots are masked inactive inside the lockstep extractor)
            meshes = self._extract_meshes(out, count)[:count]
            ofs = 0
            for r in take:
                r.result = meshes[ofs : ofs + r.n]
                ofs += r.n
                r.event.set()
            return
        out = (np.clip(out, 0.0, 1.0) * 255.0).astype(np.uint8)
        ofs = 0
        for r in take:
            r.result = out[ofs : ofs + r.n]
            ofs += r.n
            r.event.set()

    def _extract_meshes(self, z: np.ndarray, count: int | None = None):
        """Latents (g, r, r, C) -> [(verts, faces), ...] via BATCHED
        lockstep MISE (geometry/generation.py::generate_meshes_batched):
        all g octrees share one device evaluation per round.  `count` marks
        the first `count` slots as real — the zero-noise padding slots that
        fill the compiled batch are skipped entirely (no octree), so a
        degenerate padding field can never block the lockstep group.
        Gradient refinement (generation.refinement_step) stays per-mesh; its
        compiled scan is shared across meshes (`refine_mesh` memoizes on the
        stable `self._refine_fn`, per-mesh pyramids ride in via ctx)."""
        from ddmi_tpu.geometry.generation import (
            generate_meshes_batched,
            refine_mesh,
        )

        gk = dict(self._gen_kwargs)
        refine_steps = int(gk.pop("refinement_step", 0) or 0)
        g = z.shape[0]
        count = g if count is None else count
        zj = jnp.asarray(z)
        pyr = self._decode_pyr(zj)
        meshes = generate_meshes_batched(
            lambda pts: self._eval_pts(pyr, jnp.asarray(pts)),
            g, active=[i < count for i in range(g)], **gk,
        )
        if refine_steps > 0:
            for i, (verts, tris) in enumerate(meshes):
                if not len(tris):
                    continue
                pyr_i = jax.tree_util.tree_map(
                    lambda a: a[i : i + 1], pyr
                )
                verts = refine_mesh(
                    verts, tris, self._refine_fn, ctx=(pyr_i,),
                    threshold=gk.get("threshold", 0.2),
                    steps=refine_steps,
                )
                meshes[i] = (verts, tris)
        return meshes


# ------------------------------------------------------------------- HTTP


def _gif_bytes(vids: np.ndarray, fps: int = 8) -> bytes:
    """(n, t, h, w, 3) uint8 -> one animated GIF (videos tiled side-by-side)."""
    from PIL import Image

    n, t, h, w, c = vids.shape
    frames = []
    for ti in range(t):
        row = np.concatenate([vids[i, ti] for i in range(n)], axis=1)
        frames.append(Image.fromarray(row))
    buf = io.BytesIO()
    frames[0].save(
        buf, format="GIF", save_all=True, append_images=frames[1:],
        duration=int(1000 / fps), loop=0,
    )
    return buf.getvalue()


def _obj_bytes(meshes) -> bytes:
    """[(verts, faces), ...] -> one Wavefront OBJ with `o mesh_i` objects
    (vertex indices are global and 1-based per the OBJ spec)."""
    lines = []
    base = 1
    for i, (verts, faces) in enumerate(meshes):
        lines.append(f"o mesh_{i}")
        for v in np.asarray(verts, np.float32):
            lines.append(f"v {v[0]:g} {v[1]:g} {v[2]:g}")
        for f in np.asarray(faces, np.int64):
            lines.append(f"f {f[0] + base} {f[1] + base} {f[2] + base}")
        base += len(verts)
    return ("\n".join(lines) + "\n").encode("ascii")


def _npz_bytes(meshes) -> bytes:
    """[(verts, faces), ...] -> np.savez archive verts_i / faces_i."""
    arrays = {}
    for i, (verts, faces) in enumerate(meshes):
        arrays[f"verts_{i}"] = np.asarray(verts, np.float32)
        arrays[f"faces_{i}"] = np.asarray(faces, np.int64)
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def _png_bytes(imgs: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 -> one PNG (row-major grid when n > 1)."""
    from PIL import Image

    n, h, w, c = imgs.shape
    cols = min(4, n)
    grid_rows = -(-n // cols)
    canvas = np.zeros((grid_rows * h, cols * w, c), np.uint8)
    for i, im in enumerate(imgs):
        r, cc = divmod(i, cols)
        canvas[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = im
    buf = io.BytesIO()
    Image.fromarray(canvas).save(buf, format="PNG")
    return buf.getvalue()


def _make_handler(service: SamplerService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "ok": True,
                    "domain": service.domain,
                    "step": service.step,
                    "resolution": service.res,
                    "service_batch": service.batch,
                    "initialized": service.initialized,
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                n = int(payload.get("n", 1))
                seed = payload.get("seed")
                fmt = payload.get("format", "npy")
                out = service.generate(n=n, seed=seed, timeout=600)
                if service.domain == "occupancy":
                    if fmt == "obj":
                        body, ctype = _obj_bytes(out), "text/plain"
                    elif fmt == "npz":
                        body, ctype = _npz_bytes(out), \
                            "application/octet-stream"
                    else:
                        self._json(400, {
                            "error": f"format {fmt!r} not valid for domain "
                            "'occupancy' (obj|npz)"
                        })
                        return
                elif fmt == "png" and out.ndim == 4:
                    body, ctype = _png_bytes(out), "image/png"
                elif fmt == "gif" and out.ndim == 5:
                    body, ctype = _gif_bytes(out), "image/gif"
                elif fmt == "npy":
                    buf = io.BytesIO()
                    np.save(buf, out)
                    body, ctype = buf.getvalue(), "application/octet-stream"
                else:
                    self._json(400, {
                        "error": f"format {fmt!r} not valid for domain "
                        f"{service.domain!r} (image: png|npy, video: "
                        "gif|npy, nerf: gif|npy)"
                    })
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except ValueError as e:
                self._json(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover - defensive
                self._json(500, {"error": str(e)})

    return Handler


def make_http_server(service: SamplerService, host: str = "127.0.0.1",
                     port: int = 8500) -> ThreadingHTTPServer:
    return ThreadingHTTPServer((host, port), _make_handler(service))


def serve_http(service: SamplerService, host: str = "127.0.0.1",
               port: int = 8500) -> None:
    server = make_http_server(service, host, port)
    print(f"serving on http://{host}:{server.server_address[1]} "
          f"(batch={service.batch}, res={service.res}, step={service.step})")
    try:
        server.serve_forever()
    finally:
        server.server_close()
        service.close()
