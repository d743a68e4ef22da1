"""Mesh generation from triplane latents.

Port of convocc/src/conv_onet/generation.py (Generator3D.
generate_mesh_fromdiffusion): decode latent -> occupancy-logit field ->
dense grid (or MISE octree refinement) -> iso-surface extraction -> optional
quadric simplification.  The device side evaluates fixed-size padded point
batches under jit (SURVEY.md §7 hard-part #3); the octree stays in C++.

Conventions preserved: logit threshold = log(t) - log(1-t) (generation.py:84),
box_size = 1 + padding, grid padded by one cell of -1e6 for watertightness
with the corresponding 0.5/1.0 vertex shifts (:160-168)."""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

from ddmi_tpu import geometry


def _bucket(n: int, quantum: int = 4096) -> int:
    """Round up to a shape bucket so per-mesh refinement compiles are bounded
    (meshes have arbitrary vertex/face counts; jit needs static shapes)."""
    return max(quantum, ((n + quantum - 1) // quantum) * quantum)


@functools.lru_cache(maxsize=16)
def _refine_runner(logits_fn, steps: int, lr: float):
    """One jitted refinement scan per (logits_fn, steps, lr) — module-level
    memoized so every mesh of a 5000-mesh protocol run reuses the SAME
    compiled program (per shape bucket).  threshold / normal_weight / denom
    and the logits context (decoded pyramids, params) are jit ARGUMENTS, not
    closure constants, so per-mesh data never forces a retrace."""
    import jax
    import jax.numpy as jnp
    import optax

    # torch.optim.RMSprop defaults (alpha=0.99, eps=1e-8), reference :281
    opt = optax.rmsprop(lr, decay=0.99, eps=1e-8)

    @jax.jit
    def run(v0, faces, mask, rng, ctx, threshold, normal_weight, denom):
        def step(carry, _):
            v, opt_state, rng = carry
            rng, k = jax.random.split(rng)
            eps = jax.random.dirichlet(
                k, jnp.array([0.5, 0.5, 0.5]), (faces.shape[0],)
            )  # (F, 3) barycentric weights, reference :288

            def loss_fn(v):
                fv = v[faces]  # (F, 3, 3)
                fp = (fv * eps[:, :, None]).sum(axis=1)  # (F, 3)
                e1 = fv[:, 1] - fv[:, 0]
                e2 = fv[:, 2] - fv[:, 1]
                fn = jnp.cross(e1, e2)
                # eps INSIDE the sqrt: d|x|/dx at x=0 is NaN, and padded
                # dummy faces have exactly-zero normals — NaN * mask would
                # still poison the whole gradient
                fn = fn / jnp.sqrt(
                    (fn**2).sum(axis=1, keepdims=True) + 1e-20
                )
                prob = lambda p: jax.nn.sigmoid(
                    logits_fn(p[None], *ctx)[0]
                )
                face_value = prob(fp)  # (F,)
                grad_p = jax.grad(lambda p: prob(p).sum())(fp)  # (F, 3)
                nt = -grad_p
                nt = nt / jnp.sqrt(
                    (nt**2).sum(axis=1, keepdims=True) + 1e-20
                )
                # masked means over REAL faces (reference means are unmasked
                # because it never pads)
                loss_t = ((face_value - threshold) ** 2 * mask).sum() / denom
                loss_n = (
                    ((fn - nt) ** 2).sum(axis=1) * mask
                ).sum() / denom
                return loss_t + normal_weight * loss_n

            g = jax.grad(loss_fn)(v)
            updates, opt_state = opt.update(g, opt_state, v)
            return (optax.apply_updates(v, updates), opt_state, rng), None

        init = (v0, opt.init(v0), rng)
        (v, _, _), _ = jax.lax.scan(step, init, None, length=steps)
        return v

    return run


def refine_mesh(
    verts: np.ndarray,
    tris: np.ndarray,
    logits_fn,
    *,
    ctx: tuple = (),
    threshold: float = 0.2,
    steps: int = 30,
    lr: float = 1e-4,
    normal_weight: float = 0.01,
    seed: int = 0,
) -> np.ndarray:
    """Gradient-based vertex refinement (convocc/src/conv_onet/
    generation.py:256-318 refine_mesh), reformulated TPU-first.

    Per step (reference semantics): sample one Dirichlet(0.5,0.5,0.5) point
    per face, pull its occupancy probability toward `threshold` (the
    iso-level) and align each face normal with the negative occupancy
    gradient; optimize vertices with RMSprop(lr=1e-4).

    TPU-first shape: the reference's Python optimizer loop (one
    autograd.grad + RMSprop step per iteration, host-driven) becomes ONE
    jitted `lax.scan` over a fixed step count — Dirichlet sampling via
    jax.random inside the scan, the occupancy gradient via `jax.grad` of
    the (differentiable) decode closure, second-order terms handled by
    composing grads exactly like the reference's create_graph=True.
    Vertices/faces are padded to shape buckets with masked dummy faces, and
    the compiled scan is memoized per (logits_fn, steps, lr) at module
    scope (`_refine_runner`), so arbitrary meshes reuse a bounded set of
    compiled programs ACROSS calls — per-mesh data rides in as arguments.

    logits_fn: differentiable (b=1, n, 3), *ctx -> (1, n) occupancy logits.
    Pass per-mesh state (decoded pyramids, params) via `ctx` — it is fed
    through jit as arguments — and keep logits_fn itself a STABLE callable
    (module function / bound method / long-lived lambda); a fresh lambda per
    mesh compiles per mesh, defeating the cache.
    """
    import jax
    import jax.numpy as jnp

    nv, nf = len(verts), len(tris)
    if nv == 0 or nf == 0 or steps <= 0:
        return verts
    pv, pf = _bucket(nv), _bucket(nf)
    v0 = np.zeros((pv, 3), np.float32)
    v0[:nv] = verts
    f = np.zeros((pf, 3), np.int32)
    f[:nf] = tris
    mask = np.zeros((pf,), np.float32)
    mask[:nf] = 1.0

    run = _refine_runner(logits_fn, int(steps), float(lr))
    out = np.asarray(
        run(jnp.asarray(v0), jnp.asarray(f), jnp.asarray(mask),
            jax.random.PRNGKey(seed), ctx,
            jnp.float32(threshold), jnp.float32(normal_weight),
            jnp.float32(nf))
    )
    return out[:nv].astype(verts.dtype, copy=False)


@dataclasses.dataclass
class MeshGenerator:
    """eval_points_fn: jitted (b=1, n, 3) float32 -> (1, n) occupancy logits.

    When `refinement_step > 0` the extracted (and optionally simplified) mesh
    gets gradient-based vertex refinement (reference generation.py:219-222;
    `refine_mesh` above) — eval_points_fn doubles as the differentiable
    occupancy closure."""

    eval_points_fn: Callable[[np.ndarray], np.ndarray]
    threshold: float = 0.2
    resolution0: int = 64
    upsampling_steps: int = 2
    padding: float = 0.1
    points_batch_size: int = 100_000
    simplify_nfaces: Optional[int] = None
    refinement_step: int = 0
    refinement_lr: float = 1e-4

    def _eval(self, pts: np.ndarray) -> np.ndarray:
        """Chunked + padded device evaluation (fixed shapes under jit)."""
        n = pts.shape[0]
        bs = self.points_batch_size
        out = np.empty(n, np.float64)
        for i in range(0, n, bs):
            chunk = pts[i : i + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, 3), np.float32)], axis=0
                )
            logits = np.asarray(
                self.eval_points_fn(chunk[None].astype(np.float32))
            )[0]
            out[i : i + bs] = logits[: bs - pad] if pad else logits
        return out

    def generate(self) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (vertices (v,3) in world coords, triangles (t,3))."""
        logit_thr = float(np.log(self.threshold) - np.log(1 - self.threshold))
        box_size = 1 + self.padding

        if self.upsampling_steps == 0:
            # corner-aligned grid over [-0.5, 0.5] (make_3d_grid semantics,
            # convocc/src/common.py:145)
            nx = self.resolution0
            lin = np.linspace(-0.5, 0.5, nx)
            g = np.stack(
                np.meshgrid(lin, lin, lin, indexing="ij"), -1
            ).reshape(-1, 3) * box_size
            value_grid = self._eval(g.astype(np.float32)).reshape(nx, nx, nx)
            denom = nx - 1
        else:
            mise = geometry.MISE(
                self.resolution0, self.upsampling_steps, logit_thr
            )
            while True:
                pts = mise.query()
                if len(pts) == 0:
                    break
                pf = box_size * (pts.astype(np.float64) / mise.res_final - 0.5)
                vals = self._eval(pf.astype(np.float32))
                mise.update(pts, vals)
            value_grid = mise.to_dense()
            denom = mise.res_final

        # watertight: pad with strongly-negative ring, then shift back
        padded = np.pad(value_grid, 1, constant_values=-1e6)
        verts, tris = geometry.marching_cubes(padded, logit_thr)
        if len(verts) == 0:
            return verts, tris
        verts = verts - 1.0  # undo pad ring
        verts = verts / denom
        verts = box_size * (verts - 0.5)

        if self.simplify_nfaces is not None and len(tris) > self.simplify_nfaces:
            verts, tris = geometry.simplify_mesh(
                verts, tris, self.simplify_nfaces, 5.0
            )
        if self.refinement_step > 0:
            # reference order: simplify, then refine (generation.py:213-222);
            # refine compares sigmoid(logit) to the PROB threshold (:271-299)
            verts = refine_mesh(
                verts, tris, self.eval_points_fn,
                threshold=self.threshold, steps=self.refinement_step,
                lr=self.refinement_lr,
            )
        return verts, tris


def generate_meshes_batched(
    eval_group_fn: Callable[[np.ndarray], np.ndarray],
    group: int,
    *,
    threshold: float = 0.2,
    resolution0: int = 64,
    upsampling_steps: int = 2,
    padding: float = 0.1,
    points_batch_size: int = 100_000,
    simplify_nfaces: Optional[int] = None,
    workers: int = 8,
    active: Optional[Sequence[bool]] = None,
) -> list:
    """Extract `group` meshes CONCURRENTLY: all MISE octrees advance in
    lockstep, their pending query points batched into ONE padded device call
    per round (eval_group_fn: (g, bs, 3) float32 -> (g, bs) logits — compile
    it once with jit and reuse across groups).

    `active[i] = False` marks slot i as padding (serving pads a partial
    request group to the compiled batch): no octree is built for it and an
    empty mesh is returned, so a degenerate padding field can never drag the
    lockstep group toward the dense-grid worst case.

    This is the protocol-scale answer to the serial MeshGenerator loop
    (reference runs 5000 meshes one at a time through 100k-point chunks,
    tools/ldm/occupancy.py:204-219 + convocc generation.py:99-115): the
    device sees g meshes' queries per dispatch — g x the arithmetic per
    launch, amortized dispatch/transfer overhead, no per-mesh retrace — and
    the host octree update/query runs in a thread pool (the C++ core is
    called via ctypes, which releases the GIL).

    Returns a list of (verts, tris) in world coords, same conventions as
    MeshGenerator.generate (pad ring, 0.5-shift, quadric simplify).
    Gradient refinement stays per-mesh (MeshGenerator/refine_mesh): it needs
    a differentiable per-mesh closure, and at refinement's cost profile the
    extraction batching is the win that matters."""
    from concurrent.futures import ThreadPoolExecutor

    logit_thr = float(np.log(threshold) - np.log(1 - threshold))
    box_size = 1 + padding
    bs = points_batch_size
    g = group
    if active is None:
        active = [True] * g
    active = list(active)

    grids: list = [None] * g

    if upsampling_steps == 0:
        nx = resolution0
        lin = np.linspace(-0.5, 0.5, nx)
        base = np.stack(
            np.meshgrid(lin, lin, lin, indexing="ij"), -1
        ).reshape(-1, 3) * box_size
        n = base.shape[0]
        vals = np.empty((g, n), np.float64)
        for o in range(0, n, bs):
            chunk = base[o : o + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, 3), np.float32)], 0
                )
            batch = np.broadcast_to(
                chunk.astype(np.float32), (g, bs, 3)
            )
            out = np.asarray(eval_group_fn(batch))
            vals[:, o : o + bs] = out[:, : bs - pad] if pad else out
        for i in range(g):
            if active[i]:
                grids[i] = vals[i].reshape(nx, nx, nx)
        denom = nx - 1
    else:
        mises = [
            geometry.MISE(resolution0, upsampling_steps, logit_thr)
            if active[i] else None
            for i in range(g)
        ]
        denom = resolution0 * 2 ** upsampling_steps
        # per-mesh pending state: (int points, float64 values, offset);
        # inactive (padding) slots are finished before round 1
        pend = [
            [m.query(), None, 0] if m is not None else None for m in mises
        ]
        for st in pend:
            if st is not None:
                st[1] = np.empty(len(st[0]), np.float64)
        pool = ThreadPoolExecutor(max_workers=workers)

        def _advance(i):
            """Octree update + next query wave for mesh i (host, GIL-free)."""
            m = mises[i]
            pts, vals, _ = pend[i]
            m.update(pts, vals)
            nxt = m.query()
            if len(nxt) == 0:
                grids[i] = m.to_dense()
                pend[i] = None
            else:
                pend[i] = [nxt, np.empty(len(nxt), np.float64), 0]

        while any(p is not None for p in pend):
            batch = np.zeros((g, bs, 3), np.float32)
            took = []
            for i, st in enumerate(pend):
                if st is None:
                    continue
                pts, _, off = st
                chunk = pts[off : off + bs]
                batch[i, : len(chunk)] = box_size * (
                    chunk.astype(np.float64) / denom - 0.5
                )
                took.append((i, len(chunk)))
            out = np.asarray(eval_group_fn(batch))
            finished = []
            for i, m_taken in took:
                pts, vals, off = pend[i]
                vals[off : off + m_taken] = out[i, :m_taken]
                pend[i][2] = off + m_taken
                if pend[i][2] >= len(pts):
                    finished.append(i)
            # update+query for drained meshes in parallel on the host while
            # the next round's device work is being assembled
            list(pool.map(_advance, finished))
        pool.shutdown()

    def _extract(grid):
        if grid is None:  # inactive padding slot
            return (
                np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
            )
        padded = np.pad(grid, 1, constant_values=-1e6)
        verts, tris = geometry.marching_cubes(padded, logit_thr)
        if len(verts) == 0:
            return verts, tris
        verts = box_size * ((verts - 1.0) / denom - 0.5)
        if simplify_nfaces is not None and len(tris) > simplify_nfaces:
            verts, tris = geometry.simplify_mesh(
                verts, tris, simplify_nfaces, 5.0
            )
        return verts, tris

    with ThreadPoolExecutor(max_workers=workers) as pool:
        return list(pool.map(_extract, grids))


def sample_surface_points(
    verts: np.ndarray, tris: np.ndarray, n: int, seed: int = 0
) -> np.ndarray:
    """Uniform surface sampling (evals_3d/meshtopc.py equivalent: 2048
    points per mesh for MMD/COV)."""
    rng = np.random.default_rng(seed)
    a = verts[tris[:, 0]]
    b = verts[tris[:, 1]]
    c = verts[tris[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    p = areas / areas.sum()
    idx = rng.choice(len(tris), n, p=p)
    u = rng.random((n, 1))
    v = rng.random((n, 1))
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    return a[idx] + u * (b[idx] - a[idx]) + v * (c[idx] - a[idx])
