"""Profile a training cell's device time per op (where do the ms go?).

bench_train.py gives wall/MFU/HBM per cell; this drills one cell down to
the XLA-op level: capture a jax.profiler trace (perfetto JSON) of a few
hot-loop steps and aggregate device time by op, printing the top-K and a
category rollup (conv / matmul / reduce-window / gather / fusion-classes).

Usage:
  python bench_profile_train.py                      # image-s1 (default)
  DDMI_PROFILE_CELL=video-s2 python bench_profile_train.py
  DDMI_PROFILE_TOPK=40 python bench_profile_train.py

Prints JSON lines; the raw trace stays under /tmp/ddmi_prof_<cell>/ for
manual inspection.
"""

import collections
import glob
import gzip
import json
import os
import re
import time

import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from bench_train import CELLS, _setup  # reuse the cell builders

CELL = os.environ.get("DDMI_PROFILE_CELL", "image-s1")
TOPK = int(os.environ.get("DDMI_PROFILE_TOPK", "25"))
STEPS = int(os.environ.get("DDMI_PROFILE_STEPS", "3"))


def build_step(cell):
    for exp, path, name in CELLS:
        if name == cell:
            break
    else:
        raise SystemExit(f"unknown cell {cell}")
    cfg, pipe, batch = _setup(exp, path)
    rng = jax.random.PRNGKey(0)
    build_step.lowered = None  # set below; used for HLO op provenance
    if exp == "d2c-vae":
        state = pipe.init_stage1(rng, steps_per_epoch=10)
        tx = pipe.stage1_optimizer(10)
        # LPIPS params as a jit ARG, not a closure (evals/lpips.py)
        pp = getattr(pipe, "perceptual_params", None)
        fn = lambda s, x, r, pp: pipe.stage1_train_step(
            tx, s, x, r,
            **({} if pp is None else {"perceptual_params": pp})
        )
        step = jax.jit(fn, donate_argnums=(0,))
        build_step.lowered = lambda: jax.jit(fn).lower(
            state, batch, rng, pp
        )
        return lambda s, i: step(s, batch, jax.random.PRNGKey(i), pp), state
    s1_params = pipe.init_stage1(rng, steps_per_epoch=10).params
    state = pipe.init_stage2(rng, steps_per_epoch=10)
    tx = pipe.stage2_optimizer()
    fn2 = lambda s, p1, x, r: pipe.stage2_train_step(tx, s, p1, x, r)
    step = jax.jit(fn2, donate_argnums=(0,))
    build_step.lowered = lambda: jax.jit(fn2).lower(
        state, s1_params, batch, rng
    )
    return lambda s, i: step(s, s1_params, batch, jax.random.PRNGKey(i)), state


def _tracks(events):
    """Perfetto JSON -> {(pid, tid): [(name, dur_us)...]}, plus labels."""
    names = {}
    rows = collections.defaultdict(list)
    for ev in events:
        ph = ev.get("ph")
        if ph == "M":  # metadata: process_name / thread_name
            key = (ev.get("pid"), ev.get("tid"), ev.get("name"))
            names[key] = ev.get("args", {}).get("name", "")
        elif ph == "X":
            rows[(ev.get("pid"), ev.get("tid"))].append(
                (ev.get("name", "?"), float(ev.get("dur", 0)))
            )
    return rows, names


CATEGORIES = [
    ("conv", re.compile(r"conv|%conv", re.I)),
    ("matmul/dot", re.compile(r"dot|matmul|einsum", re.I)),
    ("flash-attn (pallas)", re.compile(r"flash|pallas|custom-call", re.I)),
    ("gather/scatter", re.compile(r"gather|scatter", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|reshape|bitcast", re.I)),
    ("rng", re.compile(r"rng|threefry", re.I)),
]


def categorize(name):
    for label, pat in CATEGORIES:
        if pat.search(name):
            return label
    return "other/fusion"


def main():
    run, state = build_step(CELL)
    # compile + warm
    state, m = run(state, 1)
    float(jax.device_get(jax.tree_util.tree_leaves(m)[0]))

    logdir = f"/tmp/ddmi_prof_{CELL}"
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, m = run(state, 2 + i)
    float(jax.device_get(jax.tree_util.tree_leaves(m)[0]))
    wall = (time.perf_counter() - t0) / STEPS
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(f"{logdir}/**/*perfetto*", recursive=True),
                   key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no perfetto trace written under {logdir}")
    opener = gzip.open if paths[-1].endswith(".gz") else open
    with opener(paths[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    rows, names = _tracks(events)
    # pick the busiest track on a TPU device process ("XLA Ops"-style)
    def track_label(key):
        pid, tid = key
        proc = names.get((pid, None, "process_name"), "") or names.get(
            (pid, 0, "process_name"), ""
        )
        thr = names.get((pid, tid, "thread_name"), "")
        return f"{proc}/{thr}"

    best, best_sum = None, -1.0
    for key, evs in rows.items():
        lbl = track_label(key)
        if "TPU" in lbl or "tpu" in lbl or "XLA Ops" in lbl:
            s = sum(d for _, d in evs)
            if s > best_sum:
                best, best_sum = key, s
    if best is None:  # fall back: busiest track overall
        best = max(rows, key=lambda k: sum(d for _, d in rows[k]))
        best_sum = sum(d for _, d in rows[best])

    per_op = collections.Counter()
    for name, dur in rows[best]:
        per_op[name] += dur
    total = sum(per_op.values())

    print(json.dumps({
        "metric": f"profile, {CELL}", "steps": STEPS,
        "wall_ms_per_step": round(1000 * wall, 1),
        "device_track": track_label(best),
        "device_ms_per_step": round(best_sum / 1000 / STEPS, 1),
        "device_busy_pct_of_wall": round(
            100 * (best_sum / 1e6 / STEPS) / wall, 1),
    }), flush=True)

    cats = collections.Counter()
    for name, dur in per_op.items():
        cats[categorize(name)] += dur
    print(json.dumps({
        "categories_pct": {
            k: round(100 * v / total, 1)
            for k, v in cats.most_common()
        }
    }), flush=True)

    # Map profiled op names to HLO metadata (op_name carries the jax source
    # scope, e.g. "jit(_step)/.../conv_general_dilated") so hot fusions are
    # attributable without guessing.  The optimized-HLO dump comes from the
    # same (cached) compile the profiled step used.
    provenance = {}
    try:
        hlo = build_step.lowered().compile().as_text()
        pat = re.compile(
            r"%?([a-zA-Z0-9_.\-]+) = [^\n]*?metadata=\{[^}]*?"
            r'op_name="([^"]*)"'
        )
        for m in pat.finditer(hlo):
            provenance.setdefault(m.group(1), m.group(2))
    except Exception as e:  # provenance is best-effort
        print(json.dumps({"provenance_error": str(e)[:200]}), flush=True)

    for name, dur in per_op.most_common(TOPK):
        rec = {
            "op": name[:120], "ms_per_step": round(dur / 1000 / STEPS, 3),
            "pct": round(100 * dur / total, 2),
        }
        src = provenance.get(name) or provenance.get(name.split(".remat")[0])
        if src:
            rec["src"] = src[-160:]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
