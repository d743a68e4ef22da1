"""Smoke tier for the bench harnesses and the driver entry point.

Round-4 postmortem (VERDICT round 4, items 1-2): `bench_3d.py` shipped a
NameError that burned two TPU-queue slots, and `__graft_entry__.py` grew two
new dryrun cells that were never executed cold before snapshot.  This module
makes both classes of failure impossible to reach the queue:

- every `bench_*.py` harness is imported (catches import-time errors), and
- every function in every harness is statically checked for globals that
  don't resolve in the imported module (catches the `flops_of` NameError
  class WITHOUT running the harness's heavy main()), and
- the full `_dryrun_multichip_impl(8)` — all five cells, same code path the
  driver runs — executes in-process on the 8-device CPU mesh (`slow` tier;
  `pytest -m smoke` selects everything here).

Reference bar: the reference's tools/ scripts are executed by hand before
release; we gate them in CI instead (SURVEY.md §4 test strategy).
"""

from __future__ import annotations

import builtins
import glob
import importlib
import os
import symtable
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HARNESSES = sorted(
    os.path.basename(p)[:-3] for p in glob.glob(os.path.join(REPO, "bench*.py"))
) + ["__graft_entry__"]

# jax config knobs the bench modules set at import time; snapshot/restore so
# importing them doesn't redirect the test session's compile cache.
_JAX_KNOBS = (
    "jax_compilation_cache_dir",
    "jax_persistent_cache_min_compile_time_secs",
    "jax_persistent_cache_min_entry_size_bytes",
)


@pytest.fixture
def jax_config_guard():
    saved = {k: getattr(jax.config, k) for k in _JAX_KNOBS}
    yield
    for k, v in saved.items():
        jax.config.update(k, v)


def _import_harness(name):
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    return importlib.import_module(name)


@pytest.mark.smoke
@pytest.mark.parametrize("name", HARNESSES)
def test_harness_imports(name, jax_config_guard):
    mod = _import_harness(name)
    assert mod is not None


def _function_scopes(table):
    """Yield every function/lambda scope in a symtable, recursively."""
    for child in table.get_children():
        if child.get_type() == "function":
            yield child
        yield from _function_scopes(child)


@pytest.mark.smoke
@pytest.mark.parametrize("name", HARNESSES)
def test_harness_no_undefined_globals(name, jax_config_guard):
    """Poor man's pyflakes: every global a harness function references must
    resolve in the imported module's namespace (or builtins).  This is the
    static check that would have caught round 4's `flops_of` NameError at
    commit time instead of on the TPU queue."""
    mod = _import_harness(name)
    path = os.path.join(REPO, name + ".py")
    with open(path) as f:
        src = f.read()
    table = symtable.symtable(src, path, "exec")
    missing = set()
    for scope in _function_scopes(table):
        for sym in scope.get_symbols():
            if not sym.is_global() or not sym.is_referenced():
                continue
            n = sym.get_name()
            if hasattr(mod, n) or hasattr(builtins, n):
                continue
            missing.add(f"{scope.get_name()}:{n}")
    assert not missing, (
        f"{name}.py references globals that don't exist after import "
        f"(NameError at runtime): {sorted(missing)}"
    )


@pytest.mark.smoke
@pytest.mark.slow
def test_dryrun_entry_full(capsys, jax_config_guard):
    """Execute the driver's ACTUAL multichip dryrun — all five cells
    (image s2, video s2, NeRF s1, occupancy s1, amp video s2) on the
    8-device mesh, in-process (the test backend already has 8 CPU devices,
    so this is the same `_dryrun_multichip_impl` the driver subprocess
    runs).  An entry-point edit that breaks a cell now fails HERE, not in
    `MULTICHIP_r*.json`."""
    g = _import_harness("__graft_entry__")
    g._dryrun_multichip_impl(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip(8) ok" in out
    for key in (
        "loss=",
        "video_s2_loss=",
        "nerf_s1_loss=",
        "occupancy_s1_loss=",
        "amp_video_s2_loss=",
    ):
        assert key in out, f"dryrun tail missing {key}: {out!r}"


@pytest.mark.smoke
def test_dryrun_mesh_shapes():
    """_make_dryrun_mesh covers the driver's device counts without fallback
    warnings (a fallback would silently drop FSDP/TP coverage)."""
    import warnings

    g = _import_harness("__graft_entry__")
    for n in (1, 2, 4, 8):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            mesh = g._make_dryrun_mesh(n, devices=jax.devices()[:n])
        assert mesh.devices.size == n
        if n >= 4:
            assert mesh.shape["fsdp"] == 2 and mesh.shape["model"] == 2
