"""Checkpoint / resume via Orbax.

Replaces the reference's flat torch.save dicts (tools/d2c_vae/image.py:117-133,
tools/ldm/image.py:104-119) with async Orbax checkpointing of the train-state
pytree; the logical contents match (step, params, optimizer, EMA, SN state).
Writes happen once per save under SPMD (Orbax coordinates multi-host writes;
the reference gates on rank 0)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Keeps `model-{step}` checkpoints plus a rolling `last` alias,
    mirroring the reference's model-{step}.pt / model-last.pt layout."""

    def __init__(self, directory: str, max_to_keep: int = 3, prefix: str = "model"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.prefix = prefix
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
        )
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.directory, prefix), options=options
        )

    def save(self, step: int, state: Any, force: bool = False,
             overwrite: bool = False) -> None:
        """force: save off the save-interval schedule.  overwrite: replace an
        existing checkpoint at this step (orbax raises StepAlreadyExistsError
        otherwise — e.g. re-running the reference-checkpoint converter over
        the same save_pth).

        Overwrite is write-then-swap: the replacement is fully written to a
        sibling temp directory FIRST, and only then is the old step deleted
        and the new one moved in — a crash mid-save never loses the only
        copy.  (Single-controller path: used by the converter CLI, not the
        multi-host training save schedule.)"""
        if overwrite and step in self._mgr.all_steps():
            import shutil

            tmp_root = os.path.join(self.directory, f".{self.prefix}-swap")
            shutil.rmtree(tmp_root, ignore_errors=True)
            tmp_mgr = ocp.CheckpointManager(
                tmp_root,
                options=ocp.CheckpointManagerOptions(
                    create=True, enable_async_checkpointing=False
                ),
            )
            tmp_mgr.save(step, args=ocp.args.StandardSave(state))
            tmp_mgr.wait_until_finished()
            tmp_mgr.close()
            # replacement is durably on disk — now swap it in
            self._mgr.delete(step)
            src = os.path.join(tmp_root, str(step))
            dst = os.path.join(self.directory, self.prefix, str(step))
            os.rename(src, dst)
            shutil.rmtree(tmp_root, ignore_errors=True)
            self._mgr.reload()
            return
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        try:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(state_like)
            )
        except ValueError:
            # Forward-compat: the template grew optional fields (e.g. the
            # adversarial disc_params) that an older checkpoint lacks —
            # restore the stored tree raw and merge it over the template by
            # normalized path (dataclass attr keys vs dict keys).
            stored = self._mgr.restore(step)

            def norm(path):
                return "/".join(
                    str(getattr(k, "key", getattr(k, "name", k)))
                    for k in path
                )

            flat = {
                norm(p): v
                for p, v in jax.tree_util.tree_flatten_with_path(stored)[0]
            }

            def pick(path, leaf):
                return flat.get(norm(path), leaf)

            return jax.tree_util.tree_map_with_path(pick, state_like)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
