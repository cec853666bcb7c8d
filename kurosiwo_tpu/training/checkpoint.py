"""Checkpointing via orbax — unifies the reference's three conventions
(SURVEY.md §5.4 / segmentation_trainer.py:243-255, cd_trainer.py:206-213 &
305-322, train_mae.py:204-232):

  * best-val checkpoint saved as `best_segmentation` (selection metric: val
    mIoU over classes 0-2, parity with the reference);
  * per-epoch checkpoints `checkpoint_epoch={e}` for CD/recurrent;
  * MAE per-epoch `mae_{e}` (full) and `vit_{e}` (encoder-only subtree);
  * a human-readable best_segmentation.txt with the best epoch/metric
    (cd_trainer.py:320-322);
  * resume: restore params/batch_stats/opt_state/epoch.

Saves are async (orbax) so the TPU never idles on host serialization, and
PREEMPTION-SAFE via alternating slots: orbax's force=True save deletes the
existing directory before the async replacement commits, so overwriting a
name in place leaves a window where a preemption destroys the only copy.
Instead each logical name alternates between `{name}.a` / `{name}.b`
directories and a tiny `{name}.ptr.json` pointer (carrying the metadata) is
flipped atomically only AFTER the slot's async write has committed — at
every instant the pointer targets a fully-written checkpoint. Legacy bare
`{name}` directories (pre-slot layout) remain restorable.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str | Path):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self._pending: list[tuple[str, str, dict]] = []

    def _tree(self, state: TrainState) -> dict:
        return {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }

    # -- slot bookkeeping ---------------------------------------------------
    def _ptr_path(self, name: str) -> Path:
        return self.dir / f"{name}.ptr.json"

    def _read_ptr(self, name: str) -> dict | None:
        p = self._ptr_path(name)
        if p.exists():
            try:
                return json.loads(p.read_text())
            except (json.JSONDecodeError, OSError):
                return None
        return None

    def _promote_pending(self) -> None:
        """Flip pointers for saves whose async write has committed (callers
        invoke wait_until_finished first). Atomic via os.replace."""
        for name, slot, extra in self._pending:
            tmp = self._ptr_path(name).with_suffix(".json.tmp")
            tmp.write_text(json.dumps({"slot": slot, "extra": extra}))
            os.replace(tmp, self._ptr_path(name))
        self._pending.clear()

    def has(self, name: str) -> bool:
        if self._read_ptr(name) is not None:
            return True
        if any(name == n for n, _, _ in self._pending):
            return True
        return (self.dir / name).exists()  # legacy layout

    def save(self, name: str, state: TrainState, extra: dict | None = None, force: bool = True):
        # serialize with the PREVIOUS async save (committed long ago in an
        # epoch-cadence loop) and flip its pointer before starting a new one
        self._ckpt.wait_until_finished()
        self._promote_pending()
        cur = self._read_ptr(name)
        slot = "b" if (cur and cur.get("slot", "").endswith(".a")) else "a"
        slot_name = f"{name}.{slot}"
        # overwriting the alternate slot is safe: the pointer targets the
        # other one until _promote_pending flips it post-commit
        self._ckpt.save(self.dir / slot_name, self._tree(state), force=force)
        self._pending.append((name, slot_name, dict(extra or {})))

    def save_best(self, state: TrainState, epoch: int, metric: float):
        self.save("best_segmentation", state, extra={"epoch": epoch, "metric": metric})
        (self.dir / "best_segmentation.txt").write_text(
            f"epoch: {epoch}\nval_miou: {metric}\n"
        )

    def save_epoch(self, state: TrainState, epoch: int):
        self.save(f"checkpoint_epoch={epoch}", state)

    def restore(self, name: str, state: TrainState) -> tuple[TrainState, dict]:
        # finalize any in-flight save of this process first so a
        # save-then-restore sequence (train_task's end-of-run best reload)
        # sees the newest committed checkpoint
        self.wait()
        ptr = self._read_ptr(name)
        if ptr is not None:
            path = self.dir / ptr["slot"]
            extra = dict(ptr.get("extra") or {})
        elif (self.dir / name).exists():  # legacy bare-name layout
            path = self.dir / name
            extra_path = self.dir / f"{name}.extra.json"
            extra = json.loads(extra_path.read_text()) if extra_path.exists() else {}
        else:
            raise FileNotFoundError(f"no checkpoint named {name!r} under {self.dir}")
        target = self._tree(state)
        restored = self._ckpt.restore(path, target)
        new_state = state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        return new_state, extra

    def wait(self):
        self._ckpt.wait_until_finished()
        self._promote_pending()
