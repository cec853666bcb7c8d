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

Saves are async (orbax) so the TPU never idles on host serialization —
the preemption-safety story the reference lacks.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str | Path):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _tree(self, state: TrainState) -> dict:
        return {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }

    def save(self, name: str, state: TrainState, extra: dict | None = None, force: bool = True):
        path = self.dir / name
        self._ckpt.save(path, self._tree(state), force=force)
        # metadata rides beside the array tree so restore targets never need
        # to guess its structure
        if extra:
            (self.dir / f"{name}.extra.json").write_text(json.dumps(extra))

    def save_best(self, state: TrainState, epoch: int, metric: float):
        self.save("best_segmentation", state, extra={"epoch": epoch, "metric": metric})
        (self.dir / "best_segmentation.txt").write_text(
            f"epoch: {epoch}\nval_miou: {metric}\n"
        )

    def save_epoch(self, state: TrainState, epoch: int):
        self.save(f"checkpoint_epoch={epoch}", state)

    def restore(self, name: str, state: TrainState) -> tuple[TrainState, dict]:
        path = self.dir / name
        target = self._tree(state)
        restored = self._ckpt.restore(path, target)
        new_state = state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        extra_path = self.dir / f"{name}.extra.json"
        extra = json.loads(extra_path.read_text()) if extra_path.exists() else {}
        return new_state, extra

    def wait(self):
        self._ckpt.wait_until_finished()
