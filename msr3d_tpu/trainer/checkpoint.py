"""Checkpoint/resume via orbax (SURVEY.md §5 checkpoint mechanisms).

Two mechanisms, mirroring the reference:
  1. Full training state (params + opt state + Tracker) with
     automatic naming + total_limit=1 (leo_trainer.py:60-65); resume picks
     the latest step and skips consumed batches (:143-146, :204-207).
  2. Weights-only learnable params per epoch + ``best`` (:445-454,
     :476-486), restored with merge (strict=False analog).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


@dataclasses.dataclass
class Tracker:
    """Checkpointable progress record (trainer/build.py:41-49)."""

    run_id: str = ""
    epoch: int = 0
    loader_step: int = 0
    overall_best_result: float = 0.0

    def state_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        for k, v in state.items():
            if hasattr(self, k):
                setattr(self, k, v)

    def step_loader(self) -> None:
        self.loader_step += 1

    def step_epoch(self) -> None:
        self.epoch += 1
        self.loader_step = 0


class CheckpointManager:
    def __init__(
        self,
        ckpt_dir: str | Path,
        max_to_keep: int = 1,
        async_save: bool = False,
    ):
        self.dir = Path(ckpt_dir).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        # orbax's CheckpointManager writes in a background thread; with
        # async_save the trainer keeps stepping while a full-state save
        # (minutes at 7B scale) streams to disk. orbax itself serializes
        # back-to-back saves, and `wait()` fences before restore/exit.
        self.async_save = bool(async_save)
        self._mgr = ocp.CheckpointManager(
            self.dir / "state",
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    # -- full training state -------------------------------------------------

    def save_state(
        self, step: int, state: Any, tracker: Tracker, *, force: bool = False
    ) -> None:
        # force=True overwrites an existing step — the preemption save may
        # land on a step a save_frequency checkpoint already wrote
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                tracker=ocp.args.JsonSave(tracker.state_dict()),
            ),
            force=force,
        )
        if not self.async_save:
            self._mgr.wait_until_finished()

    def wait(self) -> None:
        """Fence: block until all in-flight (async) saves are durable."""
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_state(self, abstract_state: Any, tracker: Tracker) -> Any:
        self._mgr.wait_until_finished()
        step = self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                tracker=ocp.args.JsonRestore(),
            ),
        )
        tracker.load_state_dict(restored["tracker"])
        return restored["state"]

    # -- weights-only (learnable params) -------------------------------------

    def save_weights(self, name: str, learnable_params: Any) -> None:
        path = self.dir / name
        ckpt = ocp.StandardCheckpointer()
        # orbax refuses to overwrite; best/epoch saves replace in place
        import shutil

        if path.exists():
            shutil.rmtree(path)
        ckpt.save(path, learnable_params)
        ckpt.wait_until_finished()

    def load_weights(self, name: str, abstract_params: Optional[Any] = None) -> Any:
        ckpt = ocp.StandardCheckpointer()
        path = self.dir / name
        if abstract_params is not None:
            return ckpt.restore(path, abstract_params)
        return ckpt.restore(path)

    def has_weights(self, name: str) -> bool:
        return (self.dir / name).exists()
