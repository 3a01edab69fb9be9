"""Training-state checkpoint/resume (orbax).

The reference's only persistence is the index binary + pickled mapping
(``faiss_store.py:83-122``; SURVEY.md §5 "Checkpoint/resume"). The index/doc
store side is covered by index/vector_store.py + SQLite; this module adds
the training-side capability a production deployment needs: sharded,
atomic-versioned checkpoints of the encoder TrainState via orbax, restoring
onto an arbitrary mesh (the param shardings are re-applied on restore).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..core.logging import get_logger
from .train import TrainState

logger = get_logger(__name__)


class TrainCheckpointer:
    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState, step: Optional[int] = None) -> int:
        import orbax.checkpoint as ocp

        step = int(state.step) if step is None else step
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()
        logger.info("saved train checkpoint step=%d to %s", step, self.directory)
        return step

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, template: TrainState, step: Optional[int] = None
    ) -> TrainState:
        """Restore into the template's structure/shardings."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        payload = {
            "params": template.params,
            "opt_state": template.opt_state,
            "step": template.step,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(payload)
        )

        # Re-place leaves: orbax commits every restored array to an explicit
        # device; mixing a device-0-committed optimizer scalar with
        # mesh-sharded params inside one jit is an error. Mesh-sharded leaves
        # keep the template's NamedSharding; everything else is decommitted.
        from jax.sharding import NamedSharding

        def place(t, r):
            if isinstance(getattr(t, "sharding", None), NamedSharding):
                return jax.device_put(r, t.sharding)
            import numpy as np

            return jnp.asarray(np.asarray(r))

        restored = jax.tree.map(place, payload, restored)
        logger.info("restored train checkpoint step=%d", step)
        return TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"]),
        )

    def close(self) -> None:
        self._mgr.close()
