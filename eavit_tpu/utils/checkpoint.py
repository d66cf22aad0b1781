"""Checkpoint save/restore with reference-compatible semantics.

The reference checkpoints one big ``torch.save`` dict: model/optimizer
state, pickled RMS objects, counters, metric deques and room sets
(reference train.py:883-961), with scheduled saves every ``saveCkptEvery``
updates and three "best model" variants saved under suffixed filenames
(train.py:904-923). Resume restores everything and skips the obs-norm
warm-up (train.py:198-238, 503).

Here the device state (params, opt state, normalizer pytrees, counters) is
serialized with Orbax; host-side metadata (episode stats, config snapshot)
goes to a JSON sidecar. Best-model suffixes are preserved verbatim.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

BEST_SUFFIXES = {
    "rollout_reward": "__BestModelForMeanExtrinsicRolloutRewards",
    "episode_return": "__BestModelForMeanUndiscountedEpisodeReturn",
    "ssl_loss": "__BestModelForSSLEvaluationEpochLoss",
}


def _to_jsonable(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, set):
        return sorted(_to_jsonable(v) for v in obj)
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if dataclasses.is_dataclass(obj):
        return _to_jsonable(dataclasses.asdict(obj))
    if hasattr(obj, "value") and not isinstance(obj, (int, float, str)):
        return obj.value  # enums
    return obj


def save_checkpoint(
    path: str,
    state: Any,
    metadata: Optional[Dict[str, Any]] = None,
) -> str:
    """Serialize an AgentState pytree + metadata. ``path`` is a file prefix;
    writes ``<path>.msgpack`` and ``<path>.json``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    host_state = jax.device_get(state)
    with open(path + ".msgpack", "wb") as f:
        f.write(serialization.to_bytes(host_state))
    with open(path + ".json", "w") as f:
        json.dump(_to_jsonable(metadata or {}), f, indent=2, default=str)
    return path


def load_checkpoint(path: str, template: Any) -> Tuple[Any, Dict[str, Any]]:
    """Restore into the structure of ``template`` (from agent.init_state)."""
    if path.endswith(".msgpack"):
        path = path[: -len(".msgpack")]
    with open(path + ".msgpack", "rb") as f:
        state = serialization.from_bytes(template, f.read())
    metadata: Dict[str, Any] = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            metadata = json.load(f)
    return state, metadata


class CheckpointManager:
    """Scheduled + best-metric checkpointing (reference train.py:883-961)."""

    def __init__(self, directory: str, run_name: str, save_every: int):
        self.directory = directory
        self.run_name = run_name
        self.save_every = max(1, save_every)
        self.best: Dict[str, float] = {
            "rollout_reward": -float("inf"),
            "episode_return": -float("inf"),
            "ssl_loss": float("inf"),
        }

    def restore_best(self, metadata: Dict[str, Any]) -> None:
        """Resume best-metric watermarks from a checkpoint sidecar so a
        restart does not overwrite the best-model files with the first
        mediocre metric (reference persists best metrics in the checkpoint,
        train.py:904-923)."""
        for k, v in (metadata.get("best_metrics") or {}).items():
            if k in self.best and v is not None:
                self.best[k] = float(v)

    def _path(self, suffix: str = "") -> str:
        return os.path.join(self.directory, self.run_name + suffix)

    def maybe_save(
        self,
        state: Any,
        global_update: int,
        metadata: "Dict[str, Any] | Callable[[], Dict[str, Any]]",
        mean_rollout_reward: Optional[float] = None,
        mean_episode_return: Optional[float] = None,
        ssl_loss: Optional[float] = None,
    ) -> Dict[str, str]:
        """Returns {kind: path} for every checkpoint written this call.

        ``metadata`` may be a zero-arg callable: it is only evaluated when
        this call actually writes a checkpoint, so callers on hot loops
        (the zero-host device-env path builds its episode bookkeeping with
        device_get + packbits) pay nothing on the skipped updates."""
        written: Dict[str, str] = {}
        # update watermarks first so every sidecar written this call carries
        # the post-update values (resume must not re-trigger best saves)
        new_best = []
        if (
            mean_rollout_reward is not None
            and mean_rollout_reward > self.best["rollout_reward"]
        ):
            self.best["rollout_reward"] = mean_rollout_reward
            new_best.append("rollout_reward")
        if (
            mean_episode_return is not None
            and mean_episode_return > self.best["episode_return"]
        ):
            self.best["episode_return"] = mean_episode_return
            new_best.append("episode_return")
        if ssl_loss is not None and ssl_loss < self.best["ssl_loss"]:
            self.best["ssl_loss"] = ssl_loss
            new_best.append("ssl_loss")

        will_write = (global_update % self.save_every == 0) or new_best
        if not will_write:
            return written
        metadata = dict(metadata() if callable(metadata) else metadata)
        metadata["best_metrics"] = {
            k: (v if np.isfinite(v) else None) for k, v in self.best.items()
        }
        if global_update % self.save_every == 0:
            written["scheduled"] = save_checkpoint(self._path(), state, metadata)
        for kind in new_best:
            written[kind] = save_checkpoint(
                self._path(BEST_SUFFIXES[kind]), state, metadata
            )
        return written
