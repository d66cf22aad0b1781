"""Vectorized environment pools.

Replaces the reference's one-OS-process-per-env Pipe fleet
(dist_utils.py:84-117, envs.py:305-343): a thread pool of persistent workers
(gym envs release the GIL in their C cores) or a synchronous in-process loop,
both with auto-reset (the reference worker resets and sends the fresh state
in the same step, envs.py:333) and per-env seeding
``seed + rank * num_env + idx`` (dist_utils.py:108-109).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np


class SyncVectorEnv:
    """Minimal synchronous pool over gymnasium-style envs."""

    def __init__(self, env_fns: List[Callable[[], Any]]):
        self.envs = [fn() for fn in env_fns]
        self.num_envs = len(self.envs)
        space = self.envs[0].action_space
        self.action_space_n = getattr(space, "n", None)

    def reset(self) -> np.ndarray:
        return np.stack([e.reset()[0] for e in self.envs])

    def step(self, actions: np.ndarray):
        states, rewards, dones, truns, infos = [], [], [], [], []
        for env, a in zip(self.envs, actions):
            s, r, d, t, info = env.step(a)
            if d or t:
                s, _ = env.reset()
            states.append(s)
            rewards.append(r)
            dones.append(d)
            truns.append(t)
            infos.append(info)
        return (
            np.stack(states),
            np.asarray(rewards, np.float32),
            np.asarray(dones, np.bool_),
            np.asarray(truns, np.bool_),
            infos,
        )

    def close(self) -> None:
        for e in self.envs:
            if hasattr(e, "close"):
                e.close()


class ThreadVectorEnv:
    """Persistent worker threads, one env each; all envs step concurrently.

    The host-side analogue of the reference's env-worker processes without
    pickling frames over pipes — workers write straight into shared output
    arrays.
    """

    def __init__(self, env_fns: List[Callable[[], Any]]):
        self.num_envs = len(env_fns)
        self._in: List[queue.Queue] = [queue.Queue(1) for _ in env_fns]
        self._done = queue.Queue()
        self._threads = []
        self._results: List[Any] = [None] * self.num_envs
        self._states: Optional[np.ndarray] = None
        self._ready = threading.Barrier(self.num_envs + 1)
        self.action_space_n: Optional[int] = None

        def worker(idx: int, fn: Callable[[], Any]):
            env = fn()
            if idx == 0:
                self.action_space_n = getattr(env.action_space, "n", None)
            s, _ = env.reset()
            self._results[idx] = (s, 0.0, False, False, {})
            self._ready.wait()
            while True:
                action = self._in[idx].get()
                if action is None:
                    if hasattr(env, "close"):
                        env.close()
                    return
                s, r, d, t, info = env.step(action)
                if d or t:
                    s, _ = env.reset()
                self._results[idx] = (s, r, d, t, info)
                self._done.put(idx)

        for i, fn in enumerate(env_fns):
            th = threading.Thread(target=worker, args=(i, fn), daemon=True)
            th.start()
            self._threads.append(th)
        self._ready.wait()

    def reset(self) -> np.ndarray:
        # workers reset at startup; subsequent resets are automatic
        return np.stack([r[0] for r in self._results])

    def step(self, actions: np.ndarray):
        for q, a in zip(self._in, actions):
            q.put(a)
        for _ in range(self.num_envs):
            self._done.get()
        states = np.stack([r[0] for r in self._results])
        rewards = np.asarray([r[1] for r in self._results], np.float32)
        dones = np.asarray([r[2] for r in self._results], np.bool_)
        truns = np.asarray([r[3] for r in self._results], np.bool_)
        infos = [r[4] for r in self._results]
        return states, rewards, dones, truns, infos

    def close(self) -> None:
        for q in self._in:
            q.put(None)
