"""Observability: console + file logging, TensorBoard scalars, profiler hooks.

Mirror of the reference's ``Logger`` (utils.py:188-509): dual console/file
loggers, TensorBoard scalars with per-tag auto step counters, optional wandb
mirroring (gated — wandb is not installed in this image), and an
"N-iterations-then-exit" profiling mode. TensorBoard writing uses
``tensorboardX``; the profiler uses ``jax.profiler`` traces viewable in
TensorBoard/Perfetto (replacing torch.profiler/scalene, SURVEY.md §5).
"""

from __future__ import annotations

import logging
import os
import sys
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax


class Logger:
    def __init__(
        self,
        log_name: str = "eavit",
        log_dir: str = "logs",
        use_tensorboard: bool = True,
        use_wandb: bool = False,
        rank: int = 0,
        verbose: bool = False,
    ):
        self.log_name = log_name
        self.rank = rank
        self.verbose = verbose
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)

        self._logger = logging.getLogger(f"eavit.{log_name}.{rank}")
        self._logger.setLevel(logging.INFO)
        self._logger.handlers.clear()
        fmt = logging.Formatter("[%(asctime)s] %(message)s", "%H:%M:%S")
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        self._logger.addHandler(sh)
        fh = logging.FileHandler(
            os.path.join(log_dir, f"{log_name}_rank{rank}.log")
        )
        fh.setFormatter(fmt)
        self._logger.addHandler(fh)
        self._logger.propagate = False

        self.tb = None
        if use_tensorboard and rank == 0:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(os.path.join(log_dir, "tb", log_name))
            except Exception as e:  # pragma: no cover
                self.log(f"TensorBoard unavailable: {e}")

        self.wandb = None
        if use_wandb and rank == 0:
            try:  # pragma: no cover - wandb absent in this image
                import wandb

                self.wandb = wandb
                wandb.init(project="eavit_tpu", name=log_name)
            except Exception as e:
                self.log(f"wandb unavailable (continuing without): {e}")

        # per-tag auto step counters (reference utils.py:263-267)
        self.tb_global_steps: Dict[str, int] = defaultdict(int)

        # profiling state (reference utils.py:421-509)
        self._profile_remaining = 0
        self._profile_dir: Optional[str] = None

    # -- console/file -------------------------------------------------------
    def log(self, msg: str, only_rank_0: bool = False) -> None:
        if only_rank_0 and self.rank != 0:
            return
        self._logger.info(msg)

    log_msg_to_both_console_and_file = log  # reference method-name alias

    # -- scalars -------------------------------------------------------------
    def log_scalars(
        self, scalars: Dict[str, Any], step: Optional[int] = None
    ) -> None:
        for tag, value in scalars.items():
            v = float(value)
            if self.tb is not None:
                s = step if step is not None else self.tb_global_steps[tag]
                self.tb.add_scalar(tag, v, s)
                if step is None:
                    self.tb_global_steps[tag] += 1
            if self.wandb is not None:  # pragma: no cover
                self.wandb.log({f"wandb_{tag}": v}, step=step)

    def log_params_histograms(self, params: Any, prefix: str) -> None:
        """Gradient/parameter histogram dumps (reference utils.py:345-419),
        only under verbose logging."""
        if not self.verbose or self.tb is None:
            return
        import numpy as np

        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            name = prefix + "/" + "/".join(str(p) for p in path)
            self.tb.add_histogram(name, np.asarray(leaf), self.tb_global_steps[name])
            self.tb_global_steps[name] += 1

    # -- profiler (reference utils.py:421-509: trace N iterations, then exit)
    def start_profiling(self, num_updates: int, trace_dir: Optional[str] = None):
        self._profile_remaining = num_updates
        self._profile_dir = trace_dir or os.path.join(
            self.log_dir, "jax_trace", self.log_name
        )
        if num_updates > 0:
            jax.profiler.start_trace(self._profile_dir)
            self.log(f"jax.profiler tracing {num_updates} updates -> {self._profile_dir}")

    def step_profiler(self) -> bool:
        """Call once per update. Returns True when profiling just finished
        (caller should exit, matching the reference's profile-then-exit
        contract, utils.py:471-493)."""
        if self._profile_remaining <= 0:
            return False
        self._profile_remaining -= 1
        if self._profile_remaining == 0:
            jax.profiler.stop_trace()
            self.log(f"profiling finished; trace at {self._profile_dir}")
            return True
        return False

    def close(self) -> None:
        if self.tb is not None:
            self.tb.close()
