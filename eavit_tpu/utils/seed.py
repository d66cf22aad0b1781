"""Deterministic seeding of host-side RNGs (reference utils.py:173-184
`set_seed`: python random, numpy, torch, cudnn.deterministic).

Device-side randomness in this framework is already explicit (jax PRNG keys
threaded everywhere), so only the host generators need seeding: python
`random` and numpy (used by env pools and data shuffling oracles).
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
