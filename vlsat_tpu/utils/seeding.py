"""Process-level seeding (reference utils/util.py:3-9).

JAX itself is functional (explicit PRNG keys); this seeds NumPy/stdlib for
the host-side data pipeline.
"""

from __future__ import annotations

import random

import numpy as np


def set_random_seed(seed: int) -> None:
    np.random.seed(seed)
    random.seed(seed)
