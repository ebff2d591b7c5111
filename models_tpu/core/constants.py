"""Shared numeric constants (reference ``merlin/models/utils/constants.py``)."""

import numpy as np

# Sentinel logit for masked / false-negative / padded candidate scores.
# Reference parity (``utils/constants.py:19``): float16-min / 100 ≈ -655.04 —
# deep enough that exp(x - max) underflows to exactly 0 in any softmax, but
# finite and fp16-safe (a float32-min sentinel overflows half-precision math
# and poisons score-span computations).
MIN_FLOAT = float(np.finfo(np.float16).min) / 100.0

# Epsilon added to sampling probabilities before log in the logQ correction
# (reference ``tf/outputs/contrastive.py:317``).
LOGQ_EPS = 1e-16
