"""Test helpers: random hybrid-format tensor generator.

Mirrors the reference format-fuzzing oracle (/root/reference/tests/util.py:5-38):
random per-mode mixes of TT / CP / Tucker ranks.
"""

import numpy as np

import tntorch_tpu as tn


def random_format(shape, rng=None):
    rng = rng or np.random
    N = len(shape)
    if rng.randint(4) == 0:
        ranks_tucker = None
    else:
        ranks_tucker = [None] * N
        for n in sorted(rng.choice(N, rng.randint(N + 1), replace=False)):
            ranks_tucker[n] = rng.randint(1, 5)
    if rng.randint(4) == 0:
        ranks_tt = None
        ranks_cp = rng.randint(1, 5)
    elif rng.randint(4) == 0:
        ranks_cp = None
        ranks_tt = rng.randint(1, 5, N - 1)
    else:
        ranks_tt = list(rng.randint(1, 5, N - 1))
        ranks_cp = [None] * N
        for n in sorted(rng.choice(N, rng.randint(N + 1), replace=False)):
            if n > 0 and ranks_cp[n - 1] is not None:
                r = ranks_cp[n - 1]
            else:
                r = rng.randint(1, 5)
            ranks_cp[n] = r
            if n > 0:
                ranks_tt[n - 1] = None
            if n < N - 1:
                ranks_tt[n] = None
    return tn.randn(shape, ranks_tt=ranks_tt, ranks_cp=ranks_cp, ranks_tucker=ranks_tucker)
