"""Precision-policy test matrix (SURVEY.md hard part #5): lower-precision
rounding modes vs the f64 oracle, with stated tolerances.

Expected per-contraction relative error by mode (see tn.utils.set_policy):
highest ~ input dtype eps | high ~ 1e-6 | default ~ 1e-3 (TPU; exact f32 on
CPU) | bf16 ~ 1e-2. Eps-driven rank decisions below ~10x these levels are
noise in the corresponding mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tntorch_tpu as tn
from tntorch_tpu.ops.rounding import round_tt_gram, tt_full

np.random.seed(11)


def _make_cores(dtype):
    N, I, R = 4, 16, 12
    ranks = [1] + [R] * (N - 1) + [1]
    rng = np.random.default_rng(2)
    return tuple(
        jnp.asarray(rng.standard_normal((ranks[n], I, ranks[n + 1])) / np.sqrt(R), dtype=dtype)
        for n in range(N)
    )


# (precision, input dtype, tolerance vs the f64 oracle)
MATRIX = [
    ("highest", jnp.float64, 1e-12),
    ("highest", jnp.float32, 1e-5),
    ("high", jnp.float32, 1e-5),
    ("default", jnp.float32, 1e-2),  # TPU single-pass bf16; exact f32 on CPU
    ("bf16", jnp.float32, 5e-2),
]


@pytest.mark.parametrize("precision,dtype,tol", MATRIX)
def test_round_tt_gram_precision_matrix(precision, dtype, tol):
    rmax = 6
    oracle = np.asarray(
        tt_full(tuple(round_tt_gram(_make_cores(jnp.float64), rmax, precision="highest")))
    )
    out = np.asarray(
        tt_full(tuple(round_tt_gram(_make_cores(dtype), rmax, precision=precision)))
    )
    rel = np.linalg.norm(out - oracle) / np.linalg.norm(oracle)
    assert rel <= tol, f"{precision}/{dtype}: rel={rel} > {tol}"


def test_policy_plumbing():
    assert tn.utils.get_policy() == "highest"
    tn.utils.set_policy("bf16")
    try:
        assert tn.utils.resolve_precision(None) == "bf16"
        assert tn.utils.resolve_precision("high") == "high"
        cores = _make_cores(jnp.float32)
        out = round_tt_gram(cores, 6)  # routes through the bf16 kernel
        assert out[0].dtype == jnp.float32  # cast back to the input dtype
    finally:
        tn.utils.set_policy("highest")
    with pytest.raises(ValueError):
        tn.utils.set_policy("fp8")
