"""ANOVA / Sobol tests (module untested in the reference; SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn

np.random.seed(9)


def test_anova_roundtrip():
    t = tn.rand([6, 6, 6], ranks_tt=3)
    a = tn.anova_decomposition(t)
    t2 = tn.undo_anova_decomposition(a)
    assert float(tn.relative_error(t, t2)) <= 1e-10


def test_sobol_additive():
    # Additive function: first-order indices must sum to 1
    Xs = tn.meshgrid([jnp.linspace(0, 1, 8)] * 3)
    t = Xs[0] + 2 * Xs[1] + 0.5 * Xs[2]
    x, y, z = tn.symbols(3)
    s = [float(tn.sobol(t, tn.only(sym))) for sym in (x, y, z)]
    # Variance of a*U is a^2 var(U): ratios 1 : 4 : 0.25
    total = 1 + 4 + 0.25
    assert abs(s[0] - 1 / total) < 1e-8
    assert abs(s[1] - 4 / total) < 1e-8
    assert abs(s[2] - 0.25 / total) < 1e-8
    assert abs(float(tn.mean_dimension(t)) - 1) < 1e-8
    dd = np.asarray(tn.dimension_distribution(t))
    assert abs(dd[0] - 1) < 1e-8


def test_sobol_interaction():
    # Pure product interaction: all variance in order 2
    Xs = tn.meshgrid([jnp.linspace(-1, 1, 9)] * 2)
    t = Xs[0] * Xs[1]
    dd = np.asarray(tn.dimension_distribution(t))
    assert abs(dd[1] - 1) < 1e-8
    assert abs(float(tn.mean_dimension(t)) - 2) < 1e-8


def test_truncate_anova():
    Xs = tn.meshgrid([jnp.linspace(0, 1, 8)] * 3)
    t = Xs[0] + 2 * Xs[1] + 0.5 * Xs[2] + (Xs[0] * Xs[1])
    x, y, z = tn.symbols(3)
    t1 = tn.truncate_anova(t, mask=tn.only(x), keepdim=True)
    # Only terms depending solely on x survive (plus no constant)
    gt = t.numpy()
    assert t1.shape == t.shape
