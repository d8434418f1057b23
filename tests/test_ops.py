"""Arithmetic / dot / stats oracle tests (reference tests/test_ops.py).

Each test seeds its OWN RandomState so shapes/ranks are identical across
runs and xdist workers — the persistent XLA compile cache then hits on
every re-run (module-level np.random state would depend on which tests a
worker happened to execute first).
"""

import numpy as np

import tntorch_tpu as tn
from util import random_format


def check(t1, t2):
    x1 = t1.numpy()
    x2 = t2.numpy()
    assert tn.relative_error(t1 + t2, x1 + x2) <= 1e-7
    assert tn.relative_error(t1 - t2, x1 - x2) <= 1e-7
    assert tn.relative_error(t1 * t2, x1 * x2) <= 1e-7
    assert tn.relative_error(-t1 + t2, -x1 + x2) <= 1e-7


def test_ops():
    rng = np.random.RandomState(10)
    for i in range(6):
        t1 = tn.rand(
            rng.randint(1, 8, rng.randint(1, 6)), ranks_tt=3, ranks_tucker=2
        )
        t2 = tn.rand(t1.shape)
        check(t1, t2)

    shape = [8] * 4
    t1 = tn.rand(shape, ranks_tt=[3, None, None], ranks_cp=[None, None, 2, 2], ranks_tucker=5)
    t2 = tn.rand(shape, ranks_tt=[None, 2, None], ranks_cp=[4, None, None, 3])
    check(t1, t2)

    t2 = t1 * 2
    check(t1, t2)

    for i in range(8):
        t1 = random_format(shape, rng=rng)
        t2 = random_format(shape, rng=rng)
        check(t1, t2)


def test_broadcast():
    rng = np.random.RandomState(11)
    for i in range(5):
        shape1 = rng.randint(1, 10, 4)
        shape2 = shape1.copy()
        shape2[rng.choice(len(shape1), rng.randint(0, len(shape1) + 1))] = 1
        t1 = random_format(shape1, rng=rng)
        t2 = random_format(shape2, rng=rng)
        check(t1, t2)


def test_dot():
    rng = np.random.RandomState(12)

    def check_dot(t1, t2):
        x1 = t1.numpy()
        x2 = t2.numpy()
        gt = np.dot(x1.flatten(), x2.flatten())
        assert tn.relative_error(tn.dot(t1, t2), gt) <= 1e-7

    t1 = tn.rand(rng.randint(1, 8, rng.randint(1, 6)), ranks_tt=2)
    check_dot(t1, tn.rand(t1.shape, ranks_tt=3))

    t1 = tn.rand(rng.randint(1, 8, rng.randint(1, 6)), ranks_tt=2, ranks_tucker=4)
    check_dot(t1, tn.rand(t1.shape, ranks_tt=3))

    t1 = tn.rand(rng.randint(1, 8, rng.randint(1, 6)), ranks_tt=2)
    check_dot(t1, tn.rand(t1.shape, ranks_tt=3, ranks_tucker=4))

    t1 = tn.rand(rng.randint(1, 8, rng.randint(1, 6)), ranks_tt=2, ranks_tucker=3)
    check_dot(t1, tn.rand(t1.shape, ranks_tt=3, ranks_tucker=4))

    t1 = tn.rand([32] * 4, ranks_tt=[3, None, None], ranks_cp=[None, None, 10, 10], ranks_tucker=5)
    t2 = tn.rand([32] * 4, ranks_tt=[None, 2, None], ranks_cp=[4, None, None, 5])
    check_dot(t1, t2)

    shape = [8] * 4
    for i in range(8):
        check_dot(random_format(shape, rng=rng), random_format(shape, rng=rng))


def test_dot_partial():
    t1 = tn.rand([5, 6], ranks_tt=2)
    t2 = tn.rand([5, 6, 3, 4], ranks_tt=3)
    r = tn.dot(t1, t2)
    gt = np.einsum("ab,abcd->cd", t1.numpy(), t2.numpy())
    assert np.linalg.norm(r.numpy() - gt) / np.linalg.norm(gt) <= 1e-7


def test_stats():
    rng = np.random.RandomState(13)
    shape = [8] * 4
    for i in range(8):
        t = random_format(shape, rng=rng)
        x = t.numpy()
        assert tn.relative_error(tn.mean(t), np.mean(x)) <= 1e-3
        assert tn.relative_error(tn.var(t), np.var(x)) <= 1e-3
        assert tn.relative_error(tn.norm(t), np.linalg.norm(x)) <= 1e-3


def test_full_unary_surface():
    """Every unary op in the family vs the numpy oracle on a domain where it
    is defined (cross-approximated, so tolerance is the cross eps class)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # values in (0.05, 0.95): inside the domain of acos/asin/erfinv/log/...
    x = rng.uniform(0.05, 0.95, (6, 6, 6))
    t = tn.Tensor(jnp.asarray(x), eps=1e-14)
    cases = {
        "abs": np.abs, "acos": np.arccos, "asin": np.arcsin,
        "atan": np.arctan, "cos": np.cos, "cosh": np.cosh,
        "exp": np.exp, "log": np.log, "log10": np.log10, "log2": np.log2,
        "reciprocal": lambda v: 1 / v, "rsqrt": lambda v: 1 / np.sqrt(v),
        "sigmoid": lambda v: 1 / (1 + np.exp(-v)), "sin": np.sin,
        "sinh": np.sinh, "sqrt": np.sqrt, "tan": np.tan, "tanh": np.tanh,
    }
    from scipy import special
    cases["erf"] = special.erf
    cases["erfinv"] = special.erfinv
    for name, oracle in cases.items():
        got = getattr(tn, name)(t, eps=1e-10)
        want = oracle(x)
        err = np.linalg.norm(got.numpy() - want) / np.linalg.norm(want)
        assert err < 1e-6, (name, err)


def test_full_binary_surface():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    x = rng.uniform(0.1, 0.9, (5, 5, 5))
    y = rng.uniform(0.1, 0.9, (5, 5, 5))
    a = tn.Tensor(jnp.asarray(x), eps=1e-14)
    b = tn.Tensor(jnp.asarray(y), eps=1e-14)
    for name, oracle in {
        "add": lambda u, v: u + v, "mul": lambda u, v: u * v,
        "div": lambda u, v: u / v, "atan2": np.arctan2,
        "pow": np.power,
    }.items():
        got = getattr(tn, name)(a, b)
        want = oracle(x, y)
        err = np.linalg.norm(got.numpy() - want) / np.linalg.norm(want)
        assert err < 1e-6, (name, err)


def test_unfoldings_and_maxvol_aliases():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 4, 5))
    t = tn.Tensor(jnp.asarray(x), eps=1e-14)
    c = t.cores[1]  # (r, 4, r')
    L = np.asarray(tn.left_unfolding(c))
    R = np.asarray(tn.right_unfolding(c))
    assert L.shape == (c.shape[0] * 4, c.shape[2])
    assert R.shape == (c.shape[0], 4 * c.shape[2])
    np.testing.assert_allclose(L, np.asarray(c).reshape(L.shape), rtol=1e-12)
    np.testing.assert_allclose(R, np.asarray(c).reshape(R.shape), rtol=1e-12)
    # py_maxvol / py_rect_maxvol: reference-named aliases
    A = rng.standard_normal((30, 5))
    rows, _ = tn.py_maxvol(A)
    assert len(set(int(r) for r in rows)) == 5
    rows_r, _ = tn.py_rect_maxvol(A, maxK=9)
    assert 5 <= len(rows_r) <= 9


def test_logic_presence_absence():
    N = 4
    p = tn.presence(N, [0, 2])
    ab = tn.absence(N, [1])
    # presence([0,2]): strings with x0=1 and x2=1 -> 2^(N-2) accepted
    assert abs(float(tn.sum(p)) - 2 ** (N - 2)) < 1e-8
    # absence([1]): x1=0 -> 2^(N-1)
    assert abs(float(tn.sum(ab)) - 2 ** (N - 1)) < 1e-8
    both = p & ab
    assert abs(float(tn.sum(both)) - 2 ** (N - 3)) < 1e-8
    assert bool(tn.is_satisfiable(both))
