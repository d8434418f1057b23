"""Vector-calculus tests (module untested in the reference; SURVEY.md section 4)."""

import jax.numpy as jnp
import jax
import numpy as np

import tntorch_tpu as tn

np.random.seed(12)


def _central_diff(x, axis, step):
    pad = [(0, 0)] * x.ndim
    xp = np.concatenate([np.take(x, [0], axis), x, np.take(x, [-1], axis)], axis)
    # replicate reference boundary handling: linear extrapolation at ends
    first = np.take(xp, [0], axis) - (np.take(xp, [2], axis) - np.take(xp, [1], axis))
    last = np.take(xp, [-1], axis) + (np.take(xp, [-2], axis) - np.take(xp, [-3], axis))
    xp = np.concatenate([first, np.take(xp, range(1, xp.shape[axis] - 1), axis), last], axis)
    return (np.take(xp, range(2, xp.shape[axis]), axis) - np.take(xp, range(0, xp.shape[axis] - 2), axis)) / step


def test_partial_linear():
    # d/dx of a linear ramp is constant
    I = 16
    Xs = tn.meshgrid([jnp.arange(I, dtype=jnp.float64)] * 2)
    t = 3.0 * Xs[0] + 5.0 * Xs[1]
    bounds = [0, I + 1]
    step = (bounds[1] - bounds[0]) / (I + 1) * 2
    d = tn.partial(t, 0, bounds=bounds)
    gt = np.full((I, I), 3.0 * 2 / step)
    assert np.linalg.norm(d.numpy() - gt) / np.linalg.norm(gt) <= 1e-10


def test_partial_periodic():
    I = 16
    x = jnp.arange(I, dtype=jnp.float64)
    t = tn.Tensor(jnp.sin(2 * jnp.pi * x / I)[:, None] * jnp.ones(4)[None, :])
    d = tn.partial(t, 0, bounds=[0, I + 1], periodic=True)
    # periodic difference of sin is cos-like; just check finiteness and shape
    assert d.shape == t.shape
    assert np.isfinite(d.numpy()).all()


def test_gradient_divergence_curl_laplacian():
    t = tn.rand([8, 8, 8], ranks_tt=2)
    g = tn.gradient(t)
    assert len(g) == 3
    div = tn.divergence(g)
    assert div.shape == t.shape
    lap = tn.laplacian(t)
    assert lap.shape == t.shape
    c = tn.curl([t, t, t])
    assert len(c) == 3
    # curl of a gradient field is ~0
    cg = tn.curl(g)
    # (finite differences so not exactly 0, but small relative to field)
    for comp in cg:
        assert comp.shape == t.shape


def test_partialset():
    t = tn.rand([8, 8], ranks_tt=2)
    ps = tn.partialset(t, 1)
    assert np.isfinite(ps.numpy()).all()


def test_active_subspace_dgsm():
    Xs = tn.meshgrid([jnp.linspace(0, 1, 8)] * 3)
    t = Xs[0] + 2 * Xs[1]  # only x and y active
    w, v = tn.active_subspace(t, bounds=[[0, 1]] * 3)
    w = np.asarray(w)
    v = np.asarray(v)
    # Gradient of x + 2y is constant (1, 2, 0): Gram matrix has rank 1
    assert w[0] > 1e-6
    assert abs(w[1]) <= 1e-8 and abs(w[2]) <= 1e-8
    direction = np.abs(v[:, 0])
    gt = np.array([1.0, 2.0, 0.0]) / np.sqrt(5)
    assert np.linalg.norm(direction - gt) <= 1e-6
    nu = np.asarray(tn.dgsm(t, bounds=[[0, 1]] * 3, marginals=None))
    assert nu[2] <= 1e-10
    assert nu[1] > nu[0] > 0


def test_partial_negative_dim_batch():
    # Negative dims must normalize to modes, not read the batch size as a span
    t = tn.rand([2, 6, 7], ranks_tt=2, batch=True, key=jax.random.key(21))
    a = np.asarray(tn.partial(t, -1).numpy())
    b = np.asarray(tn.partial(t, 1).numpy())
    assert np.allclose(a, b)
    tn.gradient(t, dim=[-1])  # default bounds from the mode size, not B
