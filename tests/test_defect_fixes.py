"""Regression tests for latent defects found in the round-2 reviews —
most inherited verbatim from the reference and fixed here (the package's
contract is reference semantics WITH its latent defects fixed)."""

import jax
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn


def test_partial_uses_the_right_modes_span():
    """partial(t, [d]) with default bounds must use mode d's span, not
    mode 0's (reference indexed the all-modes default by dim position)."""
    x = np.zeros((5, 50))
    x += np.linspace(0, 1, 50)[None, :]  # f = y-coordinate
    t = tn.Tensor(x)
    # default bounds use mode 1's span [0, 50]; explicit bounds [0, 1] give
    # a 50x larger derivative — the step ratio must equal the span ratio
    d = tn.partial(t, 1)
    d2 = tn.partial(t, [1], bounds=[[0, 1]])
    ratio = d.numpy()[2, 10] / d2.numpy()[2, 10]
    assert np.isclose(ratio, 1.0 / 50.0, rtol=1e-10)
    # interior central differences of a linear function are constant
    vals = d.numpy()[:, 1:-1]
    assert np.allclose(vals, vals[0, 0], rtol=1e-8)


def test_gradient_scalar_dim():
    t = tn.rand([8, 12], ranks_tt=2, key=jax.random.key(0))
    g = tn.gradient(t, dim=1)
    assert isinstance(g, tn.Tensor)
    gl = tn.gradient(t, dim=[1])
    assert np.allclose(g.numpy(), gl[0].numpy())


def test_curl_rejects_non_3d():
    ts = [tn.rand([4] * 4, ranks_tt=2) for _ in range(3)]
    try:
        tn.curl(ts)
        assert False, "curl accepted 4D fields"
    except AssertionError:
        pass


def test_batch_broadcast_add_mul():
    """Batch broadcasting: repeat counts are per-mode, excluding the leading
    batch axis (reference shifted them by one)."""
    rng = np.random.default_rng(0)
    xa = rng.standard_normal((2, 3, 1))
    xb = rng.standard_normal((2, 3, 4))
    a = tn.Tensor(jnp.asarray(xa), batch=True)
    b = tn.Tensor(jnp.asarray(xb), batch=True)
    s = a + b
    assert np.allclose(s.numpy(), xa + xb)
    p = a * b
    assert np.allclose(p.numpy(), xa * xb)


def test_batch_repeat_new_trailing_mode():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 4))
    t = tn.Tensor(jnp.asarray(x), batch=True)
    r = t.repeat(1, 1, 5)
    assert np.allclose(r.numpy(), np.repeat(x[..., None], 5, axis=-1))


def test_convolve_valid_with_size1_mode():
    rng = np.random.default_rng(2)
    x1 = rng.standard_normal((6, 6))
    x2 = rng.standard_normal((1, 3))
    t1 = tn.Tensor(jnp.asarray(x1))
    t2 = tn.Tensor(jnp.asarray(x2))
    r = tn.convolve(t1, t2, mode="valid", eps=1e-10, verbose=False)
    from scipy.signal import convolve2d

    gt = convolve2d(x1, x2, mode="valid")
    assert r.numpy().shape == gt.shape
    assert np.linalg.norm(r.numpy() - gt) / np.linalg.norm(gt) <= 1e-6


def test_hadamard_sum_default_eps():
    ts = [tn.rand([5, 6, 7], ranks_tt=2, key=jax.random.key(k)) for k in range(2)]
    gt = float(np.sum(ts[0].numpy() * ts[1].numpy()))
    got = float(tn.hadamard_sum(ts, algorithm="eig"))
    assert abs(got - gt) <= 1e-8 * abs(gt)


def test_mean_scalar_dim_with_marginals():
    t = tn.rand([6, 8], ranks_tt=2, key=jax.random.key(3))
    m = jnp.asarray(np.random.default_rng(3).uniform(size=8))
    r = tn.mean(t, dim=1, marginals=[m])
    w = np.asarray(m) / np.asarray(m).sum()
    gt = (t.numpy() * w[None, :]).sum(axis=1)
    assert np.allclose(np.asarray(r.numpy()).ravel(), gt)


def test_batch_transpose_and_cat():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3, 4, 5))
    t = tn.Tensor(jnp.asarray(x), batch=True)
    tt = tn.transpose(t)
    assert np.allclose(tt.numpy(), np.transpose(x, (0, 3, 2, 1)))

    y = rng.standard_normal((2, 6, 4, 5))
    s = tn.Tensor(jnp.asarray(y), batch=True)
    c = tn.cat(t, s, dim=0)  # concatenate along MODE 0 (not the batch axis)
    assert np.allclose(c.numpy(), np.concatenate([x, y], axis=1))
