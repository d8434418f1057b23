"""Small API-parity items from the reference (VERDICT round-1 item 8):
device= on core-list construction, maxvol top_k_index, complex dtypes
through decomposition/dot/full."""

import jax
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn

np.random.seed(5)


def test_device_kwarg_core_list():
    dev = jax.devices()[0]
    cores = [np.random.rand(1, 4, 3), np.random.rand(3, 5, 1)]
    t = tn.Tensor(cores, device=dev)
    for c in t.cores:
        assert c.devices() == {dev}


def test_maxvol_top_k_index():
    # Pivots must come only from the first top rows (reference maxvol.py:114)
    A = np.random.rand(40, 5)
    top = 12
    idx, C = tn.maxvol(A, top_k_index=top)
    assert (idx < top).all()
    assert len(idx) == 5
    # Coefficient matrix still interpolates: C @ A[idx] == A
    assert np.allclose(C @ A[idx], A, atol=1e-10)


def test_rect_maxvol_top_k_index():
    A = np.random.rand(60, 4)
    top = 15
    idx, C = tn.rect_maxvol(A, maxK=10, top_k_index=top)
    assert (idx < top).all()
    assert len(idx) >= 4
    assert np.allclose(C @ A[idx], A, atol=1e-8)


def _rand_complex(shape):
    return np.random.rand(*shape) + 1j * np.random.rand(*shape)


def test_complex_full_rank_roundtrip():
    x = _rand_complex((4, 5, 6))
    t = tn.Tensor(jnp.asarray(x))
    assert np.allclose(np.asarray(t.numpy()), x, atol=1e-12)


def test_complex_round_tt():
    # Build a complex TT with redundant rank; round must recover the value
    cores = [
        jnp.asarray(_rand_complex((1, 4, 3))),
        jnp.asarray(_rand_complex((3, 5, 3))),
        jnp.asarray(_rand_complex((3, 4, 1))),
    ]
    t = tn.Tensor([c for c in cores])
    t2 = t + t  # rank doubles
    t2.round_tt(eps=1e-12)
    assert max(t2.ranks_tt) <= 2 * max(t.ranks_tt)
    assert np.allclose(np.asarray(t2.numpy()), 2 * np.asarray(t.numpy()), atol=1e-10)
    # eps-driven decomposition of a complex dense tensor
    x = np.asarray(t.numpy())
    t3 = tn.Tensor(jnp.asarray(x), eps=1e-10)
    assert np.allclose(np.asarray(t3.numpy()), x, atol=1e-8)


def test_complex_dot_norm():
    cores = [
        jnp.asarray(_rand_complex((1, 3, 2))),
        jnp.asarray(_rand_complex((2, 3, 1))),
    ]
    t = tn.Tensor([c for c in cores])
    x = np.asarray(t.numpy())
    # dot is the unconjugated bilinear form, like the reference's einsum
    # chain (metrics.py:93-98); norm/normsq/dist ARE conjugated (true norms)
    d = complex(tn.dot(t, t))
    assert np.allclose(d, np.sum(x * x), atol=1e-10)
    assert np.allclose(complex(tn.normsq(t)), np.vdot(x, x), atol=1e-10)
    assert np.allclose(float(tn.norm(t)), np.linalg.norm(x), atol=1e-10)
    t2 = t * (1 + 0.5j)
    assert np.allclose(
        float(tn.dist(t, t2)), np.linalg.norm(x - (1 + 0.5j) * x), atol=1e-10
    )
    assert float(tn.relative_error(t, t2)) < 1.2
