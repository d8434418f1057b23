"""Extra accessor / tool coverage: mask-Tensor indexing, ttm transpose,
partial Tucker decompression, bounded-rank reduce-cat, ==/!=."""

import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn

np.random.seed(15)


def test_mask_tensor_accessor():
    t = tn.rand([2] * 4, ranks_tt=2)
    x, y, z, w = tn.symbols(4)
    m = tn.only(x & ~y & z & ~w)  # accepts exactly the string (1, 0, 1, 0)
    assert abs(float(tn.sum(m)) - 1) < 1e-10
    sub = t[m]
    val = float(np.squeeze(sub.numpy() if isinstance(sub, tn.Tensor) else np.asarray(sub)))
    assert abs(val - t.numpy()[1, 0, 1, 0]) <= 1e-10


def test_ttm_transpose_and_vector():
    a = tn.rand([4, 5], ranks_tt=2)
    U = jnp.asarray(np.random.rand(5, 3))
    r = tn.ttm(a, U, dim=1, transpose=True)
    gt = np.einsum("ib,ba->ia", a.numpy(), np.asarray(U))
    assert np.linalg.norm(r.numpy() - gt) <= 1e-10
    v = jnp.asarray(np.random.rand(4))
    r2 = tn.ttm(a, v, dim=0)
    gt2 = np.einsum("i,ij->j", np.asarray(v), a.numpy())
    assert np.linalg.norm(r2.numpy().squeeze() - gt2) <= 1e-10


def test_partial_tucker_decompress():
    tt = tn.rand([4, 5, 6], ranks_tt=2, ranks_tucker=2)
    d = tt.decompress_tucker_factors(dim=[1])
    assert d.Us[0] is not None and d.Us[1] is None and d.Us[2] is not None
    assert np.linalg.norm(d.numpy() - tt.numpy()) <= 1e-12


def test_reduce_cat_bounded_rank():
    ts = [tn.rand([3, 4], ranks_tt=2) for _ in range(4)]
    r = tn.reduce(ts, tn.cat, rmax=6, dim=0)
    gt = np.concatenate([t.numpy() for t in ts], axis=0)
    assert r.shape == gt.shape
    assert np.linalg.norm(r.numpy() - gt) / np.linalg.norm(gt) <= 1e-10


def test_eq_ne():
    ts = [tn.rand([3, 4], ranks_tt=2) for _ in range(2)]
    assert ts[0] == ts[0].clone()
    assert ts[0] != ts[1]
