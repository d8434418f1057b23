"""Array-tool tests (reference tests/test_tools.py + extras for untested tools)."""

import jax
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn
from util import random_format

np.random.seed(6)


def test_unfolding():
    t = jnp.asarray(np.random.rand(30, 10, 20, 10))
    assert np.allclose(
        tn.unfolding(t, 2, batch=False), np.transpose(t, (2, 0, 1, 3)).reshape(20, -1)
    )
    assert np.allclose(
        tn.unfolding(t, 2, batch=True), np.transpose(t, (0, 3, 1, 2)).reshape(30, 10, -1)
    )


def test_cat():
    rng = np.random.RandomState(37)
    for i in range(8):
        N = rng.randint(1, 4)
        shape1 = rng.randint(1, 10, N)
        mode = rng.randint(N)
        shape2 = shape1.copy()
        shape2[mode] = rng.randint(1, 10)
        t1 = tn.rand(shape1, ranks_tt=2, ranks_tucker=2)
        t2 = tn.rand(shape2, ranks_tt=2)
        gt = np.concatenate([t1.numpy(), t2.numpy()], mode)
        assert np.linalg.norm(gt - tn.cat([t1, t2], dim=mode).numpy()) <= 1e-7


def test_transpose_flip_unbind():
    t = random_format([4, 5, 6], rng=np.random.RandomState(34))
    x = t.numpy()
    assert np.linalg.norm(tn.transpose(t).numpy() - x.transpose(2, 1, 0)) <= 1e-9
    assert np.linalg.norm(tn.flip(t, [0, 2]).numpy() - x[::-1, :, ::-1]) <= 1e-9
    parts = tn.unbind(t, 1)
    for i, p in enumerate(parts):
        assert np.linalg.norm(p.numpy() - x[:, i, :]) <= 1e-9


def test_ttm():
    t = random_format([4, 5, 6], rng=np.random.RandomState(35))
    x = t.numpy()
    U = np.random.rand(3, 5)
    r = tn.ttm(t, jnp.asarray(U), dim=1)
    gt = np.einsum("ab,ibj->iaj", U, x)
    assert np.linalg.norm(r.numpy() - gt) <= 1e-8


def test_meshgrid():
    Xs = tn.meshgrid(3, 4, 5)
    gts = np.meshgrid(np.arange(3), np.arange(4), np.arange(5), indexing="ij")
    for X, gt in zip(Xs, gts):
        assert np.allclose(X.numpy(), gt)


def test_pad():
    t = random_format([4, 5, 6], rng=np.random.RandomState(36))
    x = t.numpy()
    r = tn.pad(t, 8, dim=1)
    gt = np.zeros((4, 8, 6))
    gt[:, :5, :] = x
    assert np.linalg.norm(r.numpy() - gt) <= 1e-9


def test_reduce():
    import operator

    ts = [tn.rand([4, 5], ranks_tt=2) for _ in range(9)]
    r = tn.reduce(ts, operator.add, eps=1e-12)
    gt = sum(t.numpy() for t in ts)
    assert np.linalg.norm(r.numpy() - gt) / np.linalg.norm(gt) <= 1e-8


def test_sample():
    t = tn.rand([5, 6, 7], ranks_tt=2)
    Xs = tn.sample(t, P=10, seed=0)
    assert Xs.shape == (10, 3)
    assert (np.asarray(Xs) >= 0).all()
    assert (np.asarray(Xs) < np.array([5, 6, 7])).all()


def test_sample_distribution():
    # On-device sampler reproduces a known product PMF
    probs = np.array([0.1, 0.6, 0.3])
    t = tn.Tensor(np.outer(probs, probs).reshape(3, 3))
    Xs = np.asarray(tn.sample(t, P=20000, seed=0))
    for col in range(2):
        emp = np.bincount(Xs[:, col], minlength=3) / 20000
        assert np.abs(emp - probs).max() < 0.02


def test_hash():
    t = tn.rand([5, 6, 7], ranks_tt=2)
    h1 = tn.hash(t)
    t2 = t.clone()
    t2.round_tt(1e-14)  # different representation, same tensor
    h2 = tn.hash(t2)
    assert abs(float(h1) - float(h2)) <= 1e-8


def test_generate_basis():
    for name in ("dct", "legendre", "chebyshev", "hermite", "identity"):
        U = tn.generate_basis(name, (8, 5))
        assert U.shape == (8, 5)


def test_shift_mode():
    t = tn.rand([4, 5, 6], ranks_tt=2)
    x = t.numpy()
    tn.shift_mode(t, 0, 1, eps=1e-12)
    assert np.linalg.norm(t.numpy() - x.transpose(1, 0, 2)) <= 1e-8


def test_mask():
    t = tn.rand([4, 4], ranks_tt=2)
    m = tn.zeros(4, 4)
    m[1, 2] = 1.0
    r = tn.mask(t, m)
    gt = np.zeros((4, 4))
    gt[1, 2] = t.numpy()[1, 2]
    assert np.linalg.norm(r.numpy() - gt) <= 1e-8


def test_convolve():
    from scipy.signal import convolve as spconv

    a = tn.rand([8, 9], ranks_tt=2)
    b = tn.rand([4, 5], ranks_tt=2)
    for mode in ("full", "same", "valid"):
        c = tn.convolve(a, b, mode=mode, eps=1e-9, verbose=False)
        gt = spconv(a.numpy(), b.numpy(), mode=mode)
        assert c.shape == gt.shape
        assert np.linalg.norm(c.numpy() - gt) / np.linalg.norm(gt) <= 1e-6, mode


def test_shift_mode_kernel_matches_eager():
    """VERDICT r2 #9: the one-program masked shift_mode matches the eager
    per-swap loop (ranks and values) for both eps budgets and 'same'."""
    rng = np.random.RandomState(17)
    x = rng.standard_normal((5, 6, 7, 8))

    def eager_shift(t, n, shift, eps):
        t.orthogonalize(n)
        cores = t.cores
        sign = int(np.sign(shift))
        for i in range(n, n + shift, sign):
            c1, c2, lo = (i, i + 1, True) if sign == 1 else (i - 1, i, False)
            R1, _, R2 = cores[c1].shape
            R3 = cores[c2].shape[2]
            sc = jnp.einsum("iaj,jbk->ibak", cores[c1], cores[c2])
            sc = sc.reshape(sc.shape[0] * sc.shape[1], -1)
            if eps == "same":
                left, right = tn.truncated_svd(sc, eps=0, rmax=R2, left_ortho=lo)
            else:
                left, right = tn.truncated_svd(
                    sc, eps=eps / np.sqrt(np.abs(shift)), left_ortho=lo
                )
            cores[c1] = left.reshape(R1, cores[c2].shape[1], left.shape[1])
            cores[c2] = right.reshape(left.shape[1], -1, R3)
        return t

    for n, shift, eps in [(0, 3, 1e-10), (1, 2, "same"), (3, -2, 1e-3), (2, -2, "same")]:
        t1 = tn.Tensor(jnp.asarray(x), ranks_tt=6)
        t2 = tn.Tensor(jnp.asarray(x), ranks_tt=6)
        tn.shift_mode(t1, n, shift, eps=eps)
        eager_shift(t2, n, shift, eps)
        assert list(t1.ranks_tt) == list(t2.ranks_tt)
        a, b = np.asarray(t1.numpy()), np.asarray(t2.numpy())
        assert np.linalg.norm(a - b) <= 1e-10 * np.linalg.norm(b)


def test_tools_batch_modes():
    # Regression: tools functions index MODES, not t.shape positions — on
    # batch tensors the leading batch slot must not shift/consume mode dims
    import jax

    t = tn.rand([3, 4, 5], ranks_tt=2, batch=True, key=jax.random.key(0))
    dense = np.asarray(t.numpy())  # (B=3, 4, 5)

    # flip
    assert np.allclose(np.asarray(tn.flip(t, 0).numpy()), dense[:, ::-1, :])
    assert np.allclose(np.asarray(tn.flip(t, [0, 1]).numpy()), dense[:, ::-1, ::-1])

    # unbind along mode 0 -> 4 batch slices of shape (3, 5)
    parts = tn.unbind(t, 0)
    assert len(parts) == 4
    assert np.allclose(np.asarray(parts[2].numpy()), dense[:, 2, :])

    # cat with a negative dim
    c = tn.cat(t, t, dim=-1)
    assert np.allclose(np.asarray(c.numpy()), np.concatenate([dense, dense], axis=2))

    # pad a batch TT core
    p = tn.pad(t, 9, dim=1)
    out = np.asarray(p.numpy())
    assert out.shape == (3, 4, 9)
    assert np.allclose(out[:, :, :5], dense) and np.allclose(out[:, :, 5:], 0)

    # hash: per-sample fingerprints equal the non-batch hashes
    h = np.asarray(tn.hash(t))
    assert h.shape == (3,)
    h0 = float(tn.hash(tn.Tensor([c[0] for c in t.cores])))
    assert abs(h[0] - h0) <= 1e-10

    # squeeze never drops the batch axis (B=1 included)
    tb1 = tn.rand([1, 4, 1, 5], ranks_tt=2, batch=True, key=jax.random.key(1))
    s = tn.squeeze(tb1)
    assert s.batch and np.asarray(s.numpy()).shape == (1, 4, 5)


def test_shift_mode_bad_eps_raises():
    t = tn.rand([4, 4, 4], ranks_tt=3)
    try:
        tn.shift_mode(t, 0, 1, eps="bogus")
        assert False, "expected ValueError"
    except ValueError as e:
        assert "not recognized" in str(e)


def test_shift_mode_batch():
    """Batch tensors take the eager swap path with ellipsis einsums and
    batched truncated_svd (the 3-D einsum crashed on 4-D batch cores)."""
    t = tn.randn([3, 4, 5, 6], ranks_tt=3, batch=True, key=jax.random.key(1))
    full0 = np.asarray(t.full())

    # Tight numeric eps: matches the dense moveaxis oracle
    s = tn.shift_mode(t.clone(), 0, 2, eps=1e-12)
    assert s.batch
    assert np.abs(np.asarray(s.full()) - np.moveaxis(full0, 1, 3)).max() < 1e-5

    # Backward shift
    s2 = tn.shift_mode(t.clone(), 2, -2, eps=1e-12)
    assert np.abs(np.asarray(s2.full()) - np.moveaxis(full0, 3, 1)).max() < 1e-5

    # eps='same' (lossy fixed-rank) matches a per-sample non-batch loop
    sb = tn.shift_mode(t.clone(), 0, 1, eps="same")
    outs = []
    for b in range(3):
        tb = tn.Tensor([np.asarray(c)[b] for c in t.cores])
        outs.append(np.asarray(tn.shift_mode(tb, 0, 1, eps="same").full()))
    assert np.abs(np.asarray(sb.full()) - np.stack(outs)).max() < 1e-5


def test_truncated_svd_batch_eps():
    """Batch truncated_svd honors per-sample relative eps budgets (shared
    rank = max per-sample need); previously batch ignored eps entirely."""
    rng = np.random.default_rng(0)
    M = jnp.asarray(
        np.stack(
            [
                rng.standard_normal((12, 2)) @ rng.standard_normal((2, 10))
                for _ in range(4)
            ]
        )
    )
    L, R = tn.truncated_svd(M, eps=1e-6, batch=True)
    assert L.shape[-1] == 2
    assert np.abs(np.asarray(L @ R) - np.asarray(M)).max() < 1e-4
