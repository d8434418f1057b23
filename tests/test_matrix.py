"""TT/CP matrix tests (reference tests/test_matrix.py + kron ops)."""

import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn

np.random.seed(10)


def test_ttmatrix_reconstruct():
    M = np.random.rand(6 * 4, 6 * 4)
    ttm = tn.TTMatrix(M, ranks=[24], input_dims=[6, 4], output_dims=[6, 4])
    assert np.linalg.norm(ttm.numpy() - M) / np.linalg.norm(M) <= 1e-10


def test_tt_multiply():
    M = np.random.rand(6 * 4, 5 * 3)
    ttm = tn.TTMatrix(M, ranks=[30], input_dims=[6, 4], output_dims=[5, 3])
    v = np.random.rand(7, 24)
    gt = v @ ttm.numpy()
    assert np.linalg.norm(np.asarray(tn.tt_multiply(ttm, jnp.asarray(v))) - gt) <= 1e-8


def test_trace_flatten():
    M = np.random.rand(6 * 4, 6 * 4)
    ttm = tn.TTMatrix(M, ranks=[24], input_dims=[6, 4], output_dims=[6, 4])
    assert abs(float(ttm.trace()) - np.trace(M)) <= 1e-8
    flat = ttm.flatten()
    assert flat.shape == (6 * 6, 4 * 4)


def test_cpmatrix():
    M = np.random.rand(6 * 4, 6 * 4)
    cpm = tn.CPMatrix(M, rank=30, input_dims=[6, 4], output_dims=[6, 4])
    assert np.linalg.norm(cpm.numpy() - M) / np.linalg.norm(M) <= 1e-8
    v = np.random.rand(3, 24)
    gt = v @ cpm.numpy()
    assert np.linalg.norm(np.asarray(tn.cp_multiply(cpm, jnp.asarray(v))) - gt) <= 1e-6


def test_kron_ops():
    A = np.random.rand(3, 3)
    A = A @ A.T + 3 * np.eye(3)
    B = np.random.rand(4, 4)
    B = B @ B.T + 4 * np.eye(4)
    K = np.kron(A, B)
    ttk = tn.TTMatrix(K, ranks=[1], input_dims=[3, 4], output_dims=[3, 4])
    assert abs(float(ttk.determinant()) - np.linalg.det(K)) <= 1e-6 * abs(np.linalg.det(K))
    s, ld = ttk.slog_determinant()
    gt_s, gt_ld = np.linalg.slogdet(K)
    assert abs(float(s) - gt_s) <= 1e-10
    assert abs(float(ld) - gt_ld) <= 1e-8
    assert np.linalg.norm(ttk.inv().numpy() - np.linalg.inv(K)) <= 1e-10
    L = ttk.cholesky().numpy()
    assert np.linalg.norm(L @ L.T - K) <= 1e-10


def test_matrix_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    M = rng.standard_normal((16, 16))
    tm = tn.TTMatrix(M, ranks=[16], input_dims=[4, 4], output_dims=[4, 4])
    p = str(tmp_path / "tm.npz")
    tn.save_matrix(tm, p)
    tm2 = tn.load_matrix(p)
    np.testing.assert_allclose(np.asarray(tm2.numpy()), np.asarray(tm.numpy()), rtol=1e-12)
    assert list(tm2.input_dims) == [4, 4] and list(tm2.output_dims) == [4, 4]

    cm = tn.CPMatrix(M, rank=8, input_dims=[4, 4], output_dims=[4, 4])
    p2 = str(tmp_path / "cm.npz")
    tn.save_matrix(cm, p2)
    cm2 = tn.load_matrix(p2)
    np.testing.assert_allclose(np.asarray(cm2.numpy()), np.asarray(cm.numpy()), rtol=1e-12)
    v = rng.standard_normal((2, 16))
    np.testing.assert_allclose(
        np.asarray(tn.cp_multiply(cm2, v)), np.asarray(tn.cp_multiply(cm, v)), rtol=1e-12
    )


def test_cholesky_rejects_non_spd_kron():
    # Odd number of negative-trace Kronecker blocks = non-SPD input: raise
    # instead of silently returning NaN factors (round-3 review)
    M = np.kron(-np.eye(2) * 2.0, np.eye(2))
    m = tn.TTMatrix(jnp.asarray(M), ranks=[1], input_dims=[2, 2], output_dims=[2, 2])
    try:
        m.cholesky()
        assert False, "expected ValueError"
    except ValueError as e:
        assert "SPD" in str(e)


def test_torch_bfloat16_input():
    import pytest

    torch = pytest.importorskip("torch")
    x = torch.randn(4, 4, 4, dtype=torch.bfloat16)
    t = tn.Tensor(x, ranks_tt=4)
    assert np.isfinite(np.asarray(t.numpy())).all()
