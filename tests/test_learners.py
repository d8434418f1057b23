"""Encapsulated TT learners (the reference's TODO.md "Regressor()/Classifier()"
item; workflow from reference docs/tutorials/classification.ipynb)."""

import jax
import numpy as np
import pytest

import tntorch_tpu as tn


def _reg_data(P=300, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, (P, 2))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2
    return X, y


def test_regressor_fits_smooth_function():
    X, y = _reg_data()
    Xt, yt = _reg_data(P=150, seed=1)
    reg = tn.TTRegressor(
        nticks=64, ranks_tt=6, ranks_tucker=8, max_iter=3500, tol=1e-10,
        verbose=False, key=jax.random.key(1),
    )
    out = reg.fit(X, y)
    assert out is reg  # sklearn-style chaining
    assert reg.score(X, y) > 0.95
    assert reg.score(Xt, yt) > 0.88
    pred = np.asarray(reg.predict(Xt[:7]))
    assert pred.shape == (7,)
    # losses_ monotone-ish: final loss way below initial
    assert float(reg.losses_[-1]) < 0.1 * float(reg.losses_[0])


def test_regressor_explicit_domain():
    X, y = _reg_data(P=200)
    dom = [np.linspace(-1, 1, 32)] * 2
    reg = tn.TTRegressor(
        domain=dom, ranks_tt=5, ranks_tucker=8, max_iter=2500, tol=1e-10,
        verbose=False, key=jax.random.key(2),
    )
    reg.fit(X, y)
    assert list(reg.tensor_.shape) == [32, 32]
    assert reg.score(X, y) > 0.85


def test_classifier_blobs():
    rng = np.random.default_rng(3)
    X = np.concatenate([rng.normal(-1, 0.4, (120, 2)), rng.normal(1, 0.4, (120, 2))])
    y = np.array(["neg"] * 120 + ["pos"] * 120)
    clf = tn.TTClassifier(
        nticks=32, ranks_tt=4, ranks_tucker=6, max_iter=600,
        verbose=False, key=jax.random.key(3),
    )
    clf.fit(X, y)
    assert list(clf.classes_) == ["neg", "pos"]
    assert clf.score(X, y) > 0.95
    proba = np.asarray(clf.predict_proba(X[:9]))
    assert proba.shape == (9, 2)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, rtol=1e-6)
    assert set(clf.predict(X[:9])) <= {"neg", "pos"}


def test_classifier_three_classes():
    rng = np.random.default_rng(4)
    centers = [(-1.5, 0), (1.5, 0), (0, 1.8)]
    X = np.concatenate([rng.normal(c, 0.3, (80, 2)) for c in centers])
    y = np.repeat([0, 1, 2], 80)
    clf = tn.TTClassifier(
        nticks=32, ranks_tt=4, max_iter=600, verbose=False, key=jax.random.key(4)
    )
    clf.fit(X, y)
    assert clf.predict_proba(X).shape == (240, 3)
    assert clf.score(X, y) > 0.9


def test_regressor_ensemble_bagging():
    X, y = _reg_data(P=250)
    Xt, yt = _reg_data(P=120, seed=2)
    reg = tn.TTRegressor(
        nticks=64, ranks_tt=5, max_iter=3000, tol=1e-10,
        n_estimators=4, verbose=False, key=jax.random.key(5),
    )
    reg.fit(X, y)
    assert reg.tensor_.batch and reg.tensor_.shape[0] == 4
    assert reg.score(Xt, yt) > 0.8
    assert np.asarray(reg.predict(Xt[:6])).shape == (6,)


def test_regressor_ensemble_no_bootstrap_members_differ_only_by_init():
    """bootstrap=False: members see identical data; outputs differ only via
    random init, so the averaged prediction tracks a single fit closely."""
    X, y = _reg_data(P=150)
    reg = tn.TTRegressor(
        nticks=32, ranks_tt=4, max_iter=1500, tol=1e-10,
        n_estimators=2, bootstrap=False, verbose=False, key=jax.random.key(6),
    )
    reg.fit(X, y)
    assert reg.score(X, y) > 0.8


def test_classifier_ensemble():
    rng = np.random.default_rng(7)
    X = np.concatenate([rng.normal(-1, 0.4, (100, 2)), rng.normal(1, 0.4, (100, 2))])
    y = np.array([0] * 100 + [1] * 100)
    clf = tn.TTClassifier(
        nticks=32, ranks_tt=4, max_iter=500, n_estimators=3,
        verbose=False, key=jax.random.key(7),
    )
    clf.fit(X, y)
    proba = np.asarray(clf.predict_proba(X[:11]))
    assert proba.shape == (11, 2)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, rtol=1e-6)
    assert clf.score(X, y) > 0.9


def test_batch_gather_matches_single_getitem():
    """_batch_gather's einsum chain vs the Tensor.__getitem__ oracle, member
    by member, on a TT-Tucker batch tensor with a free trailing mode."""
    import jax.numpy as jnp
    from tntorch_tpu.models.learners import _batch_gather

    B, P = 3, 17
    t = tn.rand([B, 8, 9, 4], ranks_tt=3, ranks_tucker=4, batch=True,
                key=jax.random.key(8))
    t.set_factors("dct", dim=range(2))
    idx = np.random.default_rng(8).integers(0, [8, 9], (P, 2))
    out = np.asarray(_batch_gather(t, jnp.asarray(idx)))  # (B, P, 4)
    assert out.shape == (B, P, 4)
    for b in range(B):
        single = tn.Tensor(
            [c[b] for c in t.cores],
            Us=[None if U is None else U[b] for U in t.Us],
        )
        oracle = np.asarray(single[jnp.asarray(idx)].full())
        np.testing.assert_allclose(out[b], oracle, rtol=1e-9, atol=1e-12)
    # All-modes-indexed variant returns (B, P)
    idx3 = np.random.default_rng(9).integers(0, [8, 9, 4], (P, 3))
    out3 = np.asarray(_batch_gather(t, jnp.asarray(idx3)))
    assert out3.shape == (B, P)
    for b in range(B):
        single = tn.Tensor(
            [c[b] for c in t.cores],
            Us=[None if U is None else U[b] for U in t.Us],
        )
        oracle = np.asarray(single[jnp.asarray(idx3)].full())
        np.testing.assert_allclose(out3[b], oracle, rtol=1e-9, atol=1e-12)


def test_learner_errors():
    X, y = _reg_data(P=50)
    reg = tn.TTRegressor(max_iter=10, verbose=False)
    with pytest.raises(ValueError, match="fit must be called"):
        reg.predict(X)
    with pytest.raises(ValueError, match="rows"):
        reg.fit(X, y[:-1])
    with pytest.raises(ValueError, match="\\(P, N\\)"):
        reg.fit(X.ravel(), y)
    clf = tn.TTClassifier(max_iter=10, verbose=False)
    with pytest.raises(ValueError, match="2 classes"):
        clf.fit(X, np.zeros(len(X)))
    with pytest.raises(ValueError, match="axes"):
        tn.TTRegressor(domain=[np.linspace(0, 1, 8)], max_iter=10, verbose=False).fit(X, y)
