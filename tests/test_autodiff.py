"""optimize() / dof tests (module untested in the reference; SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tntorch_tpu as tn


def test_optimize_completion():
    target = tn.rand([8, 8, 8], ranks_tt=3, key=jax.random.key(3))
    t = tn.rand([8, 8, 8], ranks_tt=3, requires_grad=True, key=jax.random.key(4))
    tn.optimize([t], lambda u: tn.relative_error(target, u) ** 2, tol=1e-6,
                verbose=False, max_iter=3000)
    assert float(tn.relative_error(target, t)) <= 0.2


def test_optimize_raises_without_params():
    t = tn.rand([4, 4], ranks_tt=2)
    try:
        tn.optimize([t], lambda u: tn.normsq(u), verbose=False)
        assert False
    except ValueError:
        pass


def test_dof():
    t = tn.rand([5, 6, 7], ranks_tt=2, requires_grad=True)
    assert tn.dof(t) == 10 + 24 + 14
    t2 = tn.rand([5, 6, 7], ranks_tt=2)
    assert tn.dof(t2) == 0


def test_grad_flows_through_ops():
    # jax.grad through a compressed-op pipeline (indexing + metrics)
    t = tn.rand([6, 6], ranks_tt=2)

    def loss(cores):
        u = tn.Tensor(list(cores))
        return tn.normsq(u) + u[1, 2] ** 2

    g = jax.grad(loss)(t.cores)
    assert all(np.isfinite(np.asarray(gi)).all() for gi in g)
    assert any(float(np.abs(np.asarray(gi)).max()) > 0 for gi in g)


def test_set_factors_freezes_only_factors():
    """set_factors(..., requires_grad=False) freezes the factors but keeps the
    cores trainable (reference tensor.py:2157-2189 semantics: the flag applies
    to the new factor nodes, never to the whole tensor)."""
    import optax

    t = tn.rand([8] * 3, ranks_tt=2, ranks_tucker=3, requires_grad=True,
                key=jax.random.key(0))
    t.set_factors("legendre", requires_grad=False)
    # dof counts cores only (frozen Us excluded; reference autodiff.py:104-121)
    expected_core_dof = sum(int(np.prod(c.shape)) for c in t.cores)
    assert tn.dof(t) == expected_core_dof

    Us_before = [np.asarray(U) for U in t.Us]
    cores_before = [np.asarray(c) for c in t.cores]
    target = jnp.asarray(np.random.default_rng(0).standard_normal([8] * 3))

    def loss(t):
        return tn.dist(t, tn.Tensor(target, ranks_tt=4)) ** 2

    tn.optimize(t, loss, optimizer=optax.adam(1e-2), max_iter=10, tol=None,
                verbose=False)
    # Cores moved, frozen factors did not
    assert any(
        float(np.abs(np.asarray(c) - c0).max()) > 1e-12
        for c, c0 in zip(t.cores, cores_before)
    )
    for U, U0 in zip(t.Us, Us_before):
        np.testing.assert_array_equal(np.asarray(U), U0)


def test_set_factors_trainable_factors_move():
    import optax

    t = tn.rand([8] * 3, ranks_tt=2, ranks_tucker=3, requires_grad=True,
                key=jax.random.key(1))
    t.set_factors("legendre", requires_grad=True)
    assert tn.dof(t) == sum(int(np.prod(c.shape)) for c in t.cores) + sum(
        int(np.prod(U.shape)) for U in t.Us
    )
    Us_before = [np.asarray(U) for U in t.Us]
    target = jnp.asarray(np.random.default_rng(1).standard_normal([8] * 3))

    def loss(t):
        return tn.dist(t, tn.Tensor(target, ranks_tt=4)) ** 2

    tn.optimize(t, loss, optimizer=optax.adam(1e-2), max_iter=10, tol=None,
                verbose=False)
    assert any(
        float(np.abs(np.asarray(U) - U0).max()) > 1e-12
        for U, U0 in zip(t.Us, Us_before)
    )


def test_traceable_loss_never_takes_eager_path(monkeypatch):
    """VERDICT r2 #10: a jit-traceable loss must run through the compiled
    step — the eager fallback (which re-traces value_and_grad per call)
    must never trigger."""
    import tntorch_tpu.autodiff as ad

    def boom(*a, **k):
        raise AssertionError("eager fallback taken for a traceable loss")

    monkeypatch.setattr(ad, "_eager_step", boom)
    t = tn.rand((6, 6, 6), ranks_tt=2, requires_grad=True, key=jax.random.key(3))
    gt = tn.rand((6, 6, 6), ranks_tt=2, key=jax.random.key(4))
    hist = tn.optimize(
        t, lambda w: tn.normsq(w - gt), max_iter=5, tol=None, verbose=False
    )
    assert len(hist) >= 5


def test_cross_loss_warns_then_raises_clearly():
    """A cross-based loss (data-dependent ranks -> float() on a tracer)
    cannot be differentiated at all: optimize announces the retrace cliff,
    tries the eager path, and surfaces a CLEAR error (not a raw tracer
    message). MIGRATION.md 'The optimize retrace cliff' documents the
    workarounds."""
    import warnings

    t = tn.rand((5, 5), ranks_tt=2, requires_grad=True, key=jax.random.key(5))
    gt = tn.rand((5, 5), ranks_tt=2, key=jax.random.key(6)) + 2.0

    def loss_cross(w):
        return tn.dist(w ** 2, gt)

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        with pytest.raises(ValueError, match="traced value"):
            tn.optimize(t, loss_cross, max_iter=3, tol=None, verbose=False)
    assert any("EAGER" in str(w.message) for w in rec)


def test_optimize_rejects_non_tensor_params():
    class P:
        requires_grad = True

    t = tn.rand([4, 4], ranks_tt=2, requires_grad=True, key=jax.random.key(7))
    try:
        tn.optimize([t, P()], lambda a, b: tn.normsq(a), verbose=False)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "tn.Tensor" in str(e)
