"""optimize() / dof tests (module untested in the reference; SURVEY.md section 4)."""

import jax
import numpy as np

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
