"""Polynomial chaos expansions (reference docs/tutorials/pce.ipynb + pce2.ipynb).

Two ways to build a PCE surrogate of a noisy quadratic blackbox:

1. Gradient descent on a TT-Tucker tensor whose Tucker factors are FIXED
   Legendre polynomials (`set_factors('legendre')`) — the expansion
   coefficients live in the TT core and are the only trainable dof.
2. `tn.PCEInterpolator` — sparse adaptive PCE via the native LARS path
   (the reference uses scikit-learn here; ours is self-contained).
"""

import os

import jax

if os.environ.get("TN_DEVICE", "cpu") == "cpu":
    # f64 analysis mode on CPU; set TN_DEVICE=tpu to run on the accelerator (f32)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn


def main():
    rng = np.random.default_rng(0)
    P, N, ticks = 200, 5, 32
    ntrain = int(P * 0.75)

    X = rng.integers(0, ticks, (P, N)).astype(np.float64)
    ws = rng.uniform(size=N)
    y = (X**2) @ ws
    y += rng.standard_normal(P) * y.std() / 10

    X_train = jnp.asarray(X[:ntrain], dtype=jnp.int32)
    y_train = jnp.asarray(y[:ntrain])
    X_test = jnp.asarray(X[ntrain:], dtype=jnp.int32)
    y_test = jnp.asarray(y[ntrain:])

    # --- unconstrained TT regression overfits ---
    t = tn.rand([ticks] * N, ranks_tt=2, requires_grad=True,
                key=jax.random.key(0))

    def loss(t):
        return tn.relative_error(y_train, t[X_train]) ** 2

    tn.optimize(t, loss, verbose=False)
    print("plain TT    | test rel-err {:.4f} | dof {}".format(
        float(tn.relative_error(y_test, t[X_test])), tn.dof(t)))

    # --- PCE: fixed Legendre factors, only the TT core is trainable ---
    t = tn.rand([ticks] * N, ranks_tt=2, ranks_tucker=3, requires_grad=True,
                key=jax.random.key(1))
    t.set_factors("legendre", requires_grad=False)
    tn.optimize(t, loss, verbose=False)
    print("PCE (GD)    | test rel-err {:.4f} | dof {}".format(
        float(tn.relative_error(y_test, t[X_test])), tn.dof(t)))

    # --- sparse adaptive PCE via native LARS (reference pce2.ipynb) ---
    pce = tn.PCEInterpolator()
    pce.fit(np.asarray(X[:ntrain]), np.asarray(y[:ntrain]), p=3, verbose=False)
    pred = pce.predict(np.asarray(X[ntrain:]))
    rel = np.linalg.norm(pred - np.asarray(y_test)) / np.linalg.norm(y_test)
    print("PCE (LARS)  | test rel-err {:.4f} | {} active terms".format(
        rel, len(pce.coef)))


if __name__ == "__main__":
    main()
