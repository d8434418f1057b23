"""ANOVA decomposition + active subspaces (reference docs/tutorials/anova.ipynb
and active_subspaces.ipynb).

Everything runs in compressed TT form: the ANOVA transform, logical masking of
interaction terms, Sobol-style variance accounting, and the active-subspace
eigendecomposition of the gradient covariance.
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
    N = 4
    t = tn.rand([32] * N, ranks_tt=5, key=jax.random.key(0))

    # --- ANOVA decomposition and truncation ---
    anova = tn.anova_decomposition(t)
    x, y, z, w = tn.symbols(N)

    # Drop every interaction involving the last variable
    t_cut = tn.undo_anova_decomposition(tn.mask(anova, ~w))
    print("variance kept without w-terms: {:.2f}%".format(
        float(tn.var(t_cut) / tn.var(t)) * 100))

    # The empty ANOVA term is the constant (global-mean) function
    empty = tn.undo_anova_decomposition(tn.mask(anova, tn.none(N)))
    print("var(f_0) = {:.3g} (should be 0); f_0 = {:.6f} = mean = {:.6f}".format(
        float(tn.var(empty)), float(empty[0, 0, 0, 0]), float(tn.mean(t))))

    # Summing ALL terms recovers the function
    all_summed = tn.undo_anova_decomposition(tn.mask(anova, tn.true(N)))
    print("rel-err of full ANOVA reassembly: {:.3g}".format(
        float(tn.relative_error(t, all_summed))))

    # Keep only interactions of order <= 2 (weight mask over the TT)
    m = tn.weight_mask(N, [0, 1, 2])
    t_trunc = tn.truncate_anova(t, m, keepdim=True)
    print("rel-err after order<=2 truncation: {:.4f}".format(
        float(tn.relative_error(t, t_trunc))))

    # Sobol variance shares
    print("sobol share of terms without w: {:.2f}%".format(
        float(tn.sobol(t, ~w)) * 100))
    print("sobol share of pure x/y/z singletons: {:.2f}%".format(
        float(tn.sobol(t, tn.only(x | y | z))) * 100))

    # --- Active subspaces of a learned surrogate ---
    rng = np.random.default_rng(0)
    ticks, P = 64, 100

    def f(X):
        return X[:, 0] * X[:, 1] + X[:, 2]  # x3 is inactive

    X = np.round(rng.uniform(size=(P, N)) * (ticks - 1))
    yv = f(X)

    s = tn.rand([ticks] * N, ranks_tt=2, ranks_tucker=2, requires_grad=True,
                key=jax.random.key(1))
    s.set_factors("legendre")

    Xi = jnp.asarray(X, dtype=jnp.int32)
    yj = jnp.asarray(yv)

    def loss(s):
        return jnp.linalg.norm(s[Xi].full() - yj) / jnp.linalg.norm(yj)

    tn.optimize(s, loss, verbose=False)
    eigvals, _ = tn.active_subspace(s, bounds=None)
    ev = np.asarray(eigvals)
    print("active-subspace eigenvalues:", np.round(ev, 4))
    print("(one input is inactive: smallest eigenvalue is {:.2g}% of the trace)".format(
        100 * ev.min() / ev.sum()))


if __name__ == "__main__":
    main()
