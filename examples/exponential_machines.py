"""Exponential machines: TT-parameterized regression on binary features
(reference docs/tutorials/exponential_machines.ipynb; Novikov et al. 2017).

The model is w[x_1, ..., x_N] — a 2^N tensor of interaction weights stored
as a TT — evaluated at the feature activation pattern of each sample
(BASELINE config 4). The forward + grad + Adam step runs as one jitted XLA
program.
"""

import time

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
    N, P = 10, 2000

    # Synthetic sparse-interaction ground truth over binary features
    Xb = rng.integers(0, 2, (P, N))
    y = (
        1.5 * Xb[:, 0]
        - 2.0 * Xb[:, 1]
        + 0.8 * Xb[:, 2] * Xb[:, 3]
        - 1.2 * Xb[:, 1] * Xb[:, 4] * Xb[:, 5]
        + 0.1 * rng.standard_normal(P)
    )
    X = jnp.asarray(Xb)
    y = jnp.asarray(y)

    import optax

    w = tn.rand([2] * N, ranks_tt=4, requires_grad=True, key=jax.random.key(0))
    w.cores = [c * 0.3 for c in w.cores]

    def loss(w):
        pred = w[X].full()
        return jnp.mean((pred - y) ** 2)

    # On remote accelerators the per-iteration host sync dominates; run K
    # update steps per dispatch (one lax.scan program)
    block = 1 if jax.default_backend() == "cpu" else 64
    t0 = time.time()
    losses = tn.optimize([w], loss, tol=1e-7, max_iter=6000, print_freq=1000,
                         optimizer=optax.adam(1e-2), block_iters=block)
    print("final mse {:.4g} after {} iters, {:.2f}s".format(
        losses[-1], len(losses), time.time() - t0))

    pred = w[X].full()
    ss_res = float(jnp.sum((pred - y) ** 2))
    ss_tot = float(jnp.sum((y - jnp.mean(y)) ** 2))
    print("train R^2:", 1 - ss_res / ss_tot)


if __name__ == "__main__":
    main()
