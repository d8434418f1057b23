"""Tensor completion (reference docs/tutorials/completion.ipynb).

Two routes to fill in missing data under a low-rank prior:
- gradient descent on the cores (`tn.optimize`) with an optional smoothness
  regularizer — the whole update step is one jitted XLA program;
- alternating least squares (`tn.als_completion`).
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

    # Ground truth: a smooth rank-4 field on a 32x32 grid
    gt = tn.rand([32, 32], ranks_tt=4, key=jax.random.key(0))
    full = gt.full()

    # Observe 50% of the entries
    mask = rng.random((32, 32)) < 0.5
    P = int(mask.sum())
    X = np.argwhere(mask)
    y = jnp.asarray(np.asarray(full)[mask])

    # --- Route 1: gradient descent on the cores
    t = tn.rand([32, 32], ranks_tt=4, requires_grad=True, key=jax.random.key(1))
    Xj = jnp.asarray(X)

    def loss(t):
        pred = t[Xj].full()
        return jnp.mean((pred - y) ** 2)

    tn.optimize([t], loss, tol=1e-10, max_iter=3000, print_freq=1000)
    print("optimize() rel-err on unobserved:",
          float(jnp.linalg.norm(t.full() - full) / jnp.linalg.norm(full)))

    # With a second-derivative smoothness prior
    t2 = tn.rand([32, 32], ranks_tt=4, requires_grad=True, key=jax.random.key(2))

    def loss_smooth(t):
        pred = t[Xj].full()
        fit = jnp.mean((pred - y) ** 2)
        d2 = tn.partial(t, 0, order=2)
        smooth = tn.normsq(d2) / d2.numel()
        return fit, 1e-6 * smooth

    tn.optimize([t2], loss_smooth, tol=1e-10, max_iter=1500, print_freq=500)

    # --- Route 2: ALS. Fixed-rank ALS is init-sensitive (the reference
    # stalls on ~half of random inits on this problem too); restarts=
    # retries plateaued inits and keeps the best fit.
    t3 = tn.als_completion(jnp.asarray(X), y, ranks_tt=4, shape=[32, 32],
                           niter=20, verbose=False, restarts=4)
    print("ALS rel-err:", float(jnp.linalg.norm(t3.full() - full) / jnp.linalg.norm(full)))

    # --- Route 3: sparse TT-SVD. Direct (no iterations) fit of the
    # ZERO-FILLED tensor — the right tool when the observed entries
    # themselves form a low-rank pattern (e.g. complete slices). Tall
    # unfoldings (here 12288 rows on a 12288x16x16 grid) take a sketched
    # randomized-range-finder path that never materializes the unfolding,
    # so ~10^4-10^6 samples fit in seconds with bounded memory.
    shape = [12288, 16, 16]
    gt3 = tn.rand(shape, ranks_tt=3, key=jax.random.key(3))
    S = np.sort(rng.choice(shape[0], 40, replace=False))  # 40 complete slices
    i2, i3 = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    cols = np.stack([i2.ravel(), i3.ravel()], axis=1)
    Xs = np.concatenate(
        [np.repeat(S, 256)[:, None], np.tile(cols, (len(S), 1))], axis=1
    )
    ys = gt3[jnp.asarray(Xs)].full()
    t4 = tn.sparse_tt_svd(Xs, ys, eps=1e-6, shape=shape, rmax=8)
    pred = t4[jnp.asarray(Xs)].full()
    print("sparse_tt_svd (sketched) ranks:", list(t4.ranks_tt),
          "rel-err at samples:",
          float(jnp.linalg.norm(pred - ys) / jnp.linalg.norm(ys)))


if __name__ == "__main__":
    main()
