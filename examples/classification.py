"""Tensor classification on the two-class "Swiss roll" problem
(reference docs/tutorials/classification.ipynb; BASELINE config 3 family).

The classifier is a [nticks, nticks, C] TT-Tucker tensor with fixed DCT
factor bases: logits are tensor entries at the (discretized) feature
coordinates, trained with softmax cross-entropy through `tn.optimize`.
"""

import os
import time

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
    N, C, P = 2, 2, 100  # features, classes, points per class

    # Two interleaved spirals (the tutorial's "Swiss roll")
    r = rng.uniform(2, 10, P)[:, None]
    c0 = np.concatenate([r * np.cos(r), r * np.sin(r)], axis=1)
    c0 += rng.standard_normal(c0.shape) / 1.5
    c1 = -c0

    X = np.concatenate([c0, c1], axis=0)
    y = np.concatenate([np.zeros(len(c0)), np.ones(len(c1))])
    idx = rng.permutation(len(X))
    X, y = X[idx], y[idx]

    # Discretize features onto a [0, nticks) grid
    nticks = 128
    X = (X - X.min()) / (X.max() - X.min()) * (nticks - 1)
    ntrain = int(len(X) * 0.75)
    X_train = jnp.asarray(X[:ntrain].round(), dtype=jnp.int32)
    y_train = jnp.asarray(y[:ntrain], dtype=jnp.int32)
    X_test = jnp.asarray(X[ntrain:].round(), dtype=jnp.int32)
    y_test = np.asarray(y[ntrain:], dtype=np.int64)

    # Logit tensor: smooth (low-frequency DCT factors) over the 2 features
    t = tn.rand([nticks] * N + [C], ranks_tt=10, ranks_tucker=6,
                requires_grad=True, key=jax.random.key(0))
    t.set_factors("dct", dim=range(N))

    def loss(t):
        # Logits for every class at the sample coordinates: indexing with a
        # (P, 2) matrix on the [nticks, nticks, C] tensor leaves the class
        # mode free -> a (P, C) result
        logits = t[X_train].full()
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(logp[jnp.arange(len(y_train)), y_train])

    t0 = time.time()
    losses = tn.optimize(t, loss, tol=1e-5, max_iter=3000, print_freq=500)
    print("train xent {:.4f} after {} iters, {:.1f}s".format(
        losses[-1], len(losses), time.time() - t0))

    pred = np.asarray(jnp.argmax(t[X_test].full(), axis=-1))
    print("test accuracy:", float((pred == y_test).mean()))

    # --- Same workflow, encapsulated: tn.TTClassifier (the reference
    # TODO.md's "Classifier()" item). Works on the raw continuous features;
    # discretization, the logit tensor, and the training loop are internal.
    Xc = np.concatenate([c0, c1], axis=0)[idx]  # raw features, same row order
    yc = y  # already permuted above
    clf = tn.TTClassifier(nticks=nticks, ranks_tt=10, ranks_tucker=6,
                          max_iter=3000, verbose=False, key=jax.random.key(0))
    clf.fit(Xc[:ntrain], yc[:ntrain])
    print("TTClassifier test accuracy:", clf.score(Xc[ntrain:], yc[ntrain:]))

    # Bagged ensemble: 4 members trained in ONE jitted dispatch stream
    # (a batch=True tensor), probabilities averaged at predict time
    ens = tn.TTClassifier(nticks=nticks, ranks_tt=10, ranks_tucker=6,
                          max_iter=3000, n_estimators=4, verbose=False,
                          key=jax.random.key(1))
    ens.fit(Xc[:ntrain], yc[:ntrain])
    print("TTClassifier x4 ensemble test accuracy:", ens.score(Xc[ntrain:], yc[ntrain:]))


if __name__ == "__main__":
    main()
