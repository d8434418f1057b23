"""Encapsulated supervised learners on TT-Tucker tensors.

The reference library ships the raw ingredients (a trainable tensor, fixed
smooth factor bases, ``tn.optimize``) and demonstrates the workflow in its
classification tutorial (reference docs/tutorials/classification.ipynb);
its own TODO.md lists "Encapsulated Regressor() and Classifier() classes"
as an open item.  This module closes that TODO with sklearn-style
estimators:

- the model is a ``[nticks]*N`` (+ one trailing class mode) TT-Tucker
  tensor with fixed low-frequency factor bases (DCT by default), so the
  learned function is smooth in each feature by construction;
- continuous features are discretized onto the grid with
  ``features2indices`` (bounding box learned from the training set);
- training is one jit-compiled ``tn.optimize`` loop — predictions for all
  P samples are a single compressed-tensor gather, so both fit and predict
  are MXU-shaped batched einsums, not per-sample Python.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn
from tntorch_tpu.interpolation import features2indices, get_bounding_box
from tntorch_tpu.utils import default_dtype


def _batch_gather(t, idx):
    """Evaluate every member of a batch TT-Tucker tensor at integer index rows.

    ``idx`` is ``(B, P, N)`` (per-member rows, e.g. bootstrap resamples) or
    ``(P, N)`` broadcast to all members.  Returns ``(B, P)`` when all modes
    are indexed, or ``(B, P, I_last)`` when ``N == t.dim() - 1`` (the
    classifier's free trailing class mode).  One einsum chain — all members
    evaluate in a single batched dispatch.
    """
    B = t.cores[0].shape[0]
    idx = jnp.asarray(idx, dtype=jnp.int32)
    if idx.ndim == 2:
        idx = jnp.broadcast_to(idx[None], (B,) + idx.shape)
    N = idx.shape[-1]
    res = None
    for n in range(N):
        core = t.cores[n]  # (B, r, K, s)
        U = t.Us[n]
        if U is None:
            Ce = jnp.take_along_axis(core, idx[:, None, :, n, None], axis=2)
            C = jnp.transpose(Ce, (0, 2, 1, 3))  # (B, P, r, s)
        else:
            Ue = jnp.take_along_axis(U, idx[:, :, n, None], axis=1)  # (B, P, K)
            C = jnp.einsum("bpk,brks->bprs", Ue, core)
        res = C[:, :, 0, :] if res is None else jnp.einsum("bpr,bprs->bps", res, C)
    if N == t.dim():
        return res[..., 0]
    assert N == t.dim() - 1
    core = t.cores[-1]
    mat = core[..., 0]  # (B, r, K)
    if t.Us[-1] is not None:
        mat = jnp.einsum("brk,bck->brc", mat, t.Us[-1])
    return jnp.einsum("bpr,brc->bpc", res, mat)


class _TTLearner:
    """Shared scaffolding for :class:`TTRegressor` / :class:`TTClassifier`."""

    def __init__(
        self,
        nticks: int = 64,
        ranks_tt: int = 10,
        ranks_tucker: Optional[int] = 8,
        basis: str = "dct",
        max_iter: int = 4000,
        tol: float = 1e-7,
        optimizer=None,
        verbose: bool = False,
        domain: Optional[Sequence] = None,
        n_estimators: int = 1,
        bootstrap: bool = True,
        mesh=None,
        key: Optional[jax.Array] = None,
    ):
        self.nticks = int(nticks)
        self.ranks_tt = ranks_tt
        self.ranks_tucker = ranks_tucker
        self.basis = basis
        self.max_iter = int(max_iter)
        self.tol = float(tol)
        self.optimizer = optimizer
        self.verbose = verbose
        self.domain = domain
        self.n_estimators = int(n_estimators)
        self.bootstrap = bool(bootstrap)
        if mesh is not None and "dp" not in mesh.axis_names:
            raise ValueError(
                "Learner mesh must have a 'dp' axis to shard samples/members over "
                f"(got axes {mesh.axis_names}); build it with tn.make_mesh()"
            )
        self.mesh = mesh
        self.key = key if key is not None else jax.random.key(0)
        self.tensor_ = None
        self.bbox_ = None
        self.losses_ = None

    # -- feature handling ------------------------------------------------
    def _fit_grid(self, X):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim != 2:
            raise ValueError(f"X must be (P, N), got shape {X.shape}")
        if self.domain is not None and len(self.domain) != X.shape[1]:
            raise ValueError(
                f"domain has {len(self.domain)} axes but X has {X.shape[1]} features"
            )
        if self.domain is None:
            # Widen the box a hair so test points at the training extremes
            # don't all collapse onto the boundary ticks
            bbox = get_bounding_box(X)
            self.bbox_ = [
                (lo - 1e-12 - 0.025 * (hi - lo), hi + 1e-12 + 0.025 * (hi - lo))
                for (lo, hi) in bbox
            ]
        return X

    def _indices(self, X):
        X = np.asarray(X, dtype=np.float64)
        if self.domain is not None:
            return features2indices(X, domain=self.domain)
        return features2indices(X, bbox=self.bbox_, I=self.nticks)

    def _grid_shape(self, N):
        if self.domain is not None:  # length validated in _fit_grid
            return [len(d) for d in self.domain]
        return [self.nticks] * N

    def _make_tensor(self, shape):
        B = self.n_estimators
        t = tn.rand(
            ([B] + list(shape)) if B > 1 else list(shape),
            ranks_tt=self.ranks_tt,
            ranks_tucker=self.ranks_tucker,
            requires_grad=True,
            batch=B > 1,
            key=self.key,
        )
        if self.basis is not None and self.ranks_tucker is not None:
            # Fixed smooth bases on the feature modes only (a trailing class
            # mode, when present, keeps its free factor)
            nfeat = len(shape) - (1 if self._has_class_mode else 0)
            t.set_factors(self.basis, dim=range(nfeat))
        return t

    def _member_rows(self, P):
        """(B, P) training-row selection per ensemble member: bootstrap
        resamples (bagging) or the identity for plain random-restart
        ensembles."""
        if self.bootstrap:
            return jax.random.randint(
                jax.random.fold_in(self.key, 17), (self.n_estimators, P), 0, P
            )
        return jnp.broadcast_to(jnp.arange(P), (self.n_estimators, P))

    _has_class_mode = False

    def _maybe_shard(self, *arrs):
        """Shard training arrays' leading axes over the mesh dp axis (data
        parallel: samples for a single model, members for an ensemble);
        params are replicated by optimize(mesh=). Axes not divisible by the
        dp size stay unsharded (XLA still runs, just without partitioning)."""
        if self.mesh is None:
            return arrs if len(arrs) > 1 else arrs[0]
        from tntorch_tpu.parallel.algorithms import shard_array

        ndev = int(self.mesh.shape.get("dp", 1))
        out = tuple(
            shard_array(a, self.mesh)
            if int(jnp.asarray(a).shape[0]) % ndev == 0
            else jnp.asarray(a)
            for a in arrs
        )
        return out if len(out) > 1 else out[0]

    def _optimize(self, loss):
        self.losses_ = tn.optimize(
            self.tensor_,
            loss,
            optimizer=self.optimizer,
            tol=self.tol,
            max_iter=self.max_iter,
            verbose=self.verbose,
            mesh=self.mesh,
        )
        return self


class TTRegressor(_TTLearner):
    """Least-squares regression on a smooth TT-Tucker grid tensor.

    >>> reg = tn.TTRegressor(nticks=64, ranks_tt=8)
    >>> reg.fit(X, y).predict(Xtest)

    The target is standardized internally; ``score`` returns R².  The fixed
    smooth factor basis is what makes the grid tensor generalize between
    training points — ``basis=None`` (free factors) memorizes the visited
    grid cells and interpolates poorly.
    """

    def fit(self, X, y):
        X = self._fit_grid(X)
        y = np.asarray(y, dtype=np.float64).reshape(-1)
        if len(y) != len(X):
            raise ValueError(f"X has {len(X)} rows but y has {len(y)}")
        self._y_mean = float(y.mean())
        self._y_std = float(y.std()) or 1.0
        yj = jnp.asarray((y - self._y_mean) / self._y_std, dtype=default_dtype())
        idx = self._indices(X)
        self.tensor_ = self._make_tensor(self._grid_shape(X.shape[1]))

        if self.n_estimators > 1:
            sel = self._member_rows(len(y))
            # dp-shard over members: each device trains its own slice of the
            # ensemble (params replicated, gradients partitioned by XLA)
            IDX, Y = self._maybe_shard(jnp.asarray(idx)[sel], yj[sel])

            def loss(t):
                return jnp.mean((_batch_gather(t, IDX) - Y) ** 2)

        else:
            idx, yj = self._maybe_shard(jnp.asarray(idx), yj)  # dp over samples

            def loss(t):
                pred = t[idx].full()
                return jnp.mean((pred - yj) ** 2)

        return self._optimize(loss)

    def predict(self, X):
        if self.tensor_ is None:
            raise ValueError("fit must be called before predict")
        idx = self._indices(np.asarray(X, dtype=np.float64))
        if self.n_estimators > 1:
            pred = jnp.mean(_batch_gather(self.tensor_, idx), axis=0)
        else:
            pred = self.tensor_[idx].full()
        return pred * self._y_std + self._y_mean

    def score(self, X, y):
        """Coefficient of determination R² (sklearn convention)."""
        y = np.asarray(y, dtype=np.float64).reshape(-1)
        pred = np.asarray(self.predict(X), dtype=np.float64)
        ss_res = float(((y - pred) ** 2).sum())
        ss_tot = float(((y - y.mean()) ** 2).sum()) or 1.0
        return 1.0 - ss_res / ss_tot


class TTClassifier(_TTLearner):
    """Multi-class classification: a ``[*grid, C]`` logit tensor trained
    with softmax cross-entropy (the reference classification tutorial's
    workflow, packaged).

    ``predict_proba`` returns (P, C) softmax probabilities in the order of
    ``classes_``.
    """

    _has_class_mode = True

    def fit(self, X, y):
        X = self._fit_grid(X)
        y = np.asarray(y).reshape(-1)
        if len(y) != len(X):
            raise ValueError(f"X has {len(X)} rows but y has {len(y)}")
        self.classes_, y_enc = np.unique(y, return_inverse=True)
        C = len(self.classes_)
        if C < 2:
            raise ValueError("need at least 2 classes")
        yj = jnp.asarray(y_enc, dtype=jnp.int32)
        idx = self._indices(X)
        self.tensor_ = self._make_tensor(self._grid_shape(X.shape[1]) + [C])

        if self.n_estimators > 1:
            sel = self._member_rows(len(y))
            IDX, Y = self._maybe_shard(jnp.asarray(idx)[sel], yj[sel])

            def loss(t):
                logits = _batch_gather(t, IDX)  # (B, P, C)
                logp = jax.nn.log_softmax(logits, axis=-1)
                picked = jnp.take_along_axis(logp, Y[..., None], axis=-1)
                return -jnp.mean(picked)

        else:
            idx, yj = self._maybe_shard(jnp.asarray(idx), yj)

            def loss(t):
                # Indexing with a (P, N) matrix leaves the class mode free ->
                # (P, C) logits in one compressed gather
                logits = t[idx].full()
                logp = jax.nn.log_softmax(logits, axis=-1)
                return -jnp.mean(logp[jnp.arange(logp.shape[0]), yj])

        return self._optimize(loss)

    def predict_proba(self, X):
        if self.tensor_ is None:
            raise ValueError("fit must be called before predict")
        idx = self._indices(np.asarray(X, dtype=np.float64))
        if self.n_estimators > 1:
            # Bagging: average the members' probabilities
            logits = _batch_gather(self.tensor_, idx)  # (B, P, C)
            return jnp.mean(jax.nn.softmax(logits, axis=-1), axis=0)
        return jax.nn.softmax(self.tensor_[idx].full(), axis=-1)

    def predict(self, X):
        return self.classes_[np.asarray(jnp.argmax(self.predict_proba(X), axis=-1))]

    def score(self, X, y):
        """Mean accuracy."""
        y = np.asarray(y).reshape(-1)
        return float((self.predict(X) == y).mean())
