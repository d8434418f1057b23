"""Host (NumPy) cross-approximation sweep.

Used by :func:`tntorch_tpu.cross.cross` when the user function is host-locked
(a NumPy/Python callable that cannot be traced) AND the backend cannot embed
host callbacks in jitted programs (tunneled PJRT plugins raise UNIMPLEMENTED
for ``jax.pure_callback``). In that regime the alternatives are bad:

- the fused device path cannot run (f cannot be traced or called back);
- the eager device path ships every fiber batch to the host for f and every
  evaluation back, per step, through the device tunnel;
- the old "host-pin" fallback (cores committed to the local CPU JAX device)
  keeps the data next to f but pays JAX's per-op dispatch overhead on every
  one of the dozens of small ops per step — measured ~2x slower than the
  identical sweep written against raw NumPy/BLAS.

This module runs the whole sweep in NumPy/BLAS/native-C++ on the host:

- fiber evaluation is a NumPy einsum over the interface chains (for
  meshgrid/domain inputs the interfaces are rank-1, so this is a cheap
  broadcasting product — no (P, N) coordinate matrix is materialized);
- orthogonalization is a Gram-eigh basis (one syrk + small eigh + one GEMM;
  ~4x faster than LAPACK Householder QR here and robust to the rank
  deficiency smooth functions produce — see _gram_orth_q);
- pivoting is the hybrid native maxvol (BLAS init + the C++ fused swap loop,
  csrc/maxvol.cpp); its coefficient matrix C = Q @ inv(Q[rows]) IS the
  interpolation core (invariant under the right factor: A = QR gives
  A @ inv(A[rows]) = Q @ inv(Q[rows])), so no separate solve is needed.

Semantics (rank schedule, rng stream, validation eps, info dict, error
messages) mirror the eager path in cross.py; behavioral reference
/root/reference/tntorch/cross.py:138-529.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import scipy.linalg

from tntorch_tpu.maxvol import maxvol as _host_maxvol


def _np_fibers(lint, core, rint):
    """(Rl x I x Rr) fiber values of one TT/CP core, flattened."""
    if core.ndim == 3:
        V = np.einsum("ai,ibj,jc->abc", lint, core, rint, optimize=True)
    else:  # CP factor
        V = np.einsum("ai,bi,ic->abc", lint, core, rint, optimize=True)
    return V.reshape(-1)


def _np_rchain(cores_tail, idx):
    """Right interface chain: contract cores j+1..N-1 at the index rows."""
    P = idx.shape[0]
    M = np.ones((cores_tail[-1].shape[-1], P), dtype=cores_tail[-1].dtype)
    for n in range(len(cores_tail) - 1, -1, -1):
        c = cores_tail[n]
        if c.ndim == 3:
            M = np.einsum("iaj,ja->ia", c[:, idx[:, n], :], M)
        else:
            M = np.einsum("ai,ia->ia", c[idx[:, n], :], M)
    return M


def _np_init_interfaces(tensors_np, rsets, N):
    """Left/right interface chains for each input tensor (host mirror of
    cross.init_interfaces)."""
    t_lint, t_rint = [], []
    for cores in tensors_np:
        dtype = cores[0].dtype
        r0 = cores[0].shape[0] if cores[0].ndim == 3 else cores[0].shape[1]
        rN = cores[-1].shape[-1]
        lint = [np.ones((1, r0), dtype=dtype)] + [None] * (N - 1)
        rint = [None] * (N - 1) + [np.ones((rN, 1), dtype=dtype)]
        for j in range(N - 1):
            rint[j] = _np_rchain(
                cores[j + 1:], np.asarray(rsets[j])[:, : N - 1 - j]
            )
        t_lint.append(lint)
        t_rint.append(rint)
    return t_lint, t_rint


def _np_eval_points(tensors_np, X):
    """Evaluate each input tensor at integer points X (P x N) — host mirror
    of cross._eval_points_body."""
    outs = []
    for cores in tensors_np:
        P = X.shape[0]
        r0 = cores[0].shape[0] if cores[0].ndim == 3 else 1
        v = np.ones((P, r0), dtype=cores[0].dtype)
        for n, c in enumerate(cores):
            if c.ndim == 3:
                v = np.einsum("br,rbs->bs", v, c[:, X[:, n], :], optimize=True)
            else:
                v = v * c[X[:, n], :]
        outs.append(v.sum(axis=1) if cores[-1].ndim == 2 else v[:, 0])
    return outs


def _np_tt_forward(cores, X):
    """TT evaluation at integer points X (P x N).

    Cores are gathered through an (I, Rl, Rr) transposed copy so each of
    the P index lookups is one contiguous Rl*Rr block memcpy — the direct
    c[:, X, :] gather strides the mode axis and was ~4x slower at the
    validation sizes used here."""
    P = X.shape[0]
    v = np.ones((P, cores[0].shape[0]), dtype=cores[0].dtype)
    for n, c in enumerate(cores):
        if c.shape[0] * c.shape[2] > 16:
            ct = np.ascontiguousarray(c.transpose(1, 0, 2))
            v = np.einsum("br,brs->bs", v, ct[X[:, n]], optimize=True)
        else:
            v = np.einsum("br,rbs->bs", v, c[:, X[:, n], :], optimize=True)
    return v[:, 0]


def download_cores(tensors):
    """Host copies of every input tensor's cores, as ONE device transfer.

    Per-array np.asarray costs a full tunnel round trip each (~40 ms
    through the axon TPU tunnel — ~1 s for 5 meshgrid tensors x 5 cores);
    concatenating the flattened cores on device and fetching once pays a
    single round trip. Arrays already on host (NumPy / CPU-backed jax)
    convert directly."""
    import jax
    import jax.numpy as jnp

    allc = [c for t in tensors for c in t.cores]
    on_device = [
        isinstance(c, jax.Array)
        and next(iter(c.devices())).platform != "cpu"
        for c in allc
    ]
    host = {}
    dev_idx = [i for i, d in enumerate(on_device) if d]
    if len(dev_idx) > 1 and len({allc[i].dtype for i in dev_idx}) == 1:
        flat = np.asarray(
            jnp.concatenate([allc[i].reshape(-1) for i in dev_idx])
        )
        off = 0
        for i in dev_idx:
            sz = int(np.prod(allc[i].shape))
            host[i] = flat[off:off + sz].reshape(allc[i].shape)
            off += sz
    out, k = [], 0
    for t in tensors:
        cs = []
        for c in t.cores:
            cs.append(host[k] if k in host else np.asarray(c))
            k += 1
        out.append(cs)
    return out


def upload_cores(cores_np):
    """Device copies of the host sweep's output cores, as ONE transfer.

    Per-core device_put pays a tunnel round trip each (~30 MB of result
    cores = seconds through a slow tunnel when split into 5 transfers plus
    their latencies); concatenating on host, shipping once, and slicing on
    device (async dispatches, no round trips) bounds the cost to one
    latency + the payload."""
    import jax
    import jax.numpy as jnp

    if len(cores_np) <= 1:
        return [jnp.asarray(c) for c in cores_np]
    flat = jax.device_put(
        np.concatenate([np.ravel(c) for c in cores_np])
    )
    out, off = [], 0
    for c in cores_np:
        out.append(flat[off:off + c.size].reshape(c.shape))
        off += c.size
    return out


_completion_cache = {}  # (m, d, dtype) -> cached unit-norm random block


def _completion_block(m, d, dtype):
    """Deterministic pseudo-random (m, d) unit-column block for completing
    a rank-deficient basis. Cached per shape: the same fiber-matrix shapes
    recur every sweep iteration, and the rng draw (not the GEMMs) would
    otherwise dominate the completion's cost."""
    key = (m, d, np.dtype(dtype).str)
    blk = _completion_cache.get(key)
    if blk is None:
        rng = np.random.default_rng(m * 1000003 + d)
        blk = rng.standard_normal((m, d)).astype(dtype)
        blk /= np.sqrt(np.einsum("ij,ij->j", blk, blk))
        if len(_completion_cache) > 8:
            _completion_cache.clear()
        _completion_cache[key] = blk
    return blk.copy()


def _gram_orth_q(V):
    """Well-conditioned column basis of tall V spanning range(V), via the
    Gram eigendecomposition in FLOAT64: Q = V @ (U / sqrt(clip(lam))),
    columns normalized, cast back to V's dtype. GEMM/small-eigh shaped (one
    f64 syrk + one k x k eigh + one f64 GEMM — still ~2x faster here than
    LAPACK Householder QR on f32 input) and robust to rank deficiency.

    Why f64 accumulation: the Gram method squares the condition number, so
    an f32 Gram caps the attainable interpolation accuracy at
    ~kappa(V)^2 * eps_f32 — measured on the 16^4 Hilbert drive it plateaued
    at val_eps ~1e-4 where the Householder eager path reaches <1e-5.
    Accumulating in f64 removes the squaring penalty at f32 output
    precision for ~30% extra cost (the swap loop, not this, dominates).

    Any basis of the form Q = V @ W (W invertible) leaves the maxvol
    interpolation core EXACT: Q @ inv(Q[rows]) = V @ inv(V[rows]) (the
    right factor cancels), so the orthogonalization choice only affects
    pivot-selection conditioning, never the interpolation identity. The
    one exception: EXACTLY dead directions (duplicated fiber columns from
    repeated pivot rows make V's residual identically zero) come out as
    zero columns, where no right factor can help — those get
    deterministic pseudo-random columns, projected orthogonal to the live
    ones (Householder's completion class: arbitrary, orthonormal, and
    crucially NOT leaking into the live subspace's interpolation)."""
    m, k = V.shape
    Vd = V.astype(np.float64, copy=False)
    G = Vd.T @ Vd
    try:
        lam, U = scipy.linalg.eigh(G, check_finite=False)
    except scipy.linalg.LinAlgError:
        Qf = scipy.linalg.qr(V, mode="economic", check_finite=False)[0]
        return Qf, Qf.shape[1]
    lmax = float(lam[-1]) if lam[-1] > 0 else 1.0
    s = 1.0 / np.sqrt(np.maximum(lam, lmax * 1e-30) + np.finfo(np.float64).tiny)
    # The right factor W is computed at f64 (that is where the kappa^2
    # sensitivity lives); the big basis GEMM itself runs in the work dtype
    # — its elementwise roundoff is plain eps(work), not squared
    Q = V @ (U * s).astype(V.dtype)
    cn = np.sqrt(np.einsum("ij,ij->j", Q, Q))
    Q /= np.maximum(cn, np.finfo(V.dtype).eps).astype(V.dtype)
    # Numerically significant column count AT THE WORK DTYPE (columns are
    # in ASCENDING eigenvalue order): directions below the work dtype's
    # Gram noise floor carry untrustworthy content — whether exactly-zero
    # (duplicated fiber columns) or normalized in-span roundoff, pivoting
    # and interpolating on them would poison the live subspace. ALL of
    # them are replaced by a deterministic random completion projected
    # orthogonal to the live columns (Householder QR's completion class).
    eps_d = float(np.finfo(V.dtype).eps)
    k0 = max(int(np.sum(lam > lmax * (16.0 * eps_d) ** 2)), 1)
    if k0 < k:
        R = _completion_block(m, k - k0, V.dtype)
        Ql = Q[:, k - k0:]
        R = R - Ql @ (Ql.T @ R)  # keep the completion out of the live span
        R = R / np.maximum(np.sqrt(np.einsum("ij,ij->j", R, R)),
                           np.finfo(V.dtype).eps)
        Q[:, : k - k0] = R
    return Q, k0


def _orth_and_pivot(M):
    """Orthonormalize tall M and select quasi-maxvol rows.

    Returns (lj, core) where core = Q @ inv(Q[lj]) — which equals
    M @ inv(M[lj]) (the interpolation core; right-factor invariant).

    Rank-aware pivoting: the maxvol swap loop (cost O(m*k) per swap, ~25
    swaps) runs only over the numerically SIGNIFICANT columns of the basis
    — the sub-roundoff directions are normalized noise whose pivot choice
    is arbitrary by construction, so they take cheap LU pivots over the
    remaining rows instead. For smooth functions (fiber matrices of
    numerical rank ~15 at k=100) this cuts the pivot search ~6x with no
    effect on the certified validation error; full-rank matrices take the
    plain full-width maxvol."""
    m, k = M.shape
    if m <= k:
        return np.arange(m, dtype=np.int64), np.eye(m, dtype=M.dtype)
    Q, k0 = _gram_orth_q(M)
    if k0 >= k or k0 > 0.6 * k:
        lj, C = _host_maxvol(Q, 1.05, 100)
        return lj, C
    # maxvol over the significant (trailing, descending-importance) columns
    sig = np.ascontiguousarray(Q[:, k - k0:])
    lj_sig, _ = _host_maxvol(sig, 1.05, 100)
    # LU pivots for the noise columns over the not-yet-selected rows (the
    # zeroed copy only steers the pivot SELECTION; the interpolation block
    # below uses the true rows). The LU runs on the top-row-norm CANDIDATE
    # subset only (4x oversampling) — partial pivoting would pick
    # high-norm rows anyway, and a full-height LU here cost more than the
    # entire maxvol swap loop.
    noise_masked = Q[:, : k - k0].copy()
    noise_masked[lj_sig] = 0.0  # zeroed rows are never chosen by pivoting
    from tntorch_tpu.maxvol import _initial_pivots

    d = k - k0
    ncand = min(m, max(4 * d, d + 8))
    rn = np.einsum("ij,ij->i", noise_masked, noise_masked)
    cand = np.argpartition(rn, -ncand)[-ncand:]
    lj_noise = cand[_initial_pivots(noise_masked[cand], ncand)[:d]]
    lj = np.concatenate([np.asarray(lj_sig, dtype=np.int64),
                         np.asarray(lj_noise, dtype=np.int64)])
    # Interpolation core on the combined row set; the column order of C
    # follows the row order in lj, which is what the caller records in its
    # index sets — consistency, not any particular order, is what matters
    Qperm = np.concatenate([sig, Q[:, : k - k0]], axis=1)
    try:
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("ignore", scipy.linalg.LinAlgWarning)
            Csub = scipy.linalg.inv(Qperm[lj], check_finite=False)
        C = Qperm @ Csub
        if not np.all(np.isfinite(C)):
            raise scipy.linalg.LinAlgError("non-finite interpolation core")
    except scipy.linalg.LinAlgError:
        lj, C = _host_maxvol(Q, 1.05, 100)
    return lj, C


def host_sweep(
    f,
    tensors_np,
    Is,
    Rs,
    lsets,
    rsets,
    Xs_val_mat,
    kickrank,
    rmax,
    eps,
    max_iter,
    verbose,
    record_samples,
    info,
    function,
    grow_schedule,
    draw_extra,
    start,
):
    """Run the full cross sweep on the host. Mutates ``info`` (nsamples,
    eval_time, val_epss, sample_* when recording) and returns
    (cores, lsets, rsets, left_locals, Rs, val_eps, converged).

    Parameters mirror the eager loop's locals in cross.cross();
    ``grow_schedule``/``draw_extra`` are the shared rank-growth callables so
    the rng stream and rank schedule stay in lockstep with the other paths.
    """
    N = len(Is)
    dtype = tensors_np[0][0].dtype
    lsets = [np.asarray(l) for l in lsets[:1]] + [None] * (N - 1)
    rsets = [np.asarray(r) for r in rsets]

    X_val = np.asarray(Xs_val_mat)
    t0 = time.time()
    ys_val = np.asarray(f(*_np_eval_points(tensors_np, X_val)))
    info["eval_time"] += time.time() - t0
    if ys_val.ndim == 2:
        assert ys_val.shape[1] == 1
        ys_val = ys_val[:, 0]
    norm_ys_val = float(np.linalg.norm(ys_val))

    t_lint, t_rint = _np_init_interfaces(tensors_np, rsets, N)
    cores = [None] * N
    left_locals = []
    _rec = []

    def evaluate(j):
        Xs = [
            _np_fibers(t_lint[k][j], cores_k[j], t_rint[k][j])
            for k, cores_k in enumerate(tensors_np)
        ]
        t0 = time.time()
        ev = np.asarray(f(*Xs))
        info["eval_time"] += time.time() - t0
        if ev.ndim == 2:
            ev = ev[:, 0]
        bad = ~np.isfinite(ev)
        if bad.any():
            invalid = int(np.flatnonzero(bad)[0])
            raise ValueError(
                "Invalid return value for function {}: f({}) = {}".format(
                    function,
                    ", ".join("{:g}".format(float(x[invalid])) for x in Xs),
                    float(ev[invalid]),
                )
            )
        if record_samples:
            _rec.append((Xs, ev))
        info["nsamples"] += ev.size
        return np.ascontiguousarray(ev.astype(dtype, copy=False))

    val_eps = np.inf
    converged = False
    for i in range(max_iter):
        if verbose:
            print("iter: {: <{}}".format(i, len("{}".format(max_iter)) + 1), end="")
            sys.stdout.flush()
        left_locals = []

        # Left-to-right
        for j in range(N - 1):
            ev = evaluate(j)
            lj, core = _orth_and_pivot(ev.reshape(-1, Rs[j + 1]))
            cores[j] = core.reshape(Rs[j], Is[j], Rs[j + 1])
            left_locals.append(lj)
            lr, li = lj // Is[j], lj % Is[j]
            lsets[j + 1] = np.concatenate(
                [lsets[j][lr], li[:, None].astype(lsets[j].dtype)], axis=1
            )
            for k, cores_k in enumerate(tensors_np):
                c = cores_k[j]
                if c.ndim == 3:
                    t_lint[k][j + 1] = np.einsum(
                        "ai,iaj->aj", t_lint[k][j][lr, :], c[:, li, :], optimize=True
                    )
                else:
                    t_lint[k][j + 1] = t_lint[k][j][lr, :] * c[li, :]

        # Right-to-left
        for j in range(N - 1, 0, -1):
            ev = evaluate(j)
            lj, core = _orth_and_pivot(
                np.ascontiguousarray(ev.reshape(Rs[j], -1).T)
            )
            cores[j] = core.T.reshape(Rs[j], Is[j], Rs[j + 1])
            li, lr = lj // Rs[j + 1], lj % Rs[j + 1]
            rsets[j - 1] = np.concatenate(
                [li[:, None].astype(rsets[j].dtype), rsets[j][lr]], axis=1
            )
            for k, cores_k in enumerate(tensors_np):
                c = cores_k[j]
                if c.ndim == 3:
                    t_rint[k][j - 1] = np.einsum(
                        "iaj,ja->ia", c[:, li, :], t_rint[k][j][:, lr], optimize=True
                    )
                else:
                    t_rint[k][j - 1] = c[li, :].T * t_rint[k][j][:, lr]

        # Leave the first core ready
        cores[0] = evaluate(0).reshape(Rs[0], Is[0], Rs[1])

        pred = _np_tt_forward(cores, X_val)
        val_eps = float(np.linalg.norm(ys_val - pred) / norm_ys_val)
        info["val_epss"].append(val_eps)
        if val_eps < eps:
            converged = True
        if verbose:
            print("| eps: {:.3e}".format(val_eps), end="")
            print(
                " | time: {:8.4f} | largest rank: {:3d}".format(
                    time.time() - start, int(max(Rs))
                ),
                end="",
            )
            if converged:
                print(" <- converged: eps < {}".format(eps))
            elif i == max_iter - 1:
                print(" <- max_iter was reached: {}".format(max_iter))
            else:
                print()
        if converged:
            break
        elif i < max_iter - 1 and kickrank is not None:  # grow ranks
            newRs = grow_schedule(Rs)
            extra = draw_extra(newRs)
            for n in range(N - 1):
                if newRs[n + 1] > Rs[n + 1]:
                    rsets[n] = np.vstack(
                        [rsets[n], extra[: newRs[n + 1] - Rs[n + 1], n:]]
                    )
            Rs = newRs
            t_lint, t_rint = _np_init_interfaces(tensors_np, rsets, N)

    if record_samples and _rec:
        info["sample_positions"] = np.concatenate(
            [np.stack(Xs_s, axis=1) for Xs_s, _ in _rec], axis=0
        )
        info["sample_values"] = np.concatenate(
            [np.asarray(ev).reshape(-1) for _, ev in _rec]
        )

    return cores, lsets, rsets, left_locals, Rs, val_eps, converged
