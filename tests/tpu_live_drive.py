"""Live-accelerator smoke drive, split into named timed sections
(VERDICT r4 next #9: the old monolithic 200-line assert string gave one
opaque failure and no per-section timings).

Run directly (``python tests/tpu_live_drive.py``) on a machine where the
default JAX backend is an accelerator; each section prints
``# tpu section <name>: PASS|FAIL in <sec>s`` and the run exits non-zero if
any section fails (75 = no accelerator). bench.py echoes the section lines
into the driver log.
"""

import sys
import time
import traceback

import numpy as np

_CTX = {}  # cross-section state (h/hd/dom feed indexing + serialization)


def section_policy_rounding(jax, jnp, tn, rng):
    """Policy-routed TT rounding (randgram under 'high', eigh under 'highest')."""
    t = tn.Tensor([
        jnp.asarray(rng.standard_normal((1, 48, 4)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((4, 48, 4)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((4, 48, 1)).astype(np.float32)),
    ])
    dense = t.numpy()
    for policy in ("highest", "high", "default", "bf16"):
        tn.set_policy(policy)
        s = t + t
        s.round_tt(eps=1e-5)
        rel = np.linalg.norm(s.numpy() - 2 * dense) / np.linalg.norm(dense)
        tol = 5e-2 if policy == "bf16" else 1e-3
        assert rel < tol, (policy, rel)
        assert list(s.ranks_tt) == list(t.ranks_tt), (policy, s.ranks_tt)
    tn.set_policy("default")


def section_batched_rounding(jax, jnp, tn, rng):
    """Batched rounding (Pallas fused Gram-chain edges where supported)."""
    B = 8
    bcores = [jnp.asarray(rng.standard_normal((B, 1, 32, 8)).astype(np.float32)),
              jnp.asarray(rng.standard_normal((B, 8, 32, 8)).astype(np.float32)),
              jnp.asarray(rng.standard_normal((B, 8, 32, 1)).astype(np.float32))]
    tb = tn.Tensor(bcores, batch=True)
    sb = tb + tb
    sb.round_tt(rmax=8)
    full_b = sb.numpy()
    for b in range(B):
        single = tn.Tensor([c[b] for c in bcores])
        s1 = single + single
        s1.round_tt(rmax=8)
        rel = np.linalg.norm(full_b[b] - s1.numpy()) / np.linalg.norm(s1.numpy())
        assert rel < 1e-3, (b, rel)


def section_fused_cross(jax, jnp, tn, rng):
    """Fused cross chunks on device (Hilbert), vs exact entries."""
    dom = [jnp.linspace(1.0, 16.0, 16)] * 4
    h = tn.cross(function=lambda *X: 1.0 / sum(X), domain=dom, eps=1e-5,
                 verbose=False)
    hd = h.numpy()
    for _ in range(10):
        p = tuple(rng.integers(0, 16, 4))
        exact = 1.0 / sum(float(dom[i][p[i]]) for i in range(4))
        assert abs(hd[p] - exact) < 1e-3 * abs(exact), (p, hd[p], exact)
    _CTX.update(dom=dom, h=h, hd=hd)


def section_host_sweep_cross(jax, jnp, tn, rng):
    """NumPy host sweep for a host-locked f (the automatic path when the
    backend cannot host callbacks) matches the fused device result."""
    dom = _CTX["dom"]

    def f_np(*X):
        return 1.0 / sum(np.asarray(x) for x in X)

    h2, info = tn.cross(function=f_np, domain=dom, eps=1e-5, verbose=False,
                        fuse="host", return_info=True)
    assert info["host_sweep"], info
    assert info["val_eps"] < 1e-5, info["val_eps"]
    rel = np.linalg.norm(h2.numpy() - _CTX["hd"]) / np.linalg.norm(_CTX["hd"])
    assert rel < 1e-3, rel


def section_minimize(jax, jnp, tn, rng):
    """Device minimize (fused) finds the known minimum."""
    f = lambda *X: sum((Xi - 7.0) ** 2 for Xi in X) + 1.0  # noqa: E731
    mn = tn.minimum(tn.cross(function=f, domain=[jnp.arange(16.0)] * 3,
                             eps=1e-6, verbose=False))
    assert abs(float(mn) - 1.0) < 1e-2, mn


def section_indexing_precision(jax, jnp, tn, rng):
    """Fancy-indexed evaluation at policy precision ('highest' = f32-exact)."""
    tn.set_policy("highest")
    dom, h = _CTX["dom"], _CTX["h"]
    Xi = rng.integers(0, 16, (64, 4))
    vals = h[jnp.asarray(Xi)].numpy()
    for row, v in zip(Xi, vals):
        exact = 1.0 / sum(float(dom[i][row[i]]) for i in range(4))
        assert abs(v - exact) < 1e-3 * abs(exact), (row, v, exact)


def section_ttmatrix(jax, jnp, tn, rng):
    """TTMatrix multiply vs dense (policy-precision contraction chain)."""
    M = rng.standard_normal((16, 16)).astype(np.float32)
    tm = tn.TTMatrix(jnp.asarray(M), ranks=[16], input_dims=[4, 4],
                     output_dims=[4, 4])
    v = rng.standard_normal((3, 16)).astype(np.float32)
    out = np.asarray(tn.tt_multiply(tm, jnp.asarray(v)))
    gt = v @ tm.numpy()
    rel = np.linalg.norm(out - gt) / np.linalg.norm(gt)
    assert rel < 1e-4, rel  # 'highest' policy: f32-exact chain
    # under 'default' policy the same chain may carry single-pass-bf16
    # noise, but must stay within the documented ~1e-3-per-contraction class
    tn.set_policy("default")
    out_d = np.asarray(tn.tt_multiply(tm, jnp.asarray(v)))
    rel_d = np.linalg.norm(out_d - gt) / np.linalg.norm(gt)
    assert rel_d < 5e-2, rel_d


def section_tucker_decompress(jax, jnp, tn, rng):
    """Tucker-factored decompression stays f32-exact under a low policy
    (regression: a nested decompress wrapper once re-entered
    default_matmul_precision at the policy level, undoing full()'s pin)."""
    tn.set_policy("default")
    cores_tk = [jnp.asarray(rng.standard_normal((1, 6, 5)).astype(np.float32)),
                jnp.asarray(rng.standard_normal((5, 6, 1)).astype(np.float32))]
    Us_tk = [jnp.asarray(rng.standard_normal((64, 6)).astype(np.float32))
             for _ in range(2)]
    ttk = tn.Tensor(cores_tk, Us=Us_tk)
    got = ttk.numpy()
    c0 = np.asarray(cores_tk[0], np.float64)
    c1 = np.asarray(cores_tk[1], np.float64)
    U0 = np.asarray(Us_tk[0], np.float64)
    U1 = np.asarray(Us_tk[1], np.float64)
    gt_tk = np.einsum("ajb,ij,bkc,lk->il", c0, U0, c1, U1)
    rel_tk = np.linalg.norm(np.asarray(got, np.float64) - gt_tk) \
        / np.linalg.norm(gt_tk)
    assert rel_tk < 1e-5, rel_tk  # f32-exact; bf16 leak would be ~1e-3
    tn.set_policy("default")


def section_batch_analytics(jax, jnp, tn, rng):
    """tn.stack + batch analytics on chip: per-sample ensemble moments."""
    members = [tn.rand((8, 8, 8), ranks_tt=r, key=jax.random.key(40 + r))
               for r in (2, 3)]
    ens = tn.stack(members)
    rm = np.asarray(tn.raw_moment(ens, 2, algorithm="exact"))
    tn.set_policy("highest")
    for b, m in enumerate(members):
        single = float(tn.raw_moment(m, 2, algorithm="exact"))
        assert abs(rm[b] - single) < 5e-2 * max(abs(single), 1e-6), \
            (b, rm[b], single)
    tn.set_policy("default")


def section_sketched_sparse(jax, jnp, tn, rng):
    """Sketched sparse_tt_svd on a tall unfolding (randomized range finder)."""
    shape_sk = [16384, 16, 16]
    gt_sk = tn.rand(tuple(shape_sk), ranks_tt=3, key=jax.random.key(60))
    S_sk = np.sort(rng.choice(shape_sk[0], 30, replace=False))
    ii2, ii3 = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    cols_sk = np.stack([ii2.ravel(), ii3.ravel()], axis=1)
    X_sk = np.concatenate(
        [np.repeat(S_sk, 256)[:, None], np.tile(cols_sk, (30, 1))], axis=1)
    y_sk = np.asarray(gt_sk[jnp.asarray(X_sk)].numpy())
    t_sk = tn.sparse_tt_svd(X_sk, y_sk, eps=3e-3, shape=shape_sk, rmax=8)
    pred_sk = np.asarray(t_sk[jnp.asarray(X_sk[:2000])].numpy())
    rel_sk = np.linalg.norm(pred_sk - y_sk[:2000]) \
        / np.linalg.norm(y_sk[:2000])
    assert rel_sk < 5e-2, rel_sk


def section_sketch_noise_floor(jax, jnp, tn, rng):
    """Sketched sparse_tt_svd at TIGHT f32 eps on an exactly low-rank
    tensor: catches matmul-precision leaks the loose case cannot."""
    import tntorch_tpu.interpolation as _interp

    gt_nf = tn.rand((16, 16, 16), ranks_tt=3, key=jax.random.key(11))
    full_nf = np.asarray(gt_nf.numpy(), np.float64)
    idx_nf = np.stack(
        np.meshgrid(*[np.arange(16)] * 3, indexing="ij"), -1).reshape(-1, 3)
    _saved = _interp._SPARSE_DENSE_ROWS_MAX
    _interp._SPARSE_DENSE_ROWS_MAX = 8  # force the sketched path per mode
    try:
        t_nf = tn.sparse_tt_svd(
            idx_nf, full_nf.reshape(-1).astype(np.float32), eps=1e-5)
    finally:
        _interp._SPARSE_DENSE_ROWS_MAX = _saved
    assert max(t_nf.ranks_tt) <= 3, t_nf.ranks_tt
    rel_nf = np.linalg.norm(np.asarray(t_nf.numpy(), np.float64) - full_nf) \
        / np.linalg.norm(full_nf)
    assert rel_nf < 1e-4, rel_nf


def section_nopush_batched(jax, jnp, tn, rng):
    """No-push batched Gram rounding (128-lane ranks route through
    pallas_wgram / pallas_proj2 on chip) vs the einsum push sweep."""
    from tntorch_tpu.ops.rounding import round_tt_gram_batched, tt_full

    rk = [1, 128, 128, 128, 1]
    bc = tuple(
        jnp.asarray(rng.standard_normal((2, rk[n], 16, rk[n + 1])) / 12.0,
                    np.float32)
        for n in range(4)
    )
    nopush = round_tt_gram_batched(bc, 64, "rand", True, "highest")
    push = round_tt_gram_batched(bc, 64, "rand", False, "highest")
    fullb = jax.vmap(tt_full)
    d_np, d_p = np.asarray(fullb(nopush)), np.asarray(fullb(push))
    rel_np = np.linalg.norm(d_np - d_p) / np.linalg.norm(d_p)
    assert rel_np < 1e-3, rel_np


def section_serialization(jax, jnp, tn, rng):
    """Serialization round trip with device arrays."""
    import os
    import tempfile

    h, hd = _CTX["h"], _CTX["hd"]
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.npz")
        tn.save(h, p)
        h2 = tn.load(p)
        assert np.linalg.norm(h2.numpy() - hd) < 1e-5 * np.linalg.norm(hd)


def section_learner(jax, jnp, tn, rng):
    """TTClassifier: one tiny fit must train end-to-end on the chip."""
    Xc = np.concatenate([rng.normal(-1, 0.4, (64, 2)),
                         rng.normal(1, 0.4, (64, 2))]).astype(np.float32)
    yc = np.array([0] * 64 + [1] * 64)
    clf = tn.TTClassifier(nticks=16, ranks_tt=3, ranks_tucker=4, max_iter=200,
                          verbose=False, key=jax.random.key(50))
    clf.fit(Xc, yc)
    acc = clf.score(Xc, yc)
    assert acc > 0.8, acc


SECTIONS = [
    section_policy_rounding,
    section_batched_rounding,
    section_fused_cross,
    section_host_sweep_cross,
    section_minimize,
    section_indexing_precision,
    section_ttmatrix,
    section_tucker_decompress,
    section_batch_analytics,
    section_sketched_sparse,
    section_sketch_noise_floor,
    section_nopush_batched,
    section_serialization,
    section_learner,
]


def main():
    import jax

    if jax.default_backend() == "cpu":
        print("SKIP: no accelerator backend")
        return 75

    import jax.numpy as jnp

    import tntorch_tpu as tn

    tn.utils.enable_compilation_cache()
    rng = np.random.default_rng(0)
    failures = []
    for fn in SECTIONS:
        name = fn.__name__[len("section_"):]
        t0 = time.time()
        try:
            fn(jax, jnp, tn, rng)
            status = "PASS"
        except Exception:
            status = "FAIL"
            failures.append((name, traceback.format_exc()))
        print("# tpu section {}: {} in {:.1f}s".format(
            name, status, time.time() - t0), flush=True)
    if failures:
        for name, tb in failures:
            print("=== section {} failed ===\n{}".format(name, tb))
        return 1
    print("TPU LIVE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
