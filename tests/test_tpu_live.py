"""Live-accelerator tests (VERDICT r2 weak #9: TPU-specific behavior —
Pallas kernels, precision policies, fused cross chunks — was only exercised
by the driver bench, never by the suite).

The suite conftest pins the whole process to CPU, so these tests drive the
real chip from a SUBPROCESS with the default (axon/TPU) backend. They are
opt-in via ``TNT_TPU_TESTS=1`` because first compiles through the TPU
tunnel can take minutes; with the persistent compilation cache warm they
run in seconds.  Run:  TNT_TPU_TESTS=1 pytest tests/test_tpu_live.py -q
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("TNT_TPU_TESTS"),
    reason="live-TPU tests are opt-in (TNT_TPU_TESTS=1); first compiles are slow",
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVE = r"""
import sys
import numpy as np
import jax

if jax.default_backend() == "cpu":
    print("SKIP: no accelerator backend")
    sys.exit(75)

import jax.numpy as jnp
import tntorch_tpu as tn

tn.utils.enable_compilation_cache()
rng = np.random.default_rng(0)

# --- policy-routed TT rounding (randgram under 'high', eigh under 'highest')
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

# --- batched rounding (Pallas fused Gram-chain edges where supported)
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

# --- fused cross chunks on device (Hilbert), vs exact entries
dom = [jnp.linspace(1.0, 16.0, 16)] * 4
h = tn.cross(function=lambda *X: 1.0 / sum(X), domain=dom, eps=1e-5, verbose=False)
hd = h.numpy()
for _ in range(10):
    p = tuple(rng.integers(0, 16, 4))
    exact = 1.0 / sum(float(dom[i][p[i]]) for i in range(4))
    assert abs(hd[p] - exact) < 1e-3 * abs(exact), (p, hd[p], exact)

# --- device minimize (fused) finds the known minimum
f = lambda *X: sum((Xi - 7.0) ** 2 for Xi in X) + 1.0
mn = tn.minimum(tn.cross(function=f, domain=[jnp.arange(16.0)] * 3, eps=1e-6, verbose=False))
assert abs(float(mn) - 1.0) < 1e-2, mn

# --- fancy-indexed evaluation (the __getitem__ einsum chains must run at
# policy precision: at the TPU ambient default they carry ~1e-3 noise).
# Under 'highest' the results must be f32-exact; 'default' may be ~1e-3.
tn.set_policy("highest")
Xi = rng.integers(0, 16, (64, 4))
vals = h[jnp.asarray(Xi)].numpy()
for row, v in zip(Xi, vals):
    exact = 1.0 / sum(float(dom[i][row[i]]) for i in range(4))
    assert abs(v - exact) < 1e-3 * abs(exact), (row, v, exact)

# --- TTMatrix multiply vs dense (policy-precision contraction chain)
M = rng.standard_normal((16, 16)).astype(np.float32)
tm = tn.TTMatrix(jnp.asarray(M), ranks=[16], input_dims=[4, 4], output_dims=[4, 4])
v = rng.standard_normal((3, 16)).astype(np.float32)
out = np.asarray(tn.tt_multiply(tm, jnp.asarray(v)))
gt = v @ tm.numpy()
rel = np.linalg.norm(out - gt) / np.linalg.norm(gt)
assert rel < 1e-4, rel  # 'highest' policy: f32-exact chain
# under 'default' policy the same chain may carry single-pass-bf16 noise,
# but must stay within the documented ~1e-3-per-contraction class
tn.set_policy("default")
out_d = np.asarray(tn.tt_multiply(tm, jnp.asarray(v)))
rel_d = np.linalg.norm(out_d - gt) / np.linalg.norm(gt)
assert rel_d < 5e-2, rel_d

# --- Tucker-factored decompression must stay f32-exact under a low policy
# (regression: the nested decompress_tucker_factors wrapper re-entered
# default_matmul_precision at the policy level, silently undoing full()'s
# 'highest' pin for the factor-absorption einsums).
tn.set_policy("default")
cores_tk = [jnp.asarray(rng.standard_normal((1, 6, 5)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((5, 6, 1)).astype(np.float32))]
Us_tk = [jnp.asarray(rng.standard_normal((64, 6)).astype(np.float32)) for _ in range(2)]
ttk = tn.Tensor(cores_tk, Us=Us_tk)
got = ttk.numpy()
c0 = np.asarray(cores_tk[0], np.float64); c1 = np.asarray(cores_tk[1], np.float64)
U0 = np.asarray(Us_tk[0], np.float64); U1 = np.asarray(Us_tk[1], np.float64)
gt_tk = np.einsum("ajb,ij,bkc,lk->il", c0, U0, c1, U1)
rel_tk = np.linalg.norm(np.asarray(got, np.float64) - gt_tk) / np.linalg.norm(gt_tk)
assert rel_tk < 1e-5, rel_tk  # f32-exact; bf16 leak would be ~1e-3
tn.set_policy("default")

# --- tn.stack + batch analytics on chip: per-sample moments of an ensemble
members = [tn.rand((8, 8, 8), ranks_tt=r, key=jax.random.key(40 + r)) for r in (2, 3)]
ens = tn.stack(members)
rm = np.asarray(tn.raw_moment(ens, 2, algorithm="exact"))
tn.set_policy("highest")
for b, m in enumerate(members):
    single = float(tn.raw_moment(m, 2, algorithm="exact"))
    assert abs(rm[b] - single) < 5e-2 * max(abs(single), 1e-6), (b, rm[b], single)
tn.set_policy("default")

# --- sketched sparse_tt_svd on a tall unfolding (randomized range finder;
# the dense path would need a 16384^2 Gram eigh)
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
rel_sk = np.linalg.norm(pred_sk - y_sk[:2000]) / np.linalg.norm(y_sk[:2000])
assert rel_sk < 5e-2, rel_sk

# --- sketched sparse_tt_svd, TIGHT f32 eps on an exactly low-rank tensor:
# catches matmul-precision leaks the loose case above cannot. At the TPU
# ambient default (single-pass bf16) the sketch Gram's eigenvalue sum is
# ~1e-2*energy off, the widening loop escalates to the cap, and rank
# selection keeps sketch noise: observed ranks [1,3,16,1] + a spurious
# eps-miss warning before _sketch_range_kernel pinned 'highest'.
import tntorch_tpu.interpolation as _interp
gt_nf = tn.rand((16, 16, 16), ranks_tt=3, key=jax.random.key(11))
full_nf = np.asarray(gt_nf.numpy(), np.float64)
idx_nf = np.stack(np.meshgrid(*[np.arange(16)] * 3, indexing="ij"), -1).reshape(-1, 3)
_saved_rows_max = _interp._SPARSE_DENSE_ROWS_MAX
_interp._SPARSE_DENSE_ROWS_MAX = 8  # force the sketched path at every mode
try:
    t_nf = tn.sparse_tt_svd(idx_nf, full_nf.reshape(-1).astype(np.float32), eps=1e-5)
finally:
    _interp._SPARSE_DENSE_ROWS_MAX = _saved_rows_max
assert max(t_nf.ranks_tt) <= 3, t_nf.ranks_tt
rel_nf = np.linalg.norm(np.asarray(t_nf.numpy(), np.float64) - full_nf) \
    / np.linalg.norm(full_nf)
assert rel_nf < 1e-4, rel_nf

# --- no-push batched Gram rounding (128-lane-aligned ranks route through
# pallas_wgram / pallas_proj2 on the chip) vs the einsum push sweep
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

# --- serialization round trip with device arrays
import tempfile, os as _os
with tempfile.TemporaryDirectory() as td:
    p = _os.path.join(td, "t.npz")
    tn.save(h, p)
    h2 = tn.load(p)
    assert np.linalg.norm(h2.numpy() - hd) < 1e-5 * np.linalg.norm(hd)

# --- TTClassifier: one tiny fit must train end-to-end on the chip
Xc = np.concatenate([rng.normal(-1, 0.4, (64, 2)), rng.normal(1, 0.4, (64, 2))]).astype(np.float32)
yc = np.array([0] * 64 + [1] * 64)
clf = tn.TTClassifier(nticks=16, ranks_tt=3, ranks_tucker=4, max_iter=200,
                      verbose=False, key=jax.random.key(50))
clf.fit(Xc, yc)
acc = clf.score(Xc, yc)
assert acc > 0.8, acc

print("TPU LIVE OK")
"""


def test_tpu_live_drive():
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + ":" + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)  # let the site default (accelerator) win
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVE],
        env=env,
        capture_output=True,
        text=True,
        timeout=3000,
    )
    if proc.returncode == 75:
        pytest.skip("no accelerator visible in subprocess")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "TPU LIVE OK" in proc.stdout
