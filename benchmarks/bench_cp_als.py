"""CP-ALS decomposition wall time (BASELINE.md row 10: 128^3, r=3).

The reference notebook (decompositions.ipynb cell 10) reports 0.09 s total
(init + 2 ALS sweeps, f64) on its machine; the reference library re-run on
THIS box takes ~0.45 s warm. Ours redesigns the two hot stages:

- init: sequentially-truncated HOSVD (one syrk-shaped GEMM on the original
  layout; later modes work on the projected R x ... core) instead of N
  full-size Gram matrices on permuted unfoldings;
- sweeps: 3-GEMM MTTKRP on the original data layout (zero transposed
  copies) + compressed error check (no O(I^N) reconstruction per sweep),
  the whole sweep jitted as one XLA program.

Prints one JSON line with warm wall seconds for ours and torch-CPU running
the reference's algorithm (HOSVD init + unfolding-GEMM ALS), same data.
"""

import json
import os
import time

import numpy as np

if os.environ.get("TN_DEVICE", "cpu") == "cpu":
    # f64 CPU-vs-CPU is the documented comparison; under the axon
    # sitecustomize the default backend would otherwise be the TPU (f32)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


def make_data():
    X, Y, Z = np.meshgrid(range(128), range(128), range(128))
    return np.sqrt(np.sqrt(X) * (Y + Z) + Y * Z**2) * (X + np.sin(Y) * np.cos(Z))


def bench_ours(data_np):
    import jax.numpy as jnp

    import tntorch_tpu as tn

    data = jnp.asarray(data_np)
    t = tn.Tensor(data, ranks_cp=3)  # warm-up (compile)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        t = tn.Tensor(data, ranks_cp=3)
        times.append(time.perf_counter() - t0)
    rel = np.linalg.norm(t.numpy() - data_np) / np.linalg.norm(data_np)
    return min(times), float(rel)


def bench_torch(data_np):
    """The reference's own loop (tensor.py:210-400): HOSVD init via unfolding
    Grams, ALS sweeps with unfolding @ khatri-rao + lstsq, dense error."""
    import torch

    torch.set_num_threads(os.cpu_count() or 8)
    data = torch.from_numpy(np.asarray(data_np, dtype=np.float64))
    N, R = 3, 3

    def unf(d, n):
        perm = (n,) + tuple(i for i in range(N) if i != n)
        return d.permute(perm).reshape(d.shape[n], -1)

    def run():
        cores = []
        for n in range(N):
            u = unf(data, n)
            gram = u @ u.T
            _, vecs = torch.linalg.eigh(gram)
            cores.append(vecs.flip(-1)[:, :R])
        errors = []
        for _ in range(25):
            for n in range(N):
                k = None
                for m in range(N):
                    if m == n:
                        continue
                    c = cores[m]
                    k = c if k is None else (k[:, None, :] * c[None, :, :]).reshape(-1, R)
                prod = torch.ones(R, R, dtype=data.dtype)
                for m in range(N):
                    if m != n:
                        prod = prod * (cores[m].T @ cores[m])
                rhs = (unf(data, n) @ k).T
                cores[n] = torch.linalg.lstsq(prod, rhs).solution.T
            approx = None
            k = cores[0]
            for m in range(1, N):
                k = (k[:, None, :] * cores[m][None, :, :]).reshape(-1, R)
            approx = k.sum(dim=1).reshape(data.shape)
            errors.append(float(torch.linalg.norm(approx - data) / torch.linalg.norm(data)))
            if len(errors) >= 2 and errors[-2] - errors[-1] < 1e-4:
                break
        return cores, errors[-1]

    run()  # warm-up
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, rel = run()
        times.append(time.perf_counter() - t0)
    return min(times), rel


def main():
    data_np = make_data()
    ours_s, ours_rel = bench_ours(data_np)
    out = {"cp_als_warm_s": round(ours_s, 4), "rel_err": round(ours_rel, 6)}
    try:
        base_s, base_rel = bench_torch(data_np)
        out["torch_cpu_warm_s"] = round(base_s, 4)
        out["torch_rel_err"] = round(base_rel, 6)
        out["speedup"] = round(base_s / ours_s, 2)
    except Exception as e:
        out["torch_error"] = str(e)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
