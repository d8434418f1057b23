"""Dense -> TT decomposition throughput (TT-SVD of a 64^4 analytic field,
target rank 32): jitted Gram kernel on the default device vs the same
Gram algorithm in all-core PyTorch CPU."""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tntorch_tpu.ops.decomposition import tt_svd_randomized, _cap_ranks

    x = np.linspace(-1, 1, 64)
    X, Y, Z, W = np.meshgrid(x, x, x, x, indexing="ij")
    data_np = (1.0 / (np.abs(X + Y + Z + W) + 2.0)).astype(np.float32)
    data = jnp.asarray(data_np)
    r = 32

    def sync(cores):
        return sum(float(jnp.sum(c)) for c in cores)

    key = jax.random.key(0)
    out = tt_svd_randomized(data, r, key=key, n_iter=1); sync(out)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        out = tt_svd_randomized(data, r, key=key, n_iter=1)
    sync(out)
    t_ours = (time.perf_counter() - t0) / iters

    # torch CPU: identical Gram algorithm
    import torch
    torch.set_num_threads(os.cpu_count() or 8)
    M0 = torch.from_numpy(data_np)
    ranks = _cap_ranks(data_np.shape, r)

    def torch_run():
        shape = data_np.shape
        M = M0.reshape(shape[0], -1)
        r_prev = 1
        cores = []
        for k in range(3):
            rr = ranks[k + 1]
            m, n = M.shape
            if m <= n:
                G = M @ M.T
                _, V = torch.linalg.eigh(G)
                U = V.flip(-1)[:, :rr]
            else:
                G = M.T @ M
                _, V = torch.linalg.eigh(G)
                Wv = V.flip(-1)[:, :rr]
                U = M @ Wv
                U = U / U.norm(dim=0, keepdim=True).clamp_min(1e-30)
            cores.append(U.reshape(r_prev, shape[k], rr))
            M = (U.T @ M).reshape(rr * shape[k + 1], -1)
            r_prev = rr
        cores.append(M.reshape(r_prev, shape[3], 1))
        return cores

    torch_run()
    t0 = time.perf_counter()
    for _ in range(3):
        torch_run()
    t_base = (time.perf_counter() - t0) / 3

    # verify accuracy of the device result (direct dense comparison)
    from tntorch_tpu.ops.rounding import tt_full
    err = float(jnp.linalg.norm(tt_full(list(out)) - data) / jnp.linalg.norm(data))

    print(json.dumps({
        "metric": "tt_svd_dense_64x64x64x64_r32_randomized",
        "ours_s": round(t_ours, 4), "torch_cpu_s": round(t_base, 4),
        "speedup": round(t_base / t_ours, 2), "rel_err": err,
    }))


if __name__ == "__main__":
    main()
