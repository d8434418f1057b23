"""Gradient-fitting throughput (BASELINE config 4: completion / exponential
machines). Measures optimize() update steps per second for a rank-6 TT
completion workload — the reference's completion.ipynb does ~860 iters/s on
CPU torch (2187 iters / 2.54 s).

Ours runs the whole loss -> grad -> Adam step as one XLA program and (in
block mode) K steps per dispatch. The torch baseline is the same model and
loss written with torch.autograd + torch.optim.Adam.
"""

import json
import os
import time

import numpy as np


def bench_ours(B=512, shape=(64, 64), rank=6, iters=2000):
    import jax
    import jax.numpy as jnp
    import optax

    if jax.default_backend() != "cpu":
        from tntorch_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
    import tntorch_tpu as tn

    rng = np.random.default_rng(0)
    X = jnp.asarray(np.stack([rng.integers(0, s, B) for s in shape], axis=1))
    y = jnp.asarray(rng.standard_normal(B))
    t = tn.rand(list(shape), ranks_tt=rank, requires_grad=True, key=jax.random.key(0))

    def loss(t):
        return jnp.mean((t[X].full() - y) ** 2)

    # warm-up/compile
    tn.optimize([t], loss, tol=None, max_iter=64, verbose=False, block_iters=64,
                optimizer=optax.adam(1e-3))
    t0 = time.perf_counter()
    losses = tn.optimize([t], loss, tol=None, max_iter=iters, verbose=False,
                         block_iters=64, optimizer=optax.adam(1e-3))
    dt = time.perf_counter() - t0
    return len(losses) / dt, float(losses[-1])


def bench_torch(B=512, shape=(64, 64), rank=6, iters=2000):
    import torch

    torch.set_num_threads(os.cpu_count() or 8)
    rng = np.random.default_rng(0)
    X = [torch.from_numpy(rng.integers(0, s, B)) for s in shape]
    y = torch.from_numpy(rng.standard_normal(B)).float()
    N = len(shape)
    ranks = [1] + [rank] * (N - 1) + [1]
    cores = [
        torch.rand(ranks[n], shape[n], ranks[n + 1], requires_grad=True)
        for n in range(N)
    ]
    opt = torch.optim.Adam(cores, lr=1e-3)

    def forward():
        v = torch.ones(B, 1)
        for n in range(N):
            G = cores[n][:, X[n], :]  # (Rl, B, Rr)
            v = torch.einsum("br,rbs->bs", v, G)
        return v[:, 0]

    # warm-up
    for _ in range(10):
        opt.zero_grad()
        l = torch.mean((forward() - y) ** 2)
        l.backward()
        opt.step()
    t0 = time.perf_counter()
    for _ in range(iters):
        opt.zero_grad()
        l = torch.mean((forward() - y) ** 2)
        l.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return iters / dt, float(l.item())


def main():
    out = {}
    for tag, cfg in {
        "small_64x64_r6_B512": dict(B=512, shape=(64, 64), rank=6),
        "large_256x256x256_r16_B8192": dict(B=8192, shape=(256, 256, 256), rank=16, iters=1000),
    }.items():
        ours_ips, _ = bench_ours(**cfg)
        torch_ips, _ = bench_torch(**cfg)
        out[tag] = {
            "ours_iters_per_s": round(ours_ips, 1),
            "torch_cpu_iters_per_s": round(torch_ips, 1),
            "speedup": round(ours_ips / torch_ips, 2),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
