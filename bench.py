"""Benchmark: TT-round throughput at n=256, r=64 (BASELINE.json north star).

Rounds a 4D TT with mode size 256 from rank 128 down to rank 64 — the
canonical post-arithmetic recompression (e.g. after t+t) — using the jitted
fixed-rank kernel (QR sweep + Gram-eigh truncation) on the default JAX
device (the TPU chip under the driver). The baseline is the identical
algorithm in PyTorch on all CPU cores, same precision, same FLOP formula.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def _maybe_enable_cache():
    import jax

    if jax.default_backend() != "cpu":
        from tntorch_tpu.utils import enable_compilation_cache

        enable_compilation_cache()


def bench_ours(cores_np, rmax, iters=20):
    import jax
    import jax.numpy as jnp

    from tntorch_tpu.ops.rounding import round_tt_gram

    cores = tuple(jnp.asarray(c) for c in cores_np)

    def sync(out):
        # Hard sync: fetch a host value (block_until_ready can ack early
        # through the axon tunnel's async queue)
        return sum(float(jnp.sum(o)) for o in out)

    out = round_tt_gram(cores, rmax)  # warm-up (compile)
    sync(out)
    out = round_tt_gram(cores, rmax)  # warm-up (steady-state)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = round_tt_gram(cores, rmax)
    sync(out)
    return (time.perf_counter() - t0) / iters, out


def bench_torch_cpu(cores_np, rmax, iters=3):
    """Same algorithm (QR sweep + Gram-eigh fixed-rank truncation) in PyTorch
    on CPU — the reference's compute substrate (it is a pure-torch library)."""
    import torch

    torch.set_num_threads(os.cpu_count() or 8)
    cores0 = [torch.from_numpy(np.asarray(c)) for c in cores_np]

    def run():
        cores = [c.clone() for c in cores0]
        N = len(cores)
        for mu in range(N - 1):
            Rl, I, Rr = cores[mu].shape
            Q, R = torch.linalg.qr(cores[mu].reshape(Rl * I, Rr))
            cores[mu] = Q.reshape(Rl, I, Q.shape[1])
            nxt = cores[mu + 1]
            cores[mu + 1] = (R @ nxt.reshape(nxt.shape[0], -1)).reshape(
                R.shape[0], nxt.shape[1], nxt.shape[2]
            )
        for mu in range(N - 1, 0, -1):
            Rl, I, Rr = cores[mu].shape
            r = min(rmax, Rl)
            M = cores[mu].reshape(Rl, I * Rr)
            G = M @ M.T
            _, V = torch.linalg.eigh(G)
            U = V[:, list(range(V.shape[1] - 1, -1, -1))][:, :r]
            cores[mu] = (U.T @ M).reshape(r, I, Rr)
            cores[mu - 1] = torch.einsum("ijk,kl->ijl", cores[mu - 1], U)
        return cores

    run()  # warm-up
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    return (time.perf_counter() - t0) / iters, out


def main():
    _maybe_enable_cache()
    from tntorch_tpu.ops.rounding import round_tt_flops

    N, I, R_in, rmax = 4, 256, 128, 64
    rng = np.random.default_rng(0)
    ranks = [1] + [R_in] * (N - 1) + [1]
    # Scale so intermediate products stay well-conditioned in f32
    cores_np = [
        (rng.standard_normal((ranks[n], I, ranks[n + 1])) / np.sqrt(R_in)).astype(np.float32)
        for n in range(N)
    ]
    shapes = [c.shape for c in cores_np]
    flops = round_tt_flops(shapes, rmax)

    t_ours, _ = bench_ours(cores_np, rmax)
    gflops_ours = flops / t_ours / 1e9

    try:
        t_base, _ = bench_torch_cpu(cores_np, rmax)
        gflops_base = flops / t_base / 1e9
        vs_baseline = t_base / t_ours
    except Exception as e:  # torch unavailable: report absolute only
        print(f"# baseline failed: {e}", file=sys.stderr)
        vs_baseline = float("nan")

    print(
        json.dumps(
            {
                "metric": "tt_round_throughput_n256_r64",
                "value": round(gflops_ours, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
