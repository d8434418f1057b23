"""Cross-approximation throughput benchmark (BASELINE config 3).

Measures f-evaluations/second for:
- domain mode: 10D sum-of-sines on a 32^10 grid at eps=1e-6 (the reference's
  headline cross workload), and 5D Hilbert 32^5;
- tensor mode: elementwise x^2 of an existing TT.

Reference CPU numbers (BASELINE.md): 2.1e7 evals/s (domain/vector mode),
6.6e7 evals/s (tensor mode). Throughput here is *effective*: total evals /
total wall time of the full cross run (the reference reports pure callback
time, which under async device dispatch would be meaninglessly inflated).
"""

import json
import time

import jax

# Persistent compilation cache: cross-approximation sweeps touch many unique
# shapes; first-run compiles dominate on remote-compile TPU setups.
if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def main():
    import tntorch_tpu as tn

    results = {}

    # 10D sum of sines, domain mode
    domain = [jnp.linspace(0, 2 * np.pi, 32, dtype=jnp.float32)] * 10

    def f10(*xs):
        return sum(jnp.sin(x) for x in xs)

    tn.cross(function=f10, domain=domain, eps=1e-6, verbose=False, seed=0)  # warm-up
    t0 = time.perf_counter()
    t, info = tn.cross(function=f10, domain=domain, eps=1e-6, verbose=False,
                       return_info=True, seed=0)
    dt = time.perf_counter() - t0
    results["sines10d"] = dict(
        nsamples=int(info["nsamples"]), total_s=round(dt, 3),
        evals_per_s=round(info["nsamples"] / dt, 1),
        val_eps=float(info["val_eps"]), max_rank=int(max(info["Rs"])),
    )

    # 5D Hilbert, domain mode
    domain = [jnp.linspace(1, 32, 32, dtype=jnp.float32)] * 5

    def fh(*xs):
        return 1.0 / sum(xs)

    tn.cross(function=fh, domain=domain, eps=1e-6, verbose=False, seed=0)  # warm-up
    t0 = time.perf_counter()
    t, info = tn.cross(function=fh, domain=domain, eps=1e-6, verbose=False,
                       return_info=True, seed=0)
    dt = time.perf_counter() - t0
    results["hilbert5d"] = dict(
        nsamples=int(info["nsamples"]), total_s=round(dt, 3),
        evals_per_s=round(info["nsamples"] / dt, 1),
        val_eps=float(info["val_eps"]), max_rank=int(max(info["Rs"])),
    )

    # tensor mode: x^2 on a 6D TT (fixed ranks: adaptive growth at f32
    # precision cannot certify 1e-6)
    a = tn.randn(*([16] * 6), ranks_tt=8)
    kw = dict(function=lambda x: x * x, tensors=[a], verbose=False,
              ranks_tt=64, max_iter=2, eps=1e-4, seed=0)
    tn.cross(**{k: v for k, v in kw.items()})  # warm-up
    t0 = time.perf_counter()
    t, info = tn.cross(return_info=True, **kw)
    dt = time.perf_counter() - t0
    results["square6d"] = dict(
        nsamples=int(info["nsamples"]), total_s=round(dt, 3),
        evals_per_s=round(info["nsamples"] / dt, 1),
        val_eps=float(info["val_eps"]), max_rank=int(max(info["Rs"])),
    )

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
