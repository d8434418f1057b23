"""Decomposition formats (reference docs/tutorials/decompositions.ipynb).

TT, Tucker and CP decomposition of an analytic 128^3 field, with
compression ratios and relative errors.
"""

import time

import os

import jax

if os.environ.get("TN_DEVICE", "cpu") == "cpu":
    # f64 analysis mode on CPU; set TN_DEVICE=tpu to run on the accelerator (f32)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import tntorch_tpu as tn


def main():
    x = jnp.linspace(-1, 1, 128)
    X, Y, Z = jnp.meshgrid(x, x, x, indexing="ij")
    data = jnp.sqrt(jnp.sqrt(X**2 + (Y + Z) ** 2) + 1e-12)
    full = tn.Tensor(data)

    for kwargs in (dict(ranks_tt=3), dict(ranks_tucker=3), dict(ranks_cp=3)):
        t0 = time.time()
        t = tn.Tensor(data, **kwargs)
        dt = time.time() - t0
        print(
            "{:22s} compression {:8.1f}x   rel-err {:.2e}   {:.3f}s".format(
                str(kwargs), t.numel() / t.numcoef(), float(tn.relative_error(full, t)), dt
            )
        )
        print(t)

    # Hybrid: TT-Tucker
    t = tn.Tensor(data, ranks_tt=4, ranks_tucker=6)
    print("TT-Tucker rel-err:", float(tn.relative_error(full, t)))

    # Error-bounded: eps
    t = tn.Tensor(data, eps=1e-5)
    print("eps=1e-5 -> ranks", t.ranks_tt, "rel-err", float(tn.relative_error(full, t)))

    # TPU-first fast paths: jitted direct decomposition kernels
    t0 = time.time()
    t = tn.Tensor(data, ranks_tt=3, algorithm="randomized")  # one XLA program
    print("randomized TT-SVD: rel-err {:.2e} in {:.3f}s".format(
        float(tn.relative_error(full, t)), time.time() - t0))
    t0 = time.time()
    u = t + t
    u.round_tt(1e-8, algorithm="eig")  # adaptive-eps rounding, one jitted program
    print("adaptive-eps round: ranks", u.ranks_tt, "in {:.3f}s".format(time.time() - t0))


if __name__ == "__main__":
    main()
