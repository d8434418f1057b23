"""TT-cross approximation (reference docs/tutorials/cross.ipynb).

Builds TTs from black-box functions sampled on maxvol-chosen fibers:
a 5D Hilbert tensor over 3.4e7 grid points, then elementwise functions of
existing compressed tensors, then global minima.
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
    # Domain mode: f: R^5 -> R over a grid
    domain = [jnp.linspace(1, 32, 32)] * 5
    t0 = time.time()
    t = tn.cross(function=lambda x, y, z, u, v: 1.0 / (x + y + z + u + v),
                 domain=domain, eps=1e-6, verbose=True, seed=0)
    print("Hilbert 32^5:", t.ranks_tt, "in {:.2f}s".format(time.time() - t0))

    # Matrix-callback mode
    t2 = tn.cross(function=lambda M: 1.0 / jnp.sum(M, axis=1), domain=domain,
                  function_arg="matrix", eps=1e-6, verbose=False, seed=0)
    print("matrix mode rel-err:", float(tn.relative_error(t, t2)))

    # Tensor mode: elementwise transforms of compressed tensors
    tsq = tn.cross(function=lambda x: x**2, tensors=[t], verbose=False, seed=0)
    print("x^2 rel-err vs dense:", float(tn.relative_error(tn.Tensor(t.full() ** 2), tsq)))

    # Element-wise division t1 / t2 rides the same machinery
    ones = tn.ones(*t.shape)
    inv = ones / t
    print("1/t rel-err:", float(tn.relative_error(tn.Tensor(1 / t.full()), inv)))

    # Global optima (Oseledets' atan transform + rect_maxvol)
    q = tn.randn(8, 8, 8, 8, ranks_tt=3, key=jax.random.key(7))
    print("min found/true:", float(tn.minimum(q, verbose=False)), float(q.full().min()))
    print("argmax:", tn.argmax(q, verbose=False))

    # Differentiable cross (reference diffcross.ipynb): record the pivots
    # once, then replay them with fresh evaluations — no maxvol in the
    # replay, so jax.grad flows through the whole interpolation
    w = tn.randn(8, 8, 8, 8, ranks_tt=3, key=jax.random.key(8))
    _, info = tn.cross(lambda x: x**2, tensors=[w], verbose=False,
                       return_info=True, seed=1)

    def loss(cores):
        wt = tn.Tensor(list(cores))
        out = tn.cross_forward(info, lambda x: x**2, tensors=[wt])
        return tn.normsq(out)

    g = jax.grad(loss)(tuple(w.cores))
    print("grad through cross_forward: |g0| = {:.4g}".format(
        float(jnp.abs(g[0]).max())))

    # Host-only functions (NumPy ufuncs, wrapped C libraries — anything
    # that cannot trace) still cross-approximate: where the backend hosts
    # callbacks they embed into the fused device program; elsewhere the
    # whole sweep runs natively on the host (NumPy/BLAS/C++ — cross_host.py;
    # fuse='host' forces that path explicitly)
    import numpy as np

    def black_box(a, b, c):
        return np.sqrt(np.asarray(a) ** 2 + np.asarray(b) ** 2
                       + np.asarray(c) ** 2)

    dom3 = [jnp.linspace(0.0, 1.0, 32)] * 3
    hb, hinfo = tn.cross(function=black_box, domain=dom3, eps=1e-6,
                         verbose=False, fuse="host", return_info=True)
    print("host-sweep cross: val_eps={:.2e}, ranks={}".format(
        hinfo["val_eps"], list(hb.ranks_tt)))


if __name__ == "__main__":
    main()
