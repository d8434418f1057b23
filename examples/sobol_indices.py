"""Global sensitivity analysis (reference docs/tutorials/sobol.ipynb).

Sobol indices of the 20D Sobol g-function surrogate, computed entirely in
compressed TT form (BASELINE config 5).
"""

import os

import jax

if os.environ.get("TN_DEVICE", "cpu") == "cpu":
    # f64 analysis mode on CPU; set TN_DEVICE=tpu to run on the accelerator (f32)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn


def main():
    N = 20
    I = 16
    a = jnp.asarray([(n - 1.0) / 2.0 for n in range(1, N + 1)])

    # g-function: prod_n (|4x_n - 2| + a_n) / (1 + a_n); separable ->
    # representable exactly as a rank-1 TT over the grid
    xs = jnp.linspace(0, 1, I)
    cores = []
    for n in range(N):
        g = (jnp.abs(4 * xs - 2) + a[n]) / (1 + a[n])
        cores.append(g[None, :, None])
    t = tn.Tensor(cores)

    x_syms = tn.symbols(N)
    s1 = [float(tn.sobol(t, tn.only(x_syms[n]))) for n in range(4)]
    print("first-order indices (vars 0..3):", np.round(s1, 4))

    # closed Sobol index of {x0, x1}; total index of x0
    print("S_{x0 or x1}:", float(tn.sobol(t, tn.only(x_syms[0] | x_syms[1]))))
    print("S^T_{x0}:", float(tn.sobol(t, x_syms[0])))

    print("mean dimension:", float(tn.mean_dimension(t)))
    dd = np.asarray(tn.dimension_distribution(t))
    print("dimension distribution (first 5 orders):", np.round(dd[:5], 4))

    # Moments, fully compressed
    print("mean:", float(tn.mean(t)), " var:", float(tn.var(t)))


if __name__ == "__main__":
    main()
