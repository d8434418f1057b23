"""Vector calculus on compressed fields
(reference docs/tutorials/derivatives.ipynb + BASELINE config 5).

Gradient / divergence / curl / Laplacian of 3D fields, plus batched vector
field ops using batch=True (a leading batch dim through every core).
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
    I = 64
    axes = [jnp.linspace(0, 1, I)] * 3
    X, Y, Z = tn.meshgrid(axes)

    # Scalar potential phi = x^2 + y*z (low-rank by construction)
    phi = X * X + Y * Z
    bounds = [[0, 1]] * 3

    g = tn.gradient(phi, bounds=bounds)
    print("gradient ranks:", [int(max(gi.ranks_tt)) for gi in g])

    # curl(grad phi) = 0
    c = tn.curl(g, bounds=bounds)
    print("||curl grad phi|| (should be ~0):", [float(tn.norm(ci)) for ci in c])

    div = tn.divergence(g, bounds=bounds)
    lap = tn.laplacian(phi, bounds=bounds)
    print("||div grad - laplacian||:", float(tn.norm(div - lap)))

    # Active subspace of the potential
    w, v = tn.active_subspace(phi, bounds=bounds)
    print("active-subspace eigenvalues:", np.round(np.asarray(w), 6))

    # Batched 3D fields: 8 fields processed at once (batch dim in every core)
    B = 8
    batch = tn.randn(B, I, I, I, ranks_tt=4, batch=True)
    batch.round_tt(rmax=3, algorithm="gram")  # jitted batched rounding
    print("batched round ranks:", batch.ranks_tt, "batch:", batch.b())
    s = batch + batch
    print("batched arithmetic ok:", s.shape)


if __name__ == "__main__":
    main()
