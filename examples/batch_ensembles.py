"""Batched ensembles: one code path for B independent compressed tensors.

The reference rejects batch tensors in nearly every analytics routine
(metrics.py:18-23, anova.py:20-21); here the whole pipeline — statistics,
Sobol sensitivity, rounding, checkpointing — runs vmap-style over the
leading batch axis, in single XLA programs instead of B Python loops.
Typical use: an ensemble of surrogate models (one per scenario/posterior
draw) analyzed in one shot.
"""

import os

import jax

if os.environ.get("TN_DEVICE", "cpu") == "cpu":
    # f64 analysis mode on CPU; set TN_DEVICE=tpu to run on the accelerator (f32)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
import tempfile

import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn


def main():
    B, N, I = 8, 4, 16

    # An ensemble of B perturbed models of the same 4D field
    rng = np.random.default_rng(0)
    base = tn.rand([I] * N, ranks_tt=4, key=jax.random.key(0))
    dense = np.asarray(base.numpy())
    ensemble = np.stack(
        [dense * (1 + 0.1 * rng.standard_normal()) + 0.05 * rng.standard_normal(dense.shape)
         for _ in range(B)]
    )
    t = tn.Tensor(jnp.asarray(ensemble), ranks_tt=8, batch=True)

    # --- Per-sample statistics, one call each (returns (B,) arrays) ---
    print("means:", np.round(np.asarray(tn.mean(t)), 4))
    print("stds: ", np.round(np.asarray(tn.std(t)), 4))

    # --- Per-sample Sobol sensitivity of variable 0, one call ---
    syms = tn.symbols(N)
    s0 = np.asarray(tn.sobol(t, tn.only(syms[0])))
    print("sobol S_0 per member:", np.round(s0, 4))
    dd = np.asarray(tn.dimension_distribution(t))
    print("dimension distribution (member 0):", np.round(dd[0], 4))

    # --- Build an ensemble from already-compressed members: tn.stack
    # zero-pads heterogeneous per-sample ranks to a common batch tensor ---
    members = [
        tn.rand([I] * N, ranks_tt=r, key=jax.random.key(100 + r)) for r in (2, 3, 5)
    ]
    small = tn.stack(members)
    print("stacked ensemble:", small.shape, "ranks", list(small.ranks_tt))
    print(
        "per-member values preserved:",
        all(
            # dist of near-identical tensors is cancellation-limited, so
            # compare relative to the member's norm
            float(tn.relative_error(members[b], small[b])) < 1e-7
            for b in range(len(members))
        ),
    )

    # --- Ensemble arithmetic with per-sample scalars ---
    centered = t - tn.mean(t)  # subtracts each member's own mean
    print("centered means ~0:", np.abs(np.asarray(tn.mean(centered))).max() < 1e-10)

    # --- Batch rounding: one jitted kernel, fixed-rank reference rule ---
    s = t + t
    s.round_tt(rmax=8)
    print("rounded ranks:", list(s.ranks_tt))

    # --- Sharded checkpoint: keep the batch axis distributed on a mesh ---
    from tntorch_tpu.parallel import make_mesh, shard_batch

    if len(jax.devices()) >= 2:
        mesh = make_mesh((len(jax.devices()), 1), ("dp", "tp"))
        ts = shard_batch(t, mesh) if B % len(jax.devices()) == 0 else t
        path = tempfile.mkdtemp() + "/ensemble_ckpt"
        tn.save_orbax_sharded(ts, path)
        back = tn.load_orbax_sharded(path, mesh=mesh)
        print(
            "sharded checkpoint round trip:",
            float(jnp.abs(back.cores[0] - ts.cores[0]).max()) == 0.0,
        )


if __name__ == "__main__":
    main()
