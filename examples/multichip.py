"""Multi-chip sharding (new vs the reference, which is single-device only).

Runs on any device set; to simulate 8 chips on CPU:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/multichip.py
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if os.environ.get("TN_DEVICE", "cpu") == "cpu":
    # Simulate the mesh on virtual CPU devices (a JAX_PLATFORMS env var
    # pointing at an unavailable plugin would otherwise fail at init);
    # set TN_DEVICE=tpu to run on real accelerators
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn
from tntorch_tpu.parallel import (
    make_mesh, shard_batch, shard_ranks, sharded_dot, sharded_norm, tt_forward_sharded,
)


def main():
    n = len(jax.devices())
    print(f"{n} devices: {jax.devices()}")
    shape = (n // 2, 2) if n % 2 == 0 and n > 1 else (n, 1)
    mesh = make_mesh(shape, ("dp", "tp"))
    print("mesh:", mesh)

    # Rank-parallel contraction: TT-rank edges shard over 'tp'
    a = tn.randn(16, 16, 16, 16, ranks_tt=8)
    b = tn.randn(16, 16, 16, 16, ranks_tt=8)
    asr, bsr = shard_ranks(a, mesh), shard_ranks(b, mesh)
    print("sharded dot:", float(sharded_dot(asr, bsr)), " norm:", float(sharded_norm(asr)))

    # Data-parallel batch: leading batch dim shards over 'dp'
    tb = tn.randn(8 * shape[0], 8, 8, 8, ranks_tt=4, batch=True)
    tbs = shard_batch(tb, mesh)
    print("batch-sharded cores:", [c.sharding for c in tbs.cores][:1])

    # Sharded flagship forward: samples over dp, rank edges over tp
    X = jnp.asarray(np.random.default_rng(0).integers(0, 16, (128, 4)), dtype=jnp.int32)
    yv = tt_forward_sharded(list(a.cores), X, mesh)
    print("sharded forward:", yv.shape, yv.sharding)

    # Distributed heavy algorithms (round 2): multi-device Gram rounding
    # (cores sharded along their MODE dims, one psum per edge) ...
    from tntorch_tpu.parallel import (
        round_tt_batch_sharded, round_tt_gram_sharded, shard_array,
    )

    s = a + a  # rank doubles to 16
    rounded = round_tt_gram_sharded(list(s.cores), 8, mesh, axis="tp")
    t_r = tn.Tensor([np.asarray(c) for c in rounded])
    print("sharded Gram rounding:", list(t_r.ranks_tt),
          " rel-err vs 2a:", float(tn.relative_error(a * 2, t_r)))

    # ... batch-sharded rounding (batch dim over dp, no communication) ...
    sb = tbs + tbs
    brounded = round_tt_batch_sharded(list(sb.cores), 4, mesh, axis="dp")
    print("batch-sharded rounding:", [c.shape for c in brounded][:2])

    # ... and dp-sharded training: replicated cores + sharded samples ->
    # XLA inserts the gradient psum (optimize(..., mesh=))
    import optax

    w = tn.rand([16] * 4, ranks_tt=4, requires_grad=True)
    Xs = shard_array(np.random.default_rng(1).integers(0, 16, (64 * shape[0], 4)).astype(np.int32), mesh)
    ys = shard_array(np.asarray(a.numpy()[tuple(np.asarray(Xs).T)]), mesh)

    def loss(t):
        pred = tn.parallel.tt_batch_forward(list(t.cores), Xs)
        return jnp.mean((pred - ys) ** 2)

    hist = tn.optimize(w, loss, optimizer=optax.adam(1e-2), max_iter=50,
                       tol=None, verbose=False, mesh=mesh)
    print(f"dp-sharded optimize: loss {hist[0]:.4f} -> {hist[-1]:.4f}")


if __name__ == "__main__":
    main()
