"""Multi-device sharding tests on the virtual 8-device CPU mesh
(the distributed story the reference lacks; SURVEY.md section 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tntorch_tpu as tn
from tntorch_tpu.parallel import (
    make_mesh, replicate, shard_batch, shard_ranks, sharded_dot, sharded_norm,
    tt_forward_sharded,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_8
def test_sharded_dot_matches():
    mesh = make_mesh((4, 2), ("dp", "tp"))
    a = tn.randn(8, 8, 8, 8, ranks_tt=4)
    b = tn.randn(8, 8, 8, 8, ranks_tt=4)
    gt = float(tn.dot(a, b))
    assert abs(float(sharded_dot(shard_ranks(a, mesh), shard_ranks(b, mesh))) - gt) <= 1e-8
    assert abs(float(sharded_norm(shard_ranks(a, mesh))) - float(tn.norm(a))) <= 1e-8
    assert abs(float(sharded_dot(replicate(a, mesh), replicate(b, mesh))) - gt) <= 1e-8


@needs_8
def test_shard_batch_roundtrip():
    mesh = make_mesh((4, 2), ("dp", "tp"))
    tb = tn.randn(16, 5, 5, 5, ranks_tt=3, batch=True)
    tbs = shard_batch(tb, mesh)
    assert np.allclose(tbs.numpy(), tb.numpy())
    # arithmetic on sharded batch tensors still works
    s = tbs + tbs
    assert np.allclose(s.numpy(), 2 * tb.numpy())


@needs_8
def test_tt_forward_sharded():
    mesh = make_mesh((4, 2), ("dp", "tp"))
    a = tn.randn(8, 8, 8, 8, ranks_tt=4)
    X = jnp.asarray(np.random.default_rng(0).integers(0, 8, (64, 4)), dtype=jnp.int32)
    y = tt_forward_sharded(list(a.cores), X, mesh)
    gt = a.numpy()[tuple(np.asarray(X).T)]
    assert np.allclose(np.asarray(y), gt, atol=1e-8)


@needs_8
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    ge.dryrun_multichip(3)


@needs_8
def test_dryrun_multichip_hermetic_subprocess():
    """Regression for round-1 MULTICHIP fail: when the live process cannot
    provide the requested CPU devices (here: 16 > 8, standing in for 'a
    foreign platform is the default backend'), the dryrun must re-exec a
    hermetic CPU-pinned subprocess rather than touch the default backend."""
    import __graft_entry__ as ge

    assert not ge._cpu_ready_in_process(16)
    ge.dryrun_multichip(16)


def test_entry_forward():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256,)
    assert np.isfinite(np.asarray(out)).all()


@needs_8
def test_fiber_parallel_cross():
    import jax.numpy as jnp

    mesh = make_mesh((8,), ("dp",))
    domain = [jnp.linspace(1, 16, 16)] * 4
    h = tn.cross(
        function=lambda a, b, c, d: 1.0 / (a + b + c + d),
        domain=domain, eps=1e-6, verbose=False, seed=0, mesh=mesh,
    )
    gt = 1.0 / sum(jnp.meshgrid(*domain, indexing="ij"))
    assert float(tn.relative_error(tn.Tensor(gt), h)) <= 1e-6


@needs_8
def test_tt_forward_shard_map():
    from tntorch_tpu.parallel import tt_forward_shard_map
    from tntorch_tpu.parallel.mesh import tt_batch_forward

    mesh = make_mesh((4, 2), ("dp", "tp"))
    for N in (4, 5):
        t = tn.randn(*([8] * N), ranks_tt=4)
        X = jnp.asarray(np.random.default_rng(0).integers(0, 8, (64, N)), dtype=jnp.int32)
        gt = tt_batch_forward(list(t.cores), X)
        y = tt_forward_shard_map(list(t.cores), X, mesh)
        assert float(jnp.abs(y - gt).max()) <= 1e-10
