"""Device-placement tests — the analog of the reference's tests/test_gpu.py:
decompositions on the accelerator must match CPU results. Degrades to the
same-device comparison when only CPU is present (as the reference does)."""

import jax
import numpy as np

import tntorch_tpu as tn


def _accel():
    for kind in ("tpu", "gpu"):
        try:
            devs = jax.devices(kind)
            if devs:
                return devs[0]
        except RuntimeError:
            pass
    return jax.devices("cpu")[0]


def test_device_decomposition_matches_cpu():
    device = _accel()
    cpu = jax.devices("cpu")[0]
    x = np.random.default_rng(0).random((8, 8, 8))

    t_cpu = tn.Tensor(jax.device_put(np.asarray(x), cpu), ranks_tt=3)
    t_dev = tn.Tensor(np.asarray(x), ranks_tt=3, device=device)
    assert np.linalg.norm(t_dev.numpy() - t_cpu.numpy()) <= 1e-5

    t_moved = t_cpu.clone().to(device)
    assert t_moved.cores[0].devices() == {device}
    assert np.linalg.norm(t_moved.numpy() - t_cpu.numpy()) <= 1e-10
