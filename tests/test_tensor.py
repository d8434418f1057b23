"""Tensor construction / batch-vs-loop consistency / arithmetic over format
pairs (reference tests/test_tensor.py)."""

import numpy as np
import pytest

import tntorch_tpu as tn

np.random.seed(4)


def test_complex_tensor():
    a = np.random.rand(10, 10, 10) + 1j * np.random.rand(10, 10, 10)
    b = tn.Tensor(a)
    assert np.allclose(a, b.numpy())


def _check_batch_vs_loop(a, exact=True, **kwargs):
    b = tn.Tensor(a, batch=True, **kwargs)
    for i in range(len(a)):
        c = tn.Tensor(a[i], batch=False, **kwargs)
        if exact:
            for j, core in enumerate(c.cores):
                assert np.allclose(core, b.cores[j][i, ...], atol=1e-8)
            assert np.allclose(c.numpy(), b.numpy()[i], atol=1e-8)
        else:
            assert np.linalg.norm(c.numpy() - b.numpy()[i]) < 1e1


def test_tensor():
    _check_batch_vs_loop(np.random.rand(10, 5, 5, 5, 5))


def test_tt_tensor():
    _check_batch_vs_loop(np.random.rand(10, 5, 5, 5, 5), ranks_tt=3)
    _check_batch_vs_loop(np.random.rand(10, *([2] * 10)), ranks_tt=3)


def test_cp_tensor():
    _check_batch_vs_loop(np.random.rand(10, 5, 5, 5, 5), exact=False, ranks_cp=3)


def test_tucker_tensor():
    _check_batch_vs_loop(np.random.rand(10, 5, 5, 5, 5), ranks_tucker=3)


def test_tucker_cp_tensor():
    _check_batch_vs_loop(
        np.random.rand(10, 5, 5, 5, 5), exact=False, ranks_tucker=3, ranks_cp=4
    )


def test_tensor_eig():
    a = np.random.rand(10, 5, 5, 5, 5)
    b = tn.Tensor(a, ranks_tucker=3, batch=True, algorithm="eig")
    for i in range(len(a)):
        c = tn.Tensor(a[i], ranks_tucker=3, batch=False, algorithm="eig")
        assert np.allclose(c.numpy(), b.numpy()[i], atol=1e-6)
    b = tn.Tensor(a, ranks_tt=3, batch=True, algorithm="eig")
    for i in range(len(a)):
        c = tn.Tensor(a[i], ranks_tt=3, batch=False, algorithm="eig")
        assert np.allclose(c.numpy(), b.numpy()[i], atol=1e-6)


FORMATS = [
    dict(ranks_tt=3),
    dict(ranks_cp=3),
    dict(ranks_tucker=3),
    dict(ranks_tucker=3, ranks_cp=3),
    dict(ranks_tucker=3, ranks_tt=3),
]


@pytest.mark.parametrize("fa", FORMATS)
@pytest.mark.parametrize("fb", FORMATS)
def test_sum_formats(fa, fb):
    a = tn.rand((10, 5, 6), **fa)
    b = tn.rand((10, 5, 6), **fb)
    assert np.allclose((a + b).numpy(), a.numpy() + b.numpy())
    assert np.allclose((a * b).numpy(), a.numpy() * b.numpy())


@pytest.mark.parametrize("f", FORMATS[:3])
def test_sum_mul_batch(f):
    a = tn.rand((10, 5, 6), batch=True, **f)
    b = tn.rand((10, 5, 6), batch=True, **f)
    assert np.allclose((a + b).numpy(), a.numpy() + b.numpy())
    assert np.allclose((a * b).numpy(), a.numpy() * b.numpy())


def test_scalar_ops():
    a = tn.rand((10, 5, 6), ranks_tt=3)
    assert np.allclose((a + 5).numpy(), a.numpy() + 5)
    assert np.allclose((a * -2.5).numpy(), a.numpy() * -2.5)
    assert np.allclose((a / 2).numpy(), a.numpy() / 2)
    assert np.allclose((2 - a).numpy(), 2 - a.numpy())


def test_incompatible_ranks():
    with pytest.raises(ValueError) as exc_info:
        tn.rand((10, 5, 6), ranks_cp=3, ranks_tt=3)
    assert exc_info.value.args[0] == "The ranks_tt and ranks_cp provided are incompatible"


@pytest.mark.parametrize("f", FORMATS)
def test_ellipsis_indexing(f):
    a = tn.rand((10, 5, 6), **f)
    b = a.numpy()
    assert np.allclose(a[None].numpy(), b[None])
    assert np.allclose(a[None, ..., None].numpy(), b[None, ..., None])
    assert np.allclose(a[0, ..., 1].numpy(), b[0, ..., 1])
    assert np.allclose(a[None, ..., 1].numpy(), b[None, ..., 1])
    assert np.allclose(a[None, ..., -1].numpy(), b[None, ..., -1])


@pytest.mark.parametrize("f", FORMATS[:3])
def test_ellipsis_indexing_batch(f):
    a = tn.rand((10, 5, 6), batch=True, **f)
    b = a.numpy()
    with pytest.raises(ValueError) as exc_info:
        a[None]
    assert exc_info.value.args[0] == "Cannot change batch dimension"
    assert np.allclose(a[..., None].numpy(), b[..., None])
    assert np.allclose(a[0, ..., 1].numpy(), b[0, ..., 1])
    assert np.allclose(a[..., 1].numpy(), b[..., 1])
    assert np.allclose(a[..., -1].numpy(), b[..., -1])


def test_round_keeps_value():
    for kwargs, batch in [
        (dict(ranks_tucker=3), False),
        (dict(ranks_tucker=3), True),
        (dict(ranks_tt=3), False),
        (dict(ranks_tt=3), True),
        (dict(ranks_cp=3), False),
        (dict(ranks_cp=3), True),
    ]:
        a = tn.rand((10, 5, 6), batch=batch, **kwargs)
        b = a.clone()
        if "ranks_tucker" in kwargs:
            a.round_tucker(eps=1e-8)
        else:
            a.round_tt(eps=1e-8)
        assert np.linalg.norm(b.numpy() - a.numpy()) < 1e-7


def test_set_item():
    a = tn.rand((10, 5, 6), ranks_tt=3)
    b = np.array(a.numpy())
    a[5, 2, 3] = 6
    b[5, 2, 3] = 6
    assert abs(float(a[5, 2, 3]) - 6) < 1e-10

    a[5, 2, :] = 7
    b[5, 2, :] = 7
    assert np.allclose(a[5, 2, :].numpy(), b[5, 2, :])

    a[..., :] = 8
    b[..., :] = 8
    assert np.allclose(a.numpy(), b)

    a = tn.rand((10, 5, 6), ranks_tt=3)
    b = np.array(a.numpy())
    v = np.random.rand(10)
    a[:, 2, 0] = v
    b[:, 2, 0] = v
    assert np.allclose(a[:, 2, 0].numpy(), b[:, 2, 0])

    v = np.random.rand(10, 5)
    a[:, :, 0] = v
    b[:, :, 0] = v
    assert np.allclose(a[:, :, 0].numpy(), b[:, :, 0])

    v = np.random.rand(10, 5, 2)
    a[..., 3:5] = v
    b[..., 3:5] = v
    assert np.allclose(a[..., 3:5].numpy(), b[..., 3:5])

    v = np.random.rand(5, 2)
    a[2, :, 3:5] = v
    b[2, :, 3:5] = v
    assert np.allclose(a[2, :, 3:5].numpy(), b[2, :, 3:5])


def test_set_item_batch():
    a = tn.rand((10, 5, 6), ranks_tt=3, batch=True)
    b = np.array(a.numpy())
    a[5] = 6
    b[5] = 6
    assert np.allclose(a[5].numpy(), b[5])

    a[5, 2, 3] = 7
    b[5, 2, 3] = 7
    assert abs(float(a[5, 2, 3]) - 7) < 1e-10

    a[..., :] = 8
    b[..., :] = 8
    assert np.allclose(a.numpy(), b)


def test_repr_and_counts():
    a = tn.rand((10, 5, 6), ranks_tt=3, ranks_tucker=2)
    s = repr(a)
    assert "TT" in s and "Tucker" in s
    assert a.numel() == 300
    # cores: (1,2,3)+(3,2,3)+(3,2,1) = 30; Tucker factors: (10+5+6)*2 = 42
    assert a.numcoef() == 30 + 42


def test_torch_interop_and_misc():
    a = tn.rand((4, 5), ranks_tt=2)
    tt = a.torch()  # PyTorch interop
    import torch

    assert isinstance(tt, torch.Tensor)
    assert np.allclose(tt.numpy(), a.numpy())
    assert a.size() == a.shape
    b = tn.rand((3, 4, 5), ranks_tt=2, batch=True)
    assert b.b() == 3
    # construct from a torch tensor
    c = tn.Tensor(torch.rand(4, 5, 6), ranks_tt=2)
    assert c.shape == (4, 5, 6)
    # repr of batch tensor
    assert "batch" in repr(b)
