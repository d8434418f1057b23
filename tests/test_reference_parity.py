"""Numeric parity against the actual reference library.

SURVEY.md §4 ("Port implication") calls for numeric-parity fixtures against
tntorch outputs at <=1e-6 rel-err.  When the reference checkout is present
(read-only at /root/reference) and torch is importable, these tests feed the
SAME explicit cores to both libraries and compare outputs directly — exact
algebra at ~1e-10, approximate algorithms by their error against dense.

The whole module is skipped cleanly when the reference is unavailable, so the
suite remains standalone.
"""

import sys

import numpy as np
import pytest

import tntorch_tpu as tn

torch = pytest.importorskip("torch")
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")
rt = pytest.importorskip("tntorch")  # the reference


@pytest.fixture(autouse=True)
def _torch_f64():
    old = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(old)


def make_pair(cores, Us=None):
    """Build (reference_tensor, our_tensor) from the same NumPy cores."""
    tcores = [torch.from_numpy(np.asarray(c)) for c in cores]
    tUs = None if Us is None else [None if U is None else torch.from_numpy(np.asarray(U)) for U in Us]
    a = rt.Tensor(tcores, Us=tUs)
    b = tn.Tensor([np.asarray(c) for c in cores], Us=None if Us is None else list(Us))
    return a, b


def rng_cores(shape, ranks, rng, cp=False):
    if cp:
        return [rng.standard_normal((I, ranks)) for I in shape]
    rs = [1] + [ranks] * (len(shape) - 1) + [1]
    return [rng.standard_normal((rs[i], I, rs[i + 1])) for i, I in enumerate(shape)]


def rel(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    return np.linalg.norm(x - y) / max(np.linalg.norm(y), 1e-300)


def test_scalar_metrics_match():
    rng = np.random.default_rng(0)
    ca = rng_cores((5, 6, 4, 3), 3, rng)
    cb = rng_cores((5, 6, 4, 3), 2, rng)
    ra, oa = make_pair(ca)
    rb, ob = make_pair(cb)
    assert rel(float(tn.dot(oa, ob)), rt.dot(ra, rb).item()) < 1e-10
    assert rel(float(tn.norm(oa)), rt.norm(ra).item()) < 1e-10
    assert rel(float(tn.normsq(oa)), rt.normsq(ra).item()) < 1e-10
    assert rel(float(tn.dist(oa, ob)), rt.dist(ra, rb).item()) < 1e-10
    assert rel(float(tn.sum(oa)), rt.sum(ra).item()) < 1e-10
    assert rel(float(tn.mean(oa)), rt.mean(ra).item()) < 1e-10
    assert rel(float(tn.var(oa)), rt.var(ra).item()) < 1e-10
    assert rel(float(tn.std(oa)), rt.std(ra).item()) < 1e-10
    assert rel(float(tn.relative_error(oa, ob)), rt.relative_error(ra, rb).item()) < 1e-10
    assert rel(float(tn.rmse(oa, ob)), rt.rmse(ra, rb).item()) < 1e-10
    assert rel(float(tn.r_squared(oa, ob)), rt.r_squared(ra, rb).item()) < 1e-8


def test_arithmetic_dense_match():
    rng = np.random.default_rng(1)
    ca = rng_cores((4, 5, 3), 3, rng)
    cb = rng_cores((4, 5, 3), 2, rng)
    ra, oa = make_pair(ca)
    rb, ob = make_pair(cb)
    for rres, ores in [
        (ra + rb, oa + ob),
        (ra - rb, oa - ob),
        (ra * rb, oa * ob),
        (-ra, -oa),
        (ra * 2.5, oa * 2.5),
        (ra + 1.0, oa + 1.0),
        (2.0 - ra, 2.0 - oa),
    ]:
        assert rel(ores.numpy(), rres.torch().numpy()) < 1e-10


def test_cp_and_tucker_formats_match():
    rng = np.random.default_rng(2)
    shape = (4, 5, 3)
    cp_cores = rng_cores(shape, 3, rng, cp=True)
    r_cp, o_cp = make_pair(cp_cores)
    assert rel(o_cp.numpy(), r_cp.torch().numpy()) < 1e-10
    # TT-Tucker: 3D cores over smaller Tucker ranks + factor matrices
    tuck = [2, 3, 2]
    rs = [1, 2, 2, 1]
    cores = [rng.standard_normal((rs[i], tuck[i], rs[i + 1])) for i in range(3)]
    Us = [rng.standard_normal((shape[i], tuck[i])) for i in range(3)]
    r_tk, o_tk = make_pair(cores, Us=Us)
    assert rel(o_tk.numpy(), r_tk.torch().numpy()) < 1e-10
    # mixed arithmetic across formats
    assert rel((o_cp + o_tk).numpy(), (r_cp + r_tk).torch().numpy()) < 1e-10
    assert rel((o_cp * o_tk).numpy(), (r_cp * r_tk).torch().numpy()) < 1e-10
    assert rel(float(tn.dot(o_cp, o_tk)), rt.dot(r_cp, r_tk).item()) < 1e-10


def test_indexing_dense_match():
    rng = np.random.default_rng(3)
    cores = rng_cores((5, 6, 4, 3), 3, rng)
    r, o = make_pair(cores)
    keys = [
        (1, slice(None), slice(None), 2),
        (slice(None), slice(1, 5, 2), slice(None), slice(None)),
        (None, 2, slice(None), [0, 1, 3], slice(None)),
        (Ellipsis, 1),
        (slice(None), [0, 2], [1, 3], slice(None)),
    ]
    for key in keys:
        rres = r[key]
        ores = o[key]
        if isinstance(rres, rt.Tensor):
            assert rel(ores.numpy(), rres.torch().numpy()) < 1e-10, key
        else:
            assert rel(float(ores), rres.item()) < 1e-10, key


def test_round_sum_matches_reference_ranks_and_values():
    rng = np.random.default_rng(4)
    cores = rng_cores((6, 5, 4), 3, rng)
    r, o = make_pair(cores)
    r2 = r + r
    r2.round_tt(eps=1e-12)  # in-place, returns None (reference tensor.py:2008)
    o2 = o + o
    o2.round_tt(eps=1e-12)
    assert list(o2.ranks_tt) == list(r2.ranks_tt)
    assert rel(o2.numpy(), r2.torch().numpy()) < 1e-9


def test_ttsvd_decomposition_error_matches():
    rng = np.random.default_rng(5)
    X = rng.standard_normal((8, 8, 8))
    # low-rank-ish structure so truncation is meaningful
    X = np.einsum("ia,ja,ka->ijk", *(rng.standard_normal((8, 3)) for _ in range(3)))
    X += 1e-6 * rng.standard_normal(X.shape)
    rref = rt.Tensor(torch.from_numpy(X), ranks_tt=3)
    ours = tn.Tensor(X, ranks_tt=3)
    e_ref = rt.relative_error(rt.Tensor(torch.from_numpy(X)), rref).item()
    e_our = float(tn.relative_error(tn.Tensor(X), ours))
    # both are (near-)optimal rank-3 truncations of the same data
    assert abs(e_ref - e_our) < 1e-8
    # eps-driven rounding picks the same ranks
    rr = rt.Tensor(torch.from_numpy(X), eps=1e-4)
    oo = tn.Tensor(X, eps=1e-4)
    assert list(oo.ranks_tt) == list(rr.ranks_tt)


def test_anova_sobol_match():
    rng = np.random.default_rng(6)
    cores = rng_cores((4, 4, 4), 3, rng)
    r, o = make_pair(cores)
    ra = rt.anova_decomposition(r)
    oa = tn.anova_decomposition(o)
    assert rel(oa.numpy(), ra.torch().numpy()) < 1e-10
    ru = rt.undo_anova_decomposition(ra)
    ou = tn.undo_anova_decomposition(oa)
    assert rel(ou.numpy(), ru.torch().numpy()) < 1e-10
    for mask_pair in [
        (rt.weight_mask(3, 1), tn.weight_mask(3, 1)),
        (rt.weight_mask(3, [1, 2]), tn.weight_mask(3, [1, 2])),
    ]:
        rs = rt.sobol(r, mask_pair[0]).item()
        os_ = float(tn.sobol(o, mask_pair[1]))
        assert rel(os_, rs) < 1e-9
    assert rel(float(tn.mean_dimension(o)), rt.mean_dimension(r).item()) < 1e-9


def test_automata_and_logic_match():
    rm = rt.weight_mask(4, 2)
    om = tn.weight_mask(4, 2)
    assert rel(om.numpy(), rm.torch().numpy()) < 1e-12
    racc = rt.accepted_inputs(rm).numpy()
    oacc = np.asarray(tn.accepted_inputs(om))
    assert sorted(map(tuple, racc)) == sorted(map(tuple, oacc))
    roh = rt.weight_one_hot(3)
    ooh = tn.weight_one_hot(3)
    assert rel(ooh.numpy(), roh.torch().numpy()) < 1e-12
    # logic: (x0 | ~x0) is a tautology in both
    N = 3
    rx = rt.symbols(N)
    ox = tn.symbols(N)
    assert rt.is_tautology(rx[0] | ~rx[0]) and tn.is_tautology(ox[0] | ~ox[0])
    rf = (rx[0] & rx[1]) | rx[2]
    of = (ox[0] & ox[1]) | ox[2]
    assert rel(of.numpy(), rf.torch().numpy()) < 1e-10


def test_derivatives_match():
    rng = np.random.default_rng(7)
    cores = rng_cores((6, 6, 6), 3, rng)  # equal sizes: reference partial() uses mode-0 span
    r, o = make_pair(cores)
    for dim in range(3):
        rp = rt.partial(r, dim, order=1)
        op = tn.partial(o, dim, order=1)
        assert rel(op.numpy(), rp.torch().numpy()) < 1e-10
    rp2 = rt.partial(r, 0, order=2, periodic=True)
    op2 = tn.partial(o, 0, order=2, periodic=True)
    assert rel(op2.numpy(), rp2.torch().numpy()) < 1e-10
    rps = rt.partialset(r, order=1, mask=rt.weight_mask(3, 1))
    ops = tn.partialset(o, order=1, mask=tn.weight_mask(3, 1))
    assert rel(float(tn.norm(ops)), rt.norm(rps).item()) < 1e-9


def test_tools_match():
    rng = np.random.default_rng(8)
    ca = rng_cores((4, 5, 3), 3, rng)
    cb = rng_cores((4, 5, 3), 2, rng)
    ra, oa = make_pair(ca)
    rb, ob = make_pair(cb)
    assert rel(tn.cat(oa, ob, dim=1).numpy(), rt.cat(ra, rb, dim=1).torch().numpy()) < 1e-10
    assert rel(tn.flip(oa, 1).numpy(), rt.flip(ra, [1]).torch().numpy()) < 1e-10
    assert rel(tn.transpose(oa).numpy(), rt.transpose(ra).torch().numpy()) < 1e-10
    U = rng.standard_normal((7, 5))
    assert rel(
        tn.ttm(oa, U, dim=1).numpy(),
        rt.ttm(ra, torch.from_numpy(U), dim=1).torch().numpy(),
    ) < 1e-10
    assert rel(
        tn.pad(oa, 6, dim=0).numpy() if hasattr(tn, "pad") else tn.pad(oa, 6, 0).numpy(),
        rt.pad(ra, 6, dim=0).torch().numpy(),
    ) < 1e-10
    assert rel(tn.unsqueeze(oa, 0).numpy(), rt.unsqueeze(ra, 0).torch().numpy()) < 1e-10
    # cumsum is exact in both
    assert rel(tn.cumsum(oa, 1).numpy(), rt.cumsum(ra, [1]).torch().numpy()) < 1e-10


def test_ttmatrix_match():
    rng = np.random.default_rng(9)
    M = rng.standard_normal((16, 16))
    v = rng.standard_normal((16,))
    rM = rt.TTMatrix(torch.from_numpy(M), ranks=[16], input_dims=[4, 4], output_dims=[4, 4])
    oM = tn.TTMatrix(M, ranks=[16], input_dims=[4, 4], output_dims=[4, 4])
    assert rel(float(oM.trace()), rM.trace().item()) < 1e-10
    rres = rt.tt_multiply(rM, torch.from_numpy(v[None]))
    ores = tn.tt_multiply(oM, v[None])
    assert rel(np.asarray(ores), rres.numpy()) < 1e-9


def test_moments_match():
    rng = np.random.default_rng(10)
    cores = rng_cores((4, 4, 4), 2, rng)
    r, o = make_pair(cores)
    for k in (2, 3):
        assert rel(float(tn.raw_moment(o, k)), rt.raw_moment(r, k).item()) < 1e-8
        assert rel(
            float(tn.normalized_moment(o, k)), rt.normalized_moment(r, k).item()
        ) < 1e-7


def test_sparse_tt_svd_match():
    """sparse_tt_svd is deterministic (Gram + eigh per unfolding): both
    libraries must reconstruct the same zero-filled tensor."""
    rng = np.random.default_rng(11)
    shape = [6, 5, 4, 3]
    P = 80
    X = np.stack([rng.integers(0, s, P) for s in shape], axis=1)
    y = rng.standard_normal(P)
    ours = tn.sparse_tt_svd(X, y, eps=1e-10, shape=shape)
    theirs = rt.sparse_tt_svd(
        torch.from_numpy(X), torch.from_numpy(y), eps=1e-10, shape=shape
    )
    assert rel(ours.numpy(), theirs.numpy()) < 1e-8
    # eps-truncated variant: same reconstruction error class vs the dense
    # zero-filled oracle (signs/bases of individual cores may differ)
    dense = np.zeros(shape)
    dense[tuple(X.T)] = y  # (duplicate coords: either write is consistent
    # within each library; regenerate without duplicates to be safe)
    ours_t = tn.sparse_tt_svd(X, y, eps=0.3, shape=shape)
    theirs_t = rt.sparse_tt_svd(
        torch.from_numpy(X), torch.from_numpy(y), eps=0.3, shape=shape
    )
    e_ours = rel(np.asarray(ours_t.numpy()), dense)
    e_theirs = rel(theirs_t.numpy(), dense)
    assert e_ours <= e_theirs + 1e-6, (e_ours, e_theirs)


def test_pce_interpolator_match():
    """PCE surrogate: same data, same hyperparameters -> the two LARS
    implementations (ours native, theirs sklearn) must reach the same
    predictive quality; predictions should agree closely."""
    rng = np.random.default_rng(12)
    P, N = 120, 3
    X = rng.uniform(-1, 1, (P, N))
    y = X[:, 0] ** 2 + 0.5 * X[:, 0] * X[:, 1] - X[:, 2] + 0.05 * rng.standard_normal(P)
    Xt = rng.uniform(-1, 1, (40, N))
    yt = Xt[:, 0] ** 2 + 0.5 * Xt[:, 0] * Xt[:, 1] - Xt[:, 2]

    ours = tn.PCEInterpolator()
    ours.fit(X, y, p=4, q=0.75, val_split=0.1, seed=0, verbose=False)
    pred_o = np.asarray(ours.predict(Xt))
    e_ours = rel(pred_o, yt)
    assert e_ours < 0.1, e_ours  # recovers the cubic-free polynomial

    try:
        theirs = rt.PCEInterpolator()
        theirs.fit(
            torch.from_numpy(X), torch.from_numpy(y), p=4, q=0.75,
            val_split=0.1, seed=0, verbose=False,
        )
    except AttributeError:
        # The reference's PCE uses np.int/np.float, removed in numpy>=1.24;
        # it cannot run in this environment. Our side is still validated
        # against the analytic truth above.
        pytest.skip("reference PCEInterpolator incompatible with modern numpy")
    pred_r = theirs.predict(torch.from_numpy(Xt)).numpy()
    e_theirs = rel(pred_r, yt)
    # Equal predictive-quality class (the validation split / LARS stopping
    # may differ by implementation detail)
    assert e_ours < max(2 * e_theirs, 0.1), (e_ours, e_theirs)
    assert rel(pred_o, pred_r) < 0.1, rel(pred_o, pred_r)
