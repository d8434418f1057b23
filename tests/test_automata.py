"""Weighted-automata tests (reference tests/test_automata.py)."""

import itertools

import numpy as np

import tntorch_tpu as tn

np.random.seed(8)


def test_weight_mask():
    for N in range(2, 6):
        for w in range(N + 1):
            t = tn.weight_mask(N, w)
            x = t.numpy()
            for s in itertools.product([0, 1], repeat=N):
                assert x[s] == (1.0 if sum(s) == w else 0.0)


def test_weight():
    t = tn.weight(4)
    x = t.numpy()
    for s in itertools.product([0, 1], repeat=4):
        assert x[s] == sum(s)


def test_weight_one_hot():
    import jax.numpy as jnp

    t = tn.weight_one_hot(3)
    # The one-hot counter lives in the dangling right rank; expose it as an
    # extra mode (as tn.sobol does, reference anova.py:141-143)
    t.cores.append(jnp.eye(t.cores[-1].shape[-1])[:, :, None])
    t.Us.append(None)
    x = t.numpy()
    for s in itertools.product([0, 1], repeat=3):
        onehot = np.zeros(4)
        onehot[sum(s)] = 1
        assert np.array_equal(x[s], onehot)


def test_length():
    t = tn.length(4, nsymbols=3)
    x = t.numpy()
    for s in itertools.product([0, 1, 2], repeat=4):
        assert x[s] == sum(1 for c in s if c != 0)


def test_accepted_inputs():
    for i in range(5):
        N = np.random.randint(2, 5)
        w = np.random.randint(0, N)
        t = tn.weight_mask(N, w)
        Xs = np.asarray(tn.accepted_inputs(t))
        # round-trip: every accepted string has weight w; count matches
        assert (Xs.sum(axis=1) == w).all()
        assert len(Xs) == round(float(tn.sum(t)))
        # lexicographic order, unique
        assert len(np.unique(Xs, axis=0)) == len(Xs)


def test_accepted_inputs_batch():
    """Batch tensors return one (total_b, N) index array per sample
    (beyond-parity; the reference rejects batch, automata.py:92-93)."""
    singles = [tn.weight_mask(4, 1), tn.weight_mask(4, 2)]
    tb = tn.stack(singles)
    out = tn.accepted_inputs(tb)
    assert isinstance(out, list) and len(out) == 2
    for b, single in enumerate(singles):
        np.testing.assert_array_equal(
            np.asarray(out[b]), np.asarray(tn.accepted_inputs(single))
        )
