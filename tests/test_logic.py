"""Boolean-logic tests (module untested in the reference; SURVEY.md section 4)."""

import numpy as np

import tntorch_tpu as tn


def test_connectives():
    x, y, z = tn.symbols(3)
    assert tn.is_tautology(x | ~x)
    assert tn.is_contradiction(x & ~x)
    assert tn.is_satisfiable(x & y)
    assert tn.implies(x & y, x)
    assert not tn.implies(x, x & y)
    assert tn.equiv(x | y, ~(~x & ~y))  # De Morgan
    assert tn.equiv(x ^ y, (x | y) & ~(x & y))


def test_quantifier_builders():
    assert float(tn.sum(tn.all(3))) == 1
    assert float(tn.sum(tn.none(3))) == 1
    assert float(tn.sum(tn.any(3))) == 7
    assert float(tn.sum(tn.one(3))) == 3
    assert float(tn.sum(tn.true(3))) == 8
    assert float(tn.sum(tn.false(3))) == 0


def test_relevant_symbols():
    x, y, z = tn.symbols(3)
    f = x & y  # z is irrelevant
    assert tn.relevant_symbols(f) == [0, 1]
    assert tn.irrelevant_symbols(f) == [2]
    assert float(tn.sum(x)) == 4  # x true in 4 of 8 strings
    assert float(tn.sum(tn.only(x))) == 1
