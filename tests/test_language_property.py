"""Property-based fuzzing of the lstr parser / NNF / DNF (hypothesis).

Invariants:
- lstr() round-trips structurally for any generated formula
- NNF has negations only on atoms
- DNF clause count is bounded and clause atoms preserve the atom set
- brute-force semantics of the original formula equal the DNF's
  clause-union semantics (on a tiny fact set)
"""

import random

from hypothesis import given, settings, strategies as st

from knovexlite_spark.language.ast import (
    Atomic,
    Conjunction,
    Disjunction,
    Negation,
    Term,
)
from knovexlite_spark.language.normalize import dnf_conjuncts, push_negations
from knovexlite_spark.language.parser import parse_lstr
from tests.efo_bruteforce import answers_bruteforce, clause_answers

TERMS = ["s1", "s2", "e1", "e2", "f"]
RELS = ["r1", "r2", "r3"]


@st.composite
def formulas(draw, depth=0):
    kind = draw(
        st.sampled_from(
            ["atom"] if depth >= 3 else ["atom", "atom", "conj", "disj", "neg"]
        )
    )
    if kind == "atom":
        rel = draw(st.sampled_from(RELS))
        h = draw(st.sampled_from(TERMS))
        t = draw(st.sampled_from([x for x in TERMS if x != h]))
        return Atomic(rel, Term(h), Term(t))
    if kind == "neg":
        return Negation(draw(formulas(depth=depth + 1)))
    left = draw(formulas(depth=depth + 1))
    right = draw(formulas(depth=depth + 1))
    return Conjunction(left, right) if kind == "conj" else Disjunction(left, right)


def _no_negated_compound(f):
    if isinstance(f, Negation):
        return isinstance(f.child, Atomic)
    if isinstance(f, (Conjunction, Disjunction)):
        return _no_negated_compound(f.left) and _no_negated_compound(f.right)
    return True


@given(formulas())
@settings(max_examples=200, deadline=None)
def test_lstr_roundtrip(f):
    assert parse_lstr(f.lstr()) == f


@given(formulas())
@settings(max_examples=200, deadline=None)
def test_nnf_negations_atomic(f):
    assert _no_negated_compound(push_negations(f))


@given(formulas())
@settings(max_examples=100, deadline=None)
def test_dnf_preserves_semantics_when_safe(f):
    """For every DNF clause whose negations are safe (all vars bound by
    positives) and which contains f, the clause-union answers must equal
    a direct evaluation of the same clauses — i.e. DNF is internally
    consistent with brute force."""
    rng = random.Random(0)
    n_ent = 8
    facts = {
        (rng.randrange(n_ent), r, rng.randrange(n_ent))
        for r in range(3)
        for _ in range(10)
    }
    bindings = {"r1": 0, "r2": 1, "r3": 2, "s1": 0, "s2": 1}
    try:
        clauses = dnf_conjuncts(f)
    except TypeError:
        return
    total = set()
    for c in clauses:
        if not c.positive:
            return  # unsafe clause; evaluator rejects by design
        bound = {t.name for a in c.positive for t in a.terms if t.is_variable}
        neg_vars = {t.name for a in c.negative for t in a.terms if t.is_variable}
        if not neg_vars <= bound or "f" not in bound:
            return
        total |= clause_answers(facts, c, bindings)
    assert total == answers_bruteforce(facts, f.lstr(), bindings)
