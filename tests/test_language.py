"""Parser / NNF / DNF unit tests (SURVEY.md §5.1)."""

import pytest

from knovexlite_spark.language.ast import Atomic, Conjunction, Negation, Term, TermType
from knovexlite_spark.language.normalize import dnf_conjuncts, push_negations, to_dnf
from knovexlite_spark.language.parser import parse_lstr
from knovexlite_spark.language.query import QUERY_TYPES


@pytest.mark.parametrize("name,lstr", sorted(QUERY_TYPES.items()))
def test_parse_roundtrip(name, lstr):
    f1 = parse_lstr(lstr)
    f2 = parse_lstr(f1.lstr())
    assert f1 == f2


def test_term_types():
    assert Term("s1").type == TermType.CONSTANT
    assert Term("e2").type == TermType.EXISTENTIAL
    assert Term("f").type == TermType.FREE
    with pytest.raises(ValueError):
        Term("x1").type


def test_atom_structure():
    f = parse_lstr("r1(s1,f)")
    assert f == Atomic("r1", Term("s1"), Term("f"))


def test_nnf_demorgan():
    f = parse_lstr("!(r1(s1,f)&r2(s2,f))")
    assert push_negations(f).lstr() == "(!(r1(s1,f)))|(!(r2(s2,f)))"
    f = parse_lstr("!(r1(s1,f)|r2(s2,f))")
    assert push_negations(f).lstr() == "(!(r1(s1,f)))&(!(r2(s2,f)))"


def test_nnf_double_negation():
    f = parse_lstr("!(!(r1(s1,f)))")
    assert push_negations(f) == Atomic("r1", Term("s1"), Term("f"))


def test_dnf_distribution():
    # (a|b)&c -> (a&c)|(b&c)   — the `up` shape
    f = parse_lstr("(r1(s1,e1)|r2(s2,e1))&r3(e1,f)")
    clauses = dnf_conjuncts(f)
    assert len(clauses) == 2
    assert all(len(c.positive) == 2 and not c.negative for c in clauses)
    rels = sorted(tuple(sorted(a.relation for a in c.positive)) for c in clauses)
    assert rels == [("r1", "r3"), ("r2", "r3")]


def test_dnf_negation_stays_atomic():
    f = parse_lstr("r1(s1,f)&!r2(s2,f)")
    (clause,) = dnf_conjuncts(f)
    assert [a.relation for a in clause.positive] == ["r1"]
    assert [a.relation for a in clause.negative] == ["r2"]


def test_dnf_negated_disjunction():
    # a & !(b|c)  ->  a & !b & !c   (one clause, two negatives)
    f = parse_lstr("r1(s1,f)&!(r2(s2,f)|r3(s3,f))")
    (clause,) = dnf_conjuncts(f)
    assert len(clause.positive) == 1 and len(clause.negative) == 2


def test_parse_errors():
    for bad in ["r1(s1,f", "r1(s1)", "&r1(s1,f)", "r1(s1,f)&", "r1(s1,f))"]:
        with pytest.raises(ValueError):
            parse_lstr(bad)
