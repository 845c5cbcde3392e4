"""Logic-AST rewrites (SURVEY.md §2.2 L3-L5): NNF, DNF, flatten.

Reference parity: ``push_negations`` (De Morgan + double-negation,
/root/reference/knovex/language/efo_lang.py:379-401),
``push_conjunctions`` (∧-over-∨ distribution, efo_lang.py:404-440),
``transform_to_dnf`` / DNF flattening (efo_lang.py:443-506).

These run driver-side on the tiny logic AST *above* the DataFrame
layer — Catalyst then optimizes each disjunct's join plan and the final
UNION normally.
"""

from __future__ import annotations

from knovexlite_spark.language.ast import (
    Atomic,
    Conjunction,
    ConjunctiveClause,
    Disjunction,
    Formula,
    Negation,
)


def push_negations(f: Formula) -> Formula:
    """NNF: negations pushed to atomic level (efo_lang.py:379-401)."""
    if isinstance(f, Atomic):
        return f
    if isinstance(f, Negation):
        c = f.child
        if isinstance(c, Negation):
            return push_negations(c.child)
        if isinstance(c, Conjunction):
            return Disjunction(
                push_negations(Negation(c.left)), push_negations(Negation(c.right))
            )
        if isinstance(c, Disjunction):
            return Conjunction(
                push_negations(Negation(c.left)), push_negations(Negation(c.right))
            )
        return f  # !atom
    if isinstance(f, Conjunction):
        return Conjunction(push_negations(f.left), push_negations(f.right))
    if isinstance(f, Disjunction):
        return Disjunction(push_negations(f.left), push_negations(f.right))
    raise TypeError(type(f))


def push_conjunctions(f: Formula) -> Formula:
    """Distribute ∧ over ∨ until DNF (efo_lang.py:404-440).
    Assumes NNF input."""
    if isinstance(f, (Atomic, Negation)):
        return f
    if isinstance(f, Disjunction):
        return Disjunction(push_conjunctions(f.left), push_conjunctions(f.right))
    if isinstance(f, Conjunction):
        left = push_conjunctions(f.left)
        right = push_conjunctions(f.right)
        if isinstance(left, Disjunction):
            return Disjunction(
                push_conjunctions(Conjunction(left.left, right)),
                push_conjunctions(Conjunction(left.right, right)),
            )
        if isinstance(right, Disjunction):
            return Disjunction(
                push_conjunctions(Conjunction(left, right.left)),
                push_conjunctions(Conjunction(left, right.right)),
            )
        return Conjunction(left, right)
    raise TypeError(type(f))


def to_dnf(f: Formula) -> Formula:
    return push_conjunctions(push_negations(f))


def _flatten_conjunction(f: Formula, clause: ConjunctiveClause) -> None:
    if isinstance(f, Conjunction):
        _flatten_conjunction(f.left, clause)
        _flatten_conjunction(f.right, clause)
    elif isinstance(f, Negation):
        assert isinstance(f.child, Atomic), "not in NNF"
        clause.negative.append(f.child)
    elif isinstance(f, Atomic):
        clause.positive.append(f)
    else:
        raise TypeError(f"disjunction under conjunction — not DNF: {f.lstr()}")


def dnf_conjuncts(f: Formula) -> list[ConjunctiveClause]:
    """Flatten a DNF formula into its list of conjunctive clauses
    (efo_lang.py:443-506)."""
    dnf = to_dnf(f)
    out: list[ConjunctiveClause] = []
    stack = [dnf]
    while stack:
        node = stack.pop()
        if isinstance(node, Disjunction):
            stack.append(node.right)
            stack.append(node.left)
        else:
            clause = ConjunctiveClause()
            _flatten_conjunction(node, clause)
            out.append(clause)
    return out
