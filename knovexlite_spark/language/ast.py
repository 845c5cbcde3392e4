"""EFO logic AST (SURVEY.md §2.2 L2).

Reference parity: Lobject/Term/Formula/Atomic/Negation/Conjunction/
Disjunction with ``lstr()`` round-trip,
/root/reference/knovex/language/efo_lang.py:70-239.  Term typing follows
the name-prefix convention (efo_lang.py:268-280): ``s*`` constant
(anchor), ``e*`` existential variable, ``f*`` free variable.

Queries are tiny (<= ~8 nodes), so the AST is plain driver-side Python;
it compiles to DataFrame plans in ``plans/exact.py``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum


class TermType(IntEnum):
    CONSTANT = 0
    EXISTENTIAL = 1
    FREE = 2


@dataclass(frozen=True)
class Term:
    name: str

    @property
    def type(self) -> TermType:
        if self.name.startswith("s"):
            return TermType.CONSTANT
        if self.name.startswith("e"):
            return TermType.EXISTENTIAL
        if self.name.startswith("f"):
            return TermType.FREE
        raise ValueError(f"unknown term prefix: {self.name!r}")

    @property
    def is_constant(self) -> bool:
        return self.type == TermType.CONSTANT

    @property
    def is_variable(self) -> bool:
        return self.type != TermType.CONSTANT

    def lstr(self) -> str:
        return self.name


class Formula:
    def lstr(self) -> str:
        raise NotImplementedError

    def atoms(self) -> list["Atomic"]:
        raise NotImplementedError

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.lstr()})"


@dataclass(frozen=True)
class Atomic(Formula):
    relation: str  # relation symbol name, e.g. "r1" (bound per instance)
    head: Term
    tail: Term

    def lstr(self) -> str:
        return f"{self.relation}({self.head.name},{self.tail.name})"

    def atoms(self) -> list["Atomic"]:
        return [self]

    @property
    def terms(self) -> tuple[Term, Term]:
        return (self.head, self.tail)


@dataclass(frozen=True)
class Negation(Formula):
    child: Formula

    def lstr(self) -> str:
        return f"!({self.child.lstr()})"

    def atoms(self) -> list[Atomic]:
        return self.child.atoms()


@dataclass(frozen=True)
class Conjunction(Formula):
    left: Formula
    right: Formula

    def lstr(self) -> str:
        return f"({self.left.lstr()})&({self.right.lstr()})"

    def atoms(self) -> list[Atomic]:
        return self.left.atoms() + self.right.atoms()


@dataclass(frozen=True)
class Disjunction(Formula):
    left: Formula
    right: Formula

    def lstr(self) -> str:
        return f"({self.left.lstr()})|({self.right.lstr()})"

    def atoms(self) -> list[Atomic]:
        return self.left.atoms() + self.right.atoms()


@dataclass
class ConjunctiveClause:
    """A flat conjunction of possibly-negated atoms (one DNF disjunct)."""

    positive: list[Atomic] = field(default_factory=list)
    negative: list[Atomic] = field(default_factory=list)

    def all_atoms(self) -> list[Atomic]:
        return self.positive + self.negative

    def variables(self) -> set[str]:
        return {
            t.name for a in self.all_atoms() for t in a.terms if t.is_variable
        }

    def constants(self) -> set[str]:
        return {
            t.name for a in self.all_atoms() for t in a.terms if t.is_constant
        }
