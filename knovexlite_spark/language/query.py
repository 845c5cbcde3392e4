"""EFOQuery descriptor + the standard 26-type query corpus.

Reference parity: ``EFOQuery`` (term/atom registries, free/existential
partitions, instance binding,
/root/reference/knovex/language/efo_lang.py:509-657), QAA binding
(efo_lang.py:568-588), BFS variable ordering from the free variable
(efo_lang.py:749-776 — implemented here with the *intended* semantics;
the reference's version has latent bugs, SURVEY.md §2.9), and the
15 BetaE + 11 EFO-1 lstr templates
(/root/reference/knovex/utils/metric.py:6-66).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from knovexlite_spark.language.ast import ConjunctiveClause, Formula, TermType
from knovexlite_spark.language.normalize import dnf_conjuncts
from knovexlite_spark.language.parser import parse_lstr

# lstr templates for the standard corpus (metric.py:6-66).
BETAE_TYPES = {
    "1p": "r1(s1,f)",
    "2p": "r1(s1,e1)&r2(e1,f)",
    "3p": "r1(s1,e1)&r2(e1,e2)&r3(e2,f)",
    "2i": "r1(s1,f)&r2(s2,f)",
    "3i": "r1(s1,f)&r2(s2,f)&r3(s3,f)",
    "ip": "r1(s1,e1)&r2(s2,e1)&r3(e1,f)",
    "pi": "r1(s1,e1)&r2(e1,f)&r3(s2,f)",
    "2in": "r1(s1,f)&!r2(s2,f)",
    "3in": "r1(s1,f)&r2(s2,f)&!r3(s3,f)",
    "inp": "r1(s1,e1)&!r2(s2,e1)&r3(e1,f)",
    "pin": "r1(s1,e1)&r2(e1,f)&!r3(s2,f)",
    "pni": "r1(s1,e1)&!r2(e1,f)&r3(s2,f)",
    "2u": "r1(s1,f)|r2(s2,f)",
    "up": "(r1(s1,e1)|r2(s2,e1))&r3(e1,f)",
    "up-dnf": "(r1(s1,e1)&r3(e1,f))|(r2(s2,e1)&r3(e1,f))",
}

EFO1_TYPES = {
    "2m": "((r1(s1,e1))&(r2(e1,f)))&(r3(e1,f))",
    "2nm": "((r1(s1,e1))&(r2(e1,f)))&(!(r3(e1,f)))",
    "3mp": "(((r1(s1,e1))&(r2(e1,e2)))&(r3(e2,f)))&(r4(e1,e2))",
    "3pm": "(((r1(s1,e1))&(r2(e1,e2)))&(r3(e2,f)))&(r4(e2,f))",
    "im": "(((r1(s1,e1))&(r2(s2,e1)))&(r3(e1,f)))&(r4(e1,f))",
    "2il": "(r1(s1,f))&(r2(e1,f))",
    "3il": "((r1(s1,f))&(r2(s2,f)))&(r3(e1,f))",
    "3c": "((((r1(s1,e1))&(r2(e1,f)))&(r3(s2,e2)))&(r4(e2,f)))&(r5(e1,e2))",
    "3cm": "(((((r1(s1,e1))&(r2(e1,f)))&(r3(s2,e2)))&(r4(e2,f)))&(r5(e1,e2)))&(r6(e1,f))",
    "3pcp": "(((((r1(s1,e1))&(r2(e1,e3)))&(r3(s2,e2)))&(r4(e2,e3)))&(r5(e1,e2)))&(r6(e3,f))",
    "pni-efo1": "((r1(s1,e1))&(!(r2(e1,f))))&(r3(s2,f))",
}

QUERY_TYPES = {**BETAE_TYPES, **EFO1_TYPES}
name2lstr = QUERY_TYPES


@dataclass
class EFOQuery:
    """Parsed query + symbol partitions + per-instance bindings."""

    lstr: str
    formula: Formula
    instances: list[dict[str, int]] = field(default_factory=list)

    @classmethod
    def from_lstr(cls, lstr: str) -> "EFOQuery":
        return cls(lstr=lstr, formula=parse_lstr(lstr))

    # -- symbol partitions (efo_lang.py:604-657) ---------------------------

    def term_names(self) -> set[str]:
        return {t.name for a in self.formula.atoms() for t in a.terms}

    def free_variables(self) -> set[str]:
        return {
            t.name
            for a in self.formula.atoms()
            for t in a.terms
            if t.type == TermType.FREE
        }

    def existential_variables(self) -> set[str]:
        return {
            t.name
            for a in self.formula.atoms()
            for t in a.terms
            if t.type == TermType.EXISTENTIAL
        }

    def constant_symbols(self) -> set[str]:
        return {
            t.name for a in self.formula.atoms() for t in a.terms if t.is_constant
        }

    def relation_symbols(self) -> set[str]:
        return {a.relation for a in self.formula.atoms()}

    @property
    def is_sentence(self) -> bool:
        return not self.free_variables()

    # -- binding (efo_lang.py:568-588) -------------------------------------

    def append_instance(self, bindings: dict[str, int]) -> None:
        """Bind every s*/r* symbol to an id. Validates coverage."""
        missing = (self.constant_symbols() | self.relation_symbols()) - set(bindings)
        if missing:
            raise ValueError(f"unbound symbols: {sorted(missing)}")
        self.instances.append(dict(bindings))

    # -- planning ----------------------------------------------------------

    def conjuncts(self) -> list[ConjunctiveClause]:
        return dnf_conjuncts(self.formula)


def bfs_variable_ordering(clause: ConjunctiveClause, source: str = "f") -> list[list[str]]:
    """L9: BFS levels over the clause's term-adjacency graph starting at
    the free variable — the evaluation order for backward search
    (intended semantics of efo_lang.py:749-776)."""
    adj: dict[str, set[str]] = {}
    for a in clause.all_atoms():
        h, t = a.head.name, a.tail.name
        adj.setdefault(h, set()).add(t)
        adj.setdefault(t, set()).add(h)
    seen = {source}
    levels = [[source]]
    frontier = deque([source])
    while frontier:
        nxt: list[str] = []
        for _ in range(len(frontier)):
            u = frontier.popleft()
            for v in sorted(adj.get(u, ())):
                if v not in seen:
                    seen.add(v)
                    nxt.append(v)
                    frontier.append(v)
        if nxt:
            levels.append(nxt)
    return levels
