"""Independent brute-force EFO evaluator over an in-memory fact set.

Used as the oracle for plans/exact.py (SURVEY.md §5.3).  Deliberately a
different algorithm family: per-clause backtracking over indexed facts,
no DataFrames, no shared join-ordering code.
"""

from __future__ import annotations

import random
from collections import defaultdict

from knovexlite_spark.language.ast import Atomic, ConjunctiveClause, Term
from knovexlite_spark.language.normalize import dnf_conjuncts
from knovexlite_spark.language.parser import parse_lstr


def _term_value(term: Term, asg: dict[str, int], bindings: dict[str, int]):
    if term.is_constant:
        return bindings[term.name]
    return asg.get(term.name)


def _extend(asg: dict[str, int], atom: Atomic, h: int, t: int, bindings) -> dict | None:
    out = dict(asg)
    for term, val in ((atom.head, h), (atom.tail, t)):
        if term.is_constant:
            if bindings[term.name] != val:
                return None
        elif term.name in out:
            if out[term.name] != val:
                return None
        else:
            out[term.name] = val
    return out


def clause_answers(
    facts: set[tuple[int, int, int]],
    clause: ConjunctiveClause,
    bindings: dict[str, int],
    free_var: str = "f",
) -> set[int]:
    by_r: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for h, r, t in facts:
        by_r[r].append((h, t))
    assignments: list[dict[str, int]] = [{}]
    for atom in clause.positive:
        rel = bindings[atom.relation]
        new = []
        for asg in assignments:
            for h, t in by_r[rel]:
                nxt = _extend(asg, atom, h, t, bindings)
                if nxt is not None:
                    new.append(nxt)
        assignments = new
    answers = set()
    for asg in assignments:
        ok = True
        for atom in clause.negative:
            h = _term_value(atom.head, asg, bindings)
            t = _term_value(atom.tail, asg, bindings)
            assert h is not None and t is not None, "unsafe negation in fixture"
            if (h, bindings[atom.relation], t) in facts:
                ok = False
                break
        if ok and free_var in asg:
            answers.add(asg[free_var])
    return answers


def answers_bruteforce(
    facts: set[tuple[int, int, int]],
    lstr: str,
    bindings: dict[str, int],
    free_var: str = "f",
) -> set[int]:
    out: set[int] = set()
    for clause in dnf_conjuncts(parse_lstr(lstr)):
        out |= clause_answers(facts, clause, bindings, free_var)
    return out


def make_tiny_kg(
    seed: int = 42,
    n_entities: int = 100,
    n_rel_pairs: int = 6,
    n_facts: int = 400,
) -> set[tuple[int, int, int]]:
    """FIXTURES.md §B2: inverse-closed random KG — every fact (h, 2i, t)
    has its mate (t, 2i+1, h)."""
    rng = random.Random(seed)
    facts: set[tuple[int, int, int]] = set()
    while len(facts) < 2 * n_facts:
        h = rng.randrange(n_entities)
        t = rng.randrange(n_entities)
        r = 2 * rng.randrange(n_rel_pairs)
        if h != t:
            facts.add((h, r, t))
            facts.add((t, r + 1, h))
    return facts


def sample_bindings(
    facts: set[tuple[int, int, int]], lstr: str, rng: random.Random
) -> dict[str, int]:
    """Random instance bindings biased toward non-empty matches: each
    relation symbol gets a relation id that exists; each constant gets
    the head of a random fact of some relation in the query."""
    formula = parse_lstr(lstr)
    atoms = formula.atoms()
    rels = sorted({a.relation for a in atoms})
    consts = sorted({t.name for a in atoms for t in a.terms if t.is_constant})
    fact_list = sorted(facts)
    bindings: dict[str, int] = {}
    for rname in rels:
        bindings[rname] = rng.choice(fact_list)[1]

    # Sample constants from a satisfying assignment of the first clause's
    # positive atoms (constants temporarily treated as variables) so that
    # instances are usually non-empty even for intersection shapes.
    clause = dnf_conjuncts(formula)[0]
    assignments: list[dict[str, int]] = [{}]
    for atom in clause.positive:
        rel = bindings[atom.relation]
        pseudo = Atomic(
            atom.relation,
            Term("e_" + atom.head.name) if atom.head.is_constant else atom.head,
            Term("e_" + atom.tail.name) if atom.tail.is_constant else atom.tail,
        )
        new = []
        for asg in assignments:
            for h, r, t in fact_list:
                if r != rel:
                    continue
                nxt = _extend(asg, pseudo, h, t, bindings)
                if nxt is not None:
                    new.append(nxt)
        assignments = new[:2000]
    if assignments:
        chosen = rng.choice(assignments)
        for sname in consts:
            bindings[sname] = chosen.get("e_" + sname, rng.choice(fact_list)[0])
    else:
        for sname in consts:
            bindings[sname] = rng.choice(fact_list)[0]
    return bindings
