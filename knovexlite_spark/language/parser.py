"""lstr recursive-descent parser (SURVEY.md §2.2 L1).

Reference parity: ``parse_lstr_to_lformula``
(/root/reference/knovex/language/efo_lang.py:242-376): bracket
stripping, ``&``/``|`` binary connectives, ``!`` negation, binary atoms
``r1(s1,e1)``; shared variables dedup through a term registry.

This is a clean grammar-based implementation (the reference splits
strings at top-level connectives; same language):

    formula := disj
    disj    := conj ('|' conj)*
    conj    := unary ('&' unary)*
    unary   := '!' unary | '(' formula ')' | atom
    atom    := NAME '(' term ',' term ')'

Connectives associate left, matching the reference's nested-paren
canonical forms (e.g. ``((a)&(b))&(c)``).
"""

from __future__ import annotations

import re

from knovexlite_spark.language.ast import (
    Atomic,
    Conjunction,
    Disjunction,
    Formula,
    Negation,
    Term,
)

_NAME = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


class _Parser:
    def __init__(self, text: str):
        self.text = text.replace(" ", "")
        self.pos = 0

    def error(self, msg: str) -> Exception:
        return ValueError(f"lstr parse error at {self.pos} in {self.text!r}: {msg}")

    def peek(self) -> str:
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def eat(self, ch: str) -> None:
        if self.peek() != ch:
            raise self.error(f"expected {ch!r}, got {self.peek()!r}")
        self.pos += 1

    def name(self) -> str:
        m = _NAME.match(self.text, self.pos)
        if not m:
            raise self.error("expected name")
        self.pos = m.end()
        return m.group(0)

    def formula(self) -> Formula:
        node = self.conj()
        while self.peek() == "|":
            self.eat("|")
            node = Disjunction(node, self.conj())
        return node

    def conj(self) -> Formula:
        node = self.unary()
        while self.peek() == "&":
            self.eat("&")
            node = Conjunction(node, self.unary())
        return node

    def unary(self) -> Formula:
        ch = self.peek()
        if ch == "!":
            self.eat("!")
            return Negation(self.unary())
        if ch == "(":
            self.eat("(")
            node = self.formula()
            self.eat(")")
            return node
        return self.atom()

    def atom(self) -> Atomic:
        rel = self.name()
        self.eat("(")
        head = Term(self.name())
        self.eat(",")
        tail = Term(self.name())
        self.eat(")")
        head.type, tail.type  # validate prefixes eagerly
        return Atomic(rel, head, tail)


def parse_lstr(lstr: str) -> Formula:
    p = _Parser(lstr)
    node = p.formula()
    if p.pos != len(p.text):
        raise p.error("trailing input")
    return node
