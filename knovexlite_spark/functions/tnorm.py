"""Fuzzy-logic t-norm library as Spark column expressions (SURVEY §2.5).

Reference parity: /root/reference/knovex/language/tnorm.py — product
(`a*b`) and Gödel (`min`) t-norms, negation ``1-a``, disjunction derived
by De Morgan.  Here each t-norm is a strategy object over Column
expressions, plus *grouped* aggregate forms (the n-ary conjunction the
reference realizes with scatter_reduce, cqd.py:344-355) so conjunction
over a group is one JVM-side aggregation, never a Python loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


class TNorm:
    name: str = "abstract"

    def negation(self, a: Column) -> Column:
        return F.lit(1.0) - a

    def conjunction(self, a: Column, b: Column) -> Column:
        raise NotImplementedError

    def disjunction(self, a: Column, b: Column) -> Column:
        # ¬(¬a ∧ ¬b)  (tnorm.py:22-28)
        return self.negation(self.conjunction(self.negation(a), self.negation(b)))

    def conj_agg(self, col: Column) -> Column:
        """Aggregate n-ary conjunction (use inside groupBy().agg())."""
        raise NotImplementedError

    @staticmethod
    def get(name: str) -> "TNorm":
        try:
            return {"product": ProductTNorm, "godel": GodelTNorm}[name]()
        except KeyError:
            raise ValueError(f"Unknown t-norm: {name}") from None


class ProductTNorm(TNorm):
    name = "product"

    def conjunction(self, a: Column, b: Column) -> Column:
        return a * b

    def conj_agg(self, col: Column) -> Column:
        # Π x  ==  exp(Σ ln x), guarded for zeros (log-space product is
        # exactly what CQD's sum-of-log-scores does, cqd.py:319-320).
        return F.when(F.min(col) <= F.lit(0.0), F.lit(0.0)).otherwise(
            F.exp(F.sum(F.log(col)))
        )


class GodelTNorm(TNorm):
    name = "godel"

    def conjunction(self, a: Column, b: Column) -> Column:
        return F.least(a, b)

    def disjunction(self, a: Column, b: Column) -> Column:
        return F.greatest(a, b)

    def conj_agg(self, col: Column) -> Column:
        return F.min(col)
