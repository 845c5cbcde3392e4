"""Deterministic sampling, splitting, mixing, and sequence-packing
operators for training-data pipelines.

Every operator here is DETERMINISTIC: selection is driven by a salted
content hash (sliced md5, the same cross-engine-portable family the
dedup operators use), never by ``rand()``.  That buys three properties
a 100-TB pipeline needs and nondeterministic sampling cannot give:

- reproducibility: the same corpus + salt always yields the same split
  / sample / mix, across reruns, partitionings, AND engines (any
  system with md5 + substring replays the decision bit-for-bit);
- stability under incremental reruns: adding new documents never flips
  the assignment of an existing document (its hash didn't change) —
  so a train/val split stays leak-free as the corpus grows;
- pushdown-friendliness: the decision is a pure column predicate, so
  it fuses into the scan (no shuffle, no UDF, no driver state).

Scale shape of each:

- hash_fraction / hash_split / stratified_sample: map-only column
  expressions — zero shuffles, linear, trivially parallel.
- pack_chunked: one window per (stratum, shard) — the shard knob
  bounds task state so arbitrarily large strata never serialize into
  one task; bins may overflow the budget by at most one document
  (straddle), the documented price of staying in pure SQL.
- pack_greedy: per-stratum first-fit-decreasing via applyInPandas —
  capacity-exact, for catalog-scale strata that fit one task.
- mix_sources: per-source hash sampling at computed rates (one count
  job to size the rates), then a union — no shuffle beyond the counts.
"""

from __future__ import annotations

from typing import Iterable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^32: the md5 slice below is 8 hex chars = 32 bits
_HASH_SPACE = float(1 << 32)


def keyed_hash_long(key: F.Column, salt: str = "") -> F.Column:
    """Deterministic 32-bit hash of a key column as a long: first 8 hex
    chars of md5(salt || key).  The shared kernel behind EVERY id-keyed
    operator in this module (hash_fraction, pack_chunked's shard), so
    they all inherit one contract — including the null handling.

    NULL keys raise at execution time: a silent NULL hash would give
    each operator its own quiet misbehavior (hash_split falling through
    to the LAST split, stratified_sample dropping the row, pack_chunked
    collapsing rows into a NULL shard) — three operators silently
    disagreeing on the same bad input.  Fail loudly instead; callers
    with legitimately null ids must key on something else."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    val = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    return F.when(
        key.isNull(),
        F.raise_error(F.lit("keyed hash: NULL key (id column has nulls)")).cast(
            "long"
        ),
    ).otherwise(val)


def hash_fraction(key: F.Column, salt: str = "") -> F.Column:
    """Deterministic uniform fraction in [0, 1) from a key column:
    keyed_hash_long / 2^32.  Portable to any engine with md5 +
    substring; the same family the MinHash operators use
    (ops/dedup.minhash_hash_exprs).  NULL keys raise (see
    keyed_hash_long)."""
    return keyed_hash_long(key, salt) / F.lit(_HASH_SPACE)


def hash_split(
    df: DataFrame,
    weights: Mapping[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: adds a ``split`` column whose
    value is chosen by where the document's hash fraction falls in the
    cumulative weight intervals (weights are normalized).  Splits are
    disjoint and exhaustive by construction, and a document's
    assignment never changes when other documents are added or removed
    — the property that keeps a held-out set leak-free over time."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    frac = hash_fraction(F.col(id_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = frac < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[str, float] | float,
    strata_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic (hash-thresholded) sampling, optionally per
    stratum.  ``fractions`` is either one global rate or a
    {stratum_value: rate} map (strata absent from the map are dropped,
    matching DataFrame.sampleBy).  Unlike sampleBy this is exactly
    reproducible across partitionings and engines, and a row's
    keep/drop decision is independent of every other row."""
    frac = hash_fraction(F.col(id_col), salt)
    if isinstance(fractions, Mapping):
        if strata_col is None:
            raise ValueError("strata_col required with per-stratum fractions")
        if not fractions:
            raise ValueError("per-stratum fractions must be non-empty")
        rate = None
        for value, r in fractions.items():
            cond = F.col(strata_col) == F.lit(value)
            rate = F.when(cond, F.lit(float(r))) if rate is None else rate.when(cond, F.lit(float(r)))
        rate = rate.otherwise(F.lit(0.0))
    else:
        rate = F.lit(float(fractions))
    return df.filter(frac < rate)


def pack_chunked(
    df: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 2048,
    strata_cols: Iterable[str] = (),
    num_shards: int = 1,
) -> DataFrame:
    """Sequence packing, the pure-SQL form: assign documents to
    fixed-token-budget bins by running-total chunking.  Documents are
    ordered deterministically (by id) within each (stratum, shard);
    bin = floor(exclusive-prefix-sum / budget).

    Contract: bins are contiguous runs in id order; every bin's token
    sum is < budget + max(single doc) — a bin may OVERFLOW the budget
    by at most the one document that straddles the boundary (the
    documented price of expressing packing as a window instead of a
    stateful scan; use pack_greedy for capacity-exact bins).

    ``num_shards`` > 1 pre-shards each stratum by document hash so one
    giant stratum never serializes into a single window task — the
    100-TB knob.  Output: input columns + (shard, bin, bin_offset) —
    ``bin_offset`` is the document's token start position WITHIN its
    bin (round 6: the field a sample-assembly writer needs to place
    each document into the packed sequence without re-scanning the
    bin), derived from the same running total, so the extra column
    costs no extra window pass.
    """
    from pyspark.sql import Window

    strata = list(strata_cols)
    # computed unconditionally (pmod(h, 1) == 0) so the keyed_hash_long
    # NULL-id contract holds at EVERY shard count — with a num_shards=1
    # fast path, NULL ids would silently sort nulls-first into the
    # window instead of raising like every other id-keyed operator
    shard = F.pmod(keyed_hash_long(F.col(id_col)), F.lit(num_shards)).cast("int")
    out = df.withColumn("shard", shard)
    w = (
        Window.partitionBy(*strata, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    out = out.withColumn("__prefix", prefix)
    bin_col = F.floor(F.col("__prefix") / F.lit(int(budget))).cast("long")
    # offset inside the bin: running total minus the bin's start.  The
    # straddle contract carries over: the one boundary-straddling doc
    # starts at (prefix - bin*budget) < budget and may END past it.
    return (
        out.withColumn("bin", bin_col)
        .withColumn(
            "bin_offset",
            (F.col("__prefix") - F.col("bin") * F.lit(int(budget))).cast("long"),
        )
        .drop("__prefix")
    )


def pack_greedy(
    df: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 2048,
    strata_cols: Iterable[str] = (),
) -> DataFrame:
    """Sequence packing, the capacity-exact form: first-fit-decreasing
    within each stratum via applyInPandas.  No bin exceeds the budget
    unless a single document alone does (it then gets a bin of its
    own).  Deterministic: documents are considered in (tokens desc,
    id asc) order and placed in the lowest-numbered bin that fits.

    Scale: each stratum must fit one task (the classic bin-packing
    sequential dependency); shard large strata first — pack_chunked is
    the unbounded-scale path.  Output: (strata..., doc_id, n_tokens,
    bin)."""
    import pandas as pd

    strata = list(strata_cols)
    gcols = strata or ["__g"]
    src = df if strata else df.withColumn("__g", F.lit(0))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [token_col, id_col], ascending=[False, True], kind="mergesort"
        )
        bins: list[int] = []  # remaining capacity per bin
        assigned = []
        for t in pdf[token_col]:
            t = int(t)
            placed = None
            for i, rem in enumerate(bins):
                if rem >= t:
                    placed, bins[i] = i, rem - t
                    break
            if placed is None:
                placed = len(bins)
                bins.append(max(int(budget) - t, 0))
            assigned.append(placed)
        pdf = pdf.assign(bin=assigned)
        return pdf[gcols + [id_col, token_col, "bin"]]

    fields = src.select(*gcols, id_col, token_col).schema.fields
    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
        + ", bin long"
    )
    out = src.groupBy(*gcols).applyInPandas(pack, schema)
    return out.drop("__g") if not strata else out


def temperature_weights(
    counts: Mapping[str, int], alpha: float = 0.3
) -> dict[str, float]:
    """Temperature-based mixing weights: weight_s ∝ count_s^alpha — the
    standard policy for upsampling low-resource sources (alpha=1 keeps
    natural proportions, alpha=0 gives uniform, the usual range is
    0.2-0.7).  Feed the result to mix_sources."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    w = {n: float(c) ** alpha for n, c in counts.items() if c > 0}
    total = sum(w.values())
    return {n: v / total for n, v in w.items()}


def mix_sources(
    sources: Mapping[str, DataFrame],
    weights: Mapping[str, float],
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Weighted data mixing: sample each source so the OUTPUT
    proportions match ``weights``, maximizing total size subject to no
    source being over-sampled (sampling without replacement: every
    source's rate is <= 1, and the binding source is kept whole).

    One count job sizes the rates (a single labeled-union groupBy, not
    one scan per source); selection is then per-row hash thresholding
    (deterministic, map-only).  Output: union of the sampled sources
    with a ``source`` label column.  All sources must share a schema."""
    names = [n for n in sources if weights.get(n, 0) > 0]
    if not names:
        raise ValueError("no source with positive weight")
    labeled = None
    for n in names:
        part = sources[n].select(F.lit(n).alias("__src"))
        labeled = part if labeled is None else labeled.unionByName(part)
    counts = {n: 0 for n in names}
    counts.update(
        {
            r["__src"]: r["count"]
            for r in labeled.groupBy("__src").count().collect()
        }
    )
    # feasible output total T: per source, weight_n/W * T <= count_n
    total_w = sum(weights[n] for n in names)
    t_max = min(counts[n] * total_w / weights[n] for n in names)
    out = None
    for n in names:
        target = weights[n] / total_w * t_max
        rate = min(target / counts[n], 1.0) if counts[n] else 0.0
        part = stratified_sample(
            sources[n], rate, id_col=id_col, salt=f"{salt}|{n}"
        ).withColumn("source", F.lit(n))
        out = part if out is None else out.unionByName(part)
    return out


def cap_per_domain(
    df: DataFrame,
    max_docs: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "domaincap",
    exact: bool = True,
    domain_col: str | None = None,
) -> DataFrame:
    """Cap each web DOMAIN's contribution to the corpus at ``max_docs``
    documents — the curation step the URL/domain tier exists for (a
    single over-crawled domain otherwise dominates the training mix).

    A document's domain is the registrable host of its FIRST URL
    (ops/text.url_domain on the first URL_RE match — deterministic,
    map-only), or an existing metadata column when ``domain_col`` is
    given (crawl corpora usually carry the source URL/host alongside
    the text — pass that and skip the regexp scan entirely).
    Documents with NO domain ('' or NULL) are never capped (they form
    no domain population).  Selection within a domain is by
    DETERMINISTIC hash rank (the module's salted-md5 family, like
    stratified_sample): the same corpus + salt always keeps the same
    documents, across reruns, partitionings and engines.

    Two modes, one contract:
    - ``exact=True`` (default): row_number over a (domain) window
      ordered by (hash, id) — exactly ``max_docs`` survivors per
      domain.  The window partitions by domain, so one PATHOLOGICALLY
      over-represented domain (tens of millions of docs) serializes
      into one task — fine for realistic domain skews, wrong for a
      single-domain corpus; use hash mode there.
    - ``exact=False``: join each doc's domain against the combinable
      per-domain count and keep docs whose hash fraction <
      max_docs / n_docs(domain) — map-side decision after a
      domain-count join, NO window, skew-free at any domain size; the
      cap is then an expectation (binomial around max_docs), the
      standard price of the scalable form.

    Returns the input rows (all columns) plus ``domain`` ('' for
    no-URL docs; the ``domain_col`` values verbatim when given),
    filtered to the kept set."""
    if domain_col is not None:
        # 'domain' is the contract output name in both modes
        with_dom = df.withColumn(
            "domain", F.coalesce(F.col(domain_col).cast("string"), F.lit(""))
        )
    else:
        from knovexlite_spark.ops.text import URL_RE, url_domain

        # coalesce to '': a NULL text yields a NULL extract, and a
        # NULL domain would satisfy NEITHER branch filter below —
        # silently deleting the row instead of passing it through
        dom = F.coalesce(
            url_domain(F.regexp_extract(F.col(text_col), URL_RE, 0)),
            F.lit(""),
        ).alias("domain")
        with_dom = df.select("*", dom)
    no_url = with_dom.filter(F.col("domain") == "")
    urled = with_dom.filter(F.col("domain") != "")
    if exact:
        from pyspark.sql import Window

        w = Window.partitionBy("domain").orderBy(
            keyed_hash_long(F.col(id_col), salt), F.col(id_col)
        )
        kept = (
            urled.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= max_docs)
            .drop("__rk")
        )
    else:
        counts = urled.groupBy("domain").agg(
            F.count("*").cast("double").alias("__nd")
        )
        kept = (
            urled.join(counts, "domain")
            .filter(
                hash_fraction(F.col(id_col), salt)
                < F.least(F.lit(1.0), F.lit(float(max_docs)) / F.col("__nd"))
            )
            .drop("__nd")
        )
    return kept.unionByName(no_url.select(*kept.columns))
