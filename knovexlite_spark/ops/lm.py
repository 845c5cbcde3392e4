"""KenLM-style n-gram language-model scoring for corpus curation.

The standard CCNet/RedPajama-style quality signal: train an n-gram LM
on a reference corpus (or the corpus itself), score every document's
perplexity, and filter/bucket by it — documents that are noise
(boilerplate, markup soup, wrong language) sit far from the reference
distribution and score high.

Spark-first shapes:

- ``train_ngram_lm``: ONE combinable groupBy over the exploded n-grams
  (map-side partial counts absorb per-partition repeats before the
  shuffle); context totals ride the same table via a second combinable
  groupBy.  Output is vocabulary-bounded, never corpus-sized, and
  ``min_count`` prunes the long tail so the model table stays
  broadcastable at any corpus size (the standard KenLM pruning knob).
- ``score_documents``: explode each doc's n-grams, LEFT-join the model
  (broadcast when it fits — the default; pass ``broadcast_lm=False``
  for a giant unpruned model and the join becomes a standard shuffle
  keyed by n-gram), aggregate log-probabilities per document.  Add-
  alpha (Lidstone) smoothing over the training vocabulary + one OOV
  slot gives every n-gram non-zero mass, so the score is total and an
  external engine can replay it from the same count table.

Tokenization is the module-standard whitespace normalization
(lowercased), with ``n-1`` BOS sentinels so the first tokens are
scored under a start-of-document context — matching the pure-Python
reference in tests.

Reference parity: the reference engine has no LM surface; this is a
beyond-reference operator of the brief's training-data tier (same
category as dedup/sampling), verified by Python-reference parity
tests rather than the SQL gate (floating-point log sums).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOS = "<s>"


def _tokens(text_col: str, lowercase: bool):
    t = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    if lowercase:
        t = F.lower(t)
    return F.split(t, " ")


def _ngram_frame(
    df: DataFrame, n: int, text_col: str, id_col: str | None, lowercase: bool
) -> DataFrame:
    """One row per document n-gram: (id?, context, token).  Context =
    the n-1 preceding tokens joined with spaces, BOS-padded at the
    document start.  Map-only (explode + slice)."""
    toks = _tokens(text_col, lowercase)
    padded = F.concat(F.array_repeat(F.lit(BOS), n - 1), toks)
    # split('') is [''], not [] — guard on the trimmed text instead
    base = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        *([F.col(id_col)] if id_col else []),
        toks.alias("__toks"),
        padded.alias("__padded"),
    )
    return base.select(
        *([id_col] if id_col else []),
        F.explode(F.sequence(F.lit(0), F.size("__toks") - 1)).alias("__i"),
        "__toks",
        "__padded",
    ).select(
        *([id_col] if id_col else []),
        F.concat_ws(
            " ", F.slice("__padded", F.col("__i") + 1, n - 1)
        ).alias("context"),
        F.element_at("__toks", F.col("__i") + 1).alias("token"),
    )


def train_ngram_lm(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    lowercase: bool = True,
    min_count: int = 1,
) -> DataFrame:
    """Train the count model: (context, token, cnt, ctx_total).
    ``ctx_total`` is the PRE-pruning context mass (so pruned models
    stay properly normalized: removed tail mass falls to the smoothing
    floor instead of silently inflating the survivors).  Two
    combinable groupBys; output is vocabulary-bounded."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    grams = _ngram_frame(df, n, text_col, None, lowercase)
    counts = grams.groupBy("context", "token").agg(
        F.count("*").cast("long").alias("cnt")
    )
    totals = counts.groupBy("context").agg(
        F.sum("cnt").cast("long").alias("ctx_total")
    )
    pruned = counts.filter(F.col("cnt") >= int(min_count))
    return pruned.join(totals, "context")


def lm_vocab_size(lm: DataFrame) -> int:
    """|V| + 1: distinct trained tokens plus one shared OOV slot —
    the smoothing denominator (one tiny job; cache the scalar)."""
    return int(lm.select("token").distinct().count()) + 1


def score_documents(
    docs: DataFrame,
    lm: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    alpha: float = 0.1,
    vocab_size: int | None = None,
    broadcast_lm: bool = True,
) -> DataFrame:
    """Per-document add-alpha n-gram log-likelihood and perplexity:

      p(tok | ctx) = (cnt + alpha) / (ctx_total + alpha * V)

    with cnt = 0 for unseen (context, token) and ctx_total = 0 for
    unseen contexts (so fully-OOV n-grams score the uniform 1/V).
    Returns (id, n_ngrams, logprob, perplexity = exp(-logprob/n)).
    Empty documents are absent from the output (no n-grams to score).
    """
    # the model frame feeds THREE consumers (the vocab-size count, the
    # broadcast (context, token) join build and the broadcast
    # per-context totals build) and a trained lm's lineage is a full
    # corpus n-gram explode + groupBy — without a barrier each consumer
    # re-trains the LM from the corpus.  The lazy localCheckpoint makes
    # the first consumer materialize the vocabulary-bounded model ONCE;
    # the other two read the cached blocks (model-parameter-sized, like
    # the broadcast itself).
    lm = lm.localCheckpoint(eager=False)
    if vocab_size is None:
        vocab_size = lm_vocab_size(lm)
    grams = _ngram_frame(docs, n, text_col, id_col, lowercase)
    model = lm.select("context", "token", "cnt", "ctx_total")
    if broadcast_lm:
        model = F.broadcast(model)
    # unseen context: ctx_total is NULL after the join -> 0.  A seen
    # context with an unseen token needs its ctx_total — join the
    # (tiny) per-context totals separately so the token miss does not
    # null the denominator.
    totals = lm.select("context", "ctx_total").distinct()
    if broadcast_lm:
        totals = F.broadcast(totals)
    joined = (
        grams.join(model.drop("ctx_total"), ["context", "token"], "left")
        .join(totals, "context", "left")
        .select(
            id_col,
            (
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(float(alpha)))
                    / (
                        F.coalesce(F.col("ctx_total"), F.lit(0))
                        + F.lit(float(alpha) * vocab_size)
                    )
                )
            ).alias("__lp"),
        )
    )
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_ngrams"),
        F.sum("__lp").alias("logprob"),
        F.exp(-F.sum("__lp") / F.count("*")).alias("perplexity"),
    )


def perplexity_filter(
    docs: DataFrame,
    lm: DataFrame,
    max_perplexity: float,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    **score_kw,
) -> DataFrame:
    """Keep documents scoring at or below ``max_perplexity`` under the
    model — the curation-funnel form (CCNet keeps the low-perplexity
    head/middle of the distribution).  Empty documents are dropped
    (they have no n-grams, hence no evidence of quality)."""
    scores = score_documents(
        docs, lm, n=n, text_col=text_col, id_col=id_col, **score_kw
    )
    keep = scores.filter(F.col("perplexity") <= max_perplexity).select(id_col)
    return docs.join(keep, id_col, "semi")


def py_ngram_reference(rows, n=2, alpha=0.1, lowercase=True, min_count=1):
    """Pure-Python reference of train+score for parity tests: returns
    {doc_id: (n_ngrams, logprob, perplexity)} scoring each doc under
    the LM trained on all of them."""
    import collections

    def toks(t):
        t = " ".join(t.split())
        return (t.lower() if lowercase else t).split(" ") if t else []

    counts: dict = collections.Counter()
    totals: dict = collections.Counter()
    for _, text in rows:
        tt = toks(text)
        if not tt:
            continue
        padded = [BOS] * (n - 1) + tt
        for i, tok in enumerate(tt):
            ctx = " ".join(padded[i : i + n - 1])
            counts[(ctx, tok)] += 1
            totals[ctx] += 1
    counts = {k: c for k, c in counts.items() if c >= min_count}
    vocab = len({tok for _, tok in counts}) + 1
    # context total = pre-pruning mass when ANY member of the context
    # survived pruning; a fully-pruned or unseen context scores as 0
    # (matching the Spark join against the pruned model table)
    surviving_ctx = {ctx for ctx, _ in counts}
    out = {}
    for doc_id, text in rows:
        tt = toks(text)
        if not tt:
            continue
        padded = [BOS] * (n - 1) + tt
        lp = 0.0
        for i, tok in enumerate(tt):
            ctx = " ".join(padded[i : i + n - 1])
            c = counts.get((ctx, tok), 0)
            tot = totals[ctx] if ctx in surviving_ctx else 0
            lp += math.log((c + alpha) / (tot + alpha * vocab))
        out[doc_id] = (len(tt), lp, math.exp(-lp / len(tt)))
    return out


def importance_weights(
    docs: DataFrame,
    target_lm: DataFrame,
    corpus_lm: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    **score_kw,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per document,
    w = exp((logprob_target - logprob_corpus) / n_ngrams) — the
    per-n-gram likelihood ratio between an LM trained on the TARGET
    distribution (e.g. curated reference text) and one trained on the
    raw corpus.  Documents that look more like the target than like
    the average corpus doc get w > 1.

    Both scores ride the same machinery as score_documents (two
    broadcast-model joins over one n-gram explode each); output is
    (id, n_ngrams, logratio, weight).  The per-n-gram normalization
    keeps weights length-comparable (raw log-ratios scale with doc
    length)."""
    t = score_documents(
        docs, target_lm, n=n, text_col=text_col, id_col=id_col, **score_kw
    ).select(id_col, "n_ngrams", F.col("logprob").alias("__lp_t"))
    c = score_documents(
        docs, corpus_lm, n=n, text_col=text_col, id_col=id_col, **score_kw
    ).select(id_col, F.col("logprob").alias("__lp_c"))
    ratio = (F.col("__lp_t") - F.col("__lp_c")) / F.col("n_ngrams")
    return t.join(c, id_col).select(
        id_col,
        "n_ngrams",
        ratio.alias("logratio"),
        F.exp(ratio).alias("weight"),
    )


def dsir_resample(
    docs: DataFrame,
    target_lm: DataFrame,
    corpus_lm: DataFrame,
    rate: float,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
    **score_kw,
) -> DataFrame:
    """Deterministic importance RESAMPLING: keep each document with
    probability min(1, rate * weight) using the module-standard salted
    md5 hash fraction (ops/sample.hash_fraction) — reproducible across
    reruns/partitionings/engines, no rand().  ``rate`` sets the base
    keep probability for a weight-1 (corpus-average) document; the
    expected output size is sum(min(1, rate*w)) over docs.  Documents
    with no n-grams (empty text) are dropped — no evidence either
    way, matching perplexity_filter."""
    from knovexlite_spark.ops.sample import hash_fraction

    w = importance_weights(
        docs, target_lm, corpus_lm, n=n, text_col=text_col,
        id_col=id_col, **score_kw
    )
    keep = w.filter(
        hash_fraction(F.col(id_col), salt)
        < F.least(F.lit(1.0), F.lit(float(rate)) * F.col("weight"))
    ).select(id_col)
    return docs.join(keep, id_col, "semi")
