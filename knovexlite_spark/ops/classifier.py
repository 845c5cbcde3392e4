"""Linear quality classifier over hashed text features.

The GPT-3 / CCNet-style corpus quality filter: train a logistic
regression on hashed bag-of-words features to separate a high-quality
reference corpus (positives) from raw crawl (negatives), then score
and filter the crawl by predicted quality.  This is the third member
of the quality-signal triad next to n-gram-LM perplexity (ops/lm.py)
and DSIR importance weights — the discriminative one.

Scale split (the BPE / n-gram-LM / kmeans_fit pattern): corpus-sized
work is distributed and combinable; the model (n_buckets weights +
bias) is parameter-sized driver state.

- features: one explode + ONE combinable groupBy per corpus.  Bucket
  ids come from an md5-slice hash (engine-replayable, the repo's
  deterministic-hash convention — `family="xxhash64"` switches to the
  faster JVM hash when replayability doesn't matter).
- each training epoch is ONE lazy job: per-doc margins via a BROADCAST
  (bucket, weight) join + combinable per-doc sum, residuals joined
  back to the cached feature frame, per-bucket gradient as one
  combinable groupBy — the collect is n_buckets rows (parameters),
  never corpus rows.  This is full-batch gradient descent: rerunnable,
  deterministic, one job per epoch.
- scoring/filtering is the same broadcast join without the gradient
  tail — map-side except one (doc) aggregation.

At 100 TB you train on a SAMPLE (positives are reference-corpus-sized
anyway) and score the full corpus with the broadcast model — scoring
is the only corpus-sized pass and it is one combinable aggregation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knovexlite_spark.ops.text import tokens


def _l1_normalize(feats: DataFrame) -> DataFrame:
    """Per-doc L1 normalization of the count features (term frequency):
    one combinable per-doc total + a co-partitioned join.  Raw counts
    make the margin scale with DOCUMENT LENGTH, so full-batch GD at a
    fixed lr oscillates (sign flips with epoch parity — measured in the
    r10 natural-margin rehearsal: all-probabilities ~0 at 3 epochs,
    ~1 at 12); tf features bound the margin by max|w| and train
    stably."""
    tot = feats.groupBy("doc_id").agg(F.sum("cnt").alias("__tot"))
    return feats.join(tot, "doc_id").select(
        "doc_id", "bucket", (F.col("cnt") / F.col("__tot")).alias("cnt")
    )


def _word_ngram_terms(toks, sizes: tuple[int, ...]):
    """Array of hashed-feature TERMS for the given word n-gram sizes.
    ``sizes == (1,)`` (the default everywhere) returns the raw token
    array — byte-identical to the historical unigram path.  Any other
    sizes tag every term with its size (``"2|w1 w2"``), so an n-gram
    can never collide with a unigram pre-hash (the langid convention).
    All JVM-side: transform over an index sequence + element_at."""
    sizes = tuple(sizes)
    if not sizes or any(n < 1 for n in sizes):
        raise ValueError(f"sizes must be non-empty positive ints, got {sizes}")
    if sizes == (1,):
        return toks
    # closure factory, NOT a default arg: pyspark binds a lambda
    # variable (a Column) to EVERY named parameter of the callback,
    # so `lambda i, n=n:` would shadow the int n with a Column
    def _gram_fn(n: int):
        return lambda i: F.concat(
            F.lit(f"{n}|"),
            F.concat_ws(
                " ",
                # F.get is 0-based and takes a Column index
                # (element_at requires a literal position)
                *[F.get(toks, i + j - 1) for j in range(n)],
            ),
        )

    arrs = []
    for n in sizes:
        if n == 1:
            arr = F.transform(toks, lambda t: F.concat(F.lit("1|"), t))
        else:
            arr = F.when(
                F.size(toks) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    _gram_fn(n),
                ),
            ).otherwise(F.array().cast("array<string>"))
        arrs.append(arr)
    return F.flatten(F.array(*arrs))


def hashed_features(
    df: DataFrame,
    n_buckets: int = 1 << 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    family: str = "md5",
    sizes: tuple[int, ...] = (1,),
) -> DataFrame:
    """(doc_id, bucket, cnt): hashed bag-of-words counts.  One explode
    + ONE combinable groupBy; bucket = hash(term) % n_buckets.

    ``family``: "md5" (first 8 hex chars as an integer — replayable in
    Python/DuckDB/anything, used by the parity tests) or "xxhash64"
    (JVM-native, fastest, Spark-specific).

    ``sizes`` (round 11): word n-gram sizes, default (1,) = the
    historical bag-of-words.  ``(1, 2)`` adds hashed word BIGRAMS —
    the feature a tf-normalized linear model needs to SEE token
    concentration: run-stuffed spam is dominated by self-pair bigrams
    ("spark spark") that natural text essentially never produces, so
    the simplex-averaging blindness of pure unigram tf (measured in
    the r10 natural rehearsal) does not apply."""
    if family == "md5":
        bucket = F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast(
            "long"
        ) % n_buckets
    elif family == "xxhash64":
        bucket = F.pmod(F.xxhash64(F.col("term")), F.lit(n_buckets))
    else:
        raise ValueError(f"unknown hash family {family!r}")
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    terms = _word_ngram_terms(toks, sizes)
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(terms).alias("term"))
        .select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _weights_df(spark, weights: np.ndarray) -> DataFrame:
    """The nonzero (bucket, w) weight frame via the ARROW
    createDataFrame path (round-15 optimization, guide §6): a pandas
    input crosses as Arrow batches while a list of tuples is pickled
    row-by-row — measured 0.53 -> 0.21 s at 16k buckets, and the
    frame is rebuilt EVERY training epoch plus once per scoring
    call.  Values are bit-identical (int64/float64 straight from the
    weight vector)."""
    import pandas as pd

    nz = np.nonzero(weights)[0]
    if len(nz):
        pdf = pd.DataFrame(
            {"bucket": nz.astype("int64"), "w": weights[nz]}
        )
    else:
        pdf = pd.DataFrame({"bucket": [-1], "w": [0.0]})
    return spark.createDataFrame(pdf)


def _margins(feats: DataFrame, w_df: DataFrame, bias: float) -> DataFrame:
    """(doc_id, margin): w·x + b via broadcast weight join + one
    combinable per-doc sum.  Buckets with weight 0 are absent from
    w_df — the left join coalesces them to 0."""
    return (
        feats.join(F.broadcast(w_df), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("cnt") * F.coalesce(F.col("w"), F.lit(0.0)))
                + F.lit(bias)
            ).alias("margin")
        )
    )


def train_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    n_buckets: int = 1 << 16,
    epochs: int = 20,
    lr: float = 0.5,
    l2: float = 1e-6,
    text_col: str = "text",
    id_col: str = "doc_id",
    family: str = "md5",
    normalize: bool = False,
    sizes: tuple[int, ...] = (1,),
) -> tuple[np.ndarray, float]:
    """Full-batch logistic regression; returns (weights[n_buckets],
    bias).  ``normalize=True`` trains on per-doc L1-normalized counts
    (term frequencies) — see _l1_normalize; score with the same flag.  Each epoch is ONE Spark job: margins (broadcast weights +
    combinable doc sum) -> residual sigmoid(margin) - y -> per-bucket
    gradient (combinable groupBy) -> n_buckets-row collect.  Gradients
    are averaged over the labeled corpus; l2 excludes the bias.

    Positives/negatives may overlap in doc_id — they are tagged and
    unioned, so ids only need to be unique within each frame.  The tag
    is a string prefix on the id (not integer arithmetic, which would
    silently NULL-cast a string id under non-ANSI Spark and collapse
    every doc into one group), so any id type works."""
    spark = positives.sparkSession

    def _tag(prefix: str):
        return F.concat(F.lit(prefix), F.col("doc_id").cast("string")).alias(
            "doc_id"
        )

    pos = hashed_features(
        positives, n_buckets, text_col, id_col, family, sizes
    ).select(_tag("p|"), "bucket", "cnt")
    neg = hashed_features(
        negatives, n_buckets, text_col, id_col, family, sizes
    ).select(_tag("n|"), "bucket", "cnt")
    feats = pos.unionByName(neg)
    if normalize:
        feats = _l1_normalize(feats)
    feats = feats.localCheckpoint(eager=True)
    labels = F.when(F.col("doc_id").startswith("p|"), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    n_docs = feats.select("doc_id").distinct().count()

    w = np.zeros(n_buckets, dtype=np.float64)
    bias = 0.0
    for _ in range(epochs):
        w_df = _weights_df(spark, w)
        # residuals have two consumers below (feature join + bias row)
        # with a broadcast boundary in their lineage — lazy checkpoint
        # so the margin job runs once (the ReuseExchange gotcha)
        resid = (
            _margins(feats, w_df, bias)
            .select(
                "doc_id",
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))) - labels
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
        # ONE combinable gradient job: per-bucket terms plus the bias
        # gradient riding as synthetic bucket -1
        contrib = feats.join(resid, "doc_id").select(
            "bucket", (F.col("cnt") * F.col("r")).alias("g")
        )
        bias_row = resid.select(
            F.lit(-1).cast("long").alias("bucket"), F.col("r").alias("g")
        )
        grad_rows = (
            contrib.unionByName(bias_row)
            .groupBy("bucket")
            .agg(F.sum("g").alias("g"))
            .collect()
        )
        grad = np.zeros(n_buckets, dtype=np.float64)
        bias_g = 0.0
        for r in grad_rows:
            if r["bucket"] < 0:
                bias_g = r["g"]
            else:
                grad[r["bucket"]] = r["g"]
        w -= lr * (grad / n_docs + l2 * w)
        bias -= lr * (bias_g / n_docs)
    return w, bias


def classify(
    df: DataFrame,
    weights: np.ndarray,
    bias: float,
    n_buckets: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    family: str = "md5",
    normalize: bool = False,
    sizes: tuple[int, ...] = (1,),
) -> DataFrame:
    """(doc_id, margin, prob): score every document with the broadcast
    model — the only corpus-sized pass, one combinable aggregation.
    Documents with NO hashed features (empty text) score bias alone.
    ``normalize``/``sizes`` must match how the model was trained."""
    n_buckets = int(n_buckets or len(weights))
    spark = df.sparkSession
    w_df = _weights_df(spark, np.asarray(weights, dtype=np.float64))
    feats = hashed_features(df, n_buckets, text_col, id_col, family, sizes)
    if normalize:
        feats = _l1_normalize(feats)
    scored = _margins(feats, w_df, bias)
    # empty docs drop out of the explode — restore them at bias
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("margin", F.lit(bias)).alias("margin"),
        )
        .withColumn("prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))))
    )


def quality_filter(
    df: DataFrame,
    weights: np.ndarray,
    bias: float,
    threshold: float = 0.5,
    **kwargs,
) -> DataFrame:
    """Keep documents whose predicted quality probability clears the
    threshold (the GPT-3 paper additionally pareto-samples around the
    boundary; deterministic thresholding is the reproducible core)."""
    id_col = kwargs.get("id_col", "doc_id")
    keep = classify(df, weights, bias, **kwargs).filter(
        F.col("prob") >= threshold
    )
    return df.join(
        keep.select(F.col("doc_id").alias("__keep_id")),
        df[id_col] == F.col("__keep_id"),
        "left_semi",
    )
