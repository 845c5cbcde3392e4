"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shape of each (the thing that matters at 100 TB):

- exact:        one hash groupBy — fully map-side-combinable.
- n-gram Jaccard: shingle explode -> pair join restricted to shared
  shingles -> grouped counts.  Exact but quadratic in the worst case;
  use on candidate sets, not whole corpora.
- MinHash-LSH:  signature = k grouped mins (linear), banding turns the
  quadratic pair search into an equi-join on (band, bucket) — the
  canonical sub-quadratic near-dup path.  Hash families: sliced md5
  (portable to any engine for verification) or salted xxhash64 (the
  cheaper production path).
- SimHash:      per-token hash bits weighted ±1, summed per bit, sign ->
  64-bit fingerprint; near-dups = same fingerprint band buckets.
- embedding:    cosine threshold over vector pairs (see similarity.py
  for the ANN variants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knovexlite_spark.ops.graph import connected_components
from knovexlite_spark.ops.text import tokens, word_shingles


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup by content hash: (content_hash, canonical_id, n_dups),
    canonical = min id per group."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").cast("long").alias("n_docs"),
        )
    )


def shingle_sets(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return (
        word_shingles(df.select(id_col, text_col), text_col, n)
        .select(F.col(id_col).alias("doc"), "shingle")
        .distinct()
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
    min_chars: int = 1,
) -> DataFrame:
    """Paragraph-level exact dedup (the CCNet granularity, between the
    doc-level `exact_duplicates` and the span-level `substring_dedup`):
    a paragraph occurrence SURVIVES iff it is the canonical copy of its
    content — the (doc_id, position) MINIMUM over every occurrence of
    that exact paragraph corpus-wide (the repo's canonical-survivor
    convention; within one doc the first occurrence wins).  Documents
    are rebuilt from their surviving paragraphs in original order.

    Paragraphs shorter than ``min_chars`` after trimming are passed
    through untouched (never hashed, never removed) — blank fragments
    from consecutive separators would otherwise all "duplicate" each
    other and eat real formatting.

    Plan shape (all JVM, no Python): posexplode the split -> ONE
    combinable groupBy(hash).agg(min(struct(doc, idx))) — state is
    distinct-paragraph-sized with map-side combine — -> hash-keyed
    semi-join back -> per-doc sort_array rebuild.  At 100 TB both
    exchanges are content-hash / doc-id keyed (no skew beyond the
    duplicate groups themselves, which the min-struct agg collapses
    map-side).

    Returns (id_col, clean_text, n_paragraphs, n_removed).  NULL-text
    rows pass through unchanged (clean_text NULL, counts 0) — split()
    of NULL explodes to zero rows, which would silently DROP the doc
    otherwise (the round-7 ADVICE defect class)."""
    import re as _re

    nulls = df.filter(F.col(text_col).isNull()).select(
        F.col(id_col),
        F.lit(None).cast("string").alias("clean_text"),
        F.lit(0).cast("long").alias("n_paragraphs"),
        F.lit(0).cast("long").alias("n_removed"),
    )
    df = df.filter(F.col(text_col).isNotNull())
    paras = df.select(
        F.col(id_col),
        # sep is a literal separator, not a regex — escape it for the
        # Java regex split; limit -1 keeps trailing empty fragments so
        # the rebuild is byte-faithful around them
        F.posexplode(
            F.split(F.col(text_col), _re.escape(sep), -1)
        ).alias("__idx", "__para"),
    )
    hashed = paras.withColumn(
        "__h",
        F.when(
            F.length(F.trim(F.col("__para"))) >= min_chars,
            F.md5(F.col("__para")),
        ),
    )
    canon = (
        hashed.filter(F.col("__h").isNotNull())
        .groupBy("__h")
        .agg(
            F.min(F.struct(F.col(id_col).alias("i"), F.col("__idx").alias("x")))
            .alias("__c")
        )
    )
    kept = hashed.join(canon, "__h", "left").filter(
        F.col("__h").isNull()
        | (
            (F.col("__c.i") == F.col(id_col))
            & (F.col("__c.x") == F.col("__idx"))
        )
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("__idx"), F.col("__para")))
                ),
                lambda s: s["__para"],
            ),
            sep,
        ).alias("clean_text"),
        F.count("*").cast("long").alias("__n_kept"),
    )
    totals = paras.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_paragraphs")
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_paragraphs",
            (F.col("n_paragraphs") - F.coalesce("__n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
        .unionByName(nulls)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-n-gram Jaccard over pairs that share >= 1 shingle:
    (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard >= threshold.

    |A∩B| from the shared-shingle join, |A∪B| = |A|+|B|-|A∩B|."""
    sh = shingle_sets(df, text_col, id_col, n).cache()
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    a = sh.withColumnsRenamed({"doc": "doc_a"})
    b = sh.withColumnsRenamed({"doc": "doc_b"})
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc": "doc_a", "sz": "sz_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc": "doc_b", "sz": "sz_b"}), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_hash_exprs(num_hashes: int = 8, family: str = "md5") -> list[F.Column]:
    """The MinHash hash family.

    - "md5" (default, cross-engine portable): 8-hex-char (32-bit)
      SLICES of md5(shingle) and md5('x|' || shingle) — num_hashes hash
      values from ceil(num_hashes/4) md5 calls instead of one salted
      md5 per hash (the md5s were ~40% of the sf0.1 minhash runtime).
      Any engine with md5 + substring replays the family exactly, which
      is what the DuckDB oracle does.
    - "xxhash64" (production): one salted xxhash64 per hash — a
      non-cryptographic JVM hash, several times cheaper than md5.  Use
      when cross-engine replay is not required."""
    if family == "xxhash64":
        return [F.xxhash64(F.lit(k), F.col("shingle")) for k in range(num_hashes)]
    if family != "md5":
        raise ValueError(f"unknown hash family {family!r}")
    exprs = []
    for k in range(num_hashes):
        # salt 0 ('' ) covers hashes 0-3, salt 1 ('x|') 4-7, salt 2
        # ('x2|') 8-11, ... — every block of 4 slices gets a DISTINCT
        # md5, so num_hashes > 8 never silently repeats hash values
        block = k // 4
        if block == 0:
            base = F.md5(F.col("shingle"))
        elif block == 1:
            base = F.md5(F.concat(F.lit("x|"), F.col("shingle")))
        else:
            base = F.md5(F.concat(F.lit(f"x{block}|"), F.col("shingle")))
        exprs.append(F.substring(base, 1 + 8 * (k % 4), 8))
    return exprs


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    shingles: DataFrame | None = None,
    family: str = "md5",
) -> DataFrame:
    """MinHash signature per document: for each hash k in the chosen
    family (see minhash_hash_exprs), the min over the document's
    shingles.  One grouped aggregation computes all k mins (no per-hash
    pass over the data).

    Note the input need NOT be deduplicated — min() is duplicate-
    insensitive, so the signature path can run on raw shingles; when a
    distinct shingle frame is already materialized for verification,
    pass it as ``shingles`` so one cache serves both."""
    if shingles is not None:
        sh = shingles
    else:
        sh = word_shingles(df.select(id_col, text_col), text_col, n).select(
            F.col(id_col).alias("doc"), "shingle"
        )
    aggs = [
        F.min(h).alias(f"mh{k}")
        for k, h in enumerate(minhash_hash_exprs(num_hashes, family))
    ]
    return sh.groupBy("doc").agg(*aggs)


def minhash_signatures_hof(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    family: str = "md5",
) -> DataFrame:
    """Shuffle-free MinHash signatures: identical output contract to
    ``minhash_signatures`` (same hash family, same (doc, mh0..mhK-1)
    rows — pinned by an equivalence test), computed as ONE per-row
    higher-order fold instead of explode + groupBy.

    Plan shape: ZERO exchanges.  The grouped form amplifies each
    document into one row per shingle and reunites them with a hash
    aggregate; this form builds the in-row shingle array and folds all
    k mins in a single ``F.aggregate`` pass (2 md5 calls per shingle,
    exactly like minhash_hash_exprs), so signature computation is
    embarrassingly parallel — the only shuffle left in a MinHash-LSH
    pipeline is the banded candidate equi-join.  At 100 TB that is the
    difference between a full-corpus shuffle stage and a map-only scan.

    Trade-off, MEASURED (sf0.1, local[32], 6 warm runs each): the
    grouped form 0.88-0.99 s, this form 1.13-1.20 s — higher-order
    lambdas are evaluated outside whole-stage codegen, and the explode
    form's shuffle was already partial-agg-tiny (one row per doc per
    map task), so removing it buys nothing locally.  The grouped form
    stays the default; this form exists for topologies where ANY
    exchange in the stage graph is the constraint (e.g. signature
    computation fused into a wider map-only ingest pass)."""
    mh = minhash_shingle_mins(
        F.col("__toks"), n=n, num_hashes=num_hashes, family=family
    )
    return (
        df.select(
            F.col(id_col).alias("doc"),
            tokens(F.col(text_col)).alias("__toks"),
        )
        .filter(F.size("__toks") >= n)
        .withColumn("__sig", mh)
        .select(
            "doc", *[F.col("__sig")[k].alias(f"mh{k}") for k in range(num_hashes)]
        )
    )


def minhash_shingle_mins(
    toks: F.Column, n: int = 3, num_hashes: int = 8, family: str = "md5"
) -> F.Column:
    """Column form of the MinHash signature: given a token ARRAY, return
    the array [min_k over shingles] of the sliced-md5 / xxhash64 family
    (minhash_hash_exprs) — one fold, no explode, no aggregation.

    The md5 family computes each 128-bit block ONCE per shingle via a
    nested transform (array of block md5s -> 4 slices each), matching
    the 2-md5-per-shingle cost of the grouped form; a naive per-slice
    md5 inside the fold would evaluate 8 md5s per shingle because
    interpreted lambdas get no common-subexpression elimination.

    Token arrays SHORTER than ``n`` yield NULL (no shingles exist, so
    there is no signature — mirroring the grouped form, where such docs
    simply produce no row).  Without the guard, F.sequence(1, size-n+1)
    would go DESCENDING for short arrays, first emitting a truncated
    bogus shingle and then raising a cryptic element_at index error."""
    shingle_idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingles = F.transform(
        shingle_idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)]
        ),
    )
    if family == "md5":
        n_blocks = -(-num_hashes // 4)

        def slices(s: F.Column) -> F.Column:
            blocks = []
            for b in range(n_blocks):
                if b == 0:
                    blocks.append(F.md5(s))
                else:
                    salt = "x|" if b == 1 else f"x{b}|"
                    blocks.append(F.md5(F.concat(F.lit(salt), s)))
            sliced = F.flatten(
                F.transform(
                    F.array(*blocks),
                    lambda h: F.array(
                        *[F.substring(h, 1 + 8 * i, 8) for i in range(4)]
                    ),
                )
            )
            return F.slice(sliced, 1, num_hashes)

        # 'g' > 'f': lexicographically above every md5 hex slice
        init = F.array_repeat(F.lit("g"), num_hashes)
    elif family == "xxhash64":

        def slices(s: F.Column) -> F.Column:
            return F.array(*[F.xxhash64(F.lit(k), s) for k in range(num_hashes)])

        init = F.array_repeat(F.lit(9223372036854775807).cast("long"), num_hashes)
    else:
        raise ValueError(f"unknown hash family {family!r}")
    folded = F.aggregate(
        shingles, init, lambda acc, s: F.zip_with(acc, slices(s), lambda a, b: F.least(a, b))
    )
    # NULL (not the init sentinels) for shingle-less docs: init mins
    # would band-collide every short doc into one hot ("g|g") bucket
    return F.when(F.size(toks) >= n, folded)


def drop_frequent_shingles(
    shingles: DataFrame, max_df: int | float, n_docs: int | None = None
) -> DataFrame:
    """Stop-shingle dropping by document frequency — the hot-LSH-bucket
    mitigation for MinHash at crawl scale.  Boilerplate shingles
    (headers, navigation chrome, license text) occur in a large
    fraction of a real corpus; they pin signature mins to the same
    values and create hot (band, bucket) keys whose candidate lists
    grow as C(bucket_size, 2) — the quadratic blow-up the 6x unsalted
    rehearsal measured (SCALE.md).  Dropping shingles with document
    frequency above ``max_df`` (int = absolute doc count, float =
    fraction of ``n_docs``) removes the corpus-wide shingles that carry
    no discriminating signal while keeping Jaccard over the remaining
    sets intact.

    Plan shape: one exact document-frequency aggregation (combinable,
    over the distinct (doc, shingle) pairs), then a BROADCAST anti-join
    of the hot list — the hot set is by construction tiny (shingles
    shared by > max_df docs), so the mitigation itself never shuffles
    the corpus.  shingles: (doc, shingle), need not be distinct."""
    hot = frequent_shingles(shingles, max_df, n_docs)
    return shingles.join(F.broadcast(hot), "shingle", "anti")


def frequent_shingles(
    shingles: DataFrame, max_df: int | float, n_docs: int | None = None
) -> DataFrame:
    """The hot list behind drop_frequent_shingles: shingles whose
    document frequency exceeds ``max_df``.  A float ``max_df`` is a
    fraction of the DISTINCT shingle-bearing document count (docs too
    short to shingle don't dilute the denominator).  The fraction form
    stays fully LAZY: the doc count joins into the threshold filter as
    a broadcast 1-row frame instead of an eager driver job, so the
    corpus-sized distinct subtree executes once (its exchange is shared
    by the two aggregations) and only when the hot list is consumed."""
    distinct_sh = shingles.distinct()
    counts = distinct_sh.groupBy("shingle").agg(F.count("*").alias("df"))
    if isinstance(max_df, float):
        if n_docs is None:
            nd = distinct_sh.agg(F.count_distinct("doc").alias("nd"))
            return (
                counts.crossJoin(F.broadcast(nd))
                .filter(
                    F.col("df")
                    > F.greatest(
                        F.lit(1).cast("long"),
                        F.floor(F.lit(max_df) * F.col("nd")),
                    )
                )
                .select("shingle")
            )
        threshold = max(int(max_df * n_docs), 1)
    else:
        threshold = int(max_df)
    return counts.filter(F.col("df") > threshold).select("shingle")


def minhash_band_buckets(
    signatures: DataFrame, num_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """Band a (doc, mh0..mhK-1) signature frame into (doc, band,
    bucket) rows: bucket = concat of band_size signature slots, one
    output row per band — a STATELESS per-row explode (the MinHash
    analog of simhash_band_buckets).  Factored out so the same banding
    serves the batch candidate join AND a stream-static ingest index:
    a STREAMING signature frame (minhash_signatures_hof — zero
    exchanges, so it runs on readStream frames) can be banded and
    joined against a static corpus index in append mode, no watermark,
    no state — MinHash near-dup flagging at ingest (round-6 #8).

    Plan note: the explode reads the signature frame ONCE; the earlier
    4-way union-of-selects planned the signature subtree per band and
    leaned on ReuseExchange to dedupe it."""
    entries = [
        F.struct(
            F.lit(band_id).alias("band"),
            F.concat_ws(
                "|", *[f"mh{k}" for k in range(band_id, band_id + band_size)]
            ).alias("bucket"),
        )
        for band_id in range(0, num_hashes, band_size)
    ]
    return signatures.select(
        "doc", F.explode(F.array(*entries)).alias("bb")
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_candidates(
    signatures: DataFrame, num_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """LSH banding: bucket = concat of band_size signature slots; a pair
    is a candidate iff it collides in >= 1 band.  The quadratic pair
    search becomes an equi-join on (band, bucket)."""
    buckets = minhash_band_buckets(signatures, num_hashes, band_size)
    a = buckets.withColumnsRenamed({"doc": "doc_a"})
    b = buckets.withColumnsRenamed({"doc": "doc_b"})
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_for_pairs(
    pairs: DataFrame, shingles: DataFrame, broadcast_pairs: bool = True
) -> DataFrame:
    """Exact Jaccard for an explicit candidate-pair set only — the
    verification cost is O(candidates × shingles-per-doc), independent
    of corpus size (this is what makes LSH sub-quadratic end to end).

    pairs: (doc_a, doc_b); shingles: (doc, shingle) distinct.
    Returns (doc_a, doc_b, inter, union) as exact integers.

    ``broadcast_pairs`` (default on): the pair list is a stats-less
    post-shuffle frame — without the hint the pairs⋈shingles join
    plans as a full SortMergeJoin over the shingle set, the exact
    stats-less-frame failure mode the batched-atom and BFS-frontier
    fixes addressed.  Near-dup pair lists are output-density-sized;
    disable only when candidates are expected to rival the corpus."""
    hint = F.broadcast if broadcast_pairs else (lambda d: d)
    sizes = shingles.groupBy("doc").agg(F.count("*").alias("sz"))
    a = shingles.withColumnsRenamed({"doc": "doc_a"})
    b = shingles.withColumnsRenamed({"doc": "doc_b"})
    inter = (
        hint(pairs).join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    # assembly joins: inter/sizes are candidate-sized post-shuffle frames
    # with runtime stats — AQE converts these to broadcast on its own
    # (broadcasting the LEFT side of a left-outer join is unsupported,
    # so the pairs hint would be a no-op here anyway)
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.withColumnsRenamed({"doc": "doc_a", "sz": "sz_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc": "doc_b", "sz": "sz_b"}), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.coalesce("inter", F.lit(0)).cast("long").alias("inter"),
            (F.col("sz_a") + F.col("sz_b") - F.coalesce("inter", F.lit(0)))
            .cast("long")
            .alias("union"),
        )
    )


def near_dup_clusters(
    doc_ids: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs -> transitive clusters: (doc, component, size).

    The missing last step of every dedup pipeline: pair lists don't
    dedup anything until they're closed into components and one
    representative is kept per component.  component = MIN doc id in
    the cluster (the canonical survivor); singleton docs appear with
    component = self, size = 1, so ``filter(doc == component)`` IS the
    dedup.  Built on ops/graph.connected_components (hash-to-min with
    pointer jumping, O(log diameter) rounds — near-dup clusters from
    chained LSH pairs can be long paths, not cliques, so the jumping
    matters).

    The iteration runs over PAIR-TOUCHED nodes only (round-16
    optimization, guide §2.3 — shuffle only the rows that can
    change): a node in no pair keeps label = itself under hash-to-min
    by definition, so carrying the whole corpus id set through every
    CC round (join + min-agg + checkpoint per round) moved corpus-
    sized frames to compute an identity.  Untouched ids re-enter
    after the fixpoint as (doc, component=doc, size=1) — output
    IDENTICAL (pinned by the existing cluster tests and the emb_*
    oracle members)."""
    # distinct FIRST (the old form distinct'ed inside CC's label init,
    # so duplicate input ids must still collapse to one output row)
    nodes = doc_ids.select(F.col(id_col).alias("node")).distinct()
    e = pairs.select(F.col("doc_a").alias("h"), F.col("doc_b").alias("t"))
    e = e.localCheckpoint(eager=False)  # feeds endpoints + every CC round
    endpoints = (
        e.select(F.col("h").alias("node"))
        .unionByName(e.select(F.col("t").alias("node")))
        .distinct()
    )
    touched = nodes.join(endpoints, "node", "semi")
    comp_t = connected_components(touched, e)
    sizes = comp_t.groupBy("component").agg(
        F.count("*").cast("long").alias("size")
    )
    clustered = comp_t.select(F.col("node").alias("doc"), "component").join(
        sizes, "component"
    )
    singletons = nodes.join(endpoints, "node", "left_anti").select(
        F.col("node").alias("doc"),
        F.col("node").alias("component"),
        F.lit(1).cast("long").alias("size"),
    )
    return clustered.select("doc", "component", "size").unionByName(
        singletons
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.8,
    family: str = "md5",
    restrict_verify: bool | str = True,
    max_shingle_df: int | float | None = None,
    broadcast_pairs: bool = True,
    raw_counts: bool = False,
    auto_restrict_share: float = 0.05,
) -> DataFrame:
    """Full MinHash-LSH pipeline: signatures -> banded candidates ->
    exact Jaccard verification of the CANDIDATES only (never the full
    pair space).

    ``raw_counts``: return (doc_a, doc_b, inter, union) as exact longs
    with the threshold applied via integer cross-multiplication
    (Fraction(threshold)), instead of (doc_a, doc_b, jaccard) with a
    float compare — the hash-stable form the correctness gates consume
    (no doubles leave the query, and the boundary jaccard == threshold
    case is decided exactly).

    ``max_shingle_df``: when set, drop shingles whose document
    frequency exceeds it (int = docs, float = fraction of the distinct
    shingle-bearing docs — the same denominator as
    drop_frequent_shingles; the float denominator is computed LAZILY as
    a broadcast 1-row crossJoin, no eager driver job — see
    frequent_shingles) from BOTH the signature and the verification
    shingle sets —
    the boilerplate/hot-bucket mitigation; Jaccard is then over the
    filtered sets, the standard stop-shingle semantics.  The hot list
    is computed once (lazy checkpoint) and broadcast into map-only
    anti-joins.

    ``restrict_verify``: semi-join the corpus down to docs that appear
    in >= 1 candidate pair BEFORE the verification shingling.  Without
    it, the verify stage re-shingles and DISTINCTs the ENTIRE corpus
    just to serve candidate lookups — a full-corpus shuffle that dwarfs
    the candidate join at low duplicate density (the common 100-TB
    case: candidates ~ duplicate density x corpus, a small fraction).
    Measured caveat (round 6, SCALE.md): the restriction also carries
    a fixed cost (pair-list checkpoint barrier + broadcast +
    semi-join) which EXCEEDS its saving on short-document corpora at
    10-20% candidate share (~10-20% slower there) — while forcing it
    OFF on a 100-TB low-share corpus re-scans and re-shuffles every
    text byte for verification (a second full pass).  True (the
    default) is the asymmetric-risk choice: bounded overhead where it
    loses, unbounded saving where it wins.

    ``"auto"`` decides from the data instead: the candidate pair list
    materializes eagerly, the candidate-doc share is counted against
    the corpus, and the restriction applies only below
    ``auto_restrict_share`` (5%).  Its decision runs AT PLAN-BUILD
    TIME and its price profile is lopsided (measured, SCALE.md): when
    it resolves ON the premium is just the two count jobs (the
    checkpoint was needed anyway), but when it resolves OFF the eager
    pair-list job is a full serialized signature pass the fused
    unrestricted plan would not have run — up to ~2x on corpora where
    OFF wins.  Use auto only when the regime is genuinely unknown AND
    a wrong ON matters more than the decision cost; the choice never
    changes the OUTPUT, only the plan (pinned by the gate oracle and
    an output-invariance test).

    ``broadcast_pairs``: forwarded to jaccard_for_pairs, and also gates
    the restrict_verify doc-list broadcast — set False when candidates
    are expected to rival the corpus (a hot-bucket corpus WITHOUT
    max_shingle_df set), where broadcasting the pair list would exceed
    broadcast limits; the joins then fall back to shuffles instead of
    aborting.

    localCheckpoint caveat: the lazy checkpoints that let the pair/hot
    lists feed two consumers store blocks on executors WITHOUT lineage;
    on a cluster that loses executors mid-job the action fails rather
    than recomputes.  They are output-density-sized blocks held for one
    job — on long-lived production clusters, swap for a reliable
    checkpoint dir or persist-with-replication if that risk matters."""
    # the shingle projection is recomputed per consumer on purpose: a
    # shared .cache() breaks parse->agg codegen fusion and measures
    # SLOWER than the double parse (see q_dedup_minhash A/B numbers)
    pair_hint = F.broadcast if broadcast_pairs else (lambda d: d)
    hot = None
    if max_shingle_df is not None:
        base_sh = word_shingles(df.select(id_col, text_col), text_col, n).select(
            F.col(id_col).alias("doc"), "shingle"
        )
        # tiny by construction; checkpoint so the two consumers
        # (signature + verify anti-joins) share one computation
        hot = frequent_shingles(base_sh, max_shingle_df).localCheckpoint(
            eager=False
        )
        sig_sh = base_sh.join(F.broadcast(hot), "shingle", "anti")
        sigs = minhash_signatures(
            df, text_col, id_col, n, num_hashes, shingles=sig_sh, family=family
        )
    else:
        sigs = minhash_signatures(
            df, text_col, id_col, n, num_hashes, family=family
        )
    cand = minhash_lsh_candidates(sigs, num_hashes, band_size)
    if restrict_verify not in (True, False, "auto"):
        raise ValueError(f"restrict_verify must be bool or 'auto', got {restrict_verify!r}")
    checkpointed = False
    if restrict_verify == "auto":
        # decide from the data: materialize the pair list (it feeds the
        # verify join in every branch) and compare candidate-doc share
        # against the corpus.  Costs one pair-list-sized count and one
        # count-star the parquet scan answers from metadata.
        cand = cand.localCheckpoint(eager=True)
        checkpointed = True
        n_cand_docs = (
            cand.select(F.explode(F.array("doc_a", "doc_b")).alias("d"))
            .distinct()
            .count()
        )
        restrict_verify = n_cand_docs <= auto_restrict_share * df.count()
    verify_src = df
    if restrict_verify:
        # the pair list feeds two consumers (verify join + doc-id
        # restriction); checkpointing the tiny pair list keeps the
        # second consumer from re-running signatures+banding as a
        # separate broadcast-build job (ReuseExchange does not cross
        # the broadcast boundary — measured in queries/pipeline.py)
        if not checkpointed:
            cand = cand.localCheckpoint(eager=False)
        cd = cand.select(
            F.explode(F.array("doc_a", "doc_b")).alias(id_col)
        ).distinct()
        verify_src = df.join(pair_hint(cd), id_col, "semi")
    sh = shingle_sets(verify_src, text_col, id_col, n)
    if hot is not None:
        sh = sh.join(F.broadcast(hot), "shingle", "anti")
    jac = jaccard_for_pairs(cand, sh, broadcast_pairs=broadcast_pairs)
    if raw_counts:
        from fractions import Fraction

        fr = Fraction(threshold).limit_denominator(10**6)
        return jac.filter(
            F.col("inter") * fr.denominator >= F.col("union") * fr.numerator
        ).select("doc_a", "doc_b", "inter", "union")
    return jac.withColumn("jaccard", F.col("inter") / F.col("union")).filter(
        F.col("jaccard") >= threshold
    ).select("doc_a", "doc_b", "jaccard")


def decontaminate(
    train: DataFrame,
    evalset: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
    broadcast: bool = True,
    min_overlap_frac: float | None = None,
) -> DataFrame:
    """Benchmark decontamination: find TRAINING documents that contain
    word n-grams from an EVALUATION set — the cross-corpus containment
    check every training pipeline runs before release (dedup finds
    train-train duplicates; this finds train-eval leakage, the thing
    that silently inflates benchmark scores).

    Returns (doc_id, eval_id, hits): training doc x eval doc pairs
    sharing >= ``min_hits`` distinct n-grams, with the shared count.
    The standard n is longer than dedup shingles (8-13 words) so
    incidental phrase overlap does not flag; tune ``min_hits`` upward
    for short n.

    Plan shape, ``broadcast=True`` (default): the eval n-gram set is
    benchmark-sized (thousands of docs), so it is BROADCAST and the
    training corpus is scanned map-only — one grouped count on the
    (train-doc, eval-doc) hits, keyed by flagged pairs (output-sized).
    At 100 TB the training side never shuffles; only the flagged pairs
    do.

    ``broadcast=False`` — the BUCKETED form (round-6 ask #4), for eval
    suites that rival the corpus (where the broadcast would exceed the
    driver/executor broadcast ceiling and be refused): both sides
    hash-partition on the shingle and meet in a SHUFFLE_HASH join —
    the per-partition hash map is built from the (smaller) eval side,
    and the training side is streamed against it WITHOUT being sorted
    (a merge join would pay an O(n log n) sort of the corpus shingles;
    the same shuffled-equi-join shape the MinHash band join uses).
    Output is identical; only the exchange strategy changes.

    ``min_overlap_frac`` (round 8 — FUZZY decontamination, the
    GPT-3/PaLM-style criterion): additionally require that the shared
    n-grams cover at least this FRACTION of the eval document's
    distinct n-grams (hits / eval_ngrams), so incidental single-phrase
    overlap with a long eval doc does not flag.  Adds an
    ``overlap_frac`` column; the eval n-gram counts ride a broadcast
    eval-sized join (the denominators are per-eval-doc, computed once
    from the same distinct shingle set the join uses)."""
    tr = word_shingles(train.select(id_col, text_col), text_col, n).select(
        F.col(id_col).alias("doc_id"), "shingle"
    )
    ev = (
        word_shingles(
            evalset.select(
                F.col(id_col).alias("eval_id"), F.col(text_col)
            ),
            text_col,
            n,
        )
        .select("eval_id", "shingle")
        .distinct()
    )
    # NO distinct on the training side (that would full-shuffle the
    # corpus shingles): the join keeps only hit rows, so the
    # distinct-shingle count runs on the output-sized hit set instead
    ev_side = F.broadcast(ev) if broadcast else ev.hint("shuffle_hash")
    hits = (
        tr.join(ev_side, "shingle")
        .groupBy("doc_id", "eval_id")
        .agg(F.count_distinct("shingle").cast("long").alias("hits"))
        .filter(F.col("hits") >= min_hits)
    )
    if min_overlap_frac is None:
        return hits
    denom = ev.groupBy("eval_id").agg(
        F.count("*").cast("long").alias("__ev_n")
    )
    return (
        hits.join(F.broadcast(denom), "eval_id")
        .withColumn("overlap_frac", F.col("hits") / F.col("__ev_n"))
        .filter(F.col("overlap_frac") >= float(min_overlap_frac))
        .select("doc_id", "eval_id", "hits", "overlap_frac")
    )


def _simhash_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The shared SimHash front end: (doc, tok) token explode with the
    exact tokenizer the kernel form mirrors (trim(' '), ASCII \\s+,
    trailing empties kept — pinned by the kernel equivalence test)."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )


def _simhash_signs(weighted_toks: DataFrame, bits: int) -> DataFrame:
    """The shared SimHash back end: (doc, h, w) -> (doc, simhash).
    Bit explode, per-bit weighted vote sum (exact integer aggregation),
    sign -> fingerprint bit.  Both the unweighted (w=1) and idf forms
    run through this single implementation so their tokenize/vote/sign
    semantics cannot drift apart."""
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    weighted = weighted_toks.select("doc", "h", "w", bit).select(
        "doc",
        "bit",
        (
            (F.expr("shiftright(h, bit)").bitwiseAND(F.lit(1)) * 2 - 1)
            * F.col("w")
        ).alias("v"),
    )
    per_bit = weighted.groupBy("doc", "bit").agg(F.sum("v").alias("s"))
    return per_bit.groupBy("doc").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(
                F.lit(0)
            )
        ).alias("simhash")
    )


def simhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """SimHash: per token take a 60-bit hash (hex md5 prefix), weight
    each bit ±1, sum per bit position over the document, sign -> bit.
    Entirely column expressions: tokens explode × bit explode, two
    grouped aggregations."""
    bits = min(bits, 60)  # 15 hex chars fit a signed 64-bit long
    toks = _simhash_tokens(df, text_col, id_col).select(
        "doc",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
        F.lit(1).cast("long").alias("w"),
    )
    return _simhash_signs(toks, bits)


def simhash_fingerprints_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """idf-weighted SimHash — the hot-bucket mitigation for the SimHash
    path (the analog of drop_frequent_shingles for MinHash): each
    token's ±1 bit votes are scaled by its inverse document frequency,
    so corpus-wide boilerplate stops dominating every fingerprint.  A
    token present in EVERY document gets idf ln(N/N) = 0 — exactly
    dropped — while rare (discriminating) tokens dominate the signs.

    Determinism: weights are idf scaled to INTEGERS
    (round(1000 * ln(N/df))), so the per-bit vote sums are exact
    integer aggregations — no float summation-order sensitivity in the
    sign decision, same guarantee as the unweighted form.

    Plan shape: one distinct + combinable DF aggregation over (doc,
    token), one equi-join of tokens with their df (both sides keyed by
    token), then the same two grouped aggregations as the unweighted
    form.  The corpus size N is the one driver-side scalar."""
    bits = min(bits, 60)
    n_docs = df.select(id_col).distinct().count()
    toks = _simhash_tokens(df, text_col, id_col)
    docfreq = (
        toks.distinct()
        .groupBy("tok")
        .agg(F.count("*").alias("tok_df"))
        .withColumn(
            "w",
            F.round(F.log(F.lit(float(n_docs)) / F.col("tok_df")) * 1000).cast(
                "long"
            ),
        )
    )
    weighted_toks = toks.join(docfreq.select("tok", "w"), "tok").select(
        "doc",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
        "w",
    )
    return _simhash_signs(weighted_toks, bits)


def simhash_fingerprints_kernel(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """One-pass Arrow-batched SimHash fingerprint: same output contract
    as ``simhash_fingerprints`` (bit-for-bit — pinned by test) without
    the x``bits`` row amplification before the first groupBy.  Per doc,
    the kernel hashes each token once and accumulates all bit positions
    in one [n_tokens x bits] NumPy pass, so shuffle input is one row per
    document instead of ``bits`` rows per (doc, bit).

    Trade-off (measured, see SCALE.md round-3 A/B): the expression form
    stays inside whole-stage codegen with a combinable partial agg — the
    explode amplifies CPU, not shuffle bytes; this kernel removes the
    amplification but pays Python md5 + Arrow transfer.  The expression
    form doubles as the DuckDB oracle mirror.

    Token semantics mirror the expression form exactly: trim(' ') then
    split on ASCII \\s+ with trailing empties kept (Spark split
    limit=-1) — pinned by an equivalence test over edge-case strings."""
    import hashlib
    import re
    from typing import Iterator

    import numpy as np
    import pandas as pd

    bits = min(bits, 60)  # 15 hex chars fit a signed 64-bit long
    shifts = np.arange(bits, dtype=np.uint64)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids, fps = [], []
            for doc, text in zip(pdf["doc"], pdf["txt"]):
                # mirrors F.split(F.trim(text), "\\s+"): space-only trim,
                # ASCII \s, trailing empties KEPT (Spark split limit=-1)
                toks = re.split(r"\s+", str(text).strip(" "), flags=re.ASCII)
                hs = np.array(
                    [
                        int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                        for t in toks
                    ],
                    dtype=np.uint64,
                )
                ones = ((hs[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
                w = 2 * ones.astype(np.int64) - len(toks)
                fp = int(((w > 0).astype(np.uint64) << shifts).sum())
                ids.append(doc)
                fps.append(fp)
            yield pd.DataFrame({"doc": ids, "simhash": fps})

    return df.select(
        F.col(id_col).alias("doc"), F.col(text_col).alias("txt")
    ).mapInPandas(run, "doc long, simhash long")


def simhash_band_buckets(fp: DataFrame, band_bits: int = 15) -> DataFrame:
    """Band a (doc, simhash) frame into (doc, band, bucket) rows — 4
    slices of ``band_bits`` bits (pigeonhole: hamming <= 3 implies at
    least one identical slice).  Factored out so the same banding
    serves the batch near-dup join AND a stream-static ingest index:
    the per-row explode is stateless, so a STREAMING fingerprint frame
    can be banded and joined against a static corpus index in append
    mode (no watermark, no state) — near-dup flagging at ingest."""
    return fp.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), i * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("bucket"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    band_bits: int = 15,
    max_hamming: int = 3,
    fingerprints: str = "expr",
) -> DataFrame:
    """SimHash near-dup: band the fingerprint into 4 slices (pigeonhole:
    hamming <= 3 => at least one identical slice), bucket-join, verify
    with bit_count of xor.  ``fingerprints``: "expr" (column-expression
    explode form, the DuckDB-mirrorable default), "kernel" (one-pass
    mapInPandas form, identical output), or "idf" (idf-weighted form —
    the boilerplate/hot-bucket mitigation, different fingerprints by
    design)."""
    if fingerprints == "kernel":
        fp = simhash_fingerprints_kernel(df, text_col, id_col).cache()
    elif fingerprints == "idf":
        fp = simhash_fingerprints_idf(df, text_col, id_col).cache()
    elif fingerprints == "expr":
        fp = simhash_fingerprints(df, text_col, id_col).cache()
    else:
        raise ValueError(f"unknown fingerprints mode {fingerprints!r}")
    return fingerprint_near_duplicates(fp, band_bits, max_hamming)


def fingerprint_near_duplicates(
    fp: DataFrame, band_bits: int, max_hamming: int
) -> DataFrame:
    """Band a (doc, simhash) fingerprint frame into 4 slices
    (pigeonhole: hamming <= 3 => at least one identical slice),
    bucket-join for candidates, verify with bit_count of xor.  Shared
    by the text SimHash path and the image dHash path
    (ops/multimodal.image_near_duplicates) — any 64-bit-or-less
    fingerprint family gets the same sub-quadratic machinery."""
    buckets = simhash_band_buckets(fp, band_bits)
    cand = (
        buckets.withColumnsRenamed({"doc": "doc_a"})
        .join(buckets.withColumnsRenamed({"doc": "doc_b"}), ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    fa = fp.withColumnsRenamed({"doc": "doc_a", "simhash": "sh_a"})
    fb = fp.withColumnsRenamed({"doc": "doc_b", "simhash": "sh_b"})
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ------------------------------------------------ substring-level dedup


def substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 50,
    min_count: int = 2,
    key: str = "hash",
    use_sketch: bool = False,
    sketch_depth: int = 5,
    sketch_width: int = 1 << 16,
) -> DataFrame:
    """Repeated-SPAN removal — the training-data step doc-level dedup
    cannot do (suffix-array dedup a la "Deduplicating Training Data
    Makes Language Models Better"): find token spans of ``span_tokens``
    that occur >= ``min_count`` times ACROSS the corpus and cut every
    occurrence out of the surviving documents.

    Spark-first, combinable, never all-pairs:
      1. tokenize (whitespace-normalized) — map-only,
      2. explode every window start 0..n-L and key the window
         (``key="hash"``: xxhash64 of the joined span — the production
         path; ``key="string"``: the raw span text, exactly replayable
         by an oracle engine) — map-side generate, O(n*L) slice work,
      3. corpus span frequencies via ONE combinable groupBy (map-side
         partial aggregation absorbs per-partition repeats before the
         shuffle), filter >= min_count,
      4. semi-join windows against the hot spans -> (id, start) hit
         list, collect_set per doc (output-scaled: only duplicated
         spans survive to here),
      5. merge overlapping/adjacent hot windows into MAXIMAL spans
         (round-8 ask #7): sorted starts fold into [lo, hi) segments
         via one JVM ``aggregate`` HOF — a VARIABLE-LENGTH repeat (a
         200-token boilerplate seen through 50-token windows) collapses
         to one segment instead of 150 overlapping starts, so the
         rebuild's per-token containment test scans segments, not raw
         windows (two consecutive windows merge when the next start is
         at or before the previous end),
      6. rebuild each doc JVM-side: a token at position i is dropped
         iff some merged segment covers it (lo <= i < hi) — a nested
         higher-order EXISTS over the doc's segment array, no Python
         in the loop.

    ``use_sketch=True`` replaces steps 3-4 with a count-min sketch
    (ops/sketch.py): state is depth*width REGARDLESS of the span
    vocabulary (the unbounded-key-space answer at 100 TB), windows are
    scored against the BROADCAST sketch and reduced per (id, start) —
    no shuffle keyed by span, so a boilerplate span repeated in 10% of
    the corpus cannot create a hot shuffle key.  CMS never
    undercounts, so every truly repeated span is still removed; the
    price is up to eps*N false-positive removals (eps = e/width).

    Returns (id_col, clean_text, n_tokens, n_removed, n_spans) —
    ``n_spans`` counts the MAXIMAL removed spans (merged segments; 0
    when nothing was removed), the per-doc boilerplate-block count a
    fixed-window scheme can't report.  Whitespace is normalized to
    single spaces in clean_text (tokens are rejoined).

    Reference parity: the reference's dedup surface is doc-level
    (SURVEY.md §2 dedup rows); this operator extends it with the
    standard substring tier built from the same primitives
    (chunking/rolling-hash/CMS)."""
    if key not in ("hash", "string"):
        raise ValueError(f"key must be 'hash' or 'string', got {key!r}")
    L = int(span_tokens)
    # drop empty tokens so an empty/whitespace-only doc counts 0
    # tokens, not the [''] Spark's split('') yields (the Python-
    # reference .split() convention)
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " "),
        lambda t: t != "",
    )
    base = df.select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__n")
    )
    span = F.concat_ws(" ", F.slice("__toks", F.col("__start") + 1, L))
    kcol = F.xxhash64(span) if key == "hash" else span
    wins = (
        base.filter(F.col("__n") >= L)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.col("__n") - L)).alias("__start"),
            "__toks",
        )
        .select(id_col, "__start", kcol.alias("__k"))
    )
    # (round-15 optimization, guide §5) the window stream feeds TWO
    # consumers in both modes (exact: hot-span groupBy + semi-join
    # probe; sketch: CMS build + probe explode) and its lineage is the
    # expensive O(n*L) slice+concat(+hash) over every token window —
    # the lazy checkpoint materializes the compact (id, start, key)
    # rows once (~20 bytes per window with key="hash", the same order
    # as one shuffle of the exact path's counts) instead of paying the
    # window generation twice.  Same executor-block caveat as
    # minhash_near_duplicates' checkpoints.
    wins = wins.localCheckpoint(eager=False)
    if use_sketch:
        from knovexlite_spark.ops.sketch import _bucket, count_min_sketch

        sketch = count_min_sketch(
            wins, "__k", depth=sketch_depth, width=sketch_width,
            salt="substr",
        )
        probes = wins.select(
            id_col, "__start",
            F.explode(F.array(*[
                F.struct(
                    F.lit(d).alias("depth"),
                    _bucket(F.col("__k"), d, sketch_width, "substr").alias("bucket"),
                )
                for d in range(sketch_depth)
            ])).alias("e"),
        ).select(
            id_col, "__start",
            F.col("e.depth").alias("depth"), F.col("e.bucket").alias("bucket"),
        )
        hits = (
            probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
            .groupBy(id_col, "__start")
            .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("__est"))
            .filter(F.col("__est") >= min_count)
            .select(id_col, "__start")
        )
    else:
        hot = (
            wins.groupBy("__k")
            .agg(F.count("*").alias("__c"))
            .filter(F.col("__c") >= min_count)
            .select("__k")
        )
        hits = wins.join(hot, "__k", "left_semi").select(id_col, "__start")
    rem = hits.groupBy(id_col).agg(
        F.sort_array(F.collect_set("__start")).alias("__ss")
    )
    seg_type = "array<struct<lo:int,hi:int>>"
    # fold sorted starts into maximal [lo, hi) segments: a start at or
    # before the previous segment's end extends it (hi = s + L, always
    # past the previous hi because starts are distinct and ascending);
    # a start past the end opens a new segment
    segs = F.aggregate(
        "__ss",
        F.array().cast(seg_type),
        lambda acc, s: F.when(
            (F.size(acc) == 0) | (s > F.element_at(acc, -1)["hi"]),
            F.concat(
                acc,
                F.array(F.struct(
                    s.alias("lo"), (s + F.lit(L)).cast("int").alias("hi")
                )),
            ),
        ).otherwise(
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.struct(
                    F.element_at(acc, -1)["lo"].alias("lo"),
                    (s + F.lit(L)).cast("int").alias("hi"),
                )),
            )
        ),
    )
    joined = base.join(rem, id_col, "left").select(
        id_col, "__toks", "__n",
        F.coalesce(segs, F.array().cast(seg_type)).alias("__segs"),
    )
    kept = F.filter(
        F.transform(
            "__toks",
            lambda t, i: F.when(
                F.exists(
                    "__segs", lambda g: (g["lo"] <= i) & (i < g["hi"])
                ),
                F.lit(None).cast("string"),
            ).otherwise(t),
        ),
        lambda t: t.isNotNull(),
    )
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias("clean_text"),
        F.col("__n").cast("long").alias("n_tokens"),
        (F.col("__n") - F.size(kept)).cast("long").alias("n_removed"),
        F.size("__segs").cast("long").alias("n_spans"),
    )
