"""Text analysis operators for large-scale training-data pipelines:
tokenization, language ID, quality scoring, fingerprinting.

All hot-path operators are pure column expressions (JVM-side, inside
whole-stage codegen) — no Python UDFs.  Shingling uses
explode(sequence(...)) which Catalyst plans as a generator, and the
per-document aggregations are map-side-combinable groupBys, so every
operator scales linearly with corpus size and parallelism at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"\S+"
# Simple per-language stopword lists for the n-gram/stopword language-ID
# heuristic; deterministic, no model download.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    # round 8: three more high-volume crawl languages.  Markers
    # overlap across Romance/Germanic languages by nature ('de', 'que',
    # 'e'); the argmax with earliest-wins tie-break keeps the verdict
    # deterministic, and dict ORDER is therefore part of the contract
    # (the gate oracle generates its CASE chain from this dict).
    "it": ["il", "di", "che", "non", "per"],
    "pt": ["o", "de", "que", "um", "uma"],
    "nl": ["de", "het", "een", "en", "van"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (regexp, JVM-side)."""
    return F.regexp_count(text, F.lit(TOKEN_RE)).cast("long")


# GPT-2-style pre-tokenizer approximation (the brief's "BPE-ish regex"):
# contraction suffixes, space-prefixed letter runs, digit runs, and
# punctuation runs — ASCII classes only so Java regex (Spark) and RE2
# (DuckDB) count identically.
BPE_TOKEN_RE = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: non-overlapping matches of the GPT-2-style
    pre-tokenizer regex — a better LLM-token estimate than whitespace
    (splits punctuation and digit runs off words), still one JVM regexp
    scan."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE)).cast("long")


def tokens(text: Column) -> Column:
    """Whitespace token array (the shingling unit)."""
    return F.split(F.trim(text), r"\s+")


def word_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Word n-gram shingles: one output row per (doc, shingle).
    explode(sequence) keeps generation inside the JVM."""
    toks = tokens(F.col(text_col))
    with_toks = df.withColumn("__toks", toks).withColumn(
        "__n", F.size("__toks")
    )
    idx = F.explode(F.sequence(F.lit(1), F.col("__n") - (n - 1))).alias("i")
    parts = [F.element_at("__toks", F.col("i") + j) for j in range(n)]
    return (
        with_toks.filter(F.col("__n") >= n)
        .select("*", idx)
        .select(
            *[c for c in df.columns],
            F.concat_ws(" ", *parts).alias("shingle"),
        )
    )


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quality signals: token count, character count, mean
    token length, punctuation/digit counts, stopword ratio."""
    t = F.col(text_col)
    n_tok = token_count(t)
    # one alternation scan instead of one pass per stopword
    stop_pat = r"\b(" + "|".join(LANG_MARKERS["en"]) + r")\b"
    stop_hits = F.regexp_count(t, F.lit(stop_pat)).cast("long")
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.length(t).cast("long").alias("n_chars"),
        F.regexp_count(t, F.lit(r"[.,;:!?]")).cast("long").alias("n_punct"),
        F.regexp_count(t, F.lit(r"[0-9]")).cast("long").alias("n_digits"),
        stop_hits.alias("n_stopwords"),
    )


# html_to_text's ordered entity-decode chain — ONE source of truth so
# the DuckDB oracle replays (tests + the warc gate) generate the same
# replace chain instead of hand-mirroring it.  Ampersand-producing
# entities MUST stay last (see html_to_text step 4).
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "), ("&#160;", " "),
    ("&lt;", "<"), ("&#60;", "<"),
    ("&gt;", ">"), ("&#62;", ">"),
    ("&quot;", '"'), ("&#34;", '"'),
    ("&#39;", "'"), ("&apos;", "'"),
    ("&#8216;", "‘"), ("&#8217;", "’"),
    ("&#8220;", "“"), ("&#8221;", "”"),
    ("&#8211;", "–"), ("&#8212;", "—"),
    ("&#8230;", "…"),
    ("&#38;", "&"), ("&amp;", "&"),
)

# the regexp stages around the entity chain, same single-source idea:
# PRE strips blocks/tags (before entities), POST shapes whitespace
# (after).  '\n' replacements are emitted as chr(10) in the SQL twin.
HTML_PRE_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"(?is)<script\b.*?</script\s*>", " "),
    (r"(?is)<style\b.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?i)</?(p|br|div|li|tr|h[1-6]|table|ul|ol|blockquote)\b[^>]*>", "\n"),
    (r"(?s)<[^>]*>", " "),
)
HTML_POST_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[^\S\n]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
    (r"^\s+|\s+$", ""),
)


def html_to_text_duckdb_sql(col: str) -> str:
    """DuckDB expression replaying :func:`html_to_text` byte-for-byte
    on the SQL expression ``col`` — GENERATED from the same
    pattern/entity tables the operator consumes, so the oracle replay
    (tests + the warc_ingest gate) can never drift from the
    implementation by hand-mirroring."""

    def _sqlstr(s: str) -> str:
        if s == "\n":
            return "chr(10)"
        if s == "'":
            return "chr(39)"
        return "'" + s.replace("'", "''") + "'"

    expr = col
    # patterns and entity keys interpolate through the same quoting
    # helper as replacements — a future table entry containing a
    # single quote must not generate broken (or silently wrong) SQL
    # (ADVICE r9)
    for pat, rep in HTML_PRE_PATTERNS:
        expr = f"regexp_replace({expr}, {_sqlstr(pat)}, {_sqlstr(rep)}, 'g')"
    for ent, rep in HTML_ENTITIES:
        expr = f"replace({expr}, {_sqlstr(ent)}, {_sqlstr(rep)})"
    for pat, rep in HTML_POST_PATTERNS:
        expr = f"regexp_replace({expr}, {_sqlstr(pat)}, {_sqlstr(rep)}, 'g')"
    return expr


def html_to_text(html: Column) -> Column:
    """HTML -> visible text, the WET-generation step downstream of the
    WARC source (ops/warc.py) — heuristic regex extraction in the
    Common-Crawl-WET spirit, NOT a DOM parse (malformed crawl HTML
    defeats strict parsers; regex stripping is the battle-tested
    baseline).  Pure JVM regexp chain (one codegen span, zero Python),
    every pattern in the Java∩RE2 subset so DuckDB replays it:

    1. drop <script>/<style>/<!-- --> blocks wholesale ((?s) dotall,
       non-greedy, case-insensitive tags),
    2. turn block-level closers/openers (</p>, <br>, </div>, </li>,
       </h1>..) into newlines so words from adjacent blocks don't fuse,
    3. strip every remaining tag,
    4. decode the five predefined XML entities plus the COMMON decimal
       numeric references — &#160; (nbsp), &#34;/&#39;/&#60;/&#62;/
       &#38; (the predefined five by number), and the typographic set
       &#8216;/&#8217;/&#8220;/&#8221;/&#8211;/&#8212;/&#8230; — as an
       ordered literal-replace chain (ampersand-PRODUCING entities
       decode last so escaped text like '&amp;lt;' stays escaped);
       other numeric/hex references pass through verbatim (a general
       chr(NN) decode can't be a pure-JVM column expression, and the
       long tail is rare in crawl text),
    5. collapse HORIZONTAL whitespace runs to one space but PRESERVE
       the newline structure step 2 created (collapsing blank-line
       runs to one newline) — downstream LINE-based operators
       (c4_clean's line rules, paragraph/line dedup, bullet/ellipsis
       line fractions) need those boundaries; a flat single-line
       output would silently disable every one of them."""
    t = html
    for pat, rep in HTML_PRE_PATTERNS:
        t = F.regexp_replace(t, pat, rep)
    # &amp; decodes LAST: '&amp;lt;' is the ESCAPED text '&lt;', not
    # '<' — decoding ampersands first would double-decode it
    for ent, rep in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    for pat, rep in HTML_POST_PATTERNS:
        t = F.regexp_replace(t, pat, rep)
    return t


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition-based quality signals (the Gopher-style filters that
    catch boilerplate and degenerate generations):

    - ``dup_line_frac``: fraction of lines that are duplicates of an
      earlier line (1 - distinct/total), computed per row with
      higher-order functions — no explode, map-only;
    - ``dup_line_char_frac``: fraction of characters in duplicate
      OCCURRENCES of a line — occurrences beyond the first, the
      Gopher-style definition, so both line signals agree that the
      first occurrence is not a duplicate (catches few-but-huge
      repeated blocks);
    - ``top_bigram_frac``: fraction of word-bigram occurrences taken
      by the single most frequent bigram (explode + two combinable
      groupBys; degenerate repetition pushes this toward 1).

    Documents with no lines / fewer than 2 tokens get 0.0 for the
    respective signals (nothing repeats in an empty set)."""
    lines = F.filter(
        F.split(F.col(text_col), r"\n"), lambda x: F.length(F.trim(x)) > 0
    )
    n_lines = F.size(lines)
    n_dist = F.size(F.array_distinct(lines))
    dup_line_frac = F.when(
        n_lines > 0, (n_lines - n_dist) / n_lines
    ).otherwise(F.lit(0.0))
    total_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    # chars in duplicate OCCURRENCES (beyond-the-first), via sort
    # adjacency (O(L log L) per row, not the O(L^2) count-each-line
    # form): after array_sort, position i is a beyond-first occurrence
    # iff it equals its LEFT sorted neighbor
    srt = F.array_sort(lines)
    # the sequence guard keeps F.sequence ascending (sequence(2, 0)
    # would DESCEND through index 0 and raise — the short-input trap
    # the minhash fold also guards against)
    dup_chars = F.when(
        n_lines >= 2,
        F.aggregate(
            F.sequence(F.lit(2), n_lines),
            F.lit(0).cast("long"),
            lambda a, i: a
            + F.when(
                F.element_at(srt, i) == F.element_at(srt, i - 1),
                F.length(F.element_at(srt, i)).cast("long"),
            ).otherwise(F.lit(0)),
        ),
    ).otherwise(F.lit(0).cast("long"))
    dup_char_frac = F.when(
        total_chars > 0, dup_chars / total_chars
    ).otherwise(F.lit(0.0))
    # token-level concentration signals (round 10 — the natural-margin
    # rehearsal measured that in-VOCABULARY keyword stuffing is
    # invisible to both order statistics and linear tf models; what
    # separates it is CONCENTRATION, a quadratic statistic):
    # - dup_token_frac: 1 - distinct/total tokens (the token twin of
    #   dup_line_frac — degenerate text reuses its own tokens)
    # - max_token_run: longest run of consecutive IDENTICAL tokens;
    #   natural text essentially never runs 4+, run-stuffed spam and
    #   degenerate generations do.  One aggregate HOF, map-only.
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    n_toks = F.size(toks)
    dup_token_frac = F.when(
        n_toks > 0, (n_toks - F.size(F.array_distinct(toks))) / n_toks
    ).otherwise(F.lit(0.0))
    run_state = F.aggregate(
        toks,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    base = df.select(
        F.col(id_col),
        dup_line_frac.alias("dup_line_frac"),
        dup_char_frac.alias("dup_line_char_frac"),
        dup_token_frac.alias("dup_token_frac"),
        # NULL-text guard like every sibling signal: aggregate() over a
        # NULL array is NULL, which would make `max_token_run < 4`
        # silently drop NULL-text docs instead of treating them run-free
        F.when(n_toks > 0, run_state)
        .otherwise(F.lit(0).cast("long"))
        .alias("max_token_run"),
    )
    # top-bigram fraction: explode + combinable groupBys (the per-doc
    # vocabulary is unbounded, so this one is not a pure row expression)
    sh = word_shingles(df.select(id_col, text_col), text_col, 2)
    big = (
        sh.groupBy(id_col, "shingle")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            (F.max("c") / F.sum("c")).alias("top_bigram_frac"),
        )
    )
    return base.join(big, id_col, "left").select(
        id_col,
        "dup_line_frac",
        "dup_line_char_frac",
        "dup_token_frac",
        "max_token_run",
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
    )


# Gopher rule-pack (Rae et al. 2021, Appendix A) — the published
# stop-word presence list ("must contain >= 2 of ...")
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    counts: bool = False,
) -> DataFrame:
    """Per-document signals for the Gopher quality rules (Rae et al.
    2021, Appendix A — public heuristics), every one a pure JVM row
    expression (map-only, zero Python, one codegen span):

    - ``n_words``: whitespace word count,
    - ``mean_word_len``: mean characters per word (0.0 for empty docs),
    - ``symbol_word_ratio``: (# of '#' plus '...'/unicode-ellipsis
      occurrences) per word,
    - ``bullet_line_frac`` / ``ellipsis_line_frac``: fraction of
      non-blank lines starting with a bullet (-, *, or the unicode
      bullet) / ending with an ellipsis,
    - ``alpha_word_frac``: fraction of words containing at least one
      [a-zA-Z] character,
    - ``n_stop_hits``: how many DISTINCT Gopher stop words appear
      (array_intersect against the published 8-word list).

    ``counts=True`` (round 8) returns the raw INTEGER numerators
    instead of ratios — (n_words, total_chars, n_symbols, n_lines,
    n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stop_hits).
    Integers are engine-exact (the oracle convention) AND combinable:
    corpus-level Gopher statistics aggregate from these where the
    per-doc ratios can't (a mean of ratios is not the corpus ratio)."""
    t = F.col(text_col)
    words = F.filter(
        F.split(F.trim(F.regexp_replace(t, r"\s+", " ")), " "),
        lambda w: w != "",
    )
    n_words = F.size(words)
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    mean_len = F.when(n_words > 0, total_chars / n_words).otherwise(F.lit(0.0))
    symbols = (
        F.regexp_count(t, F.lit(r"#")) + F.regexp_count(t, F.lit(r"\.\.\.|…"))
    ).cast("long")
    sym_ratio = F.when(n_words > 0, symbols / n_words).otherwise(F.lit(0.0))
    lines = F.filter(
        F.split(t, r"\n"), lambda x: F.length(F.trim(x)) > 0
    )
    n_lines = F.size(lines)
    bullets = F.size(
        F.filter(
            lines, lambda x: F.trim(x).rlike(r"^[\-\*•‣▪]")
        )
    )
    ellipses = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike(r"(\.\.\.|…)$"))
    )
    bullet_frac = F.when(n_lines > 0, bullets / n_lines).otherwise(F.lit(0.0))
    ell_frac = F.when(n_lines > 0, ellipses / n_lines).otherwise(F.lit(0.0))
    alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    alpha_frac = F.when(n_words > 0, alpha / n_words).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.transform(words, F.lower),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    ).cast("long")
    if counts:
        return df.select(
            F.col(id_col),
            n_words.cast("long").alias("n_words"),
            total_chars.cast("long").alias("total_chars"),
            symbols.alias("n_symbols"),
            n_lines.cast("long").alias("n_lines"),
            bullets.cast("long").alias("n_bullet_lines"),
            ellipses.cast("long").alias("n_ellipsis_lines"),
            alpha.cast("long").alias("n_alpha_words"),
            stop_hits.alias("n_stop_hits"),
        )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_len.cast("double").alias("mean_word_len"),
        sym_ratio.cast("double").alias("symbol_word_ratio"),
        bullet_frac.cast("double").alias("bullet_line_frac"),
        ell_frac.cast("double").alias("ellipsis_line_frac"),
        alpha_frac.cast("double").alias("alpha_word_frac"),
        stop_hits.alias("n_stop_hits"),
    )


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.1,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Keep documents passing ALL Gopher rules (defaults are the
    paper's published thresholds: 50-100k words, mean word length
    3-10, symbol ratio <= 0.1, <= 10% bullet lines, <= 30% ellipsis
    lines, >= 80% alphabetic words, >= 2 of the stop-word list).
    One semi-join against the map-only feature scan; thresholds are
    corpus policy — override per corpus."""
    g = gopher_features(df, text_col, id_col)
    keep = g.filter(
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("n_stop_hits") >= min_stop_hits)
    ).select(id_col)
    return df.join(keep, id_col, "semi")


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4-style cleanup (Raffel et al. 2020 — public heuristics), all
    JVM higher-order/regex expressions:

    LINE filter: keep lines that end in terminal punctuation (. ! ? ")
    AND have at least ``min_words_per_line`` words AND do not mention
    javascript (case-insensitive) — the classic boilerplate cut.
    DOCUMENT filter: after the line cut, drop the whole doc if it has
    fewer than ``min_sentences`` sentences, contains a curly brace
    (code), or the phrase 'lorem ipsum'.

    Returns (id_col, text) with the rewritten text — a text REWRITE
    like redact_pii/substring_dedup, so it composes at any funnel
    position.  Cost: one map-only pass."""
    t = F.col(text_col)
    lines = F.split(t, r"\n")
    kept = F.filter(
        lines,
        lambda x: F.trim(x).rlike(r'[.!?"]$')
        & (F.size(F.filter(F.split(F.trim(x), r"\s+"), lambda w: w != ""))
           >= min_words_per_line)
        & ~F.lower(x).contains("javascript"),
    )
    new_text = F.array_join(kept, "\n")
    sentences = F.regexp_count(F.col("__c4"), F.lit(r"[.!?]"))
    return (
        df.withColumn("__c4", new_text)
        .filter(
            (sentences >= min_sentences)
            & ~F.col("__c4").contains("{")
            & ~F.lower("__c4").contains("lorem ipsum")
        )
        .select(F.col(id_col), F.col("__c4").alias(text_col))
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    strip_control: bool = True,
    collapse_whitespace: bool = True,
) -> DataFrame:
    """Unicode normalization + control/whitespace cleanup — the crawl
    canonicalization step that precedes hashing (two byte-different
    encodings of 'café' must dedup together):

    1. unicodedata.normalize(``form``) — UAX#15; this is the ONE
       Python step (Spark's JVM has no exposed ICU normalizer), run as
       an Arrow-batched pandas_udf, and the DuckDB oracle replays it
       with ``nfc_normalize`` (both implement the same public
       algorithm, so hashes agree byte-for-byte);
    2. strip C0/DEL control characters (JVM regexp) — BEFORE the
       whitespace collapse on purpose: \\x0B/\\x0C are 'whitespace' to
       Java regex but not to RE2, so removing them first keeps the
       collapse engine-agnostic;
    3. collapse runs of whitespace to single spaces + trim (JVM).

    Returns df with ``text_col`` replaced, other columns untouched.
    Cost: one map-only pass; the Python step is Arrow-batched and
    string-in/string-out (no pickling, no per-row calls)."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    from pyspark.sql.functions import pandas_udf

    # no type hints on purpose: the module-wide `from __future__ import
    # annotations` turns them into strings that pyspark's hint
    # inspection can't resolve against function-local imports; hintless
    # pandas_udf defaults to the scalar (Series -> Series) contract
    @pandas_udf("string")
    def _norm(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    out = F.col(text_col)
    out = _norm(out)
    if strip_control:
        out = F.regexp_replace(out, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return df.withColumn(text_col, out)


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    """Per-language marker hits — a single alternation regexp scan per
    language (not per word)."""
    out = []
    for lang, words in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        out.append((lang, F.regexp_count(text, F.lit(pat))))
    return out


def language_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model=None,
) -> DataFrame:
    """Language ID, two forms behind one signature (same output
    schema (doc_id, lang_pred), so the funnel's language stage
    upgrades by passing a model):

    - ``model=None`` (default): stopword-marker heuristic — argmax of
      per-language hit counts, deterministic tie-break by language
      code order, 'und' when no marker hits at all.  This is the GATE
      form (the oracle generates its CASE chain from LANG_MARKERS);
      keep it deterministic and small.
    - ``model=LangIDModel``: the production path — trained multinomial
      classifier over hashed char n-grams (ops/langid.py), 20+
      languages, accuracy-pinned where the marker form measurably
      errs (tests/test_langid.py)."""
    if model is not None:
        from knovexlite_spark.ops.langid import language_id_model

        return language_id_model(df, model, text_col, id_col)
    t = F.col(text_col)
    scores = lang_scores(t)
    # argmax by (hits, -position): ties resolve to the EARLIEST language
    # in LANG_MARKERS order
    pairs = F.array(
        *[
            F.struct(
                hits.cast("long").alias("hits"),
                F.lit(-i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for i, (lang, hits) in enumerate(scores)
        ]
    )
    best = F.array_max(pairs)
    total = sum((hits for _, hits in scores), F.lit(0))
    return df.select(
        F.col(id_col),
        F.when(total == 0, F.lit("und")).otherwise(best["lang"]).alias("lang_pred"),
    )


# PII patterns restricted to the regex subset Java (Spark) and RE2
# (DuckDB) treat identically: character classes, bounded repetition,
# \d, \b, non-capturing groups — no lookarounds, no backrefs.  Order
# matters for redaction: email first (its local part may contain
# digits a later pattern would mangle), then the digit-shaped kinds
# from most to least specific (ssn before phone: a redacted phone
# would otherwise swallow the ssn's digit groups).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    # \b only guards digit-initial branches: before "(" or "+" there is
    # no word character on either side, so a leading \b would never
    # match those forms
    ("phone", r"(?:\+[0-9]{1,3}[ .-]?)?(?:\([0-9]{3}\)[ .-]?|\b[0-9]{3}[ .-])[0-9]{3}[ .-][0-9]{4}\b"),
]


def pii_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII hit counts (emails, SSNs, IPv4s, NA-style phone
    numbers) — the detection half of the scrub-before-training step
    every curation pipeline runs.  One JVM regexp scan per kind, no
    UDFs; the patterns are deliberately in the Java∩RE2 subset so an
    external engine can replay the counts (the gate oracle does)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        *[
            F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{kind}")
            for kind, pat in PII_PATTERNS
        ],
    )


def redact_pii(text: Column) -> Column:
    """Replace every PII span with its [KIND] token, applying the
    patterns in PII_PATTERNS order (see ordering note there).  A pure
    chained regexp_replace — map-only, codegen'd, linear; at 100 TB
    this is a scan, not a shuffle."""
    out = text
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


# URL pattern in the Java∩RE2 subset (no lookarounds): scheme, host,
# optional port/path — path chars stop at whitespace and closing
# punctuation that usually delimits URLs in prose
URL_RE = r"https?://(?:[^\s/@]+@)?[A-Za-z0-9.-]+(?::[0-9]+)?(?:/[^\s)\]>'\"]*)?"


def extract_urls(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per (doc, url) occurrence — JVM regexp_extract_all +
    explode, map-only.  The building block for domain-level curation
    (per-domain caps, blocklists, domain mixing)."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), F.lit(0))
        ).alias("url"),
    )


def url_domain(url: F.Column) -> F.Column:
    """Registrable host of a URL: strip scheme, creds, port, path;
    lowercase.  Pure column expressions (one regexp_extract)."""
    return F.lower(
        F.regexp_extract(url, r"https?://(?:[^/@\s]+@)?([A-Za-z0-9.-]+)", 1)
    )


def domain_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain corpus statistics: (domain, n_urls, n_docs) — the
    aggregation behind per-domain caps and blocklist audits.  One
    extract/explode plus one combinable groupBy; at 100 TB the output
    is domain-count-sized (millions), never corpus-sized."""
    urls = extract_urls(df, text_col, id_col).select(
        id_col, url_domain(F.col("url")).alias("domain")
    )
    return urls.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.count_distinct(id_col).cast("long").alias("n_docs"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split documents into token-window chunks (the context-window
    chunking step before embedding/packing): chunk k covers tokens
    [1 + k*stride, ... + chunk_tokens) with stride = chunk_tokens -
    overlap.  Output: (id, chunk_idx, chunk TEXT, n_chunk_tokens) —
    one row per chunk, chunk text = the token slice re-joined with
    single spaces (tokenizer-normalized, same contract as shingles).

    Pure JVM column expressions: tokens -> explode(sequence of chunk
    starts) -> slice + array_join — map-only, no UDF, linear in output
    tokens.  Docs shorter than one chunk yield exactly one chunk (the
    whole doc); empty/whitespace docs yield none.  The FINAL chunk may
    be shorter than chunk_tokens (no padding — padding is the packing
    stage's job, ops/sample.py)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    with_toks = df.select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__n")
    ).filter((F.col("__n") > 0) & (F.element_at("__toks", 1) != ""))
    # starts: 1, 1+stride, ... while start <= max(1, n - overlap) —
    # the upper bound guarantees full coverage (the last start is
    # > n - chunk_tokens) while never emitting a tail chunk fully
    # contained in its predecessor; the greatest() keeps sequence()
    # ascending for docs shorter than the overlap
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.lit(1), F.col("__n") - F.lit(overlap)),
        F.lit(stride),
    )
    return (
        with_toks.select(
            F.col(id_col),
            F.posexplode(starts).alias("chunk_idx", "__start"),
            F.col("__toks"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.array_join(
                F.slice("__toks", F.col("__start"), F.lit(chunk_tokens)), " "
            ).alias("chunk"),
            F.least(
                F.lit(chunk_tokens),
                F.size("__toks") - F.col("__start") + 1,
            )
            .cast("long")
            .alias("n_chunk_tokens"),
        )
    )


def rolling_hash(
    text: Column, base: int = 257, mod: int = 1_000_000_007
) -> Column:
    """Polynomial rolling hash over the document's characters (the
    brief's 'document fingerprinting (rolling hash)'): h = fold(chars,
    (h*base + codepoint) mod mod).  A pure JVM higher-order expression
    (transform + aggregate) — no UDF — and mod < 2^30 keeps every
    intermediate inside a long.  Portable: DuckDB replays it with
    list_reduce over ord(); both engines produce identical values
    including the empty-string 0."""
    chars = F.transform(F.split(text, ""), lambda ch: F.ascii(ch).cast("long"))
    h = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(base) + c) % F.lit(mod),
    )
    return F.when(F.length(text) == 0, F.lit(0).cast("long")).otherwise(h)


def min_shingle_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Document fingerprint: lexicographic min/max of md5(shingle) — a
    deterministic 2-anchor rolling fingerprint (winnowing's cheap
    cousin), one groupBy, portable to any engine with md5."""
    sh = word_shingles(df.select(id_col, text_col), text_col, n)
    return sh.groupBy(id_col).agg(
        F.min(F.md5(F.col("shingle"))).alias("fp_min"),
        F.max(F.md5(F.col("shingle"))).alias("fp_max"),
    )


def url_blocklist_filter(
    df: DataFrame,
    blocked: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str | None = None,
) -> DataFrame:
    """Drop documents whose domain — or ANY parent domain — appears in
    ``blocked`` (a one-column DataFrame of lowercase domains): the
    standard crawl-curation blocklist with SUFFIX semantics, by LABEL
    ('example.com' blocks 'sub.example.com' but never the unrelated
    'notexample.com' — string-suffix matching gets that wrong).

    A document's domain is the registrable host of its first URL
    (``url_domain`` on the first URL_RE match) or ``domain_col`` when
    the corpus carries one.  Documents with no domain pass through
    (nothing to match).

    Plan: the doc side explodes each domain into its dot-suffixes
    (bounded by label count, <= ~10 rows/doc — never corpus x list),
    equi-joins the blocklist (broadcast when small, shuffled when a
    multi-million-entry list outgrows that — Spark picks by stats),
    and the hit ids anti-join back.  All JVM expressions."""
    if domain_col is not None:
        src = df.select(F.col(id_col), F.lower(F.col(domain_col)).alias("__dom"))
    else:
        src = df.select(
            F.col(id_col),
            url_domain(
                F.regexp_extract(F.col(text_col), URL_RE, 0)
            ).alias("__dom"),
        )
    labels = F.split(F.col("__dom"), r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(0), F.size(labels) - 1),
        lambda i: F.array_join(
            F.slice(labels, i + 1, F.size(labels) - i), "."
        ),
    )
    cand = (
        src.filter(F.col("__dom").isNotNull() & (F.col("__dom") != ""))
        .select(F.col(id_col), F.explode(suffixes).alias("__sfx"))
    )
    bl = blocked.select(
        F.lower(F.col(blocked.columns[0])).alias("__sfx")
    ).distinct()
    hits = cand.join(bl, "__sfx").select(id_col).distinct()
    return df.join(hits, id_col, "left_anti")


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_model=None,
) -> dict:
    """One-call corpus health summary — the first thing an operator
    runs on a new corpus before deciding the curation recipe:

    - ``n_docs``, ``n_null_text``,
    - token/char totals and the token-count quantiles (p5/p50/p95),
    - ``exact_dup_frac``: fraction of docs whose content hash is not
      its group's canonical (what doc-level dedup would remove),
    - ``lang_mix``: doc share per predicted language — the marker
      heuristic by default; pass ``lang_model`` (a trained
      ops/langid.LangIDModel) and the mix comes from the trained
      scorer instead (same one-broadcast-join + one-groupBy stage
      shape, 50-language coverage),
    - ``gopher_pass_frac``: share passing the default Gopher rules.

    Cost: one pass per signal family (5 jobs — totals agg, quantile
    sketch, dedup groupBy, language groupBy, gopher count), every
    aggregation combinable; the RESULT is scalars, so driver transfer
    is O(languages).  This is a reporting convenience over public
    operators, not a new primitive."""
    t = F.col(text_col)
    nn = df.filter(t.isNotNull())
    stats = df.agg(
        F.count("*").alias("n_docs"),
        F.sum(t.isNull().cast("long")).alias("n_null"),
        F.sum(F.coalesce(token_count(t), F.lit(0))).alias("tokens"),
        F.sum(F.coalesce(F.length(t).cast("long"), F.lit(0))).alias("chars"),
    ).first()
    qs = nn.select(token_count(t).alias("ntok")).stat.approxQuantile(
        "ntok", [0.05, 0.5, 0.95], 0.01
    )
    n_docs = int(stats["n_docs"])
    dup = nn.select(F.md5(t).alias("h")).groupBy("h").count()
    n_dupes = int(
        dup.agg(F.sum(F.col("count") - 1)).first()[0] or 0
    )
    lang = {
        r["lang_pred"]: int(r["count"])
        for r in language_id(nn, text_col, id_col, model=lang_model)
        .groupBy("lang_pred")
        .count()
        .collect()
    }
    n_pass = gopher_filter(nn, text_col, id_col).count()
    n_text = n_docs - int(stats["n_null"])
    return {
        "n_docs": n_docs,
        "n_null_text": int(stats["n_null"]),
        "total_tokens": int(stats["tokens"] or 0),
        "total_chars": int(stats["chars"] or 0),
        "token_quantiles_p5_p50_p95": [int(q) for q in qs] if qs else [],
        "exact_dup_frac": round(n_dupes / n_text, 4) if n_text else 0.0,
        "lang_mix": {
            k: round(v / n_text, 4) for k, v in sorted(lang.items())
        } if n_text else {},
        "gopher_pass_frac": round(n_pass / n_text, 4) if n_text else 0.0,
    }
