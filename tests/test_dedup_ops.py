"""Dedup operators on constructed corpora with known duplicates."""

import numpy as np
import pytest

from knovexlite_spark.ops.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_duplicates,
)

BASE = "spark filter join group window sort merge hash scan shuffle broadcast agg"
NEAR = BASE.replace("shuffle", "exchange")  # one token differs
OTHER = "completely different words entirely unrelated to anything else at all here"

DOCS = [(0, BASE), (1, BASE), (2, NEAR), (3, OTHER)]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(spark):
    rows = {r["canonical_id"]: r["n_docs"] for r in exact_duplicates(_df(spark)).collect()}
    assert rows[0] == 2  # docs 0,1 identical
    assert rows[2] == 1 and rows[3] == 1


def test_ngram_jaccard_exact_values(spark):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_df(spark), threshold=0.0).collect()
    }
    assert np.isclose(pairs[(0, 1)], 1.0)
    # hand value: 12 tokens -> 10 shingles each; one token change kills
    # shingles overlapping position of 'shuffle' (3 shingles) -> inter=7
    a = {" ".join(BASE.split()[i : i + 3]) for i in range(10)}
    b = {" ".join(NEAR.split()[i : i + 3]) for i in range(10)}
    expect = len(a & b) / len(a | b)
    assert np.isclose(pairs[(0, 2)], expect)
    assert (0, 3) not in pairs or pairs[(0, 3)] == 0.0


def test_minhash_pipeline_finds_near_dups(spark):
    found = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_near_duplicates(_df(spark), threshold=0.5).collect()
    }
    assert (0, 1) in found
    assert all(3 not in pair for pair in found)


def test_minhash_signature_is_content_keyed(spark):
    sigs = {r["doc"]: [r[f"mh{k}"] for k in range(8)] for r in minhash_signatures(_df(spark)).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[3]
    # identical docs collide in every band; disjoint docs in none
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(minhash_signatures(_df(spark))).collect()
    }
    assert (0, 1) in cands


def test_simhash(spark):
    fps = {r["doc"]: r["simhash"] for r in simhash_fingerprints(_df(spark)).collect()}
    assert fps[0] == fps[1]
    assert fps[0] != fps[3]
    near = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_duplicates(_df(spark), max_hamming=10).collect()
    }
    assert near[(0, 1)] == 0
    assert (0, 3) not in near


def test_minhash_restrict_verify_is_output_invariant(spark):
    """The candidate-doc verify restriction (semi-join the corpus to
    docs in >= 1 candidate pair before shingling) must not change the
    output: jaccard is only evaluated on candidate pairs, all of whose
    docs survive the restriction by construction.  Checked on the edge
    corpus and the real documents table."""
    from knovexlite_spark.engine import Engine
    from tests.conftest import SF_SMALL

    docs = Engine.for_dir(spark, SF_SMALL).table("documents").select("doc_id", "text")
    for df in (_df(spark), docs):
        on = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in minhash_near_duplicates(
                df, threshold=0.5, restrict_verify=True
            ).collect()
        )
        off = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in minhash_near_duplicates(
                df, threshold=0.5, restrict_verify=False
            ).collect()
        )
        assert on == off


def test_minhash_xxhash64_family_sound_and_recalls_near_identical(spark):
    """The production (xxhash64) hash family: every reported pair is a
    true near-dup (verification is exact, so soundness is structural),
    and the near-identical pair is recalled.  Borderline pairs may
    differ from the md5 family — candidate probability at jaccard ~0.5
    with 4 bands is < 1 and family-dependent by design."""
    from knovexlite_spark.ops.dedup import ngram_jaccard_pairs

    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(_df(spark), threshold=0.5).collect()
    }
    xx_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_near_duplicates(
            _df(spark), threshold=0.5, family="xxhash64"
        ).collect()
    }
    assert xx_pairs <= exact
    assert (0, 1) in xx_pairs


def test_drop_frequent_shingles_collapses_boilerplate_hot_buckets(spark):
    """Corpus-wide boilerplate shingles pin signature mins and make
    EVERY doc pair an LSH candidate (the hot-bucket blow-up); dropping
    shingles above a document-frequency threshold collapses the
    candidate set to the true near-dups without losing them."""
    from knovexlite_spark.ops.dedup import (
        drop_frequent_shingles,
        minhash_lsh_candidates,
        shingle_sets,
    )

    boiler = "this site uses cookies accept terms and conditions apply now"
    uniq = [
        f"document {i} talks about entirely distinct topic number {i} alone"
        for i in range(12)
    ]
    rows = [(i, f"{boiler} {u}") for i, u in enumerate(uniq)]
    rows.append((100, rows[0][1]))  # one true duplicate of doc 0
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sh = shingle_sets(df, "text", "doc_id", 3)
    hot_cands = minhash_lsh_candidates(minhash_signatures(df)).count()
    cold_sh = drop_frequent_shingles(sh, 3)
    cold_sigs = minhash_signatures(df, shingles=cold_sh)
    cold_cands = minhash_lsh_candidates(cold_sigs).count()
    # boilerplate made (nearly) everyone collide; the filter collapses it
    assert hot_cands > 10 * cold_cands

    # end-to-end: true duplicate recalled, candidates stay collapsed,
    # and the float-fraction threshold form agrees with the count form
    for max_df in (3, 0.25):
        out = minhash_near_duplicates(
            df, threshold=0.8, max_shingle_df=max_df
        ).collect()
        assert {(r["doc_a"], r["doc_b"]) for r in out} == {(0, 100)}

    # structural: the hot list is broadcast (anti-join stays map-only)
    plan = (
        drop_frequent_shingles(sh, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # LeftAnti against the hot list


def test_minhash_hof_signatures_equal_grouped_form(spark):
    """The shuffle-free higher-order-fold signature path must produce
    EXACTLY the rows of the explode+groupBy form — same hash family,
    same doc filter (< n tokens dropped), both families — including
    tokenizer edge cases."""
    from knovexlite_spark.engine import Engine
    from knovexlite_spark.ops.dedup import minhash_signatures_hof
    from tests.conftest import SF_SMALL

    edge = spark.createDataFrame(
        [
            (1, "plain words here and more tokens beyond three"),
            (2, "tab\tseparated\tand trailing\t"),
            (3, "  leading and trailing  "),
            (4, ""),
            (5, "   "),
            (6, "one two"),  # < 3 tokens: dropped by both forms
            (7, "dup dup dup dup"),  # duplicate shingles
        ],
        "doc_id long, text string",
    )
    docs = Engine.for_dir(spark, SF_SMALL).table("documents").select("doc_id", "text")
    for df in (edge, _df(spark), docs):
        for family in ("md5", "xxhash64"):
            grouped = sorted(
                tuple(r) for r in minhash_signatures(df, family=family).collect()
            )
            hof = sorted(
                tuple(r) for r in minhash_signatures_hof(df, family=family).collect()
            )
            assert hof == grouped, family


def test_minhash_hof_signatures_plan_has_no_exchange(spark):
    """The point of the HOF form: signature computation is map-only.
    Zero Exchange nodes anywhere in the physical plan."""
    from knovexlite_spark.ops.dedup import minhash_signatures_hof

    plan = (
        minhash_signatures_hof(_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    # and the fold is evaluated once, not once per signature column
    assert plan.count("aggregate(") <= 1


def test_decontaminate_finds_planted_eval_leakage(spark):
    """Training docs containing verbatim eval n-grams are flagged with
    the exact distinct-shared-n-gram count; clean docs are not, and
    repeated occurrences of the same n-gram count once."""
    from knovexlite_spark.ops.dedup import decontaminate

    eval_q = "what is the capital of france and when was it founded exactly"
    evalset = spark.createDataFrame(
        [(0, eval_q), (1, "name every planet in order from the sun outward please")],
        "doc_id long, text string",
    )
    filler = " ".join(f"w{i}" for i in range(30))
    train = spark.createDataFrame(
        [
            (10, f"{filler} {eval_q} {filler}"),  # full leak
            (11, f"{filler} {eval_q} {eval_q}"),  # repeated leak
            (12, f"what is the capital of france and other questions {filler}"),
            (13, f"{filler} entirely clean content here {filler}"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["eval_id"]): r["hits"]
        for r in decontaminate(train, evalset, n=8).collect()
    }
    # eval_q has 12 tokens -> 5 distinct 8-gram shingles
    assert got[(10, 0)] == 5
    assert got[(11, 0)] == 5  # repeats count once
    # doc 12 shares only a 7-word prefix: no 8-gram hit
    assert (12, 0) not in got and (13, 0) not in got
    assert all(eid == 0 for (_, eid) in got)

    # plan: eval side broadcast, training side map-only (no shuffle
    # before the output-sized hit aggregation)
    plan = (
        decontaminate(train, evalset, n=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_overlap_fraction_mode(spark):
    """Round 8 — fuzzy decontamination: min_overlap_frac requires the
    shared n-grams to cover a fraction of the EVAL doc's distinct
    n-grams (the GPT-3/PaLM criterion), so a single incidental phrase
    inside a long eval doc stops flagging while substantial overlap
    still does.  Fractions are exact rationals checked against hand
    counts."""
    from knovexlite_spark.ops.dedup import decontaminate

    eval_q = " ".join(f"e{i}" for i in range(12))  # 12 tokens: 5 8-grams
    evalset = spark.createDataFrame(
        [(0, eval_q)], "doc_id long, text string"
    )
    filler = " ".join(f"w{i}" for i in range(30))
    first8 = " ".join(f"e{i}" for i in range(8))  # exactly ONE 8-gram
    train = spark.createDataFrame(
        [
            (10, f"{filler} {eval_q} {filler}"),   # 5/5 overlap
            (11, f"{filler} {first8} {filler}"),   # 1/5 overlap
            (12, filler),                          # none
        ],
        "doc_id long, text string",
    )
    all_rows = {
        (r["doc_id"], r["eval_id"]): (r["hits"], r["overlap_frac"])
        for r in decontaminate(
            train, evalset, n=8, min_overlap_frac=0.0
        ).collect()
    }
    assert all_rows[(10, 0)] == (5, 1.0)
    assert all_rows[(11, 0)] == (1, 0.2)
    assert (12, 0) not in all_rows
    flagged = {
        r["doc_id"]
        for r in decontaminate(
            train, evalset, n=8, min_overlap_frac=0.5
        ).collect()
    }
    assert flagged == {10}  # the 20%-overlap doc no longer flags
    # default (no fraction) is unchanged: both docs flag on hits >= 1
    base = {
        r["doc_id"] for r in decontaminate(train, evalset, n=8).collect()
    }
    assert base == {10, 11}


def test_simhash_idf_weighting_defeats_boilerplate(spark):
    """Unweighted SimHash lets corpus-wide boilerplate dominate every
    fingerprint (distinct docs collide within the hamming radius); idf
    weighting zeroes tokens present in every doc and separates distinct
    content while keeping true duplicates at hamming 0."""
    from knovexlite_spark.ops.dedup import (
        simhash_fingerprints_idf,
        simhash_near_duplicates,
    )

    # SimHash hamming ~ 60 * theta / pi (cosine geometry): distinct
    # docs collide at hamming <= 3 only when shared token mass is
    # ~97%+, so the boilerplate must dominate — 200 boilerplate tokens
    # against ONE distinguishing token (everything deterministic: md5
    # hashing, no randomness)
    boiler = " ".join(
        ["this site uses cookies accept all terms conditions privacy "
         "policy navigation home about contact rights reserved help "
         "center language english welcome back sign in register"] * 8
    )
    rows = [(i, f"{boiler} topic{i}") for i in range(10)]
    rows.append((100, rows[0][1]))  # true duplicate of doc 0
    df = spark.createDataFrame(rows, "doc_id long, text string")

    plain = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_duplicates(df, max_hamming=3).collect()
    }
    idf = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_duplicates(
            df, max_hamming=3, fingerprints="idf"
        ).collect()
    }
    assert len(plain) > len(idf)  # boilerplate collisions collapse
    assert idf == {(0, 100)}  # the true duplicate survives, alone

    # identical docs get identical idf fingerprints (determinism incl.
    # the integer-weight aggregation)
    fps = {
        r["doc"]: r["simhash"]
        for r in simhash_fingerprints_idf(df).collect()
    }
    assert fps[0] == fps[100]


def test_simhash_kernel_equals_expression_form(spark):
    """The one-pass mapInPandas fingerprint must be bit-for-bit equal to
    the explode/expression form, including tokenizer edge cases (space
    trim only, ASCII \\s, trailing empties kept) and on real documents."""
    from knovexlite_spark.ops.dedup import simhash_fingerprints_kernel
    from tests.conftest import SF_SMALL
    from knovexlite_spark.engine import Engine

    edge = spark.createDataFrame(
        [
            (1, "plain words here"),
            (2, "tab\tseparated\tand trailing\t"),
            (3, "  leading and trailing  "),
            (4, ""),
            (5, "   "),
            (6, "nbsp is not ascii ws"),
            (7, "one"),
        ],
        "doc_id long, text string",
    )
    docs = Engine.for_dir(spark, SF_SMALL).table("documents").select("doc_id", "text")
    for df in (edge, docs):
        expr_fp = {r["doc"]: r["simhash"] for r in simhash_fingerprints(df).collect()}
        kern_fp = {
            r["doc"]: r["simhash"]
            for r in simhash_fingerprints_kernel(df).collect()
        }
        assert expr_fp == kern_fp

    # the near-dup pipeline accepts either form and agrees
    a = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_duplicates(docs, max_hamming=3).collect()
    )
    b = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_duplicates(docs, max_hamming=3, fingerprints="kernel").collect()
    )
    assert a == b


def test_minhash_shingle_mins_short_arrays_yield_null(spark):
    """ADVICE round 5: the public column helper must survive token
    arrays shorter than n (no descending-sequence bogus shingle, no
    element_at index-0 error) — short docs get a NULL signature, never
    a shared sentinel that would band-collide them."""
    from pyspark.sql import functions as F

    from knovexlite_spark.ops.dedup import minhash_shingle_mins

    df = spark.createDataFrame(
        [(0, ["a"]), (1, ["a", "b"]), (2, []), (3, ["a", "b", "c", "d"])],
        "doc_id long, toks array<string>",
    )
    for family in ("md5", "xxhash64"):
        rows = {
            r["doc_id"]: r["sig"]
            for r in df.select(
                "doc_id",
                minhash_shingle_mins(F.col("toks"), n=3, family=family).alias(
                    "sig"
                ),
            ).collect()
        }
        assert rows[0] is None and rows[1] is None and rows[2] is None, family
        assert rows[3] is not None and len(rows[3]) == 8, family


def test_decontaminate_bucketed_form_matches_broadcast(spark):
    """Round-6 ask #4: decontaminate(broadcast=False) — the bucketed
    form for eval suites that rival the corpus — must produce the
    identical flagged-pair set via a shuffled hash join (eval side
    builds the per-partition map; no broadcast, and no sort of the
    corpus side)."""
    from knovexlite_spark.ops.dedup import decontaminate

    eval_q = "what is the capital of france and when was it founded exactly"
    evalset = spark.createDataFrame(
        [(0, eval_q), (1, "name every planet in order from the sun outward please")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (10, "intro text " + eval_q + " closing remarks"),
            (11, eval_q + " " + eval_q),
            (12, "what is the capital of france and when"),
            (13, "totally unrelated content with nothing shared at all here now"),
        ],
        "doc_id long, text string",
    )
    want = {
        (r["doc_id"], r["eval_id"]): r["hits"]
        for r in decontaminate(train, evalset, n=8).collect()
    }
    got = {
        (r["doc_id"], r["eval_id"]): r["hits"]
        for r in decontaminate(train, evalset, n=8, broadcast=False).collect()
    }
    assert got == want and got[(10, 0)] == 5

    plan = (
        decontaminate(train, evalset, n=8, broadcast=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" not in plan


def test_minhash_auto_restriction_is_output_invariant_and_data_driven(spark):
    """restrict_verify='auto' (round 6): the choice is made from the
    measured candidate-doc share, and NEVER changes the output —
    auto == forced-True == forced-False on the same corpus.  Plan
    evidence: high candidate share -> no semi-join restriction; low
    share -> the LeftSemi restriction appears."""
    from knovexlite_spark.ops.dedup import minhash_near_duplicates

    # high-share corpus: every doc duplicated (share 100%)
    dup = _df(spark)
    outs = []
    for rv in ("auto", True, False):
        outs.append(
            {
                (r["doc_a"], r["doc_b"])
                for r in minhash_near_duplicates(
                    dup, threshold=0.5, restrict_verify=rv
                ).collect()
            }
        )
    assert outs[0] == outs[1] == outs[2] and outs[0]

    def plan_of(df_corpus, rv):
        return (
            minhash_near_duplicates(df_corpus, threshold=0.5, restrict_verify=rv)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    assert "LeftSemi" not in plan_of(dup, "auto")  # 75%+ share: OFF

    # low-share corpus: 2 duplicated docs among 200 unique -> ~2% share
    uniq = [(100 + i, f"unique text number {i} with tokens {i*7} {i*13} {i*29} end") for i in range(200)]
    low = spark.createDataFrame(
        uniq + [(901, uniq[0][1].replace("end", "end")), ], "doc_id long, text string"
    ).unionByName(spark.createDataFrame([(902, uniq[1][1])], "doc_id long, text string"))
    assert "LeftSemi" in plan_of(low, "auto")  # ~2% share: ON

    with pytest.raises(ValueError, match="auto"):
        minhash_near_duplicates(dup, restrict_verify="maybe").collect()


# --------------------------------------- substring-level dedup (round 7)


def _py_substring_dedup(rows, L, min_count):
    """Pure-Python reference: tokenize, count L-token spans across the
    corpus, merge overlapping/adjacent hot windows into maximal
    segments, drop every covered token, rejoin with single spaces.
    Returns (clean_text, n_tokens, n_removed, n_spans) per doc —
    n_spans = the count of maximal merged segments."""
    toks = {i: t.split() for i, t in rows}
    from collections import Counter

    freq = Counter(
        " ".join(t[s : s + L])
        for t in toks.values()
        for s in range(len(t) - L + 1)
    )
    out = {}
    for i, t in toks.items():
        hot = [
            s
            for s in range(len(t) - L + 1)
            if freq[" ".join(t[s : s + L])] >= min_count
        ]
        segs = []
        for s in sorted(set(hot)):
            if segs and s <= segs[-1][1]:
                segs[-1][1] = s + L
            else:
                segs.append([s, s + L])
        kept = [
            tok
            for j, tok in enumerate(t)
            if not any(lo <= j < hi for lo, hi in segs)
        ]
        out[i] = (" ".join(kept), len(t), len(t) - len(kept), len(segs))
    return out


def test_substring_dedup_matches_python_reference(spark):
    from knovexlite_spark.ops.dedup import substring_dedup

    hdr = "all rights reserved contact the publisher for permission details"
    rows = [
        (
            i,
            (hdr + f" body {i} has its own unique tail {i * 7}")
            if i % 3 == 0
            else f"document {i} plain content without any shared spans {i * 13}",
        )
        for i in range(24)
    ]
    # plus one doc shorter than the span window and one fully duplicated pair
    rows += [(100, "too short"), (101, "dup " * 12), (102, "dup " * 12)]
    rows = [(i, t.strip()) for i, t in rows]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = _py_substring_dedup(rows, L=8, min_count=2)
    for key in ("hash", "string"):
        got = {
            r["doc_id"]: (
                r["clean_text"], r["n_tokens"], r["n_removed"], r["n_spans"]
            )
            for r in substring_dedup(
                df, span_tokens=8, min_count=2, key=key
            ).collect()
        }
        assert got == want, key
    # the planted boilerplate is excised from every i%3 doc ("body" is
    # itself corpus-shared so the last hot window reaches it), bodies kept
    assert want[0][0] == "0 has its own unique tail 0"
    assert want[0][3] == 1  # one maximal boilerplate span, not N windows
    assert want[1][2] == 0  # untouched doc loses nothing
    assert want[100] == ("too short", 2, 0, 0)  # shorter than window: kept
    assert want[101][0] == "" and want[101][2] == 12  # full-dup doc emptied
    assert want[101][3] == 1  # emptied by ONE merged segment


def test_substring_dedup_sketch_mode_superset_and_exact_here(spark):
    """CMS mode: never undercounts, so every truly-hot span is removed;
    at this scale (no bucket collisions) it equals the exact path."""
    from knovexlite_spark.ops.dedup import substring_dedup

    rows = [
        (i, ("shared boilerplate line repeated across many docs here now "
             f"and doc {i} specific text follows after it"))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = sorted(map(tuple, substring_dedup(df, span_tokens=8, min_count=2).collect()))
    sk = sorted(map(tuple, substring_dedup(
        df, span_tokens=8, min_count=2, use_sketch=True
    ).collect()))
    assert exact == sk
    # sketch path removals are a SUPERSET of exact removals by doc
    ex_rem = {r[0]: r[3] for r in exact}
    sk_rem = {r[0]: r[3] for r in sk}
    assert all(sk_rem[d] >= ex_rem[d] for d in ex_rem)


def test_substring_dedup_plan_is_combinable_no_allpairs(spark):
    """Scale shape: one combinable hash aggregate for span frequencies
    (partial_count before the exchange), no cartesian/NLJ anywhere, and
    the sketch path joins only a BROADCAST sketch."""
    from knovexlite_spark.ops.dedup import substring_dedup

    df = spark.createDataFrame(
        [(i, f"some words {i} " * 20) for i in range(50)],
        "doc_id long, text string",
    )
    plan = (
        substring_dedup(df, span_tokens=8, min_count=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert "partial_count" in plan  # map-side combine on the span agg
    plan_sk = (
        substring_dedup(df, span_tokens=8, min_count=2, use_sketch=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan_sk and "NestedLoop" not in plan_sk
    assert "BroadcastHashJoin" in plan_sk  # sketch lookup is broadcast


from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_docs_strategy = st.lists(
    st.lists(_words, min_size=0, max_size=12).map(" ".join),
    min_size=1, max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(texts=_docs_strategy)
def test_substring_dedup_property_matches_python(spark, texts):
    """For ANY small corpus over a tiny vocabulary (maximizing span
    collisions), substring_dedup == the pure-Python reference."""
    from knovexlite_spark.ops.dedup import substring_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["clean_text"], r["n_tokens"], r["n_removed"], r["n_spans"]
        )
        for r in substring_dedup(df, span_tokens=3, min_count=2, key="string").collect()
    }
    want = _py_substring_dedup(
        [(i, " ".join(t.split())) for i, t in rows], L=3, min_count=2
    )
    assert got == want


def test_substring_dedup_variable_length_repeats_merge_to_one_span(spark):
    """Round-8 ask #7: real boilerplate is variable-length.  Repeats of
    50-200 tokens seen through a 50-token window produce a pile of
    overlapping hot starts; they must merge into ONE maximal segment
    per block (n_spans), excise the ENTIRE block (not just exact-length
    multiples), and match the Python reference exactly."""
    from knovexlite_spark.ops.dedup import substring_dedup

    rng_words = [f"w{k}" for k in range(300)]
    hdr170 = " ".join(rng_words[:170])       # 170-token boilerplate
    ftr50 = " ".join(f"f{k}" for k in range(50))   # exactly window-sized
    rows = []
    for i in range(8):
        body = " ".join(f"b{i}x{j}" for j in range(60))
        # header + unique body + footer: two disjoint repeated blocks
        rows.append((i, f"{hdr170} {body} {ftr50}"))
    rows.append((99, "lone document with no shared fifty token spans at all"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["clean_text"], r["n_tokens"], r["n_removed"], r["n_spans"]
        )
        for r in substring_dedup(
            df, span_tokens=50, min_count=2, key="string"
        ).collect()
    }
    want = _py_substring_dedup(rows, L=50, min_count=2)
    assert got == want
    for i in range(8):
        body = " ".join(f"b{i}x{j}" for j in range(60))
        # the whole 170-token header goes (one span), the whole footer
        # goes (one span), the unique body survives
        assert got[i][0] == body, i
        assert got[i][2] == 220 and got[i][3] == 2, i
    assert got[99][2] == 0 and got[99][3] == 0


# -- paragraph dedup ----------------------------------------------------------


def test_paragraph_dedup_canonical_survivor_and_rebuild(spark):
    """Corpus-wide canonical copy = min (doc_id, position); documents
    rebuild from survivors in original order; within-doc repeats keep
    the first occurrence."""
    from knovexlite_spark.ops.dedup import paragraph_dedup

    boiler = "subscribe to our newsletter for updates"
    df = spark.createDataFrame(
        [
            (1, f"alpha body one\n\n{boiler}\n\nalpha body two"),
            (2, f"{boiler}\n\nbeta body\n\n{boiler}"),
            (3, "gamma body only"),
            (4, f"{boiler}"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_paragraphs"], r["n_removed"])
        for r in paragraph_dedup(df).collect()
    }
    # doc 1 holds the canonical boiler copy (min doc_id, idx 1)
    assert got[1] == (f"alpha body one\n\n{boiler}\n\nalpha body two", 3, 0)
    # doc 2 loses BOTH copies (canonical lives in doc 1)
    assert got[2] == ("beta body", 3, 2)
    assert got[3] == ("gamma body only", 1, 0)
    assert got[4] == ("", 1, 1)


def test_paragraph_dedup_within_doc_first_occurrence_wins(spark):
    from knovexlite_spark.ops.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(7, "same para\n\nmiddle\n\nsame para\n\nsame para")],
        "doc_id long, text string",
    )
    (row,) = paragraph_dedup(df).collect()
    assert row["clean_text"] == "same para\n\nmiddle"
    assert row["n_paragraphs"] == 4 and row["n_removed"] == 2


def test_paragraph_dedup_short_fragments_pass_through(spark):
    """Blank/short fragments (consecutive separators) are never hashed:
    they all survive even though they 'duplicate' each other, keeping
    the rebuild byte-faithful around empty slots."""
    from knovexlite_spark.ops.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "a body\n\n\n\na body tail"), (2, "b\n\n\n\nc")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert got[1]["clean_text"] == "a body\n\n\n\na body tail"
    assert got[1]["n_removed"] == 0
    assert got[2]["clean_text"] == "b\n\n\n\nc"


def test_paragraph_dedup_plan_combinable_min_struct(spark):
    """The canonical-copy aggregation is ONE combinable groupBy on the
    content hash (partial_min of the (doc, idx) struct) — state is
    distinct-paragraph-sized with map-side combine, never a window
    over the full explode."""
    from knovexlite_spark.ops.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(i, f"p{i % 3}\n\nq{i}") for i in range(20)],
        "doc_id long, text string",
    )
    plan = paragraph_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan
    assert "Window" not in plan


def test_paragraph_dedup_null_text_passes_through(spark):
    """split(NULL) explodes to zero rows — without the guard a
    NULL-text doc would vanish from the output entirely (the r7
    ADVICE defect class).  It must pass through with NULL clean_text
    and zero counts."""
    from knovexlite_spark.ops.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "real\n\nbody"), (2, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert set(got) == {1, 2}
    assert got[2]["clean_text"] is None
    assert got[2]["n_paragraphs"] == 0 and got[2]["n_removed"] == 0
    assert got[1]["clean_text"] == "real\n\nbody"


from hypothesis import given, settings
from hypothesis import strategies as st

_para = st.sampled_from(["alpha beta", "gamma", "shared body", "x y z", ""])
_pcorpus = st.lists(
    st.lists(_para, min_size=0, max_size=5), min_size=1, max_size=6
)


def _para_reference(corpus, sep="\n\n", min_chars=1):
    """Pure-Python paragraph_dedup: canonical = min (doc, idx) over
    every occurrence; short fragments pass through unhashed."""
    canon = {}
    for d, paras in enumerate(corpus):
        for i, p in enumerate(paras):
            if len(p.strip()) >= min_chars and p not in canon:
                canon[p] = (d, i)  # first (doc, idx) in scan order == min
    out = {}
    for d, paras in enumerate(corpus):
        kept = [
            p for i, p in enumerate(paras)
            if len(p.strip()) < min_chars or canon[p] == (d, i)
        ]
        out[d] = (sep.join(kept), len(paras), len(paras) - len(kept))
    return out


@settings(max_examples=12, deadline=None)
@given(_pcorpus)
def test_paragraph_dedup_matches_python_reference(spark, corpus):
    """Property: for ANY corpus over a tiny paragraph vocabulary the
    operator agrees with a direct Python implementation of its
    contract (canonical min-(doc,idx) survivor, short-fragment
    pass-through, ordered rebuild)."""
    from knovexlite_spark.ops.dedup import paragraph_dedup

    rows = [(d, "\n\n".join(paras)) for d, paras in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_paragraphs"], r["n_removed"])
        for r in paragraph_dedup(df).collect()
    }
    # note: joining with sep then re-splitting is how the operator
    # SEES the corpus — mirror that in the reference input
    seen = {d: t.split("\n\n") for d, t in rows}
    want = _para_reference([seen[d] for d in sorted(seen)])
    assert got == {d: want[d] for d in sorted(seen)}
