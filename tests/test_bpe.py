"""BPE trainer + encoder (ops/bpe.py) vs hand computations and an
independent per-word reference implementation."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from knovexlite_spark.ops.bpe import (
    END,
    bpe_encode,
    learn_bpe_merges,
    word_frequencies,
)
from knovexlite_spark.ops.text import BPE_TOKEN_RE


def test_learn_merges_classic_low_lower_example():
    """The Sennrich paper's canonical corpus: with 'low' dominant, the
    first merges build 'low' from characters.  Hand-derivable: pair
    (l,o) and (o,w) both occur in every word containing 'low'; ties
    break to the lexicographically smaller pair."""
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_bpe_merges(freqs, 4)
    assert len(merges) == 4
    # 'es' appears in newest+widest (9) and 'lo'/'ow' in low+lower (7);
    # (e,s) and then (es,t) dominate, then t</w>; hand-check the start:
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    # after est</w>, the best remaining pair is (l,o) with 7
    assert merges[3] == ("l", "o")


def test_learn_merges_stops_when_nothing_repeats():
    merges = learn_bpe_merges({"ab": 1, "cd": 1}, 10)
    assert merges == []  # no pair reaches freq 2


def _ref_encode(word: str, merges: list) -> list:
    """Independent reference: REPLAY the merges in learned order (a
    different strategy from the kernel's best-rank-first loop; for a
    rank list produced by learn_bpe_merges the two are equivalent, so
    disagreement flags a bug in either)."""
    sym = list(word) + [END]
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    if sym and sym[-1] == END:
        sym = sym[:-1]
    elif sym and sym[-1].endswith(END):
        sym = sym[:-1] + [sym[-1][: -len(END)]]
    return sym


def test_bpe_encode_matches_reference_and_surface_roundtrip(spark):
    docs = [
        (1, "low lower lowest newest widest"),
        (2, "the newest lowlands, lower-widest!"),
        (3, ""),
        (4, "unseen zebras"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = learn_bpe_merges(word_frequencies(df), 12)
    assert len(merges) > 4

    got = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    pat = re.compile(BPE_TOKEN_RE)
    for doc_id, text in docs:
        words = pat.findall(text)
        want = [t for w in words for t in _ref_encode(w, merges)]
        assert list(got[doc_id]["tokens"]) == want, doc_id
        assert got[doc_id]["n_tokens"] == len(want)
        # surface roundtrip: concatenation reproduces the pre-tokens
        assert "".join(got[doc_id]["tokens"]) == "".join(words), doc_id


def test_bpe_compresses_trained_words_only(spark):
    """Words the merges were learned on encode to fewer symbols than
    their character count; unseen words fall back toward characters."""
    train = spark.createDataFrame(
        [(i, "low lowest low newest") for i in range(5)],
        "doc_id long, text string",
    )
    merges = learn_bpe_merges(word_frequencies(train), 20)
    probe = spark.createDataFrame(
        [(1, "lowest"), (2, "qxzv")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_tokens"] for r in bpe_encode(probe, merges).collect()}
    assert got[1] <= 2  # trained word collapses
    assert got[2] == 4  # unseen word stays at character level


def test_word_frequencies_is_pretokenizer_keyed(spark):
    df = spark.createDataFrame(
        [(1, "ab ab ab, cd!")], "doc_id long, text string"
    )
    got = {r["word"]: r["freq"] for r in word_frequencies(df).collect()}
    # GPT-2-style pre-tokens keep the leading space and split punct runs
    assert got["ab"] == 1 and got[" ab"] == 2
    assert got[","] == 1 and got["!"] == 1 and got[" cd"] == 1


corpus_words = st.lists(
    st.text(alphabet="abcd ", min_size=1, max_size=12),
    min_size=1,
    max_size=6,
)


@settings(max_examples=10, deadline=None)
@given(texts=corpus_words)
def test_bpe_roundtrip_property(spark, texts):
    """For ANY corpus: merges learned from it applied back to it give
    (a) surface roundtrip per doc, (b) token counts <= pre-token char
    counts, (c) kernel == independent replay reference."""
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = learn_bpe_merges(word_frequencies(df), 6)
    got = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    pat = re.compile(BPE_TOKEN_RE)
    for i, t in docs:
        words = pat.findall(t)
        assert "".join(got[i]["tokens"]) == "".join(words)
        assert got[i]["tokens"] == [
            tok for w in words for tok in _ref_encode(w, merges)
        ]
        assert got[i]["n_tokens"] <= sum(len(w) for w in words) or not words


def test_incremental_trainer_matches_naive_reference():
    """The round-15 incremental trainer (pair counts updated via an
    inverted index) must reproduce the naive Sennrich loop MERGE FOR
    MERGE, tie order included — pinned against a direct naive
    reimplementation on a zipf-ish vocabulary large enough that
    inverted-index bookkeeping (pair deletion, multi-occurrence
    words) is exercised."""
    import numpy as np

    from knovexlite_spark.ops.bpe import END, learn_bpe_merges

    rng = np.random.default_rng(42)
    syll = ["ba", "ko", "ri", "ta", "mu", "en", "so", "li", "da", "pe"]
    vocab = {}
    for _ in range(400):
        w = "".join(
            syll[int(x)] for x in rng.integers(0, 10, size=rng.integers(1, 5))
        )
        vocab[w] = vocab.get(w, 0) + int(rng.zipf(1.5)) % 50 + 1

    def naive(freqs, num_merges):
        seqs = {}
        for w, f in freqs.items():
            t = tuple(list(w) + [END])
            seqs[t] = seqs.get(t, 0) + f
        merges = []
        for _ in range(num_merges):
            pc = {}
            for seq, f in seqs.items():
                for a, b in zip(seq, seq[1:]):
                    pc[(a, b)] = pc.get((a, b), 0) + f
            if not pc:
                break
            top = max(pc.values())
            best = min(p for p, c in pc.items() if c == top)
            if pc[best] < 2:
                break
            merges.append(best)
            merged = best[0] + best[1]
            new_seqs = {}
            for seq, f in seqs.items():
                out, i = [], 0
                while i < len(seq):
                    if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                t = tuple(out)
                new_seqs[t] = new_seqs.get(t, 0) + f
            seqs = new_seqs
        return merges

    for n in (1, 17, 120, 4000):  # 4000 > available merges: break path
        assert learn_bpe_merges(dict(vocab), n) == naive(dict(vocab), n), n


def test_bpe_encode_counters_and_bounded_cache(spark):
    """counters=True appends per-doc n_words/n_miss without changing
    the token output; a cache smaller than the vocabulary yields more
    misses than a full cache, and n_miss <= n_words always."""
    from knovexlite_spark.ops.bpe import (
        bpe_encode,
        learn_bpe_merges,
        word_frequencies,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta alpha beta " * 5) for i in range(6)],
        "doc_id long, text string",
    ).coalesce(1)
    merges = learn_bpe_merges(word_frequencies(docs), num_merges=30)
    base = sorted(
        map(tuple, bpe_encode(docs, merges).collect())
    )
    with_c = bpe_encode(docs, merges, counters=True).collect()
    assert sorted((r["doc_id"], tuple(r["tokens"]), r["n_tokens"]) for r in with_c) == [
        (d, tuple(t), n) for d, t, n in base
    ]
    for r in with_c:
        assert r["n_words"] == 30 and 0 <= r["n_miss"] <= r["n_words"]
    full_miss = sum(
        r["n_miss"]
        for r in bpe_encode(docs, merges, counters=True).collect()
    )
    tiny_miss = sum(
        r["n_miss"]
        for r in bpe_encode(
            docs, merges, cache_size=1, counters=True
        ).collect()
    )
    # one merge-loop run per distinct PRE-TOKEN: the GPT-2-style
    # pre-tokenizer keeps the leading space, so doc-initial "alpha"
    # and interior " alpha" are distinct (4 words + 1 space variant)
    assert full_miss == 5
    assert tiny_miss > full_miss  # bounded cache keeps missing


def test_synthetic_corpus_deterministic_and_zipfish(spark):
    """synthetic_corpus: same seed -> identical text; vocabulary is
    large (realistic) and the rank distribution is head-heavy
    (zipf-ish), the property that makes a word cache effective while
    leaving real misses."""
    from knovexlite_spark.ops.bpe import synthetic_corpus, word_frequencies

    a = synthetic_corpus(
        spark, n_docs=20, words_per_doc=100, vocab_size=2000, seed=3
    )
    b = synthetic_corpus(
        spark, n_docs=20, words_per_doc=100, vocab_size=2000, seed=3
    )
    ra = sorted(map(tuple, a.collect()))
    assert ra == sorted(map(tuple, b.collect()))
    assert len(ra) == 20
    assert all(len(t.split(" ")) == 100 for _, t in ra)
    wf = {r["word"]: r["freq"] for r in word_frequencies(a).collect()}
    assert len(wf) > 400  # far beyond the 31-word fixture vocabulary
    top = sorted(wf.values(), reverse=True)
    assert sum(top[:20]) > 0.25 * 2000  # head-heavy: top-1% >> uniform


def test_bpe_merge_table_round_trip(spark, tmp_path):
    """bpe_save_merges/bpe_load_merges: the tokenizer table
    round-trips exactly (encode after reload == encode before, token
    for token), metadata validates loudly, and corrupted tables
    (duplicate / non-contiguous ranks) raise instead of silently
    reordering merge priorities."""
    import pytest

    from knovexlite_spark.ops.bpe import (
        bpe_encode,
        bpe_load_merges,
        bpe_save_merges,
        learn_bpe_merges,
        word_frequencies,
    )
    from knovexlite_spark.ops.persist import sketch_load

    docs = spark.createDataFrame(
        [(i, "tokens merge ranks order tokens merge " * 3) for i in range(4)],
        "doc_id long, text string",
    )
    merges = learn_bpe_merges(word_frequencies(docs), num_merges=40)
    assert merges
    path = str(tmp_path / "tok")
    bpe_save_merges(spark, merges, path, params={"num_merges": 40})
    loaded, meta = bpe_load_merges(spark, path)
    assert loaded == merges
    assert meta["family"] == "bpe" and meta["params"] == {"num_merges": 40}
    before = sorted(map(tuple, bpe_encode(docs, merges).collect()))
    after = sorted(map(tuple, bpe_encode(docs, loaded).collect()))
    assert before == after
    # family mismatch through the shared loader
    with pytest.raises(ValueError, match="expected 'gk'"):
        sketch_load(spark, path, expect_family="gk")
    # corrupted tables raise
    dup = str(tmp_path / "dup")
    df, _ = sketch_load(spark, path, expect_family="bpe")
    from knovexlite_spark.ops.persist import sketch_save

    sketch_save(
        df.unionByName(df.limit(1)), dup, "bpe", params={"num_merges": 40}
    )
    with pytest.raises(ValueError, match="duplicate merge rank"):
        bpe_load_merges(spark, dup)
    gap = str(tmp_path / "gap")
    sketch_save(
        df.filter("rank != 3"), gap, "bpe", params={"num_merges": 40}
    )
    with pytest.raises(ValueError, match="not contiguous"):
        bpe_load_merges(spark, gap)
