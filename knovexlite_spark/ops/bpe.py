"""Byte-pair encoding: a REAL trainable/applicable subword tokenizer
for the training-data pipeline (the `bpe_token_count` regex in
ops/text.py is the cheap scan-time ESTIMATE; this module is the actual
encoder a packing/counting pipeline runs when token budgets must match
the model's tokenizer).

Scale shape — the part that matters at 100 TB:

- ``word_frequencies``: the ONLY corpus-sized work.  One pre-tokenize
  explode + one combinable groupBy; output is vocabulary-sized (unique
  pre-tokens), not corpus-sized.
- ``learn_bpe_merges``: classic BPE training over the word-frequency
  table ON THE DRIVER — deliberately.  The table is vocab-sized (10^5-
  10^6 entries for natural language, independent of corpus bytes), and
  merge learning is an inherently sequential loop (merge k+1 depends
  on the table state after merge k), so distributing it buys nothing
  and costs a shuffle per merge.  This is the standard production
  split: corpus pass distributed, merge loop local.
- ``bpe_encode``: distributed apply via an Arrow-batched kernel with
  the merge ranks broadcast.  BPE's merge loop is irreducibly
  iterative per word — the documented Python-kernel exception (same
  category as the KGE scoring kernels); everything around it (pre-
  tokenization, batching) stays columnar.

Character-level BPE (symbols start as unicode chars, '</w>' marks
word ends) — the classic Sennrich formulation; byte-level remapping
(GPT-2) is an input transform away and changes nothing structural.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knovexlite_spark.ops.text import BPE_TOKEN_RE

END = "</w>"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus, using the GPT-2-style pre-tokenizer
    regex (so BPE merges can never cross a pre-token boundary).  The
    one corpus-sized job in BPE training: explode + combinable count."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def learn_bpe_merges(
    word_freqs: DataFrame | dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge learning (Sennrich et al. 2016, public
    algorithm): repeatedly merge the most frequent adjacent symbol
    pair.  Runs on the driver over the vocab-sized frequency table —
    see module docstring for why that is the scalable split.  Ties
    break lexicographically for determinism (engine-independent).

    Accepts the DataFrame from ``word_frequencies`` (collected here —
    vocab-sized) or a plain dict for tests."""
    if isinstance(word_freqs, DataFrame):
        freqs = {r["word"]: int(r["freq"]) for r in word_freqs.collect()}
    else:
        freqs = dict(word_freqs)
    # symbol sequences per word; '</w>' marks the word end so merges
    # can distinguish suffix from interior occurrences
    seqs: dict[tuple[str, ...], int] = {}
    for w, f in freqs.items():
        seqs[tuple(list(w) + [END])] = seqs.get(tuple(list(w) + [END]), 0) + f
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, f in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
        if not pair_counts:
            break
        # deterministic: max freq, then lexicographically SMALLEST pair
        top = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == top)
        if pair_counts[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        merged = best[0] + best[1]
        new_seqs: dict[tuple[str, ...], int] = {}
        for seq, f in seqs.items():
            out = []
            i = 0
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


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one pre-token: repeatedly merge the best-ranked
    adjacent pair (lowest rank number = learned earliest)."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    if sym and sym[-1] == END:
        sym = sym[:-1]
    elif sym and sym[-1].endswith(END):
        sym = sym[:-1] + [sym[-1][: -len(END)]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed BPE encode: (doc_id, tokens array<string>, n_tokens).
    The merge ranks broadcast (vocab-sized); documents stream through
    an Arrow-batched kernel.  Surface contract (pinned by tests):
    concatenating a word's tokens reproduces the word, and merges
    never cross pre-token boundaries."""
    import re
    from typing import Iterator

    import pandas as pd

    spark = df.sparkSession
    b_ranks = spark.sparkContext.broadcast(
        {tuple(p): i for i, p in enumerate(merges)}
    )
    pat = re.compile(BPE_TOKEN_RE)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = b_ranks.value
        cache: dict[str, list[str]] = {}
        for pdf in it:
            ids, toks, ns = [], [], []
            for doc, text in zip(pdf["doc"], pdf["txt"]):
                out: list[str] = []
                for w in pat.findall(str(text)):
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        if len(cache) < 200_000:  # bound kernel memory
                            cache[w] = enc
                    out.extend(enc)
                ids.append(doc)
                toks.append(out)
                ns.append(len(out))
            yield pd.DataFrame({"doc": ids, "tokens": toks, "n": ns})

    return (
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("txt"))
        .mapInPandas(run, "doc long, tokens array<string>, n long")
        .select(
            F.col("doc").alias(id_col),
            F.col("tokens"),
            F.col("n").alias("n_tokens"),
        )
    )
