"""End-to-end corpus-curation rehearsal: the engine's pipeline
operators composed into the shape they exist for — turning a raw
document corpus into packed, split, deduplicated training data — with
per-stage row counts and wall times at sf0.1 and at a blow-up corpus.

Stages (each one an operator this repo ships; no ad-hoc logic):

  1. quality filter   ops/text.quality_features — drop docs that are
                      too short or stopword-free (boilerplate/noise)
  2. language filter  ops/text.language_id — keep docs with a
                      confident marker language (drop 'und')
  3. exact dedup      ops/dedup.exact_duplicates — md5 groupBy,
                      keep canonical ids
  4. near dedup       ops/dedup.minhash_near_duplicates
                      (restrict_verify on) -> near_dup_clusters
                      (connected components) -> keep component minimum
  5. decontamination  ops/dedup.decontaminate — drop docs containing
                      8-grams of a (planted) benchmark set; the eval
                      shingles broadcast, the corpus scanned map-only
  6. PII redaction    ops/text.redact_pii — map-only chained
                      regexp_replace of emails/SSNs/IPs/phones
  7. split            ops/sample.hash_split 98/1/1 train/val/test
  8. packing          ops/sample.pack_chunked at a 2048-token budget
                      (sharded windows), per split

Every stage's survivor count is printed NEXT TO its time — the
zero-row streaming war story (SCALE.md) made rows-beside-timings the
house protocol: a fast pipeline stage that filtered everything is a
bug, not a win.

Measurement protocol (round-6 ask #5 — the round-5 table compared a
COLD sf0.1 run against a WARM 6x run, which made the quality stage
look faster on 6x data): the bench harness discipline applies here
too — pre-touched heap (-Xms=-Xmx -XX:+AlwaysPreTouch), the
Python/Arrow worker pool spun up front, and one UNTIMED full warm-up
pass of the funnel per corpus (pays whole-stage-codegen compilation
and parquet footers) before the timed pass.  Both corpora are
therefore measured equally WARM; the warm-up totals are kept in the
artifact so the cold cost stays visible.

Usage: python scripts/curation_rehearsal.py [corpus_parquet ...]
Defaults: sf0.1 documents + /tmp/docs6x_raw.parquet if present — six
UNSALTED id-shifted copies (byte-identical duplicates, the crawl-
corpus shape the exact-dedup stage exists for; the per-token-salted
blow-up the dedup A/B uses is unusable here, and the rehearsal's own
protocol caught that: salting destroys the stopword markers, so the
language stage reported a fast 0-row "success").  Prints one JSON
line per corpus.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from knovexlite_spark.engine import Engine
from knovexlite_spark.ops.dedup import (
    decontaminate,
    exact_duplicates,
    minhash_near_duplicates,
    near_dup_clusters,
)
from knovexlite_spark.ops.sample import hash_split, pack_chunked
from knovexlite_spark.ops.text import (
    language_id,
    quality_features,
    redact_pii,
    repetition_features,
    token_count,
)
from knovexlite_spark.session import get_spark

SRC = "/root/testdata/sf0.1"


def run(spark, docs, label: str, lang_model=None) -> dict:
    out: dict = {"corpus": label, "stages": []}
    if lang_model is not None:
        out["language_stage"] = "trained-model"

    pins: list = []

    def stage(name, df):
        # localCheckpoint after each stage: the stage's wall time is its
        # MARGINAL cost (materialize + count), not a re-execution of the
        # whole upstream lineage — so the totals reflect a real one-pass
        # pipeline rather than a triangular re-derivation.  Each stage
        # depends only on the PREVIOUS checkpoint, so once the new one
        # has materialized the old blocks are dead weight (the early
        # frames are full-corpus copies, not small survivor lists) —
        # unpersist them instead of accumulating one corpus copy per
        # stage in executor storage.
        t0 = time.time()
        df = df.localCheckpoint()  # eager: materializes here
        n = df.count()
        out["stages"].append(
            {"stage": name, "rows": n, "sec": round(time.time() - t0, 2)}
        )
        if pins:
            pins[-1].unpersist()
        pins.append(df)
        return df

    docs = stage("raw", docs.select("doc_id", "text"))

    # 1. quality: length + repetition gates (thresholds are corpus
    #    policy, the operators are the engine's)
    q = quality_features(docs)
    rep = repetition_features(docs)
    keep_q = (
        q.join(rep, "doc_id")
        .filter(
            (F.col("n_tokens") >= 10)
            & (F.col("top_bigram_frac") < 0.5)
            & (F.col("dup_line_frac") < 0.5)
        )
        .select("doc_id")
    )
    docs = stage("quality", docs.join(keep_q, "doc_id", "semi"))

    # 2. language: confident language only.  Default = the marker
    # heuristic (the frozen funnel form); --trained-langid swaps in the
    # trained model via the same language_id() entry point (same output
    # schema, same stage shape: ONE broadcast join + ONE combinable
    # groupBy) so the production path has a measured wall-clock number.
    lid = language_id(docs, model=lang_model) if lang_model is not None \
        else language_id(docs)
    keep_l = lid.filter(F.col("lang_pred") != "und").select("doc_id")
    docs = stage("language", docs.join(keep_l, "doc_id", "semi"))

    # 2b. per-domain cap (round 7): cap each web domain at 500 docs
    # (ops/sample.cap_per_domain).  This corpus carries no URLs, so the
    # stage is a verified pass-through whose measured cost is the real
    # per-doc URL_RE extract scan — the full window path is benched
    # separately on an injected-URL fixture (bench row `domain_cap`).
    from knovexlite_spark.ops.sample import cap_per_domain

    docs = stage(
        "domain_cap",
        cap_per_domain(docs, max_docs=500).select("doc_id", "text"),
    )

    # 3. exact dedup: canonical survivor per content hash
    canon = exact_duplicates(docs).select(
        F.col("canonical_id").alias("doc_id")
    )
    docs = stage("exact_dedup", docs.join(canon, "doc_id", "semi"))

    # 4. near dedup: LSH pairs -> CC clusters -> component minimum
    pairs = minhash_near_duplicates(docs, threshold=0.8)
    clusters = near_dup_clusters(docs.select("doc_id"), pairs)
    survivors = clusters.filter(F.col("doc") == F.col("component")).select(
        F.col("doc").alias("doc_id")
    )
    docs = stage("near_dedup", docs.join(survivors, "doc_id", "semi"))

    # 5. decontamination: the "benchmark" is a slice of the corpus
    # itself (every 500th doc), so the planted leakage rate is known —
    # each eval doc must flag at least its own source document
    evalset = docs.filter(F.col("doc_id") % 500 == 0).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
    )
    flagged = decontaminate(docs, evalset, n=8).select("doc_id").distinct()
    docs = stage("decontaminate", docs.join(flagged, "doc_id", "anti"))

    # 5b. substring dedup (round 7): cut corpus-repeated >= 50-token
    # spans out of the SURVIVORS (doc-level dedup cannot see spans
    # shared across otherwise-distinct docs) — a text rewrite, row
    # count unchanged; post-dedup placement keeps the span-frequency
    # pass off the removed duplicates (correct economics)
    from knovexlite_spark.ops.dedup import substring_dedup

    docs = stage(
        "substr_dedup",
        substring_dedup(docs, span_tokens=50, min_count=2).select(
            "doc_id", F.col("clean_text").alias("text")
        ),
    )

    # 6. PII redaction: map-only text rewrite (row count unchanged —
    # the stage cost is the chained regexp scan)
    docs = stage(
        "pii_redact",
        docs.select("doc_id", redact_pii(F.col("text")).alias("text")),
    )

    # 6b. perplexity scoring (round 7, ops/lm.py): train a bigram LM on
    # the survivors and score every doc — the CCNet-style quality
    # signal.  MEASUREMENT-ONLY stage: scores are counted but docs are
    # NOT filtered, so every downstream stage row stays comparable
    # round-over-round (the filter form, perplexity_filter, is
    # exercised in tests).  No checkpoint/pin: docs is untouched.
    from knovexlite_spark.ops.lm import score_documents, train_ngram_lm

    t0 = time.time()
    lm = train_ngram_lm(docs, n=2)
    n_scored = score_documents(docs, lm, n=2).count()
    out["stages"].append(
        {"stage": "ppl_score", "rows": n_scored, "sec": round(time.time() - t0, 2)}
    )

    # 6c. quality-classifier scoring (round 7, ops/classifier.py):
    # train the GPT-3-style hashed-feature logistic regression on a
    # slice of the survivors (every 100th doc stands in for the
    # high-quality reference corpus, a disjoint equal-rate slice for
    # the negatives — the funnel ships no external wiki; the COST
    # SHAPE is what this stage measures: 3 one-job epochs on
    # sample-sized features + ONE broadcast-model scoring pass over
    # the full corpus).  MEASUREMENT-ONLY like ppl_score: rows are
    # scored, not filtered; docs is untouched.
    from knovexlite_spark.ops.classifier import (
        classify,
        train_quality_classifier,
    )

    t0 = time.time()
    clf_pos = docs.filter(F.col("doc_id") % 100 == 0)
    clf_neg = docs.filter(F.col("doc_id") % 100 == 50)
    w, bias = train_quality_classifier(
        clf_pos, clf_neg, n_buckets=1 << 14, epochs=3
    )
    n_clf = classify(docs, w, bias).count()
    out["stages"].append(
        {"stage": "clf_score", "rows": n_clf, "sec": round(time.time() - t0, 2)}
    )

    # 7. deterministic split
    split = hash_split(docs, {"train": 0.98, "val": 0.01, "test": 0.01})
    # 6. pack to 2048-token bins per split (sharded windows)
    sized = split.select(
        "doc_id", "split", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_chunked(
        sized, budget=2048, strata_cols=["split"], num_shards=8
    )
    t0 = time.time()
    summary = (
        packed.groupBy("split")
        .agg(
            F.count("*").alias("docs"),
            F.countDistinct("shard", "bin").alias("bins"),
            F.sum("n_tokens").alias("tokens"),
        )
        .collect()
    )
    out["stages"].append(
        {
            "stage": "split+pack",
            "rows": int(sum(r["docs"] for r in summary)),
            "sec": round(time.time() - t0, 2),
        }
    )
    out["splits"] = {
        r["split"]: {
            "docs": r["docs"],
            "bins": r["bins"],
            "tokens": int(r["tokens"]),
        }
        for r in summary
    }
    if pins:
        pins[-1].unpersist()  # last checkpoint: summary is collected
    return out


SPAM_WORDS = (
    "win free casino bonus click now offer deal cheap pills lottery "
    "prize claim reward subscribe jackpot instant cash viagra discount "
    "limited exclusive winner congratulations unsubscribe"
).split()


def run_filter_variant(
    spark, docs, label: str, spam_frac_mod: int = 10,
    spam_mode: str = "foreign",
) -> dict:
    """FILTER-MODE funnel rehearsal (round-8 ask #6): the round-7
    funnel scores quality measurement-only; this variant plants a
    known spam slice, lets the quality stages actually FILTER, and
    reports survivor precision/recall plus the downstream cost delta.

    Setup: one synthetic spam doc per ``spam_frac_mod`` originals
    (ids offset +2e9 so labels are exact).  The models train on a
    small labeled SEED — every 20th original as the clean reference,
    every 20th spam doc as the negative sample — the realistic setup
    (a curation team always holds a small labeled slice; no label
    leakage to the remaining 95%).

    ``spam_mode``:

    - "foreign" (round 8): keyword stuffing over a vocabulary FOREIGN
      to the corpus.  The perplexity filter catches it at the
      add-alpha unseen-token ceiling — which on this tiny-vocabulary
      corpus sits a razor above the clean p95 (the r8 caveat).
    - "natural" (round 9, verdict ask #7): spam built INSIDE the
      corpus's own vocabulary — keyword stuffing over a deterministic
      6-word subset of the corpus's actual words — so no unseen-token
      ceiling is in play anywhere.  Two measured consequences,
      reported rather than papered over: (a) this corpus is iid
      unigram text (the in-run 'shuffle probe' scores token-shuffled
      clean docs vs originals: medians match), so ORDER-based signals
      (bigram perplexity) carry no information about any
      in-distribution rewrite — the literal 'shuffled n-grams' plant
      would be information-theoretically unfilterable, and the ppl
      stage is expected to remove ~nothing here; (b) the
      DISTRIBUTIONAL signal is where the natural margin lives: the
      seed-trained hashed-feature classifier separates the skewed
      unigram histogram from clean with a wide probability gap,
      reported as the clean/spam score quantiles.

    Two filter stages, then the downstream split+pack runs TWICE —
    once on the filtered survivors, once on the unfiltered planted
    corpus — so the 'what does filtering buy downstream' delta is a
    same-run, same-JVM measurement.

    Metrics: spam recall (planted spam removed / planted), precision
    (planted spam removed / all removed), per-stage rows+seconds,
    and in natural mode the probe + margin quantiles."""
    from knovexlite_spark.ops.classifier import (
        quality_filter,
        train_quality_classifier,
    )
    from knovexlite_spark.ops.lm import (
        perplexity_filter,
        score_documents,
        train_ngram_lm,
    )

    out: dict = {"corpus": label, "variant": f"filter-{spam_mode}", "stages": []}
    base = docs.select("doc_id", "text").filter(F.length("text") > 0)
    if spam_mode == "foreign":
        vocab = SPAM_WORDS
        runs = 1  # cycle word-by-word (the r8 form, kept comparable)
        doc_len = 80
    elif spam_mode == "natural":
        # the corpus's OWN vocabulary, collected once (parameter-sized:
        # this synthetic corpus holds ~31 distinct words; a real crawl
        # would use its top-K list) — spam = 6 of these words stuffed
        # in runs of 12, a skewed-histogram rewrite with zero
        # out-of-vocabulary tokens
        vocab = [
            r["w"]
            for r in base.select(
                F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
            )
            .groupBy("w")
            .count()
            .orderBy(F.desc("count"), "w")
            .limit(40)
            .collect()
        ]
        runs = 12
        doc_len = 72
    else:
        raise ValueError(f"unknown spam_mode {spam_mode!r}")
    n_words = len(vocab)
    # deterministic spam doc per planted id (pure JVM exprs): token k
    # = vocab[(id*7 + (k div runs)*13) mod n]; runs>1 repeats each
    # keyword consecutively (real keyword stuffing repeats in runs)
    spam_tokens = F.transform(
        F.sequence(F.lit(0), F.lit(doc_len - 1)),
        lambda k: F.element_at(
            F.array(*[F.lit(w) for w in vocab]),
            (
                F.pmod(
                    F.col("doc_id") * 7 + (k / runs).cast("long") * 13,
                    F.lit(n_words),
                )
                + 1
            ).cast("int"),
        ),
    )
    spam = (
        base.filter(F.col("doc_id") % spam_frac_mod == 0)
        .select((F.col("doc_id") + 2_000_000_000).alias("doc_id"))
        .select("doc_id", F.array_join(spam_tokens, " ").alias("text"))
    )
    planted = base.unionByName(spam).localCheckpoint()
    n_spam = spam.count()
    n_total = planted.count()
    out["stages"].append({"stage": "planted", "rows": n_total, "sec": 0.0})
    out["n_spam_planted"] = n_spam

    is_spam = F.col("doc_id") >= 2_000_000_000
    seed_pos = planted.filter(~is_spam & (F.col("doc_id") % 20 == 0))
    seed_neg = planted.filter(is_spam & (F.col("doc_id") % 20 == 0))

    if spam_mode == "natural":
        # SHUFFLE PROBE: is there any order signal for a bigram LM to
        # use on this corpus?  Score a clean sample and the SAME
        # sample with tokens deterministically shuffled (sort by
        # xxhash64(token, doc_id) — pure JVM); matching medians mean
        # in-distribution order destruction is unfilterable by
        # perplexity HERE, which is why natural spam must differ
        # DISTRIBUTIONALLY to be separable at all.
        from knovexlite_spark.ops.lm import score_documents as _score
        from knovexlite_spark.ops.lm import train_ngram_lm as _train

        probe_lm = _train(seed_pos, n=2)
        sample = planted.filter(~is_spam & (F.col("doc_id") % 7 == 0))
        toks = F.split(F.trim("text"), r"\s+")
        shuffled = sample.select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.transform(
                            toks,
                            lambda t: F.struct(
                                F.xxhash64(t, F.col("doc_id")).alias("h"),
                                t.alias("t"),
                            ),
                        )
                    ),
                    lambda s: s["t"],
                ),
                " ",
            ).alias("text"),
        )
        med = lambda frame: _score(frame, probe_lm, n=2).stat.approxQuantile(  # noqa: E731
            "perplexity", [0.5], 0.001
        )[0]
        out["shuffle_probe"] = {
            "clean_ppl_median": round(med(sample), 3),
            "shuffled_ppl_median": round(med(shuffled), 3),
        }

    # stage F1: perplexity filter — bigram LM trained on the CLEAN
    # seed, threshold = the seed distribution's OWN p99 (the CCNet
    # keep-the-head/middle rule: docs the reference model finds more
    # surprising than 99% of reference docs go).  All-unseen-bigram
    # spam sits at the add-alpha uniform ceiling (~vocab size), above
    # any reference quantile by construction; ~1% clean false
    # positives are the rule's stated price and are REPORTED, not
    # tuned away.
    t0 = time.time()
    lm = train_ngram_lm(seed_pos, n=2)
    thr = (
        score_documents(seed_pos, lm, n=2)
        .stat.approxQuantile("perplexity", [0.99], 0.001)[0]
    )
    ppl_kept = perplexity_filter(planted, lm, max_perplexity=thr, n=2)
    ppl_kept = ppl_kept.localCheckpoint()
    n_after_ppl = ppl_kept.count()
    spam_after_ppl = ppl_kept.filter(is_spam).count()
    out["stages"].append(
        {"stage": "ppl_filter", "rows": n_after_ppl,
         "sec": round(time.time() - t0, 2)}
    )
    out["ppl_threshold"] = round(thr, 2)
    out["spam_removed_by_ppl"] = n_spam - spam_after_ppl

    # stage F2: classifier on the perplexity survivors.
    # foreign mode keeps the frozen r8 FILTER form (3 epochs, raw
    # counts, 0.5 threshold).  Natural mode is MEASUREMENT-ONLY, and
    # the measurement is a negative result worth stating precisely
    # (the r9 conjecture said "the distributional classifier margin is
    # where the natural margin lives" — the r10 in-round runs refute
    # it for LINEAR models):
    #
    # - raw counts at lr=0.5 OSCILLATE (margins scale with document
    #   length; probabilities all ~0 at 3 epochs, all ~1 at 12 —
    #   epoch-parity sign flips), so the raw-count filter form is a
    #   coin flip here;
    # - per-doc L1-normalized (tf) features train stably at any lr —
    #   and are PROVABLY blind: every doc's tf sums to 1, so a linear
    #   margin is a weighted AVERAGE of per-word weights, and the
    #   rotating in-vocabulary spam covers the same words clean docs
    #   use, so no weight vector separates (measured: seed medians
    #   equal to 4+ decimals; an offline NumPy twin on the real corpus
    #   confirms non-separability at any lr/epochs).
    #
    # Concentration — a QUADRATIC statistic (top-bigram fraction, dup
    # tokens) — is where in-vocabulary stuffing is visible, and the
    # funnel already ships that operator: stage F3 below filters with
    # repetition_features at the main funnel's own threshold.
    t0 = time.time()
    natural = spam_mode == "natural"
    w, bias = train_quality_classifier(
        seed_pos,
        seed_neg,
        n_buckets=1 << 14,
        epochs=12 if natural else 3,
        normalize=natural,
    )
    if natural:
        # the natural-margin report: tf-model score quantiles per
        # planted label — the measured blindness is the headline
        from knovexlite_spark.ops.classifier import classify as _classify

        scored = _classify(ppl_kept, w, bias, normalize=True).localCheckpoint()
        qs = [0.01, 0.5, 0.99]
        lab = scored.withColumn(
            "spam", (F.col("doc_id").cast("long") >= 2_000_000_000)
        )
        out["clf_prob_quantiles"] = {
            "clean": [
                round(v, 6)
                for v in lab.filter(~F.col("spam")).stat.approxQuantile(
                    "prob", qs, 0.001
                )
            ],
            "spam": [
                round(v, 6)
                for v in lab.filter(F.col("spam")).stat.approxQuantile(
                    "prob", qs, 0.001
                )
            ],
            "quantiles": qs,
        }
        out["clf_note"] = (
            "report-only in natural mode: a linear model on tf features "
            "is provably unable to separate in-vocabulary stuffing "
            "(simplex averaging); see stage rep_filter"
        )
        # round 11 (VERDICT #6): the BIGRAM-feature rerun.  Hashed
        # word 1+2-grams give the tf model eyes for concentration:
        # run-stuffing is dominated by self-pair bigrams ("spark
        # spark") clean text essentially never produces, so the
        # simplex-averaging blindness above does not apply.  Measured
        # WITHOUT the rep gate: the seed-trained (1,2)-gram tf model's
        # probability quantiles per label, the median separation, and
        # what a plain 0.5-threshold filter would remove on the ppl
        # survivors — the margin now does the work the concentration
        # gate did in r10.
        t0b = time.time()
        w2, b2 = train_quality_classifier(
            seed_pos,
            seed_neg,
            n_buckets=1 << 14,
            epochs=60,
            lr=5.0,
            normalize=True,
            sizes=(1, 2),
        )
        scored2 = _classify(
            ppl_kept, w2, b2, normalize=True, sizes=(1, 2)
        ).localCheckpoint()
        lab2 = scored2.withColumn(
            "spam", (F.col("doc_id").cast("long") >= 2_000_000_000)
        )
        cq2 = {
            "clean": [
                round(v, 6)
                for v in lab2.filter(~F.col("spam")).stat.approxQuantile(
                    "prob", qs, 0.001
                )
            ],
            "spam": [
                round(v, 6)
                for v in lab2.filter(F.col("spam")).stat.approxQuantile(
                    "prob", qs, 0.001
                )
            ],
            "quantiles": qs,
        }
        sep = round(cq2["clean"][1] - cq2["spam"][1], 6)
        removed2 = lab2.filter(F.col("prob") < 0.5)
        spam_rm2 = removed2.filter(F.col("spam")).count()
        total_rm2 = removed2.count()
        out["clf_bigram"] = {
            "sizes": [1, 2],
            "prob_quantiles": cq2,
            "median_separation": sep,
            "spam_recall_margin_only": (
                round(spam_rm2 / spam_after_ppl, 4) if spam_after_ppl else None
            ),
            "spam_precision_margin_only": (
                round(spam_rm2 / total_rm2, 4) if total_rm2 else None
            ),
            "sec": round(time.time() - t0b, 2),
            "note": (
                "margin separates WITHOUT the rep gate: clean median "
                "prob minus spam median prob"
            ),
        }
        clf_kept = ppl_kept
    else:
        clf_kept = quality_filter(ppl_kept, w, bias, threshold=0.5)
        clf_kept = clf_kept.localCheckpoint()
    n_after_clf = clf_kept.count()
    out["stages"].append(
        {"stage": "clf_filter" if not natural else "clf_report",
         "rows": n_after_clf,
         "sec": round(time.time() - t0, 2)}
    )
    out["spam_removed_by_clf"] = spam_after_ppl - clf_kept.filter(
        is_spam
    ).count()

    if natural:
        # stage F3 (natural only): the CONCENTRATION gate.  Keyword
        # stuffing is a repetition signature, but the measured spam
        # sits UNDER the classic thresholds (rotating 12-run stuffing:
        # top bigram 11/71 = 0.15 < the 0.5 line-policy and even
        # Gopher's 0.20) — the decisive quadratic statistics are the
        # token-level ones repetition_features grew this round:
        # max_token_run (spam runs 12 identical tokens; natural text
        # essentially never runs 4+) and dup_token_frac.  Filter on
        # the run signal (threshold 4, corpus-independent), keep the
        # funnel's top_bigram policy alongside.
        from knovexlite_spark.ops.text import repetition_features as _rep

        t0 = time.time()
        keep_rep = (
            _rep(clf_kept)
            .filter(
                (F.col("top_bigram_frac") < 0.5)
                & (F.col("max_token_run") < 4)
            )
            .select("doc_id")
        )
        clf_kept = clf_kept.join(keep_rep, "doc_id", "semi").localCheckpoint()
        n_after_clf = clf_kept.count()
        out["stages"].append(
            {"stage": "rep_filter", "rows": n_after_clf,
             "sec": round(time.time() - t0, 2)}
        )
        out["spam_removed_by_rep"] = (
            spam_after_ppl
            - out["spam_removed_by_clf"]
            - clf_kept.filter(is_spam).count()
        )

    # precision / recall on the planted labels
    spam_surviving = clf_kept.filter(is_spam).count()
    clean_total = n_total - n_spam
    clean_surviving = n_after_clf - spam_surviving
    removed_spam = n_spam - spam_surviving
    removed_total = n_total - n_after_clf
    out["spam_recall"] = round(removed_spam / n_spam, 4) if n_spam else None
    out["spam_precision"] = (
        round(removed_spam / removed_total, 4) if removed_total else None
    )
    out["clean_false_positive_rate"] = (
        round((clean_total - clean_surviving) / clean_total, 4)
        if clean_total else None
    )

    # downstream cost delta: split+pack on filtered vs unfiltered
    def split_pack_sec(frame):
        t0 = time.time()
        split = hash_split(frame, {"train": 0.98, "val": 0.01, "test": 0.01})
        sized = split.select(
            "doc_id", "split", token_count(F.col("text")).alias("n_tokens")
        )
        pack_chunked(
            sized, budget=2048, strata_cols=["split"], num_shards=8
        ).groupBy("split").agg(F.count("*")).collect()
        return round(time.time() - t0, 2)

    out["downstream_sec_filtered"] = split_pack_sec(clf_kept)
    out["downstream_sec_unfiltered"] = split_pack_sec(planted)
    return out


def main() -> None:
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(
        app_name="curation_rehearsal",
        extra_conf={
            "spark.driver.extraJavaOptions": f"-Xms{mem} -XX:+AlwaysPreTouch"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # spin the Python/Arrow worker pool outside any timed window
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    corpora: list[tuple[str, object]] = []
    args = sys.argv[1:]
    filter_variant = "--filter" in args
    natural = "--filter-natural" in args
    if natural:
        filter_variant = True
    trained_langid = "--trained-langid" in args
    args = [
        a for a in args
        if a not in ("--filter", "--filter-natural", "--trained-langid")
    ]
    if args:
        for p in args:
            corpora.append((p, spark.read.parquet(p)))
    else:
        corpora.append(
            ("sf0.1", Engine.for_dir(spark, SRC).table("documents"))
        )
        if not filter_variant and os.path.exists("/tmp/docs6x_raw.parquet"):
            corpora.append(
                ("6x", spark.read.parquet("/tmp/docs6x_raw.parquet"))
            )
    if filter_variant:
        mode = "natural" if natural else "foreign"
        for label, docs in corpora:
            warm = run_filter_variant(  # noqa: F841 — untimed warm-up
                spark, docs, label, spam_mode=mode
            )
            t0 = time.time()
            res = run_filter_variant(spark, docs, label, spam_mode=mode)
            res["total_sec"] = round(time.time() - t0, 2)
            print(json.dumps(res))
        return
    lang_model = None
    if trained_langid:
        # train once on the byte-stable fixture (sample-sized — the
        # 100-TB shape: train on the labeled sample, score the corpus)
        from knovexlite_spark.ops.langid import (
            multilingual_corpus,
            train_language_id,
        )

        t0 = time.time()
        lang_model = train_language_id(
            multilingual_corpus(spark, docs_per_lang=30), epochs=20
        )
        print(json.dumps({"langid_train_sec": round(time.time() - t0, 2)}))
    for label, docs in corpora:
        # untimed warm-up pass: codegen compile + parquet footers paid
        # here, so the timed pass measures the pipeline on a warm JVM
        # for BOTH corpora (the r5 table's cold-vs-warm trap)
        t0 = time.time()
        warm = run(spark, docs, label, lang_model=lang_model)
        warm_total = round(time.time() - t0, 2)
        t0 = time.time()
        res = run(spark, docs, label, lang_model=lang_model)
        res["total_sec"] = round(time.time() - t0, 2)
        res["warmup_total_sec"] = warm_total
        print(json.dumps(res))


if __name__ == "__main__":
    main()
