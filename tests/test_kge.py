"""KGE kernel math + Spark scoring operators (SURVEY §2.6)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from knovexlite_spark.functions.kge import (
    ComplEx,
    DistMult,
    EmbeddingStore,
    RESCAL,
    RotatE,
    SWTransE,
    TransE,
    inverse_relation_ids,
    rank_of_tails,
    score_all_tails,
    score_triples,
)
from knovexlite_spark.functions.tnorm import TNorm

RNG = np.random.default_rng(7)


def test_transe_kernel():
    h, r, t = RNG.normal(size=(3, 8)).astype(np.float32)
    m = TransE(p=2)
    assert np.isclose(m.score(h, r, t), -np.linalg.norm(h + r - t))
    assert np.allclose(m.estimate_tail(h, r), h + r)


def test_complex_kernel_matches_complex_arithmetic():
    d = 4
    h, r, t = RNG.normal(size=(3, 2 * d)).astype(np.float32)
    hc = h[:d] + 1j * h[d:]
    rc = r[:d] + 1j * r[d:]
    tc = t[:d] + 1j * t[d:]
    est = ComplEx().estimate_tail(h, r)
    assert np.allclose(est[:d] + 1j * est[d:], hc * rc, atol=1e-5)
    # score = Re(<h∘r, t>) under the [re|im] dot convention
    assert np.isclose(
        ComplEx().score(h, r, t), np.sum((hc * rc).real * tc.real + (hc * rc).imag * tc.imag),
        atol=1e-5,
    )


def test_rotate_rotation_preserves_norm():
    d = 4
    h = RNG.normal(size=2 * d).astype(np.float32)
    phase = RNG.uniform(-np.pi, np.pi, size=d).astype(np.float32)
    est = RotatE().estimate_tail(h, phase)
    hm = np.hypot(h[:d], h[d:])
    em = np.hypot(est[:d], est[d:])
    assert np.allclose(hm, em, atol=1e-5)
    # estimate_head inverts estimate_tail
    back = RotatE().estimate_head(est, phase)
    assert np.allclose(back, h, atol=1e-5)


def test_rescal_bilinear():
    d = 3
    h, t = RNG.normal(size=(2, d)).astype(np.float32)
    w = RNG.normal(size=(d, d)).astype(np.float32)
    s = RESCAL().score(h, w.reshape(-1), t)
    assert np.isclose(s, h @ w @ t, atol=1e-5)


def test_swtranse_sorted_particles():
    m = SWTransE(num_particles=2, p=2)
    # one dim, two particles; sets {1,3} and {3,1} are equal -> distance 0
    h = np.array([1.0, 3.0], dtype=np.float32)
    t = np.array([3.0, 1.0], dtype=np.float32)
    r = np.zeros(1, dtype=np.float32)
    assert np.isclose(m.score(h, r, t), 0.0)


def test_inverse_relation_ids():
    assert inverse_relation_ids(np.array([0, 1, 4, 7])).tolist() == [1, 0, 5, 6]


@pytest.mark.parametrize(
    "model", [TransE(), DistMult(), ComplEx(), RotatE(), RESCAL(), SWTransE(num_particles=4)]
)
def test_score_all_consistent_with_score(model):
    n, d = 6, 4
    # entity width: 2d for the complex/particle models, d otherwise
    if isinstance(model, (ComplEx, RotatE, SWTransE)):
        ent = RNG.normal(size=(n, 2 * d)).astype(np.float32)
    else:
        ent = RNG.normal(size=(n, d)).astype(np.float32)
    # relation width per model convention
    if isinstance(model, RotatE):
        rel = RNG.uniform(-np.pi, np.pi, size=(3, d)).astype(np.float32)
    elif isinstance(model, RESCAL):
        rel = RNG.normal(size=(3, d * d)).astype(np.float32)
    elif isinstance(model, ComplEx):
        rel = RNG.normal(size=(3, 2 * d)).astype(np.float32)
    elif isinstance(model, SWTransE):
        rel = RNG.normal(size=(3, 2 * d // model.num_particles)).astype(np.float32)
    else:
        rel = RNG.normal(size=(3, d)).astype(np.float32)
    heads = ent[[0, 1]]
    rels = rel[[0, 1]]
    block = model.score_all(heads, rels, ent)
    assert block.shape == (2, n)
    for b in range(2):
        for j in range(n):
            assert np.isclose(
                block[b, j], model.score(heads[b], rels[b], ent[j]), atol=1e-4
            ), (type(model).__name__, b, j)


def test_spark_score_triples_matches_numpy(spark):
    store = EmbeddingStore.xavier(num_entities=20, num_relations=6, ent_dim=8, seed=1)
    model = TransE()
    rows = [(int(h), int(r), int(t)) for h, r, t in RNG.integers(0, [20, 6, 20], size=(30, 3))]
    df = spark.createDataFrame(rows, schema="h long, r long, t long")
    got = {
        (x["h"], x["r"], x["t"]): x["score"]
        for x in score_triples(df, model, store).collect()
    }
    for h, r, t in rows:
        want = model.score(store.ent[h], store.rel[r], store.ent[t])
        assert np.isclose(got[(h, r, t)], want, atol=1e-4)


def test_spark_score_all_tails_negation(spark):
    store = EmbeddingStore.xavier(num_entities=10, num_relations=4, ent_dim=6, seed=2)
    model = DistMult()
    df = spark.createDataFrame(
        [(3, 1, True, 0.5)], schema="h long, r long, neg boolean, acc double"
    )
    out = {r["t"]: r["score"] for r in score_all_tails(df, model, store, neg_col="neg", acc_col="acc").collect()}
    assert len(out) == 10
    for t in range(10):
        want = -model.score(store.ent[3], store.rel[1], store.ent[t]) + 0.5
        assert np.isclose(out[t], want, atol=1e-4)


def test_spark_rank_of_tails(spark):
    store = EmbeddingStore.xavier(num_entities=12, num_relations=2, ent_dim=4, seed=3)
    model = DistMult()
    df = spark.createDataFrame([(0, 1, 5), (2, 0, 7)], schema="h long, r long, t long")
    got = {(r["h"], r["r"], r["t"]): r["rank"] for r in rank_of_tails(df, model, store).collect()}
    for (h, r, t), rank in got.items():
        scores = model.score_all(store.ent[[h]], store.rel[[r]], store.ent)[0]
        assert rank == int(np.sum(scores > scores[t]))


def test_tnorm_grouped_product(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (1, 0.4), (2, 0.9), (2, 0.0)], schema="g long, x double"
    )
    tn = TNorm.get("product")
    got = {
        r["g"]: r["p"]
        for r in df.groupBy("g").agg(tn.conj_agg(F.col("x")).alias("p")).collect()
    }
    assert np.isclose(got[1], 0.2)
    assert got[2] == 0.0
    gd = TNorm.get("godel")
    got = {
        r["g"]: r["p"]
        for r in df.groupBy("g").agg(gd.conj_agg(F.col("x")).alias("p")).collect()
    }
    assert np.isclose(got[1], 0.4) and got[2] == 0.0


def test_conve_forward_shapes_and_determinism(spark):
    from knovexlite_spark.functions.kge import ConvE

    m = ConvE(embedding_dim=33, seed=3)
    h = RNG.normal(size=(4, 33)).astype(np.float32)
    r = RNG.normal(size=(4, 33)).astype(np.float32)
    t = RNG.normal(size=(4, 33)).astype(np.float32)
    est = m.estimate_tail(h, r)
    assert est.shape == (4, 33)
    assert np.allclose(est[:, 0], 1.0)  # constant bias feature
    assert np.all(est[:, 1:] >= 0)  # post-ReLU
    # deterministic
    assert np.allclose(ConvE(embedding_dim=33, seed=3).estimate_tail(h, r), est)
    # score_all consistency
    ents = RNG.normal(size=(6, 33)).astype(np.float32)
    block = m.score_all(h[:2], r[:2], ents)
    for b in range(2):
        for j in range(6):
            assert np.isclose(block[b, j], m.score(h[b], r[b], ents[j]), atol=1e-4)
    # bad dimension rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ConvE(embedding_dim=30)


def test_conve_spark_scoring(spark):
    from knovexlite_spark.functions.kge import ConvE, EmbeddingStore

    store = EmbeddingStore.xavier(num_entities=10, num_relations=4, ent_dim=33, seed=9)
    m = ConvE(embedding_dim=33, seed=9)
    df = spark.createDataFrame([(1, 0, 2), (3, 1, 4)], "h long, r long, t long")
    got = {(r_["h"], r_["r"], r_["t"]): r_["score"] for r_ in score_triples(df, m, store).collect()}
    for (h, r, t), s in got.items():
        assert np.isclose(s, m.score(store.ent[h], store.rel[r], store.ent[t]), atol=1e-4)


def test_grouped_max_expansion_equals_unfused(spark):
    """score_all_tails_grouped_max + merge == score_all_tails + groupBy
    max (the J2+A1 fusion must be a pure plan optimization)."""
    import numpy as np
    from pyspark.sql import functions as F

    from knovexlite_spark.functions.kge import (
        EmbeddingStore,
        TransE,
        score_all_tails,
        score_all_tails_grouped_max,
    )

    store = EmbeddingStore.xavier(12, 4, ent_dim=6, seed=9)
    rows = [(q, h, r, False, float(a)) for q, h, r, a in
            [(0, 1, 0, 0.0), (0, 2, 1, -0.5), (0, 3, 0, 1.5),
             (1, 4, 2, 0.0), (1, 5, 3, 2.0)]]
    df = spark.createDataFrame(
        rows, schema="query_id long, h long, r long, neg boolean, acc double"
    ).repartition(3)
    unfused = (
        score_all_tails(df, TransE(), store, acc_col="acc", neg_col="neg",
                        keep_cols=("query_id",))
        .groupBy("query_id", "t").agg(F.max("score").alias("score"))
    )
    fused = (
        score_all_tails_grouped_max(df, TransE(), store, acc_col="acc",
                                    neg_col="neg", group_cols=("query_id",))
        .groupBy("query_id", "t").agg(F.max("score").alias("score"))
    )
    a = {(r["query_id"], r["t"]): r["score"] for r in unfused.collect()}
    b = {(r["query_id"], r["t"]): r["score"] for r in fused.collect()}
    assert a.keys() == b.keys()
    assert all(np.isclose(a[k], b[k], atol=1e-9) for k in a)


def test_sharded_expansion_equals_grouped_max(spark):
    """Entity-axis sharding (no whole-matrix broadcast) must be a pure
    distribution change: merged shard partials == the single-broadcast
    grouped-max path, across uneven shard boundaries."""
    import numpy as np
    from pyspark.sql import functions as F

    from knovexlite_spark.functions.kge import (
        EmbeddingStore,
        RotatE,
        score_all_tails_grouped_max,
        score_all_tails_sharded,
    )

    store = EmbeddingStore.xavier(13, 4, ent_dim=8, rel_dim=4, seed=21)
    rows = [(0, 1, 0, False, 0.0), (0, 2, 1, True, -1.0),
            (1, 3, 2, False, 0.5), (1, 4, 3, False, 0.0)]
    df = spark.createDataFrame(
        rows, schema="query_id long, h long, r long, neg boolean, acc double"
    ).repartition(2)
    base = (
        score_all_tails_grouped_max(df, RotatE(), store, acc_col="acc",
                                    neg_col="neg")
        .groupBy("query_id", "t").agg(F.max("score").alias("score"))
    )
    a = {(r["query_id"], r["t"]): r["score"] for r in base.collect()}
    # overlap sweep: serial, the default 2-way, and full fan-out must
    # all be pure distribution changes (round-6 concurrent shard jobs)
    for overlap in (1, 2, 4):
        shard = (
            score_all_tails_sharded(df, RotatE(), store, n_shards=3,
                                    acc_col="acc", neg_col="neg",
                                    overlap=overlap)
            .groupBy("query_id", "t").agg(F.max("score").alias("score"))
        )
        b = {(r["query_id"], r["t"]): r["score"] for r in shard.collect()}
        assert a.keys() == b.keys(), overlap
        assert all(np.isclose(a[k], b[k], atol=1e-6) for k in a), overlap


# --------------------------------------- quantized scoring (round 7)


def test_score_all_tails_quantized_close_and_rank_stable(spark):
    """quantized=True: scores within the int8 reconstruction bound of
    the exact path, and the per-row argmax (the decision every
    consumer aggregates toward) matches on a comfortable margin."""
    import numpy as np

    from knovexlite_spark.functions.kge import (
        EmbeddingStore,
        TransE,
        score_all_tails,
    )

    store = EmbeddingStore.xavier(60, 4, 16, seed=3)
    model = TransE()
    df = spark.createDataFrame(
        [(i % 60, i % 4, i) for i in range(20)], "h long, r long, query_id long"
    )
    exact = score_all_tails(
        df, model, store, keep_cols=("query_id",)
    ).toPandas()
    quant = score_all_tails(
        df, model, store, keep_cols=("query_id",), quantized=True
    ).toPandas()
    e = exact.sort_values(["query_id", "t"]).reset_index(drop=True)
    q = quant.sort_values(["query_id", "t"]).reset_index(drop=True)
    assert (e[["query_id", "t"]].values == q[["query_id", "t"]].values).all()
    # TransE distance scores move by at most the L1 mass of the
    # per-component error (<= d * max_scale/2, far below 1 here)
    assert np.abs(e["score"].values - q["score"].values).max() < 0.5
    # argmax per query matches between paths
    am_e = e.loc[e.groupby("query_id")["score"].idxmax()]["t"].tolist()
    am_q = q.loc[q.groupby("query_id")["score"].idxmax()]["t"].tolist()
    agree = sum(a == b for a, b in zip(am_e, am_q))
    assert agree >= len(am_e) - 1  # near-ties may flip at most one


def test_score_all_tails_sharded_quantized_matches_unsharded_quantized(spark):
    """The sharded quantized path slices the SAME int8 matrix as the
    whole-matrix quantized path, but its HEAD vectors stay float (they
    come from ent_df, the scale contract) while the whole-matrix path
    gathers dequantized heads — so scores agree within the head
    reconstruction bound, not bit-exactly."""
    from pyspark.sql import functions as F

    from knovexlite_spark.functions.kge import (
        EmbeddingStore,
        TransE,
        score_all_tails,
        score_all_tails_sharded,
    )

    store = EmbeddingStore.xavier(40, 3, 8, seed=5)
    model = TransE()
    df = spark.createDataFrame(
        [(i % 40, i % 3, i) for i in range(8)], "h long, r long, query_id long"
    )
    whole = (
        score_all_tails(df, model, store, keep_cols=("query_id",), quantized=True)
        .groupBy("query_id", "t")
        .agg(F.max("score").alias("score"))
        .toPandas()
        .sort_values(["query_id", "t"])
        .reset_index(drop=True)
    )
    sharded = (
        score_all_tails_sharded(
            df, model, store, n_shards=3, quantized=True, overlap=2
        )
        .groupBy("query_id", "t")
        .agg(F.max("score").alias("score"))
        .toPandas()
        .sort_values(["query_id", "t"])
        .reset_index(drop=True)
    )
    assert (whole[["query_id", "t"]].values == sharded[["query_id", "t"]].values).all()
    import numpy as np

    assert np.abs(whole["score"].values - sharded["score"].values).max() < 0.01


def test_ent_quantized_shape_and_bound():
    import numpy as np

    from knovexlite_spark.functions.kge import EmbeddingStore

    store = EmbeddingStore.xavier(30, 2, 12, seed=7)
    q, s = store.ent_quantized()
    assert q.dtype == np.int8 and s.dtype == np.float32
    assert q.shape == store.ent.shape and s.shape == (30,)
    deq = q.astype(np.float32) * s[:, None]
    assert np.abs(deq - store.ent).max() <= (s.max() / 2) + 1e-7
    # 4x memory: int8 matrix + one float scale per row
    assert q.nbytes == store.ent.nbytes // 4
    # cached: same object back
    assert store.ent_quantized()[0] is q
