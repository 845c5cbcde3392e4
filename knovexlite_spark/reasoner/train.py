"""Distributed KGE training step: negative-sampling SGD with Spark as
the gradient all-reduce.

The reference exposes training losses but no optimizer loop
(/root/reference/knovex/reasoner/cqd.py:68-80 train_loss,
lmpnn.py:218-288 train_loss_nce/train_loss_softmax are the whole
training surface — no .step()/optimizer exists in the package), so the
analytics engine previously shipped the loss VALUES only
(reasoner/losses.py).  This module completes the story with an actual
parameter update, structured the way data-parallel KGE training has to
look on a cluster:

1. per-triple gradient contributions are computed in an Arrow-batched
   kernel against the BROADCAST parameter matrices (the model is
   catalog-sized; the triple set is the big thing),
2. contributions are reduced with ONE combinable aggregation —
   posexplode to (param, dim, val) then partial-sum-per-dimension.
   Deliberately NOT collect_list + array fold: a high-degree entity at
   100 TB would materialize millions of vectors in one group, while a
   per-dimension SUM combines map-side and never holds more than a
   scalar per (param, dim) per partition,
3. the aggregated gradient (at most |params| x dim scalars — the same
   size as the model) is collected and applied on the driver.

That is precisely the parameter-server pattern: Spark shuffles
gradients, the driver holds the (small) dense parameters.

Loss: the standard margin logsigmoid objective with uniform negative
tail corruption,

    L = -log sigmoid(gamma + s(h,r,t))
        - (1/K) * sum_k log sigmoid(-gamma - s(h,r,t'_k))

with s the model score (TransE: -||h+r-t||_p; DistMult: <h*r, t>).
Negative sampling is deterministic per (seed, h, r, t) so results are
independent of partitioning — required for tests and for Spark task
retries to be idempotent at scale.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knovexlite_spark.functions.kge import (
    ComplEx,
    ConvE,
    DistMult,
    EmbeddingStore,
    KGEModel,
    RESCAL,
    RotatE,
    SWTransE,
    TransE,
)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    e = np.exp(x[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def _log_sigmoid(x: np.ndarray) -> np.ndarray:
    # stable: log sigmoid(x) = min(x, 0) - log1p(exp(-|x|))
    return np.minimum(x, 0.0) - np.log1p(np.exp(-np.abs(x)))


def _score_and_grads(
    model: KGEModel, h: np.ndarray, r: np.ndarray, t: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Score s and (ds/dh, ds/dr, ds/dt) for a batch of embedding rows.

    Closed forms for the models whose gradients are linear-algebra
    one-liners, sort-permutation subgradients, or a fixed-network
    backward pass (TransE / DistMult / ComplEx / RotatE / RESCAL /
    SWTransE / ConvE — the complete model family; ConvE's gradient is
    w.r.t. the EMBEDDINGS with the conv/proj weights as constants,
    matching what the parameter-server step updates).  Partials come back broadcast to
    the full batch shape of their parameter (note RotatE's relation
    width is entity_width/2 — phases — so ds/dr's last dim differs from
    ds/dh's; the contribution emitter derives each width from the
    gradient itself)."""
    if isinstance(model, TransE):
        diff = h + r - t  # [B, d]
        if model.p == 2:
            nrm = np.linalg.norm(diff, axis=-1, keepdims=True)
            g = diff / np.maximum(nrm, 1e-12)  # d||diff||/d diff
            s = -nrm[..., 0]
        elif model.p == 1:
            g = np.sign(diff)
            s = -np.abs(diff).sum(axis=-1)
        else:
            raise NotImplementedError(f"TransE grad for p={model.p}")
        # s = -||diff||  =>  ds/dh = -g, ds/dr = -g, ds/dt = +g
        return s, -g, -g, g
    if isinstance(model, DistMult):
        s = np.sum(h * r * t, axis=-1)
        # each partial keeps only the broadcast shape of its two factors
        # (e.g. ds/dt = h*r stays [B,1,d] when t is [B,K,d]); expand all
        # three to the full batch shape so callers can index [:, k]
        shp = np.broadcast_shapes(h.shape, r.shape, t.shape)
        return (
            s,
            np.broadcast_to(r * t, shp),
            np.broadcast_to(h * t, shp),
            np.broadcast_to(h * r, shp),
        )
    if isinstance(model, ComplEx):
        # s = Re(<h, r, conj(t)>) over [re | im] embedding halves
        # (reference layout: complex.py:28-31); all partials are
        # elementwise complex products, so this is the same closed-form
        # family as DistMult with a re/im split
        d = h.shape[-1] // 2
        hr, hi = h[..., :d], h[..., d:]
        rr, ri = r[..., :d], r[..., d:]
        tr, ti = t[..., :d], t[..., d:]
        s = np.sum((hr * rr - hi * ri) * tr + (hr * ri + hi * rr) * ti, axis=-1)
        dh = np.concatenate([rr * tr + ri * ti, -ri * tr + rr * ti], axis=-1)
        dr = np.concatenate([hr * tr + hi * ti, -hi * tr + hr * ti], axis=-1)
        dt = np.concatenate([hr * rr - hi * ri, hr * ri + hi * rr], axis=-1)
        shp = np.broadcast_shapes(h.shape, r.shape, t.shape)
        return (
            s,
            np.broadcast_to(dh, shp),
            np.broadcast_to(dr, shp),
            np.broadcast_to(dt, shp),
        )
    if isinstance(model, RotatE):
        # s = -||rot(h, theta) - t||_2 with entity re/im halves and the
        # relation a width-d phase vector (reference rotate.py:40-115).
        # With u = rot(h) - t and g = u/||u||:
        #   ds/dt      = +g
        #   ds/dh      = -R(-theta) g      (inverse rotation of g)
        #   ds/dtheta  = g_re*rot(h)_im - g_im*rot(h)_re   (per phase)
        d = r.shape[-1]
        hr, hi = h[..., :d], h[..., d:]
        c, sn = np.cos(r), np.sin(r)
        rot_re = hr * c - hi * sn
        rot_im = hr * sn + hi * c
        u = np.concatenate([rot_re, rot_im], axis=-1) - t
        nrm = np.linalg.norm(u, axis=-1, keepdims=True)
        g = u / np.maximum(nrm, 1e-12)
        s = -nrm[..., 0]
        gr, gi = g[..., :d], g[..., d:]
        dh = -np.concatenate([gr * c + gi * sn, -gr * sn + gi * c], axis=-1)
        dr = gr * rot_im - gi * rot_re
        return s, dh, dr, g
    if isinstance(model, RESCAL):
        # s = h^T W_r t with W_r the relation's flattened d x d matrix
        # (reference rescal.py:23-26); the bilinear form's partials:
        #   ds/dh = W t,  ds/dt = h^T W,  ds/dW = h t^T (outer product)
        d = h.shape[-1]
        w = r.reshape(r.shape[:-1] + (d, d))
        wt = np.einsum("...ij,...j->...i", w, t)
        hw = np.einsum("...i,...ij->...j", h, w)
        s = np.sum(hw * t, axis=-1)
        outer = h[..., :, None] * t[..., None, :]
        dr = outer.reshape(outer.shape[:-2] + (d * d,))
        eshp = np.broadcast_shapes(h.shape, t.shape)
        return (
            s,
            np.broadcast_to(wt, eshp),
            np.broadcast_to(dr, eshp[:-1] + (d * d,)),
            np.broadcast_to(hw, eshp),
        )
    if isinstance(model, SWTransE):
        # s = -sum_dims ||sort(est_dim) - sort(t_dim)||_p over particle
        # sets, est = particles(h) + r per dimension (reference
        # swtranse.py:40-68).  Piecewise smooth: away from particle
        # ties the sort permutations are locally constant, so the
        # subgradient is the p-norm gradient mapped back through each
        # side's argsort (scatter = inverse permutation).
        P = model.num_particles
        hp = h.reshape(h.shape[:-1] + (-1, P))
        tp = t.reshape(t.shape[:-1] + (-1, P))
        est = hp + r[..., None]
        ia = np.argsort(est, axis=-1, kind="stable")
        ib = np.argsort(tp, axis=-1, kind="stable")
        a = np.take_along_axis(est, ia, axis=-1)
        b = np.take_along_axis(tp, ib, axis=-1)
        diff = a - b  # broadcasts [B,1,dims,P] vs [B,K,dims,P]
        if model.p == 2:
            nrm = np.linalg.norm(diff, axis=-1, keepdims=True)
            g = diff / np.maximum(nrm, 1e-12)
            s = -nrm[..., 0].sum(axis=-1)
        elif model.p == 1:
            g = np.sign(diff)
            s = -np.abs(diff).sum(axis=-1).sum(axis=-1)
        else:
            raise NotImplementedError(f"SWTransE grad for p={model.p}")
        full = np.broadcast_shapes(est.shape, tp.shape)
        # ds/d est = -(g scattered back through ia); ds/d tp = +scatter(ib)
        d_est = np.zeros(full)
        np.put_along_axis(d_est, np.broadcast_to(ia, full), -np.broadcast_to(g, full), axis=-1)
        d_tp = np.zeros(full)
        np.put_along_axis(d_tp, np.broadcast_to(ib, full), np.broadcast_to(g, full), axis=-1)
        dh = d_est.reshape(full[:-2] + (-1,))
        dt = d_tp.reshape(full[:-2] + (-1,))
        dr = d_est.sum(axis=-1)  # est = hp + r[..., None]: sum particles
        return s, dh, dr, dt
    if isinstance(model, ConvE):
        # ds/d(embeddings) for the FIXED network — the training step
        # updates EMBEDDINGS; conv/proj weights are model constants in
        # this parameter-server design (they'd be driver-side state,
        # not shuffled contributions).  Standard backward through
        # dot -> ReLU -> linear -> ReLU -> 3x3 valid conv -> stack;
        # the bias slot (dim 0) is dropped in the forward, so its
        # gradient is exactly 0.  ReLU masks use the strict >0
        # convention; the forward mirrors ConvE.estimate_tail
        # (functions/kge.py) shape for shape.
        D = h.shape[-1]
        full = np.broadcast_shapes(h.shape, r.shape, t.shape)
        hb = np.broadcast_to(h, full).reshape(-1, D)
        rb = np.broadcast_to(r, full).reshape(-1, D)
        tb = np.broadcast_to(t, full).reshape(-1, D)
        n = hb.shape[0]
        hh, ww = model.h, model.w
        x = np.concatenate(
            [hb[:, 1:].reshape(n, hh, ww), rb[:, 1:].reshape(n, hh, ww)],
            axis=1,
        )
        win = np.lib.stride_tricks.sliding_window_view(x, (3, 3), axis=(1, 2))
        conv = np.einsum("bhwij,cij->bchw", win, model.conv_w) + model.conv_b[
            None, :, None, None
        ]
        conv_mask = conv > 0
        flat = np.where(conv_mask, conv, 0.0).reshape(n, -1)
        proj = flat @ model.proj_w.T + model.proj_b
        proj_mask = proj > 0
        est = np.concatenate(
            [np.ones((n, 1)), np.where(proj_mask, proj, 0.0)], axis=1
        )
        s = np.sum(est * tb, axis=-1)
        g_proj = tb[:, 1:] * proj_mask
        g_conv = (g_proj @ model.proj_w).reshape(conv.shape) * conv_mask
        # transposed conv back to the stacked input: full correlation of
        # the zero-padded output gradient with the flipped kernel
        gp = np.pad(g_conv, ((0, 0), (0, 0), (2, 2), (2, 2)))
        gwin = np.lib.stride_tricks.sliding_window_view(gp, (3, 3), axis=(2, 3))
        g_x = np.einsum("bchwij,cij->bhw", gwin, model.conv_w[:, ::-1, ::-1])
        zero = np.zeros((n, 1))
        dh = np.concatenate([zero, g_x[:, :hh, :].reshape(n, -1)], axis=1)
        dr = np.concatenate([zero, g_x[:, hh:, :].reshape(n, -1)], axis=1)
        return (
            s.reshape(full[:-1]),
            dh.reshape(full),
            dr.reshape(full),
            est.reshape(full),  # ds/dt = est
        )
    raise NotImplementedError(
        f"analytic gradient not implemented for model {model.name!r}"
    )


@dataclass
class StepResult:
    store: EmbeddingStore
    loss: float
    n_triples: int


def grad_contributions(
    triples: DataFrame,
    model: KGEModel,
    store: EmbeddingStore,
    gamma: float = 2.0,
    num_negatives: int = 8,
    seed: int = 0,
    _bcast: tuple | None = None,
) -> DataFrame:
    """Per-dimension gradient contributions as a DataFrame
    ``(kind, id, dim, val)`` with kind 'e' (entity), 'r' (relation) or
    'l' (loss accumulator: id=0, dim=0 sum / dim=1 count).

    The output is agg-ready: every row is one scalar contribution, so
    the reduction downstream is a plain combinable SUM.  All arithmetic
    runs in float64 so the reported loss/gradients are insensitive (to
    ~1e-12) to how triples are batched across partitions.

    ``_bcast`` lets ``train_step`` own the broadcast lifetime (create,
    run the job, destroy) so multi-epoch training does not leak one
    model-sized broadcast pair per epoch on the executors.
    """
    spark = triples.sparkSession
    if _bcast is not None:
        b_ent, b_rel = _bcast
    else:
        b_ent = spark.sparkContext.broadcast(store.ent)
        b_rel = spark.sparkContext.broadcast(store.rel)
    n_ent = store.ent.shape[0]

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ent = b_ent.value
        rel = b_rel.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            hids = pdf["h"].to_numpy(np.int64)
            rids = pdf["r"].to_numpy(np.int64)
            tids = pdf["t"].to_numpy(np.int64)
            B = len(hids)

            # deterministic per-triple negative tails: the stream is a
            # function of (seed, h, r, t), so partitioning and task
            # retries cannot change the sample
            row_key = (
                hids * np.int64(1000003)
                ^ rids * np.int64(998244353)
                ^ tids * np.int64(786433)
            ) + np.int64(seed) * np.int64(2654435761)
            negs = np.empty((B, num_negatives), dtype=np.int64)
            for i in range(B):
                negs[i] = np.random.default_rng(
                    np.uint64(row_key[i])
                ).integers(0, n_ent, size=num_negatives)

            h = ent[hids].astype(np.float64)
            r = rel[rids].astype(np.float64)
            t = ent[tids].astype(np.float64)

            s_pos, dh_p, dr_p, dt_p = _score_and_grads(model, h, r, t)
            # dL/ds_pos for -logsigmoid(gamma + s): sigmoid(gamma+s) - 1
            c_pos = (_sigmoid(gamma + s_pos) - 1.0)[:, None]

            # negatives: broadcast h,r against [B, K, d] corrupted tails
            tn = ent[negs].astype(np.float64)  # [B, K, d]
            s_neg, dh_n, dr_n, dt_n = _score_and_grads(
                model, h[:, None, :], r[:, None, :], tn
            )
            # dL/ds_neg for -(1/K) logsigmoid(-gamma - s): sigmoid(gamma+s)/K
            c_neg = (_sigmoid(gamma + s_neg) / num_negatives)[..., None]

            loss = -_log_sigmoid(gamma + s_pos) - np.mean(
                _log_sigmoid(-gamma - s_neg), axis=-1
            )

            # accumulate (kind, id, dim, val) scalar contributions
            kinds: list[np.ndarray] = []
            ids: list[np.ndarray] = []
            dims: list[np.ndarray] = []
            vals: list[np.ndarray] = []

            def emit(kind: str, id_arr: np.ndarray, grad: np.ndarray) -> None:
                # grad: [B, w] -> B*w scalar rows; width comes from the
                # gradient itself (RotatE relation width != entity width)
                grad = np.asarray(grad, dtype=np.float64)
                w = grad.shape[-1]
                kinds.append(np.full(B * w, kind, dtype=object))
                ids.append(np.repeat(id_arr, w))
                dims.append(np.tile(np.arange(w, dtype=np.int64), B))
                vals.append(grad.ravel())

            emit("e", hids, c_pos * dh_p + (c_neg * dh_n).sum(axis=1))
            emit("r", rids, c_pos * dr_p + (c_neg * dr_n).sum(axis=1))
            emit("e", tids, c_pos * dt_p)
            # corrupted tails get only their own negative-term gradient
            for k in range(num_negatives):
                emit("e", negs[:, k], c_neg[:, k] * dt_n[:, k])

            out = pd.DataFrame(
                {
                    "kind": np.concatenate(kinds),
                    "id": np.concatenate(ids),
                    "dim": np.concatenate(dims),
                    "val": np.concatenate(vals).astype(np.float64),
                }
            )
            # loss accumulator rows (sum + count) for exact mean loss
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {
                            "kind": ["l", "l"],
                            "id": [0, 0],
                            "dim": [0, 1],
                            "val": [float(loss.sum()), float(B)],
                        }
                    ),
                ],
                ignore_index=True,
            )
            yield out

    return triples.select("h", "r", "t").mapInPandas(
        kernel, schema="kind string, id long, dim long, val double"
    )


def train_step(
    triples: DataFrame,
    model: KGEModel,
    store: EmbeddingStore,
    lr: float = 0.05,
    gamma: float = 2.0,
    num_negatives: int = 8,
    seed: int = 0,
) -> StepResult:
    """One full-batch SGD step over the triple set; returns the updated
    store and the mean loss BEFORE the step (the quantity the step
    descends on)."""
    sc = triples.sparkSession.sparkContext
    b_ent = sc.broadcast(store.ent)
    b_rel = sc.broadcast(store.rel)
    try:
        contribs = grad_contributions(
            triples,
            model,
            store,
            gamma=gamma,
            num_negatives=num_negatives,
            seed=seed,
            _bcast=(b_ent, b_rel),
        )
        # ONE combinable aggregation: partial sums per (kind, id, dim) on
        # the map side, one shuffle of at-most-|params|*dim keys.  The
        # result is parameter-sized (|touched entities|*dim rows), which
        # at KG scale is millions of rows — fetch it through Arrow and
        # scatter with vectorized fancy indexing; a Row loop over a
        # .collect() list was the driver bottleneck at the 6x rehearsal.
        agg = (
            contribs.groupBy("kind", "id", "dim")
            .agg(F.sum("val").alias("g"))
            .toPandas()
        )
    finally:
        # the job is done once toPandas() returns; a multi-epoch train()
        # would otherwise leak one model-sized broadcast pair per epoch
        b_ent.destroy()
        b_rel.destroy()
    g_ent = np.zeros_like(store.ent, dtype=np.float64)
    g_rel = np.zeros_like(store.rel, dtype=np.float64)
    kind = agg["kind"].to_numpy()
    ids = agg["id"].to_numpy()
    dims = agg["dim"].to_numpy()
    gs = agg["g"].to_numpy()
    e_m = kind == "e"
    r_m = kind == "r"
    # post-groupBy keys are unique, so plain fancy-index assignment is a
    # well-defined scatter (no duplicate-index last-writer ambiguity)
    g_ent[ids[e_m], dims[e_m]] = gs[e_m]
    g_rel[ids[r_m], dims[r_m]] = gs[r_m]
    l_m = ~(e_m | r_m)
    loss_sum = float(gs[l_m & (dims == 0)].sum())
    n = float(gs[l_m & (dims == 1)].sum())
    n = max(n, 1.0)
    new = EmbeddingStore(
        (store.ent - lr * (g_ent / n)).astype(np.float32),
        (store.rel - lr * (g_rel / n)).astype(np.float32),
    )
    return StepResult(store=new, loss=loss_sum / n, n_triples=int(n))


def train(
    triples: DataFrame,
    model: KGEModel,
    store: EmbeddingStore,
    epochs: int = 5,
    lr: float = 0.05,
    gamma: float = 2.0,
    num_negatives: int = 8,
    seed: int = 0,
) -> tuple[EmbeddingStore, list[float]]:
    """Full-batch gradient descent for a few epochs; returns the final
    store and the per-epoch loss trace (loss BEFORE each step).  Varying
    the negative-sample seed per epoch matches standard practice."""
    losses: list[float] = []
    for e in range(epochs):
        res = train_step(
            triples,
            model,
            store,
            lr=lr,
            gamma=gamma,
            num_negatives=num_negatives,
            seed=seed + e,
        )
        store = res.store
        losses.append(res.loss)
    return store, losses
