"""Similarity search over an embedding column (``list<float>``).

- brute_force_topk: the exact baseline — numpy matmul per batch against a
  BROADCAST query matrix (``ray.put`` once, read per actor in __init__),
  per-batch local top-k then a tiny global top-k merge. The big side
  streams; only (query_id, vec_id, score) candidate rows leave each batch
  (k per query per batch).
- ivf_topk: the scale path — a one-pass sampled k-means coarse quantizer
  (trained driver-side on a sample), assign inside map_batches, probe only
  the closest ``nprobe`` cells. Same output contract, approximate recall.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray



def _as_matrix(vecs) -> np.ndarray:
    m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def _brute_force_batch(batch: pa.Table, *, queries_ref, vec_col: str,
                       id_col: str, k: int) -> pa.Table:
    from ..util import worker_cached
    q = worker_cached(("annq", queries_ref.hex()),
                      lambda: ray.get(queries_ref))
    Q, qids = q["matrix"], q["ids"]          # (nq, dim), unit rows
    V = _as_matrix(batch.column(vec_col).to_pylist())
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    sim = Q @ V.T                            # (nq, nb)
    k = min(k, sim.shape[1])
    # local top-k per query (argpartition, then exact merge later)
    part = np.argpartition(-sim, k - 1, axis=1)[:, :k]
    out_q, out_id, out_s = [], [], []
    for qi in range(sim.shape[0]):
        cols = part[qi]
        out_q.append(np.full(k, qids[qi]))
        out_id.append(ids[cols])
        out_s.append(sim[qi, cols])
    return pa.table({
        "query_id": pa.array(np.concatenate(out_q)),
        id_col: pa.array(np.concatenate(out_id)),
        "score": pa.array(np.concatenate(out_s)),
    })


def _merge_topk(candidates: pd.DataFrame, id_col: str, k: int) -> \
        pd.DataFrame:
    """Global merge of per-batch candidates: exact top-k per query with a
    deterministic (score desc, id asc) tie-break."""
    outs = []
    for qid, g in candidates.groupby("query_id", sort=False):
        g = g.sort_values(["score", id_col],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        outs.append(g)
    return pd.concat(outs, ignore_index=True)


def brute_force_topk(ds, queries, query_ids=None, vec_col: str = "embedding",
                     id_col: str = "vec_id", k: int = 10,
                     batch_size: int = 65536) -> pd.DataFrame:
    """Exact cosine top-k: → pandas ``(query_id, vec_id, score, rank)``
    (small result: nq × k rows)."""
    Q = _as_matrix(queries)
    qids = np.asarray(query_ids if query_ids is not None
                      else np.arange(len(Q)))
    import functools
    ref = ray.put({"matrix": Q, "ids": qids})
    cand = ds.select_columns([id_col, vec_col]).map_batches(
        functools.partial(_brute_force_batch, queries_ref=ref,
                          vec_col=vec_col, id_col=id_col, k=k),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size).to_pandas()
    return _merge_topk(cand, id_col, k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant


def _kmeans(X: np.ndarray, ncells: int, iters: int = 10,
            seed: int = 5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(ncells, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)  # cosine on unit vectors
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[c] = v / n
    return C


def _ivf_batch(batch: pa.Table, *, state_ref, vec_col: str, id_col: str,
               k: int, nprobe: int) -> pa.Table:
    from ..util import worker_cached

    def setup():
        st = ray.get(state_ref)
        C, Q, qids = st["centroids"], st["matrix"], st["ids"]
        probe = {qi: np.argsort(-(Q[qi] @ C.T))[:nprobe]
                 for qi in range(len(Q))}
        return C, Q, qids, probe

    C, Q, qids, probe = worker_cached(("ivf", state_ref.hex(), nprobe),
                                      setup)
    V = _as_matrix(batch.column(vec_col).to_pylist())
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    cell = np.argmax(V @ C.T, axis=1)
    out_q, out_id, out_s = [], [], []
    for qi in range(len(Q)):
        sel = np.isin(cell, probe[qi])
        if not sel.any():
            continue
        sims = Q[qi] @ V[sel].T
        kk = min(k, len(sims))
        idx = np.argpartition(-sims, kk - 1)[:kk]
        out_q.append(np.full(kk, qids[qi]))
        out_id.append(ids[sel][idx])
        out_s.append(sims[idx])
    if not out_q:
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         id_col: pa.array([], type=pa.int64()),
                         "score": pa.array([], type=pa.float64())})
    return pa.table({
        "query_id": pa.array(np.concatenate(out_q)),
        id_col: pa.array(np.concatenate(out_id)),
        "score": pa.array(np.concatenate(out_s)),
    })


def ivf_topk(ds, queries, query_ids=None, vec_col: str = "embedding",
             id_col: str = "vec_id", k: int = 10, ncells: int = 64,
             nprobe: int = 8, train_sample: int = 20000,
             batch_size: int = 65536) -> pd.DataFrame:
    """Approximate cosine top-k via IVF coarse quantization. Trains the
    quantizer on a driver-side sample (one small read), then streams."""
    sample = ds.select_columns([vec_col]).limit(train_sample).to_pandas()
    X = _as_matrix(sample[vec_col].to_numpy())
    C = _kmeans(X, ncells)
    Q = _as_matrix(queries)
    qids = np.asarray(query_ids if query_ids is not None
                      else np.arange(len(Q)))
    import functools
    ref = ray.put({"centroids": C, "matrix": Q, "ids": qids})
    cand = ds.select_columns([id_col, vec_col]).map_batches(
        functools.partial(_ivf_batch, state_ref=ref, vec_col=vec_col,
                          id_col=id_col, k=k, nprobe=nprobe),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size).to_pandas()
    return _merge_topk(cand, id_col, k)
