"""Similarity search over an embedding column (``list<float>``).

- brute_force_topk: the exact baseline — numpy matmul per batch against a
  BROADCAST query matrix (``ray.put`` once, read per actor in __init__),
  per-batch local top-k then a tiny global top-k merge. The big side
  streams; only (query_id, vec_id, score) candidate rows leave each batch
  (k per query per batch).
- IvfIndex: the scale path — a coarse k-means quantizer trained on a
  RANDOM sample, the corpus materialized ONCE as cell-partitioned parquet
  (``cell=<c>/`` directories); a probe reads only the ``nprobe`` closest
  cells' files, so probe I/O is ~nprobe/ncells of the corpus.
- ivf_topk: index-free IVF over one full stream (saves dot products, not
  I/O) — kept for one-shot queries where building the index doesn't pay.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def embedding_matrix(col) -> np.ndarray:
    """Zero-copy-ish (n, dim) float64 matrix from a ``list<float>`` /
    ``fixed_size_list<float>`` column: flatten → reshape, no per-row
    Python objects. Null or ragged rows are a ValueError."""
    import pyarrow.compute as pc
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if col.null_count:
        raise ValueError("embedding column has null rows")
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        flat = pc.list_flatten(col)
    else:
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        dim = int(lens[0]) if n else 0
        if n and not (lens == dim).all():
            raise ValueError("ragged embedding column")
        flat = pc.list_flatten(col)
    return flat.to_numpy(zero_copy_only=False) \
        .reshape(n, dim).astype(np.float64, copy=False)


def _unit_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def _as_matrix(vecs) -> np.ndarray:
    if isinstance(vecs, (pa.Array, pa.ChunkedArray)):
        return _unit_rows(embedding_matrix(vecs))
    if len(vecs) == 0:  # np.stack([]) raises; empty query/vector sets are legal
        return np.zeros((0, 0), dtype=np.float64)
    return _unit_rows(np.stack([np.asarray(v, dtype=np.float64)
                                for v in vecs]))


def _local_topk(row: np.ndarray, ids: np.ndarray, k: int):
    """Deterministic batch-local top-k of one query's score row: rows
    strictly above the k-th score kept as-is, boundary ties filled with
    the SMALLEST ids — so the local survivors are a superset of the
    global (score desc, id asc) winners regardless of batch/block
    boundaries. Returns (ids, scores) of ≤ k rows."""
    finite = ~np.isnan(row)
    if not finite.all():
        # a NaN score inside the k-window would make every comparison
        # below false and silently discard the whole batch's candidates
        row, ids = row[finite], ids[finite]
    kk = min(k, len(row))
    if kk <= 0:
        return ids[:0], row[:0]
    part = np.argpartition(-row, kk - 1)[:kk]
    skth = row[part].min()
    above = np.nonzero(row > skth)[0]
    ties = np.nonzero(row == skth)[0]
    need = kk - len(above)
    sel_t = ties[np.argsort(ids[ties], kind="stable")[:need]]
    cols = np.concatenate([above, sel_t])
    return ids[cols], row[cols]


def _qid_type(qids: np.ndarray) -> pa.DataType:
    return pa.array(qids[:1]).type if len(qids) else pa.int64()


def _result_table(out_q: list, out_id: list, out_s: list, *,
                  id_type: pa.DataType, qids: np.ndarray,
                  id_col: str) -> pa.Table:
    """Candidate rows with SCHEMA-STABLE types: the id column always uses
    the batch's real id type and query_id the queries' type, so empty and
    non-empty blocks unify (string/large_string ids included)."""
    qt = _qid_type(qids)
    if not out_q:
        return pa.table({"query_id": pa.array([], type=qt),
                         id_col: pa.array([], type=id_type),
                         "score": pa.array([], type=pa.float64())})
    return pa.table({
        "query_id": pa.array(np.concatenate(out_q), type=qt),
        id_col: pa.array(np.concatenate(out_id), type=id_type),
        "score": pa.array(np.concatenate(out_s), type=pa.float64()),
    })


def _norm_labels(seq) -> np.ndarray:
    """Object array with EVERY missing-value flavor (None, float NaN,
    pd.NA, NaT) normalized to None, so the IS-NOT-DISTINCT-FROM label
    compare sees one canonical null on both the query and corpus sides
    (NaN == NaN is False and would silently disable the both-NULL
    exclusion)."""
    return np.asarray([None if pd.isna(x) else x for x in seq],
                      dtype=object)


def _brute_force_batch(batch: pa.Table, *, queries_ref, vec_col: str,
                       id_col: str, k: int,
                       label_col=None) -> pa.Table:
    from ..util import worker_cached
    q = worker_cached(("annq", queries_ref.hex()),
                      lambda: ray.get(queries_ref))
    Q, qids = q["matrix"], q["ids"]          # (nq, dim), unit rows
    qlabels = q.get("labels")
    id_type = batch.schema.field(id_col).type
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    out_q, out_id, out_s = [], [], []
    if batch.num_rows and len(Q):            # empty batch/queries → empty block
        V = _as_matrix(batch.column(vec_col))
        sim = Q @ V.T                        # (nq, nb)
        labels = (_norm_labels(batch.column(label_col).to_pylist())
                  if label_col is not None else None)
        for qi in range(sim.shape[0]):
            row = sim[qi]
            if labels is not None:
                # SQL IS NOT DISTINCT FROM: equal labels — including
                # both-NULL — are positives and excluded; the exclusion
                # also removes the query vector itself (same label)
                same = labels == qlabels[qi]
                row = row.copy()
                row[same.astype(bool)] = np.nan  # _local_topk drops NaN
            sel_id, sel_s = _local_topk(row, ids, k)
            out_q.append(np.full(len(sel_id), qids[qi]))
            out_id.append(sel_id)
            out_s.append(sel_s)
    return _result_table(out_q, out_id, out_s, id_type=id_type,
                         qids=qids, id_col=id_col)


def hard_negative_topk(ds, queries, query_labels, query_ids=None,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       label_col: str = "label", k: int = 10,
                       batch_size: int = 65536) -> pd.DataFrame:
    """Hard-negative mining: exact cosine top-k per query RESTRICTED to
    vectors whose label differs from the query's (SQL
    ``IS DISTINCT FROM`` — a both-NULL pair counts as SAME and is
    excluded; NaN/pd.NA labels normalize to the same null as None).
    The contrastive-training retrieval pass — brute_force_topk with
    the label mask applied vectorized inside the shared batch scorer,
    so the corpus never gathers and the filter never re-scans."""
    return brute_force_topk(ds, queries, query_ids=query_ids,
                            vec_col=vec_col, id_col=id_col, k=k,
                            batch_size=batch_size,
                            query_labels=query_labels,
                            label_col=label_col)


def _merge_topk(candidates: pd.DataFrame, id_col: str, k: int) -> \
        pd.DataFrame:
    """Global merge of per-batch candidates: exact top-k per query with a
    deterministic (score desc, id asc) tie-break."""
    if "query_id" not in candidates.columns:
        # an empty Dataset can surface as a column-less frame
        return pd.DataFrame({"query_id": [], id_col: [], "score": [],
                             "rank": pd.Series([], dtype=np.int64)})
    outs = []
    for qid, g in candidates.groupby("query_id", sort=False):
        g = g.sort_values(["score", id_col],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        outs.append(g)
    if not outs:  # empty corpus / nothing probed: dtype-stable empty frame
        empty = candidates.head(0).copy()
        empty["rank"] = pd.Series([], dtype=np.int64)
        return empty
    return pd.concat(outs, ignore_index=True)


def brute_force_topk(ds, queries, query_ids=None, vec_col: str = "embedding",
                     id_col: str = "vec_id", k: int = 10,
                     batch_size: int = 65536, query_labels=None,
                     label_col: str = "label") -> pd.DataFrame:
    """Exact cosine top-k: → pandas ``(query_id, vec_id, score, rank)``
    (small result: nq × k rows). With ``query_labels``, corpus rows
    whose ``label_col`` equals the query's label (IS NOT DISTINCT
    FROM — both-null is equal) are excluded: the hard-negative mask."""
    Q = _as_matrix(queries)
    qids = np.asarray(query_ids if query_ids is not None
                      else np.arange(len(Q)))
    import functools
    payload = {"matrix": Q, "ids": qids}
    cols, lab = [id_col, vec_col], None
    if query_labels is not None:
        payload["labels"] = _norm_labels(list(query_labels))
        cols.append(label_col)
        lab = label_col
    ref = ray.put(payload)
    cand = ds.select_columns(cols).map_batches(
        functools.partial(_brute_force_batch, queries_ref=ref,
                          vec_col=vec_col, id_col=id_col, k=k,
                          label_col=lab),
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
    id_type = batch.schema.field(id_col).type
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    out_q, out_id, out_s = [], [], []
    if batch.num_rows and len(Q):
        V = _as_matrix(batch.column(vec_col))
        cell = np.argmax(V @ C.T, axis=1)
        for qi in range(len(Q)):
            sel = np.isin(cell, probe[qi])
            if not sel.any():
                continue
            sel_id, sel_s = _local_topk(Q[qi] @ V[sel].T, ids[sel], k)
            out_q.append(np.full(len(sel_id), qids[qi]))
            out_id.append(sel_id)
            out_s.append(sel_s)
    return _result_table(out_q, out_id, out_s, id_type=id_type,
                         qids=qids, id_col=id_col)


def _train_centroids(ds, vec_col: str, ncells: int, train_sample: int,
                     seed: int = 5) -> np.ndarray:
    """Coarse quantizer from a UNIFORM random sample of the corpus (not
    first-N — parquet row order is not exchangeable)."""
    n = ds.count()
    frac = min(1.0, train_sample / max(1, n))
    vecs = ds.select_columns([vec_col])
    if frac < 1.0:
        vecs = vecs.random_sample(frac, seed=seed)
    sample = vecs.to_pandas()
    if not len(sample):
        raise ValueError("cannot train IVF centroids on an empty corpus")
    X = _as_matrix(sample[vec_col].to_numpy())
    return _kmeans(X, ncells, seed=seed)


def ivf_topk(ds, queries, query_ids=None, vec_col: str = "embedding",
             id_col: str = "vec_id", k: int = 10, ncells: int = 64,
             nprobe: int = 8, train_sample: int = 20000,
             batch_size: int = 65536) -> pd.DataFrame:
    """Approximate cosine top-k via IVF coarse quantization over ONE full
    stream (saves dot products, not I/O — see :class:`IvfIndex` for the
    materialized index whose probes read only nprobe cells)."""
    C = _train_centroids(ds, vec_col, ncells, train_sample)
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


# ---------------------------------------------------------------------------
# materialized IVF index: build once, probe by reading only nprobe cells


def _probe_cells_batch(batch: pa.Table, *, queries_ref, vec_col: str,
                       id_col: str, k: int) -> pa.Table:
    """Brute-force within an already-probed cell partition: the batch's
    ``cell`` column says which queries compare against it."""
    from ..util import worker_cached
    q = worker_cached(("ivfq", queries_ref.hex()),
                      lambda: ray.get(queries_ref))
    Q, qids, probe_sets = q["matrix"], q["ids"], q["probe_sets"]
    import pyarrow.compute as pc
    id_type = batch.schema.field(id_col).type
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    out_q, out_id, out_s = [], [], []
    if batch.num_rows and len(Q):
        V = _as_matrix(batch.column(vec_col))
        # hive partition values surface as strings when reading explicit files
        cell = pc.cast(batch.column("cell"), pa.int64()).to_numpy(
            zero_copy_only=False)
        for qi in range(len(Q)):
            sel = np.isin(cell, probe_sets[qi])
            if not sel.any():
                continue
            sel_id, sel_s = _local_topk(Q[qi] @ V[sel].T, ids[sel], k)
            out_q.append(np.full(len(sel_id), qids[qi]))
            out_id.append(sel_id)
            out_s.append(sel_s)
    return _result_table(out_q, out_id, out_s, id_type=id_type,
                         qids=qids, id_col=id_col)


class IvfIndex:
    """Materialized IVF index (the actual 100-TB scale path): the corpus is
    written ONCE as parquet partitioned by coarse cell (``cell=<c>/``
    directories, resumable layout), centroids saved alongside. A probe
    ranks cells against each query and READS ONLY the union of the top
    ``nprobe`` cells' files — I/O scales with nprobe/ncells, unlike the
    streaming :func:`ivf_topk` which always scans everything."""

    def __init__(self, index_dir: str, centroids: np.ndarray,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        self.index_dir = index_dir
        self.centroids = centroids
        self.vec_col, self.id_col = vec_col, id_col

    @classmethod
    def build(cls, ds, index_dir: str, vec_col: str = "embedding",
              id_col: str = "vec_id", ncells: int = 64,
              train_sample: int = 20000, seed: int = 5,
              batch_size: int = 65536) -> "IvfIndex":
        import functools
        import os

        import ray.data as rd  # noqa: F401  (documents the dependency)
        C = _train_centroids(ds, vec_col, ncells, train_sample, seed=seed)
        cref = ray.put(C)

        def assign(b: pa.Table, *, cref=cref) -> pa.Table:
            from ..util import worker_cached
            if b.num_rows == 0:  # a zero-row list column infers dim 0 —
                # the (0,0) @ (dim,ncells) matmul would crash the build
                return b.append_column(
                    "cell", pa.array([], type=pa.int32()))
            C = worker_cached(("ivfC", cref.hex()), lambda: ray.get(cref))
            V = _as_matrix(b.column(vec_col))
            cell = np.argmax(V @ C.T, axis=1).astype(np.int32)
            return b.append_column("cell", pa.array(cell))

        # a non-empty index_dir means a previous/crashed build left files
        # behind; mixing them into the fresh partition layout would feed
        # duplicate/stale rows to probes — wipe before writing, but ONLY
        # if the contents actually look like a prior index (a mistyped
        # path at an arbitrary data directory must not be destroyed)
        if os.path.isdir(index_dir) and os.listdir(index_dir):
            entries = os.listdir(index_dir)
            looks_like_index = "centroids.npy" in entries or \
                "_META.json" in entries or \
                any(e.startswith("cell=") for e in entries)
            if not looks_like_index:
                raise ValueError(
                    f"index_dir {index_dir!r} is non-empty and does not "
                    "look like a previous IVF index (no centroids.npy / "
                    "cell=* entries) — refusing to delete it")
            import shutil
            shutil.rmtree(index_dir)
        os.makedirs(index_dir, exist_ok=True)
        ds.select_columns([id_col, vec_col]).map_batches(
            functools.partial(assign),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size).write_parquet(
            index_dir, partition_cols=["cell"])
        np.save(os.path.join(index_dir, "centroids.npy"), C)
        import json as _json
        with open(os.path.join(index_dir, "_META.json"), "w") as f:
            _json.dump({"vec_col": vec_col, "id_col": id_col,
                        "ncells": int(C.shape[0]),
                        "dim": int(C.shape[1])}, f)
        return cls(index_dir, C, vec_col=vec_col, id_col=id_col)

    @classmethod
    def load(cls, index_dir: str, vec_col: str = "embedding",
             id_col: str = "vec_id") -> "IvfIndex":
        import json as _json
        import os
        C = np.load(os.path.join(index_dir, "centroids.npy"))
        meta_path = os.path.join(index_dir, "_META.json")
        if os.path.exists(meta_path):  # legacy indexes lack _META —
            # when present, the RECORDED columns win (a caller-side
            # mismatch would otherwise KeyError deep inside the probe,
            # or silently probe the wrong column)
            with open(meta_path) as f:
                meta = _json.load(f)
            vec_col = meta.get("vec_col", vec_col)
            id_col = meta.get("id_col", id_col)
        return cls(index_dir, C, vec_col=vec_col, id_col=id_col)

    def _empty_topk(self) -> pd.DataFrame:
        """Typed empty result (rank int64 / score float64) — the same
        shape every non-empty path produces, so schemas stay
        data-independent."""
        return pd.DataFrame({
            "query_id": pd.Series([], dtype=np.int64),
            self.id_col: pd.Series([], dtype=np.int64),
            "score": pd.Series([], dtype=np.float64),
            "rank": pd.Series([], dtype=np.int64)})

    def topk(self, queries, query_ids=None, k: int = 10, nprobe: int = 8,
             batch_size: int = 65536) -> pd.DataFrame:
        import functools
        import glob
        import os

        import ray.data as rd
        Q = _as_matrix(queries)
        if len(Q) == 0:  # (0,0) @ centroids.T is shape-incompatible —
            # return the typed empty frame like the sibling APIs
            return self._empty_topk()
        qids = np.asarray(query_ids if query_ids is not None
                          else np.arange(len(Q)))
        rank = np.argsort(-(Q @ self.centroids.T), axis=1)[:, :nprobe]
        probe_sets = {qi: rank[qi] for qi in range(len(Q))}
        needed = sorted(set(int(c) for cells in rank for c in cells))
        files = [f for c in needed
                 for f in sorted(glob.glob(os.path.join(
                     self.index_dir, f"cell={c}", "*.parquet")))]
        if not files:
            return self._empty_topk()
        ref = ray.put({"matrix": Q, "ids": qids, "probe_sets": probe_sets})
        cells_ds = rd.read_parquet(files)  # ONLY the probed partitions
        cand = cells_ds.map_batches(
            functools.partial(_probe_cells_batch, queries_ref=ref,
                              vec_col=self.vec_col, id_col=self.id_col,
                              k=k),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size).to_pandas()
        return _merge_topk(cand, self.id_col, k)
