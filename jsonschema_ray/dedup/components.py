"""Connected components over a duplicate-pair edge Dataset.

Near-dup detection (minhash/simhash/embedding LSH, exact k-gram Jaccard)
emits PAIRS; a real dedup pipeline must then cluster the pairs and keep
one canonical document per cluster. This operator computes, for every
node that appears in at least one edge, the minimum node id reachable
from it (the component representative), so `component == node` selects
the canonical survivors.

No reference analog (LLM-pipeline surplus surface, like the rest of
dedup/). Two physical plans, cap-gated like dedup/minhash.py:

* driver path (edges fit ``driver_cap``): one collect + numpy
  union-find with path halving — pair sets at toy scale are tiny and a
  multi-round Ray iteration costs ~0.5 s of fixed spin-up per round.
* distributed path: min-label propagation. ``labels`` is a Dataset of
  (node, label); each round joins labels onto both edge directions
  (``equi_join`` picks broadcast vs shuffle by measured size), takes a
  per-node grouped min (per-batch partial min first, so the shuffle
  moves one row per (node, batch)), and stops when a node-keyed
  old-vs-new join counts zero changed labels — exact for any orderable
  id type (labels only ever decrease, so this is a true fixpoint test,
  and the join is against the label table, not the corpus). Each round
  ALSO pointer-doubles (every node adopts its label's label — the
  shortcutting step of alternating star contraction), so rounds needed
  = O(log diameter): near-clique duplicate clusters converge in 2-3
  rounds and adversarial chain-shaped graphs (template spam) in
  ~log2(length), never O(length). ``max_rounds`` is an unreachable
  backstop (diameter ~2**max_rounds).

The label table is O(nodes-that-appear-in-pairs) — a small fraction of
the corpus for real dedup workloads — and only (node, label) pairs
(16 B/row for int64 ids) ever shuffle.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa


def union_find_components(src: np.ndarray, dst: np.ndarray):
    """Driver-side exact components: (unique nodes, representative per
    node) via union-by-smaller-root with full path compression."""
    nodes, idx = np.unique(np.concatenate([src, dst]), return_inverse=True)
    parent = np.arange(len(nodes))
    a_idx, b_idx = idx[: len(src)], idx[len(src):]

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:        # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(a_idx, b_idx):
        ra, rb = find(a), find(b)
        if ra != rb:
            # smaller-id root wins so the representative is the min id
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    comp = np.array([find(i) for i in range(len(nodes))])
    return nodes, nodes[comp]


def _partial_min(b: pa.Table, *, key: str, col: str) -> pa.Table:
    df = b.to_pandas()
    out = df.groupby(key, sort=False, as_index=False)[col].min()
    return pa.Table.from_pandas(out, preserve_index=False)


def _grouped_min(ds, key: str, col: str):
    """groupby(key).min(col) with per-batch partial min before the
    shuffle (one row per (key, batch) moves)."""
    from ray.data.aggregate import Min
    partials = ds.map_batches(
        functools.partial(_partial_min, key=key, col=col),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=131072)
    return partials.groupby(key).aggregate(Min(col, alias_name=col))


def connected_components(edges, src: str = "id_a", dst: str = "id_b",
                         driver_cap: int = 64 << 20,
                         max_rounds: int = 64):
    """Edges Dataset (src, dst) → Dataset (node, component) where
    ``component`` is the smallest node id in the node's connected
    component. Nodes are every id appearing in any edge; node type must
    be orderable (ints, strings). See module docstring for plans."""
    import ray.data

    from ..joins import equi_join

    source = edges.select_columns([src, dst]).materialize()
    node_type = source.schema().base_schema.field(src).type

    if source.size_bytes() <= driver_cap:
        df = source.to_pandas()
        nodes, comp = union_find_components(
            df[src].to_numpy(), df[dst].to_numpy())
        tab = pa.table({"node": pa.array(nodes, type=node_type),
                        "component": pa.array(comp, type=node_type)})
        return ray.data.from_arrow(tab)

    # --- distributed min-label propagation -----------------------------
    def seed(b: pa.Table) -> pa.Table:
        both = pa.concat_arrays([b.column(src).combine_chunks(),
                                 b.column(dst).combine_chunks()])
        return pa.table({"node": both, "component": both})

    labels = _grouped_min(
        source.map_batches(seed, batch_format="pyarrow",
                           zero_copy_batch=True),
        "node", "component").materialize()

    fwd = source.rename_columns({src: "node", dst: "peer"}) \
        .select_columns(["node", "peer"])
    rev = source.rename_columns({dst: "node", src: "peer"}) \
        .select_columns(["node", "peer"])
    both_dirs = fwd.union(rev).materialize()

    def _n_changed(new, old) -> int:
        j = equi_join(new, old, on="node", right_suffix="_old")

        def diff_count(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            n = pc.sum(pc.not_equal(b["component"],
                                    b["component_old"])).as_py() or 0
            return pa.table({"changed": pa.array([n], type=pa.int64())})

        parts = j.map_batches(diff_count, batch_format="pyarrow",
                              zero_copy_batch=True)
        from ray.data.aggregate import Sum
        return parts.aggregate(Sum("changed", alias_name="s"))["s"] or 0

    for _ in range(max_rounds):
        # each node sends its current label to every neighbour
        msgs = equi_join(both_dirs, labels, on="node") \
            .select_columns(["peer", "component"]) \
            .rename_columns({"peer": "node"})
        # pointer doubling (shortcutting / alternating star contraction):
        # each node also adopts its LABEL's label — label(x) ≤ x is an
        # invariant of the grouped min, so label(label(x)) is in the same
        # component and ≤ label(x); distance-to-representative halves per
        # round, making chain-shaped graphs (template spam) converge in
        # O(log diameter) rounds instead of O(diameter)
        hops = equi_join(
            labels,
            labels.rename_columns({"node": "component",
                                   "component": "component2"}),
            on="component") \
            .select_columns(["node", "component2"]) \
            .rename_columns({"component2": "component"})
        new_labels = _grouped_min(labels.union(msgs).union(hops),
                                  "node", "component").materialize()
        if _n_changed(new_labels, labels) == 0:
            return new_labels
        labels = new_labels
    raise RuntimeError(  # unreachable below diameter ~2**max_rounds
        f"connected_components did not converge in {max_rounds} rounds")
