"""SimHash near-duplicate detection over a text column.

Composition, not new machinery: a map_batches stage computes the 64-bit
SimHash fingerprint per document (text/analysis.py:simhash64_batch —
Charikar 2002 sign-vector over token hashes), then the banded Hamming-LSH
pair search that already powers phash image near-dup
(checks/neardup.py:phash_near_duplicates) finds all pairs within
``max_distance`` bits with recall 1 (bands > max_distance pigeonhole).

Scale shape: the only shuffle carries (band_id, band_value, id) rows —
the narrow banded explode — never the text; the signature dataset
(id + 8 bytes) is materialized once so the text column is read exactly
once. No reference analog (LLM-pipeline surplus surface).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def simhash_near_duplicates(ds, text_col: str = "text",
                            id_col: str = "doc_id",
                            max_distance: int = 3, bands: int = None,
                            max_bucket: int = 1024,
                            num_partitions: int = None,
                            batch_size: int = 8192):
    """Dataset → Dataset of (id_a, id_b, distance): document pairs whose
    SimHash fingerprints differ in ≤ ``max_distance`` of 64 bits.
    Exact recall for the fingerprint metric; SimHash itself is the
    similarity approximation (near-identical token multisets → near-equal
    fingerprints)."""
    from ..checks.neardup import phash_near_duplicates
    from ..text.analysis import simhash64_batch

    def add_sig(b: pa.Table) -> pa.Table:
        sig = simhash64_batch(b.column(text_col).combine_chunks())
        return pa.table({id_col: b.column(id_col),
                         "_simhash": pa.array(sig, type=pa.int64())})

    sigs = ds.select_columns([id_col, text_col]).map_batches(
        add_sig, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size).materialize()  # id + 8 B/doc; text read once
    return phash_near_duplicates(
        sigs, id_col=id_col, phash_col="_simhash",
        max_distance=max_distance, bands=bands, max_bucket=max_bucket,
        num_partitions=num_partitions, batch_size=batch_size)
