"""Round-4 review pins for joins.py + hashing.py: string/large_string
broadcast-join keys, the ±2^53 exact-integer guard, reserved-name
collisions, and time-of-day column hashing."""

import datetime

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def test_equi_join_broadcast_large_string_key():
    """Acero refuses string vs large_string key pairs; the broadcast
    join now casts the left key per batch (the tfidf-crash class,
    fixed at the join itself)."""
    import ray.data as rd

    from jsonschema_ray.joins import equi_join
    left = rd.from_arrow(pa.table({
        "k": pa.array(["a", "b", "c"], type=pa.string()),
        "x": pa.array([1, 2, 3], type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array(["a", "c"], type=pa.large_string()),
        "y": pa.array([10, 30], type=pa.int64())}))
    out = equi_join(left, right, on="k").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert out["x"].tolist() == [1, 3]
    assert out["y"].tolist() == [10, 30]
    # and the reverse orientation (left large_string, right string)
    out2 = equi_join(right, left, on="k").to_pandas()
    assert len(out2) == 2


def test_asof_join_refuses_unsafe_int64():
    """Integer payloads past ±2^53 would be silently rounded by the
    pandas merge; the join now refuses loudly instead."""
    import ray.data as rd

    from jsonschema_ray.joins import asof_join
    big = (1 << 53) + 1
    left = rd.from_arrow(pa.table({
        "g": pa.array([1], type=pa.int64()),
        "t": pa.array([100], type=pa.int64()),
        "payload": pa.array([big], type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "g": pa.array([1], type=pa.int64()),
        "t": pa.array([50], type=pa.int64()),
        "v": pa.array([7], type=pa.int64())}))
    with pytest.raises(Exception, match="2\\^53"):
        asof_join(left, right, by="g", on="t",
                  value_cols=["v"]).to_pandas()
    # safe values still join exactly
    left_ok = rd.from_arrow(pa.table({
        "g": pa.array([1], type=pa.int64()),
        "t": pa.array([100], type=pa.int64()),
        "payload": pa.array([123], type=pa.int64())}))
    out = asof_join(left_ok, right, by="g", on="t",
                    value_cols=["v"]).to_pandas()
    assert out["v"].tolist() == [7] and out["payload"].tolist() == [123]


def test_asof_join_refuses_reserved_names():
    import ray.data as rd

    from jsonschema_ray.joins import asof_join
    left = rd.from_arrow(pa.table({
        "g": pa.array([1], type=pa.int64()),
        "t": pa.array([1], type=pa.int64()),
        "_part": pa.array([1], type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "g": pa.array([1], type=pa.int64()),
        "t": pa.array([1], type=pa.int64()),
        "v": pa.array([1], type=pa.int64())}))
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, by="g", on="t", value_cols=["v"])
    # value-column rename colliding with an existing left column
    left2 = rd.from_arrow(pa.table({
        "g": pa.array([1], type=pa.int64()),
        "t": pa.array([1], type=pa.int64()),
        "v": pa.array([2], type=pa.int64()),
        "v_r": pa.array([3], type=pa.int64())}))
    with pytest.raises(ValueError, match="collide"):
        asof_join(left2, right, by="g", on="t", value_cols=["v"])


def test_hash64_time_and_duration_columns():
    """time32/time64/duration columns hash (they used to crash on the
    object-array to_numpy path), deterministically, nulls to the
    sentinel."""
    from jsonschema_ray.sketches.hashing import hash64_array
    t32 = pa.array([datetime.time(1, 2, 3), None,
                    datetime.time(23, 59, 59)], type=pa.time32("s"))
    t64 = pa.array([datetime.time(1, 2, 3, 5)], type=pa.time64("us"))
    dur = pa.array([datetime.timedelta(seconds=5)],
                   type=pa.duration("us"))
    h1, h2 = hash64_array(t32), hash64_array(t32)
    assert (h1 == h2).all() and len(np.unique(h1)) == 3
    assert hash64_array(t64).shape == (1,)
    assert hash64_array(dur).shape == (1,)
    # equal logical values hash equally across units? (not required —
    # but the same column must be batch-split invariant)
    hb = hash64_array(pa.concat_arrays([t32, t32]))
    assert (hb[:3] == hb[3:]).all()


def test_equi_join_empty_sides_degrade(ray_session):
    """Ray's hash-shuffle join dies on ANY zero-row input side (even a
    typed empty block: the partition aggregator rebuilds the missing
    side column-less and Acero KeyErrors on the join key). equi_join
    must construct the exact degenerate result instead."""
    import pytest
    import ray.data as rd

    from jsonschema_ray.joins import equi_join

    def mk(rows, key_t=pa.int32()):
        return rd.from_arrow(pa.table({
            "nk": pa.array([r[0] for r in rows], type=key_t),
            "v": pa.array([r[1] for r in rows], type=pa.int64())}))

    def mkr(rows, name="w", key="nk"):
        return rd.from_arrow(pa.table({
            key: pa.array([r[0] for r in rows], type=pa.int32()),
            name: pa.array([r[1] for r in rows], type=pa.int64())}))

    left = mk([(1, 10), (2, 20)])
    empty_r = mkr([])
    empty_l = mk([])

    # full_outer, empty right → left rows + null right payload
    j = equi_join(left, empty_r, on="nk", how="full_outer").to_pandas()
    assert sorted(j.columns) == ["nk", "v", "w"]
    assert len(j) == 2 and j["w"].isna().all()
    # full_outer, empty left → right rows under the left key name
    j = equi_join(empty_l, mkr([(3, 30)]), on="nk",
                  how="full_outer").to_pandas()
    assert len(j) == 1 and j.iloc[0]["nk"] == 3 and j["v"].isna().all() \
        and j.iloc[0]["w"] == 30
    # right_outer mirrors; inner with any empty side → typed empty
    j = equi_join(empty_l, mkr([(3, 30)]), on="nk",
                  how="right_outer").to_pandas()
    assert len(j) == 1 and j.iloc[0]["w"] == 30
    # empty results keep the combined schema on the DATASET (Ray's
    # to_pandas of an empty dataset drops columns — a Ray quirk, not
    # ours)
    j = equi_join(left, empty_r, on="nk", how="right_outer")
    assert sorted(j.schema().names) == ["nk", "v", "w"]
    assert j.count() == 0
    # both empty → typed empty with the combined schema
    j = equi_join(empty_l, empty_r, on="nk", how="full_outer")
    assert j.count() == 0 and sorted(j.schema().names) == ["nk", "v", "w"]

    # right payload name colliding with a left column takes the suffix
    j = equi_join(left, mkr([], name="v"), on="nk", how="full_outer")
    assert sorted(j.schema().names) == ["nk", "v", "v_r"]

    # a SCHEMA-LESS empty side (Ray drops the schema of an all-empty
    # pipeline): semi/anti stay exact (left-typed outputs); the others
    # need a hint and say so
    from ray.data.aggregate import Sum

    def _agg_empty():
        # a groupby-aggregate over a fully-filtered input is how real
        # pipelines lose their schema (a plain filter keeps it)
        def part(b: pa.Table) -> pa.Table:
            g = b.select(["nk"]).group_by(["nk"]) \
                .aggregate([([], "count_all")])
            return g.rename_columns(["nk", "w"])

        return mkr([(1, 1)]).filter(expr="w > 99") \
            .map_batches(part, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .groupby("nk").aggregate(Sum("w", alias_name="w"))

    schemaless = _agg_empty()
    assert schemaless.materialize().schema() is None
    got = equi_join(left, schemaless, on="nk", how="anti").to_pandas()
    assert len(got) == 2 and sorted(got.columns) == ["nk", "v"]
    got = equi_join(left, schemaless, on="nk", how="semi").to_pandas()
    assert len(got) == 0
    with pytest.raises(ValueError, match="right_schema"):
        equi_join(left, schemaless, on="nk", how="left_outer").to_pandas()
    # full_outer with an UNHINTED lazy empty side stays streaming by
    # design and dies inside Ray's shuffle join (the documented trade:
    # we will not execute a lazy side just to probe emptiness)
    with pytest.raises(Exception):
        equi_join(left, schemaless, on="nk", how="full_outer").to_pandas()
    # with the hint, the schema-less empty right joins exactly
    hint = pa.schema([("nk", pa.int32()), ("w", pa.int64())])
    j = equi_join(left, schemaless, on="nk", how="full_outer",
                  right_schema=hint).to_pandas()
    assert len(j) == 2 and j["w"].isna().all() \
        and sorted(j.columns) == ["nk", "v", "w"]

    # non-empty shuffle path unchanged (sanity: coalesced key)
    j = equi_join(mk([(1, 10), (2, 20)]), mkr([(2, 5), (4, 7)]),
                  on="nk", how="full_outer").to_pandas()
    assert len(j) == 3 and set(j["nk"]) == {1, 2, 4}


def test_empty_side_join_key_cast_and_duplicate_names(ray_session):
    """The empty-left degenerate branch emits the key under the LEFT
    schema's type (schema must not depend on which side was empty),
    and a duplicate output name survives _typed_empty."""
    import ray.data as rd

    from jsonschema_ray.joins import equi_join

    right = rd.from_arrow(pa.table({
        "rk": pa.array([7], type=pa.int32()),
        "w": pa.array([70], type=pa.int64())}))
    empty_left = rd.from_arrow(pa.table({
        "nk": pa.array([], type=pa.int64()),
        "v": pa.array([], type=pa.int64())}))
    j = equi_join(empty_left, right, on="nk", right_on="rk",
                  how="full_outer")
    sch = {f.name: f.type for b in j.iter_batches(batch_format="pyarrow")
           for f in b.schema}
    assert sch["nk"] == pa.int64()          # left type, right value
    assert j.to_pandas().iloc[0]["nk"] == 7

    # duplicate output name: left already has 'v_r', right payload 'v'
    # suffixes to a second 'v_r' — Ray cannot serialize duplicate
    # column names, so the degenerate path refuses loudly
    import pytest
    left = rd.from_arrow(pa.table({
        "nk": pa.array([], type=pa.int32()),
        "v": pa.array([], type=pa.int64()),
        "v_r": pa.array([], type=pa.int64())}))
    r2 = rd.from_arrow(pa.table({
        "nk": pa.array([], type=pa.int32()),
        "v": pa.array([], type=pa.float64())}))
    with pytest.raises(ValueError, match="collide"):
        equi_join(left, r2, on="nk", how="full_outer")


def test_empty_side_join_semi_anti_arms_direct(ray_session):
    """_empty_side_join's semi/anti arms, called DIRECTLY: through
    equi_join the Acero branch intercepts every empty right for
    semi/anti (an empty materialized right always broadcasts), so these
    arms are belt-and-braces against Ray ever reporting nonzero
    size_bytes for empty blocks — pin their semantics here."""
    import ray.data as rd

    from jsonschema_ray.joins import _empty_side_join

    lsch = pa.schema([("nk", pa.int64()), ("v", pa.int64())])
    rsch = pa.schema([("rk", pa.int64())])
    left = rd.from_arrow(pa.table(
        {"nk": pa.array([1, 2], type=pa.int64()),
         "v": pa.array([10, 20], type=pa.int64())}))
    empty_r = rd.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    empty_l = rd.from_arrow(pa.table(
        {"nk": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}))

    # r empty: anti keeps ALL left rows, semi keeps none (left-typed)
    anti = _empty_side_join(left, empty_r, lsch, rsch, ["nk"], ["rk"],
                            "anti", "_r", False, True).to_pandas()
    assert sorted(anti["nk"]) == [1, 2]
    semi = _empty_side_join(left, empty_r, lsch, rsch, ["nk"], ["rk"],
                            "semi", "_r", False, True)
    assert semi.count() == 0
    assert {f.name for b in semi.iter_batches(batch_format="pyarrow")
            for f in b.schema} in (set(), {"nk", "v"})

    # l empty: both keep nothing, left columns only
    for how in ("semi", "anti"):
        out = _empty_side_join(empty_l, left, lsch, lsch, ["nk"],
                               ["nk"], how, "_r", True, False)
        assert out.count() == 0
        assert set(out.schema().names) == {"nk", "v"}
