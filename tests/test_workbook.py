"""One-source -> N-datasets split (S10) and grouped nest-to-list (M6/J3 tail)
— the reference's workbook laws: exact sheet count, column presence, children
nested under parents (userCode/xlsx/lib.py:33-56, helpers.py:79-197)."""

import pyarrow as pa
import pytest

import ray

from oregonwaterdataportal_etl_ray.stages.workbook import nest_children, split_source


def _tagged_ds():
    return ray.data.from_arrow(pa.table({
        "sheet": ["site", "site", "meta", "data", "data", "data"],
        "a": [1, 2, 3, 4, 5, 6],
        "b": ["x", "y", "z", "p", "q", "r"],
    }))


def test_split_source_three_sheets(ray_session):
    out = split_source(_tagged_ds(), "sheet",
                       {"site": ["a", "b"], "meta": ["a"], "data": ["a", "b"]})
    assert set(out) == {"site", "meta", "data"}
    assert out["site"].count() == 2
    assert out["data"].count() == 3
    assert out["meta"].schema().names == ["a"]     # projected to declared cols


def test_split_source_sheet_count_law(ray_session):
    with pytest.raises(ValueError, match="exactly sheets"):
        split_source(_tagged_ds(), "sheet", {"site": ["a"], "meta": ["a"]})


def test_split_source_missing_column_law(ray_session):
    with pytest.raises(ValueError, match="missing columns"):
        split_source(_tagged_ds(), "sheet",
                     {"site": ["a", "nope"], "meta": ["a"], "data": ["a"]})


def test_nest_children_sorted_lists_and_inner_semantics(ray_session):
    parents = ray.data.from_arrow(pa.table({
        "pk": pa.array([10, 20, 30], pa.int64()),
        "pname": ["ten", "twenty", "thirty"],
    }))
    children = ray.data.from_arrow(pa.table({
        "fk": pa.array([20, 10, 10, 99], pa.int64()),   # 99: orphan child
        "seq": pa.array([1, 2, 1, 1], pa.int64()),
        "val": ["b", "z", "a", "orphan"],
    }))
    got = nest_children(parents, children, "pk", "fk", ["seq", "val"],
                        order_cols=["seq"], list_col="kids",
                        num_buckets=4).to_pandas().sort_values("pk") \
        .reset_index(drop=True)
    # parent 30 has no children -> dropped (inner); orphan key 99 -> dropped
    assert got["pk"].tolist() == [10, 20]
    assert got["pname"].tolist() == ["ten", "twenty"]
    kids10 = got.loc[0, "kids"]
    assert [k["val"] for k in kids10] == ["a", "z"]     # sorted by seq
    assert [k["seq"] for k in kids10] == [1, 2]
    assert [k["val"] for k in got.loc[1, "kids"]] == ["b"]


def test_nest_children_strict_orphan_raises(ray_session):
    parents = ray.data.from_arrow(pa.table({
        "pk": pa.array([10, 20], pa.int64()),
        "pname": ["ten", "twenty"],
    }))
    children = ray.data.from_arrow(pa.table({
        "fk": pa.array([20, 10, 99], pa.int64()),   # 99: orphan child
        "seq": pa.array([1, 1, 1], pa.int64()),
        "val": ["b", "a", "orphan"],
    }))
    # default mode drops the orphan silently (inner semantics) ...
    got = nest_children(parents, children, "pk", "fk", ["seq", "val"],
                        num_buckets=4).to_pandas()
    assert sorted(got["pk"].tolist()) == [10, 20]
    # ... strict mode mirrors the reference's fail-loud law
    # (userCode/xlsx/helpers.py 'Associated thing ... not found')
    with pytest.raises(Exception, match="orphan children"):
        nest_children(parents, children, "pk", "fk", ["seq", "val"],
                      num_buckets=4, on_orphan="error").materialize()
