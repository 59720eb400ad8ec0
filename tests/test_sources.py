"""Source-connector tests (SURVEY.md §2.1 S9/S11): CSV station-list union with
distinct, and opaque binary-file ingestion — the reference's two non-Parquet
input formats (/root/reference/userCode/awqms/stations.py:6-33,
/root/reference/userCode/xlsx/dag.py:57-76) re-expressed as Ray Data reads."""

import os

import pyarrow.parquet as pq

import ray


def _write_csvs(tmp_path):
    ev = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["user_id"]).to_pandas()
    a, b = ev.iloc[: len(ev) // 2], ev.iloc[len(ev) // 3:]
    pa_, pb_ = str(tmp_path / "a.csv"), str(tmp_path / "b.csv")
    a.to_csv(pa_, index=False)
    b.to_csv(pb_, index=False)
    return pa_, pb_, set(ev["user_id"])


def test_csv_union_distinct(ray_session, tmp_path):
    """Two overlapping CSV lists -> union -> distinct (S11)."""
    from ray.data.aggregate import Count
    pa_, pb_, want = _write_csvs(tmp_path)
    ds = ray.data.read_csv(pa_).union(ray.data.read_csv(pb_))
    distinct = ds.groupby("user_id").aggregate(Count(alias_name="__n")) \
                 .select_columns(["user_id"])
    got = set(distinct.to_pandas()["user_id"])
    assert got == want


TSV = (b"station_nbr\tdate\tmean_daily_flow_cfs\n"
       b"14210000\t03-15-2024 12:30\t12.5\n"
       b"14210000\t03-16-2024\t\n"              # null result -> dropped
       b"14210000\t07/04/2023 01:02:03 PM\t7.25\n")


def test_tsv_parse_laws():
    """S3 (reference userCode/wrd/lib.py:56-102): unit from the 3rd header
    field's suffix, null-result drop, PT->UTC ISO-Z dates, duplicate-date
    and invalid-sentinel rejection — vectorized."""
    import pytest
    from oregonwaterdataportal_etl_ray.sources.tsv import parse_timeseries_tsv
    t = parse_timeseries_tsv(TSV)
    assert t["units"].to_pylist() == ["cfs", "cfs"]
    # 12:30 PDT == 19:30 UTC; 13:02:03 PDT == 20:02:03 UTC
    assert t["date_utc"].to_pylist() == ["2024-03-15T19:30:00Z",
                                         "2023-07-04T20:02:03Z"]
    assert t["result"].to_pylist() == [12.5, 7.25]
    kept = parse_timeseries_tsv(TSV, drop_nulls=False)
    assert kept["result"].to_pylist() == [12.5, None, 7.25]
    with pytest.raises(ValueError, match="duplicate dates"):
        parse_timeseries_tsv(TSV + b"14210000\t03-15-2024 12:30\t9.9\n")
    with pytest.raises(ValueError, match="invalid"):
        parse_timeseries_tsv(b"Invalid data type to download\n")


def test_tsv_parser_stage_over_binary_files(ray_session, tmp_path):
    """read_binary_files -> TsvTimeseriesParser explode (the reference's
    per-station fetch loop as a block-parallel pipeline)."""
    from oregonwaterdataportal_etl_ray.sources.tsv import TsvTimeseriesParser
    for i in range(3):
        (tmp_path / f"s{i}.tsv").write_bytes(TSV)
    ds = ray.data.read_binary_files(str(tmp_path), include_paths=True)
    out = ds.map_batches(TsvTimeseriesParser(), batch_format="pyarrow") \
            .to_pandas()
    assert len(out) == 6                       # 2 kept rows x 3 files
    assert out["units"].eq("cfs").all()
    assert out["source_path"].nunique() == 3


def test_binary_files_payload_stats(ray_session, tmp_path):
    """Opaque attachment bytes -> read_binary_files -> payload stats (S9)."""
    payloads = {f"f{i}.bin": os.urandom(100 + i) for i in range(5)}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    ds = ray.data.read_binary_files(str(tmp_path), include_paths=True)
    got = {os.path.basename(r["path"]): len(r["bytes"]) for r in ds.take_all()}
    assert got == {k: len(v) for k, v in payloads.items()}
