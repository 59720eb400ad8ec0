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


def test_binary_files_payload_stats(ray_session, tmp_path):
    """Opaque attachment bytes -> read_binary_files -> payload stats (S9)."""
    payloads = {f"f{i}.bin": os.urandom(100 + i) for i in range(5)}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    ds = ray.data.read_binary_files(str(tmp_path), include_paths=True)
    got = {os.path.basename(r["path"]): len(r["bytes"]) for r in ds.take_all()}
    assert got == {k: len(v) for k, v in payloads.items()}
