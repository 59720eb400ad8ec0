"""TSV time-series parsing (S3): upstream TSV bytes -> columnar Arrow.

The reference parses each station's TSV response row by row with the csv
module (``parse_oregon_tsv``, /root/reference/userCode/wrd/lib.py:56-102):
unit extracted from the third header field's ``_``-suffix, empty results
dropped (or kept as null), dates interpreted as Pacific wall time and
converted to UTC ISO-Z, duplicate dates asserted, and a sentinel header
("Invalid data type to download") rejected.

Here the same laws run vectorized: ``pyarrow.csv`` parses the whole blob in
C++, :func:`coalesce_timestamps` converts the date column in one kernel
pass, and the duplicate-date law is one distinct-count compare. The parser
composes with ``ray.data.read_binary_files`` (one TSV blob per row) as a
``map_batches`` stage — the reference's per-station fetch loop becomes a
block-parallel binary read followed by this stage.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv

from ..functions.kernels import REFERENCE_DATE_FORMATS, coalesce_timestamps

INVALID_SENTINEL = "Invalid data type to download"


def parse_timeseries_tsv(payload: bytes, drop_nulls: bool = True,
                         assume_tz: str = "America/Los_Angeles") -> pa.Table:
    """One TSV blob -> table(date_utc: string ISO-Z, result: float64,
    units: string). Columns are positional (station, date, result), like the
    reference; extra columns are ignored."""
    if INVALID_SENTINEL.encode() in payload.split(b"\n", 1)[0]:
        raise ValueError(
            "the tsv response is invalid due to an incorrect requested data type")
    t = pacsv.read_csv(
        pa.BufferReader(payload),
        parse_options=pacsv.ParseOptions(delimiter="\t"),
        convert_options=pacsv.ConvertOptions(strings_can_be_null=True))
    if t.num_columns < 3:
        raise ValueError(f"expected >= 3 tsv columns, got {t.num_columns}")
    units = t.column_names[2].split("_")[-1]
    date_raw = pc.cast(t.column(1), pa.string())
    result = pc.cast(t.column(2), pa.float64())
    if drop_nulls:
        keep = pc.is_valid(result)
        date_raw, result = date_raw.filter(keep), result.filter(keep)
    if date_raw.null_count:
        raise ValueError(
            f"tsv response has {date_raw.null_count} rows with a missing date")
    ts = coalesce_timestamps(date_raw, REFERENCE_DATE_FORMATS,
                             assume_tz=assume_tz)
    iso = pc.strftime(ts.cast(pa.timestamp("s", tz="UTC")),
                      format="%Y-%m-%dT%H:%M:%SZ")
    n_distinct = pc.count_distinct(iso).as_py()
    if n_distinct != len(iso):
        raise ValueError(
            f"duplicate dates in tsv response ({len(iso) - n_distinct} repeats)")
    return pa.table({
        "date_utc": iso,
        "result": result,
        "units": pa.array([units] * len(iso), pa.string()),
    })


class TsvTimeseriesParser:
    """map_batches stage over ``read_binary_files`` rows: each (path, bytes)
    blob explodes into its parsed observation rows, tagged with the source
    path — the reference's per-station fetch+parse loop, block-parallel."""

    def __init__(self, drop_nulls: bool = True,
                 assume_tz: str = "America/Los_Angeles",
                 bytes_col: str = "bytes", path_col: str = "path"):
        self.drop_nulls = drop_nulls
        self.assume_tz = assume_tz
        self.bytes_col = bytes_col
        self.path_col = path_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        paths = batch[self.path_col].to_pylist()
        for path, payload in zip(paths, batch[self.bytes_col].to_pylist()):
            t = parse_timeseries_tsv(payload or b"", self.drop_nulls,
                                     self.assume_tz)
            out.append(t.append_column(
                "source_path", pa.array([path] * t.num_rows, pa.string())))
        if not out:
            return pa.schema([("date_utc", pa.string()),
                              ("result", pa.float64()),
                              ("units", pa.string()),
                              ("source_path", pa.string())]).empty_table()
        return pa.concat_tables(out)
