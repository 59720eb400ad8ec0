"""Single-process reference oracle for the change-event replay.

Replays the same Parquet event batches with plain pandas (no Ray) and returns
the final table the engine must equal: one row per surviving (repo, path) with
the max-LSN content, tombstones removed, plus ``sha256(content)`` — the
per-row invariant from BASELINE.json. This is the "reference final table" the
sha256 row-equality gate compares against (SURVEY.md §5 layer (c))."""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow.parquet as pq

from .schema import EvolutionSpec


def sha256_series(s: pd.Series) -> pd.Series:
    # binary content columns surface as bytes in pandas; the engine's
    # sha256_hex handles both, so the oracle must too
    return s.map(lambda x: hashlib.sha256(
        x if isinstance(x, bytes) else x.encode()).hexdigest())


def oracle_replay(files: list[str], evolution: EvolutionSpec | None = None) -> pd.DataFrame:
    """Columns: repo, path, lsn, lang, content, sha256 (+ extras), sorted by key."""
    evolution = evolution or EvolutionSpec()
    frames = []
    for f in files:
        df = pq.read_table(f).to_pandas()
        df = df.rename(columns=evolution.renames)
        frames.append(df)
    ev = pd.concat(frames, ignore_index=True, sort=False)
    # parity with the engine's fail-loud normalize: null PK components or
    # commits must raise here too, not silently drop (pandas groupby would
    # discard null keys with dropna=True and mask engine misbehavior)
    bad = {c: int(ev[c].isna().sum()) for c in ("repo", "path", "commit")
           if ev[c].isna().any()}
    if bad:
        raise ValueError(f"malformed change events: null values in {bad}")
    ev["lsn"] = ev["commit"].str[:12].astype("int64")
    ev = ev.sort_values("lsn", kind="stable")
    final = ev.groupby(["repo", "path"], as_index=False, sort=False).tail(1)
    final = final[final["content"].notna()].copy()
    final["sha256"] = sha256_series(final["content"])
    return final.sort_values(["repo", "path"]).reset_index(drop=True)
