"""Deterministic synthetic change-event generator (FIXTURES.md F1/F2).

Produces the engine's authoritative input shape (BASELINE.json ``input_hint``):

    events(repo: string, path: string, commit: string, lang: string, content: string)

- Primary key ``(repo, path)``; version order = LSN = ``int(commit[:12])``.
- ``content`` null => tombstone (delete).
- Duplicate delivery: some rows re-emitted verbatim inside the same batch file.
- Out-of-order: rows shuffled within a bounded window (never across more than
  one batch boundary) — mirrors the reference's overlap-window re-fetch
  (/root/reference/userCode/wrd/dag.py:189-197) where correctness comes from
  keys + version order, not arrival order.
- Skew: Zipfian repo popularity to exercise partition balance.
- Optional schema evolution (F2): batches >= ``add_col_at`` gain ``size_bytes``
  (int32 first, widened to int64 later), batches >= ``rename_at`` ship the
  ``lang`` column under the alias ``language`` (the reference's
  ``most_recent_operator`` -> ``organization`` alias pattern,
  /root/reference/userCode/wrd/types.py:207).

Fully vectorized (numpy + pyarrow); no wall clock, fixed seed.
"""

from __future__ import annotations

import binascii
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

LANGS = ["py", "rs", "go", "md", "js", "c"]


@dataclass(frozen=True)
class GeneratorSpec:
    n_events: int = 10_000
    n_repos: int = 50
    paths_per_repo: int = 40
    n_batches: int = 8
    seed: int = 42
    zipf_s: float = 1.2          # repo popularity skew exponent
    delete_rate: float = 0.06
    dup_rate: float = 0.05       # fraction of rows re-delivered verbatim
    shuffle_frac: float = 0.3    # fraction of rows displaced out of order
    content_pad_max: int = 160   # max filler bytes appended to content
    # F2 schema evolution (batch indices; None = off)
    add_col_at: int | None = None      # batches >= this gain size_bytes:int32
    widen_at: int | None = None        # batches >= this carry size_bytes:int64
    rename_at: int | None = None       # batches >= this rename lang -> language


def _hex8(a: np.ndarray) -> np.ndarray:
    """Vectorized 8-char hex of a uint32 array."""
    raw = binascii.hexlify(a.astype(">u4").tobytes())
    return np.frombuffer(raw, dtype="S8").astype("U8")


def _string(a) -> pa.Array:
    return pc.cast(pa.array(a), pa.string())


def generate_change_events(out_dir: str, spec: GeneratorSpec) -> dict:
    """Write ``batch-{i:04d}.parquet`` files under ``out_dir``; return metadata.

    Replay order = batch-file order, row order within file (delivery order).
    """
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events

    # --- logical event stream (LSN order); integers only — string columns
    # are materialized per batch slice so arbitrarily large event counts never
    # exceed Arrow's 2 GiB single-array limit -----------------------------
    ranks = np.arange(1, spec.n_repos + 1, dtype=np.float64)
    w = ranks ** -spec.zipf_s
    w /= w.sum()
    repo_id = rng.choice(spec.n_repos, size=n, p=w)
    path_id = rng.integers(0, spec.paths_per_repo, size=n)
    is_delete = rng.random(n) < spec.delete_rate
    pad_len = rng.integers(0, spec.content_pad_max, size=n).astype(np.int32)

    # --- delivery order: bounded out-of-order + duplicate delivery ------
    batch_rows = -(-n // spec.n_batches)  # ceil
    window = max(2, batch_rows // 3)
    noise = np.where(rng.random(n) < spec.shuffle_frac,
                     rng.integers(-window, window, size=n), 0)
    order = np.argsort(np.arange(n) + noise, kind="stable").astype(np.int64)

    def build_slice(idx: np.ndarray) -> pa.Table:
        """Materialize the string columns for one delivery-order slice."""
        r_id, p_id = repo_id[idx], path_id[idx]
        lsn = idx + 1  # LSN of the logical event at position idx
        dele = is_delete[idx]
        repo = pc.binary_join_element_wise(
            pa.scalar("org"), _string(r_id // 10), pa.scalar("/repo-"), _string(r_id), "")
        lang_arr = np.array(LANGS)[p_id % len(LANGS)]
        path = pc.binary_join_element_wise(
            pa.scalar("src/pkg_"), _string(p_id // 8), pa.scalar("/mod_"),
            _string(p_id), pa.scalar("."), _string(lang_arr), "")
        commit = pc.binary_join_element_wise(
            pc.utf8_lpad(_string(lsn), 12, "0"),
            _string(_hex8((lsn * 2654435761) % (1 << 32))), "-")
        body = pc.binary_join_element_wise(
            pa.scalar("content|"), repo, pa.scalar("|"), path,
            pa.scalar("|v"), _string(lsn), pa.scalar("|"),
            pc.binary_repeat(pa.scalar("x"), pa.array(pad_len[idx])), "")
        content = pc.if_else(pa.array(~dele), body, pa.scalar(None, pa.string()))
        size_bytes = pc.if_else(
            pa.array(~dele), pc.binary_length(body), pa.scalar(None, pa.int32()))
        return pa.table({
            "repo": repo, "path": path, "commit": commit,
            "lang": _string(lang_arr), "content": content, "size_bytes": size_bytes,
        })

    os.makedirs(out_dir, exist_ok=True)
    n_dups_total = 0
    files = []
    for b in range(spec.n_batches):
        lo, hi = b * batch_rows, min((b + 1) * batch_rows, n)
        if lo >= hi:
            break
        chunk = build_slice(order[lo:hi])
        # duplicate delivery inside the same batch file (D2: must be a no-op)
        n_dups = int((hi - lo) * spec.dup_rate)
        if n_dups:
            dup_idx = rng.integers(0, hi - lo, size=n_dups)
            chunk = pa.concat_tables([chunk, chunk.take(pa.array(dup_idx))])
            perm = rng.permutation(chunk.num_rows)
            chunk = chunk.take(pa.array(perm))
            n_dups_total += n_dups

        cols = {name: chunk[name] for name in chunk.column_names}
        if spec.add_col_at is None or b < spec.add_col_at:
            cols.pop("size_bytes")
        elif spec.widen_at is None or b < spec.widen_at:
            cols["size_bytes"] = pc.cast(cols["size_bytes"], pa.int32())
        else:
            cols["size_bytes"] = pc.cast(cols["size_bytes"], pa.int64())
        if spec.rename_at is not None and b >= spec.rename_at:
            cols["language"] = cols.pop("lang")
        out = pa.table(cols)
        fp = os.path.join(out_dir, f"batch-{b:04d}.parquet")
        pq.write_table(out, fp)
        files.append(fp)

    return {
        "files": files,
        "n_logical_events": n,
        "n_delivered": n + n_dups_total,
        "n_duplicates": n_dups_total,
        "n_repos": spec.n_repos,
        "spec": spec,
    }


def generate_patch_events(out_dir: str, spec: GeneratorSpec) -> dict:
    """Partial-update (patch) change stream for merge_strategy='patch'
    (cdc/patch.py): same key/commit recipe as F1 plus an ``op`` column
    ('u'/'d'); a 'u' row leaves each value column null (= UNCHANGED) with
    fixed probability, a 'd' row carries no values. Disorder is strictly
    INTRA-batch (rows shuffled within their batch file only) and duplicates
    are intra-batch verbatim re-deliveries — matching the patch strategy's
    documented per-key epoch-ordered delivery contract for ANY epoch
    grouping of whole files."""
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events
    ranks = np.arange(1, spec.n_repos + 1, dtype=np.float64)
    w = ranks ** -spec.zipf_s
    w /= w.sum()
    repo_id = rng.choice(spec.n_repos, size=n, p=w)
    path_id = rng.integers(0, spec.paths_per_repo, size=n)
    is_delete = rng.random(n) < spec.delete_rate
    has_content = (rng.random(n) < 0.6) & ~is_delete
    has_lang = (rng.random(n) < 0.5) & ~is_delete
    batch_rows = -(-n // spec.n_batches)

    os.makedirs(out_dir, exist_ok=True)
    files = []
    n_dups_total = 0
    for b in range(spec.n_batches):
        lo, hi = b * batch_rows, min((b + 1) * batch_rows, n)
        if lo >= hi:
            break
        idx = np.arange(lo, hi)
        rng.shuffle(idx)  # intra-batch disorder only
        lsn = idx + 1
        r_id, p_id = repo_id[idx], path_id[idx]
        repo = pc.binary_join_element_wise(
            pa.scalar("org"), _string(r_id // 10), pa.scalar("/repo-"),
            _string(r_id), "")
        lang_all = np.array(LANGS)[p_id % len(LANGS)]
        path = pc.binary_join_element_wise(
            pa.scalar("src/pkg_"), _string(p_id // 8), pa.scalar("/mod_"),
            _string(p_id), pa.scalar("."), _string(lang_all), "")
        commit = pc.binary_join_element_wise(
            pc.utf8_lpad(_string(lsn), 12, "0"),
            _string(_hex8((lsn * 2654435761) % (1 << 32))), "-")
        body = pc.binary_join_element_wise(
            pa.scalar("patch|"), repo, pa.scalar("|"), path,
            pa.scalar("|v"), _string(lsn), "")
        content = pc.if_else(pa.array(has_content[idx]), body,
                             pa.scalar(None, pa.string()))
        lang = pc.if_else(pa.array(has_lang[idx]), _string(lang_all),
                          pa.scalar(None, pa.string()))
        op = pc.if_else(pa.array(is_delete[idx]), pa.scalar("d"),
                        pa.scalar("u"))
        chunk = pa.table({"repo": repo, "path": path, "commit": commit,
                          "op": op, "lang": lang, "content": content})
        n_dups = int((hi - lo) * spec.dup_rate)
        if n_dups:
            dup_idx = rng.integers(0, hi - lo, size=n_dups)
            chunk = pa.concat_tables([chunk, chunk.take(pa.array(dup_idx))])
            perm = rng.permutation(chunk.num_rows)
            chunk = chunk.take(pa.array(perm))
            n_dups_total += n_dups
        fp = os.path.join(out_dir, f"batch-{b:04d}.parquet")
        pq.write_table(chunk, fp)
        files.append(fp)
    return {"files": files, "n_logical_events": n,
            "n_delivered": n + n_dups_total, "n_duplicates": n_dups_total,
            "spec": spec}


def events_to_debezium_jsonl(parquet_files: list[str], out_dir: str,
                             key_cols=("repo", "path"),
                             carry_tx_id: bool = True) -> list[str]:
    """Test-side converter: re-encode canonical change-event parquet batches
    as Debezium envelope JSONL (one file per input batch) so the
    sources/debezium.py adapter can be round-trip-tested against the
    original corpus. Upserts rotate through op c/u/r by LSN (all three map
    to upsert); deletes (null ``content`` — or op=='d' when an op column is
    present) become ``{"before": {key}, "after": null, "op": "d"}``.
    Per-row json.dumps loop — fixture code, not a pipeline."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    outs = []
    for f in parquet_files:
        t = pq.read_table(f)
        cols = t.column_names
        has_op = "op" in cols
        value_cols = [c for c in cols
                      if c not in (*key_cols, "commit", "op")]
        lines = []
        for r in t.to_pylist():
            lsn = int(r["commit"][:12])
            src = {"lsn": lsn}
            if carry_tx_id:
                # txId is the commit's opaque suffix (the hex8 after the
                # 12-digit LSN prefix) — a realistic transaction label; the
                # adapter re-synthesizes commit = <lsn:012d>-<txId>, so the
                # round-trip reconstructs the original commit exactly
                src["txId"] = r["commit"][13:]
            is_del = (r["op"] == "d") if has_op else (r["content"] is None)
            if is_del:
                env = {"before": {k: r[k] for k in key_cols}, "after": None,
                       "op": "d", "source": src}
            else:
                env = {"before": None,
                       "after": {**{k: r[k] for k in key_cols},
                                 **{c: r[c] for c in value_cols}},
                       "op": "cur"[lsn % 3], "source": src}
            lines.append(json.dumps(env))
        dst = os.path.join(
            out_dir, os.path.splitext(os.path.basename(f))[0] + ".jsonl")
        with open(dst, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        outs.append(dst)
    return outs
