"""Schema evolution: rename-alias mapping + Arrow schema unification.

Generalizes the reference's three evolution mechanisms (SURVEY.md §1.3):
  1. strict validation  — declared core columns must exist after remapping
     (reference pydantic ``extra="forbid"``, /root/reference/userCode/wrd/types.py:251),
  2. alias/rename on read — declarative remap table
     (reference ``Field(alias=...)``, /root/reference/userCode/wrd/types.py:207;
      ontology term remap, /root/reference/userCode/ontology.py:60-328),
  3. open schema — unknown upstream columns survive into the unified schema
     (reference ``extra="allow"``, /root/reference/userCode/groundwater/wells.py:29-43).

Column adds null-fill; widenings (e.g. int32 -> int64) resolve by permissive
Arrow promotion. The target schema is planned once from Parquet file footers
(metadata only — nothing is read), then every batch is cast to it inside
``map_batches`` so all blocks agree.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.dataset as pads

CORE_COLUMNS = ("repo", "path", "commit", "lang", "content")
# names the engine appends itself — an input column with one of these names
# would collide (duplicate fields crash pyarrow lookups / make the shuffle
# key ambiguous), so planning rejects them loudly
RESERVED_COLUMNS = ("lsn", "bucket", "sha256")


def _validate_and_order(renamed: pa.Schema, origin: str = "input") -> pa.Schema:
    """Shared tail of schema planning: strict core-column presence, reserved
    engine-name rejection, stable core-first ordering. ONE definition so the
    two planners can't drift."""
    missing = [c for c in CORE_COLUMNS if renamed.get_field_index(c) < 0]
    if missing:
        raise ValueError(f"{origin} missing core columns after remap: {missing}")
    reserved = [c for c in RESERVED_COLUMNS if renamed.get_field_index(c) >= 0]
    if reserved:
        raise ValueError(
            f"{origin} uses reserved engine column names {reserved}; rename "
            "them (EvolutionSpec) — the engine appends these itself")
    extras = [f for f in renamed if f.name not in CORE_COLUMNS]
    return pa.schema([renamed.field(c) for c in CORE_COLUMNS] + extras)


@dataclass(frozen=True)
class EvolutionSpec:
    """Declarative remap table: physical-column-name -> canonical name."""
    renames: dict[str, str] = field(default_factory=lambda: {"language": "lang"})


def conform_schema(s: pa.Schema, evolution: EvolutionSpec) -> pa.Schema:
    """Apply renames + strict core-column validation + stable ordering to one
    already-known Arrow schema (the non-file half of plan_target_schema —
    used when the input is a Dataset, e.g. a bootstrap snapshot)."""
    renamed = pa.schema(
        [pa.field(evolution.renames.get(f.name, f.name), f.type) for f in s])
    return _validate_and_order(renamed)


def plan_target_schema(paths: list[str], evolution: EvolutionSpec) -> pa.Schema:
    """Unify the schemas of all input files (footer metadata only).

    Renames are applied before unification; conflicting numeric widths promote
    permissively (int32+int64 -> int64). Strict validation is PER FILE for
    core columns — a single file missing `commit` would otherwise pass the
    union check, get null-filled per batch, and its null LSNs would win LWW
    (NaN sorts last) over genuine updates — and union-level for reserved
    engine names.
    """
    from concurrent.futures import ThreadPoolExecutor

    def one(p: str) -> pa.Schema:
        s = pads.dataset(p, format="parquet").schema
        renamed = pa.schema(
            [pa.field(evolution.renames.get(f.name, f.name), f.type) for f in s])
        missing = [c for c in CORE_COLUMNS if renamed.get_field_index(c) < 0]
        if missing:
            raise ValueError(
                f"batch file {p!r} missing core columns after remap: {missing}")
        return renamed

    # footer reads are I/O-bound; a thread pool keeps planning off the
    # critical path even for thousands of batch files
    with ThreadPoolExecutor(max_workers=16) as ex:
        schemas = list(ex.map(one, paths))
    unified = pa.unify_schemas(schemas, promote_options="permissive")
    return _validate_and_order(unified)


def conform_batch(batch: pa.Table, target: pa.Schema, evolution: EvolutionSpec) -> pa.Table:
    """Rename -> null-fill missing -> safe-cast -> reorder to ``target``."""
    renamed = batch.rename_columns(
        [evolution.renames.get(c, c) for c in batch.column_names]
    )
    cols = []
    for f in target:
        idx = renamed.schema.get_field_index(f.name)
        if idx < 0:
            cols.append(pa.nulls(batch.num_rows, f.type))
        else:
            col = renamed.column(idx)
            cols.append(col if col.type == f.type else col.cast(f.type))
    return pa.table(dict(zip(target.names, cols)))
