"""Partial-update ("patch") merge strategy: column-level upserts with
explicit deletes (cdc/patch.py) — fold laws, engine replay vs a sequential
single-process oracle, duplicate delivery, compaction equivalence,
kill-resume, layout persistence, and the patch+quarantine combination."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from oregonwaterdataportal_etl_ray.cdc import CdcEngine
from oregonwaterdataportal_etl_ray.cdc.patch import (fold_epoch_events,
                                                     fold_patch_runs,
                                                     oracle_patch_replay)
from oregonwaterdataportal_etl_ray.fixtures import (GeneratorSpec,
                                                    generate_patch_events)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("patch_events")
    return generate_patch_events(str(d), GeneratorSpec(
        n_events=8_000, n_repos=20, paths_per_repo=25, n_batches=8,
        seed=31, dup_rate=0.06, delete_rate=0.08))


def _final(eng):
    return (eng.final_table().to_pandas()
            .sort_values(["repo", "path"]).reset_index(drop=True))


def _assert_matches_oracle(eng, files):
    f = _final(eng)
    o = oracle_patch_replay(files)
    assert len(f) == len(o)
    for col in ("repo", "path", "lsn", "content", "lang"):
        assert list(f[col].fillna("~")) == list(o[col].fillna("~")), col
    return f


# ---------------------------------------------------------------- kernel laws
def _events(rows):
    """rows: (repo, path, lsn, op, content, lang)"""
    t = pa.table({
        "repo": pa.array([r[0] for r in rows]),
        "path": pa.array([r[1] for r in rows]),
        "lsn": pa.array([r[2] for r in rows], pa.int64()),
        "op": pa.array([r[3] for r in rows]),
        "content": pa.array([r[4] for r in rows]),
        "lang": pa.array([r[5] for r in rows]),
    })
    return t


def test_fold_epoch_coalesces_last_nonnull_since_delete():
    t = _events([
        ("r", "a", 1, "u", "c1", "py"),
        ("r", "a", 2, "u", None, "rs"),   # content unchanged
        ("r", "a", 3, "u", "c3", None),   # lang unchanged
        ("r", "b", 4, "u", "x", "go"),
        ("r", "b", 5, "d", None, None),   # delete resets b
        ("r", "b", 6, "u", None, "md"),   # re-set lang only; content stays null
    ])
    out = fold_epoch_events(t).to_pandas().set_index("path")
    assert out.loc["a", "content"] == "c3" and out.loc["a", "lang"] == "rs"
    assert not out.loc["a", "_reset"]
    assert out.loc["b", "content"] is None and out.loc["b", "lang"] == "md"
    assert out.loc["b", "_reset"]
    assert out.loc["a", "lsn"] == 3 and out.loc["b", "lsn"] == 6


def test_fold_epoch_is_lsn_ordered_not_arrival_ordered():
    fwd = _events([("r", "a", 1, "u", "old", None),
                   ("r", "a", 9, "u", "new", None)])
    rev = fwd.take(pa.array([1, 0]))
    assert fold_epoch_events(fwd).to_pandas()["content"][0] == "new"
    assert fold_epoch_events(rev).to_pandas()["content"][0] == "new"


def test_fold_epoch_delete_row_values_are_ignored():
    t = _events([("r", "a", 1, "u", "keep", "py"),
                 ("r", "a", 2, "d", "GHOST", "GHOST")])
    out = fold_epoch_events(t).to_pandas()
    assert out["content"][0] is None and out["lang"][0] is None


def test_fold_runs_later_nonnull_wins_and_reset_cuts_history():
    run1 = fold_epoch_events(_events([("r", "a", 1, "u", "c1", "py"),
                                      ("r", "b", 2, "u", "b1", "go")]))
    run2 = fold_epoch_events(_events([("r", "a", 3, "u", None, "rs"),
                                      ("r", "b", 4, "d", None, None)]))
    out = fold_patch_runs([run1, run2]).to_pandas().set_index("path")
    assert out.loc["a", "content"] == "c1"     # unchanged carries through
    assert out.loc["a", "lang"] == "rs"
    assert out.loc["b", "content"] is None     # reset cut b1 off
    assert out.loc["b", "_reset"]


def test_fold_runs_refuses_cross_epoch_lsn_regression():
    """A later epoch part carrying an OLDER lsn for a key (cross-epoch
    stale redelivery) violates the patch ordering contract and would
    silently overwrite newer column values — fold_patch_runs must refuse
    loudly instead of corrupting state."""
    newer = fold_epoch_events(_events([("r", "a", 9, "u", "v9", "py")]))
    stale = fold_epoch_events(_events([("r", "a", 3, "u", "v3", "go")]))
    with pytest.raises(ValueError, match="epoch-ordered"):
        fold_patch_runs([newer, stale])
    # equal lsn across parts (verbatim duplicate redelivery) stays benign
    dup = fold_epoch_events(_events([("r", "a", 9, "u", "v9", "py")]))
    out = fold_patch_runs([newer, dup]).to_pandas()
    assert list(out["content"]) == ["v9"]
    # and regression on a DIFFERENT key still trips (not just adjacency)
    other = fold_epoch_events(_events([("r", "b", 1, "u", "b1", None),
                                       ("r", "a", 2, "u", "v2", None)]))
    with pytest.raises(ValueError, match="regresses"):
        fold_patch_runs([newer, other])


def test_fold_runs_matches_one_shot_fold():
    """Folding per-epoch then across runs == folding all events at once
    (under intra-epoch lsn order + epoch-ordered keys)."""
    rng = np.random.default_rng(7)
    rows = []
    for lsn in range(1, 301):
        k = chr(97 + rng.integers(0, 6))
        op = "d" if rng.random() < 0.12 else "u"
        c = None if (op == "d" or rng.random() < 0.4) else f"c{lsn}"
        lg = None if (op == "d" or rng.random() < 0.5) else f"l{lsn}"
        rows.append(("r", k, lsn, op, c, lg))
    t = _events(rows)
    whole = fold_epoch_events(t).to_pandas().sort_values("path").reset_index(drop=True)
    parts = [fold_epoch_events(t.slice(i, 100)) for i in (0, 100, 200)]
    split = (fold_patch_runs(parts).to_pandas()
             .sort_values("path").reset_index(drop=True))
    for col in ("path", "content", "lang", "lsn", "_reset"):
        assert list(whole[col].fillna("~") if whole[col].dtype == object
                    else whole[col]) == \
               list(split[col].fillna("~") if split[col].dtype == object
                    else split[col]), col


# ------------------------------------------------------------- engine replay
def test_patch_replay_matches_sequential_oracle(corpus, tmp_path):
    eng = CdcEngine(str(tmp_path / "s"), num_buckets=8, compact_every=3,
                    merge_strategy="patch")
    res = eng.replay(corpus["files"], epoch_size=2)
    assert res.n_upserts > 0 and res.n_deletes > 0
    _assert_matches_oracle(eng, corpus["files"])


def test_patch_duplicate_delivery_is_noop(corpus, tmp_path):
    doubled = [f for f in corpus["files"] for _ in (0, 1)]
    eng = CdcEngine(str(tmp_path / "s"), num_buckets=8, compact_every=2,
                    merge_strategy="patch")
    eng.replay(doubled, epoch_size=3)
    _assert_matches_oracle(eng, corpus["files"])


def test_patch_compaction_cadence_is_result_invariant(corpus, tmp_path):
    eager = CdcEngine(str(tmp_path / "a"), num_buckets=8, compact_every=1,
                      merge_strategy="patch")
    eager.replay(corpus["files"], epoch_size=1)
    lazy = CdcEngine(str(tmp_path / "b"), num_buckets=8, compact_every=99,
                     merge_strategy="patch")
    lazy.replay(corpus["files"], epoch_size=4)
    fa, fb = _final(eager), _final(lazy)
    for col in ("repo", "path", "lsn", "content", "lang"):
        assert list(fa[col].fillna("~")) == list(fb[col].fillna("~")), col


def test_patch_kill_and_resume_reconverges(corpus, tmp_path):
    state = str(tmp_path / "s")
    eng = CdcEngine(state, num_buckets=8, compact_every=2,
                    merge_strategy="patch")
    with pytest.raises(RuntimeError, match="injected failure"):
        eng.replay(corpus["files"], epoch_size=1, fail_after_epoch=3)
    resumed = CdcEngine(state, num_buckets=8, compact_every=2,
                        merge_strategy="patch")
    resumed.replay(corpus["files"], epoch_size=1)
    _assert_matches_oracle(resumed, corpus["files"])


def test_strategy_is_sticky_and_mismatch_refuses(corpus, tmp_path):
    state = str(tmp_path / "s")
    CdcEngine(state, num_buckets=8, merge_strategy="patch").replay(
        corpus["files"][:2], epoch_size=1)
    # omitted strategy adopts the persisted one
    eng = CdcEngine(state, num_buckets=8)
    assert eng.merge_strategy == "patch"
    with pytest.raises(ValueError, match="merge_strategy"):
        CdcEngine(state, num_buckets=8, merge_strategy="lww")


def test_patch_refuses_view_deltas_and_bootstrap(tmp_path):
    eng = CdcEngine(str(tmp_path / "s"), num_buckets=4, merge_strategy="patch")
    with pytest.raises(NotImplementedError, match="patch"):
        eng.view_deltas()
    with pytest.raises(NotImplementedError, match="patch"):
        import ray
        eng.bootstrap(ray.data.from_items([{"repo": "r", "path": "p",
                                            "commit": "000000000001-x",
                                            "content": "c"}]))


def test_patch_changelog_stream_reconstructs_state(corpus, tmp_path):
    """Lossless-changelog law under patch: folding the emitted stream
    (grouped by epoch, epoch-ascending) with the engine's own run fold
    reconstructs the final table exactly."""
    eng = CdcEngine(str(tmp_path / "s"), num_buckets=8, compact_every=2,
                    merge_strategy="patch", retain_changelog=True)
    eng.replay(corpus["files"], epoch_size=1)
    stream = eng.changelog_dataset().to_pandas()
    assert set(stream["op"].unique()) <= {"patch", "upsert", "delete"}
    assert "_reset" in stream.columns
    parts = []
    for e in sorted(stream["epoch"].unique()):
        part = stream[stream["epoch"] == e].drop(columns=["epoch", "op"])
        parts.append(pa.Table.from_pandas(part, preserve_index=False))
    folded = (fold_patch_runs(parts).to_pandas())
    folded = (folded[folded["content"].notna()]
              .sort_values(["repo", "path"]).reset_index(drop=True))
    final = _final(eng)
    assert len(folded) == len(final)
    for col in ("repo", "path", "lsn", "content", "lang"):
        assert list(folded[col].fillna("~")) == list(final[col].fillna("~")), col


def test_patch_as_of_matches_prefix_replay(corpus, tmp_path):
    """Time travel under patch: state as of epoch E == a fresh patch replay
    of the first E+1 batch files, at every prefix."""
    eng = CdcEngine(str(tmp_path / "s"), num_buckets=8, compact_every=2,
                    merge_strategy="patch", retain_changelog=True)
    eng.replay(corpus["files"], epoch_size=1)
    for cut in (0, 2, len(corpus["files"]) - 1):
        asof = (eng.dataset_as_of(cut, with_sha=False).to_pandas()
                .sort_values(["repo", "path"]).reset_index(drop=True))
        ref = CdcEngine(str(tmp_path / f"ref{cut}"), num_buckets=8,
                        merge_strategy="patch")
        ref.replay(corpus["files"][:cut + 1], epoch_size=1)
        want = _final(ref)
        assert len(asof) == len(want), cut
        for col in ("repo", "path", "lsn", "content", "lang"):
            assert list(asof[col].fillna("~")) == list(want[col].fillna("~")), (cut, col)


def test_lww_corpus_without_op_fails_loud_under_patch(tmp_path):
    from oregonwaterdataportal_etl_ray.fixtures import generate_change_events
    d = tmp_path / "lww_events"
    meta = generate_change_events(str(d), GeneratorSpec(
        n_events=500, n_batches=2, seed=5))
    eng = CdcEngine(str(tmp_path / "s"), num_buckets=4,
                    merge_strategy="patch")
    with pytest.raises(Exception, match="'op' column"):
        eng.replay(meta["files"])


def test_patch_tombstone_gc_spares_rows_with_live_column_state(tmp_path):
    """GC must not purge a content-null patch row that still carries other
    column values — a later content patch legitimately resurrects the key
    WITH those values. Pure tombstones (all value columns null) are purged."""
    import os

    import pyarrow.parquet as pq

    d = tmp_path / "ev"
    d.mkdir()

    def write(name, rows):
        pq.write_table(_events(rows).drop_columns(["lsn"]).add_column(
            2, "commit", pa.array([f"{r[2]:012d}-x" for r in rows])),
            str(d / name))

    # key 'a': lang set, content never set (content-null, NOT a pure tomb)
    # key 'b': deleted outright (pure tombstone)
    write("batch-0000.parquet", [("r", "a", 1, "u", None, "py"),
                                 ("r", "b", 2, "u", "xx", "go"),
                                 ("r", "b", 3, "d", None, None)])
    eng = CdcEngine(str(tmp_path / "s"), num_buckets=4,
                    merge_strategy="patch", compact_every=1)
    eng.replay([str(d / "batch-0000.parquet")])
    assert eng.compact(purge_tombstones_below_lsn=10**9) >= 1
    # 'b' (pure tombstone) purged; 'a' (live column state) retained
    remaining = []
    for m in eng.lineage().values():
        if m.base_file:
            remaining.append(pq.read_table(
                os.path.join(str(tmp_path / "s"), m.base_file)))
    kept = pa.concat_tables(remaining, promote_options="permissive").to_pandas()
    assert "a" in set(kept["path"]) and "b" not in set(kept["path"])

    # the later content patch resurrects 'a' WITH its lang
    write("batch-0001.parquet", [("r", "a", 4, "u", "c4", None)])
    eng.replay([str(d / "batch-0001.parquet")])
    f = _final(eng).set_index("path")
    assert f.loc["a", "content"] == "c4" and f.loc["a", "lang"] == "py"


def test_patch_quarantine_routes_invalid_op(corpus, tmp_path):
    # poison one file: an op outside {'u','d'} at two rows
    src = corpus["files"][0]
    t = pq.read_table(src)
    m = np.zeros(t.num_rows, bool)
    m[[4, 11]] = True
    bad_op = pc.if_else(pa.array(m), pa.scalar("x"), t["op"])
    poisoned_dir = tmp_path / "poisoned"
    poisoned_dir.mkdir()
    pf = str(poisoned_dir / "batch-0000.parquet")
    pq.write_table(t.set_column(t.column_names.index("op"), "op", bad_op), pf)

    eng = CdcEngine(str(tmp_path / "s"), num_buckets=4,
                    merge_strategy="patch", quarantine=True)
    res = eng.replay([pf])
    assert res.n_quarantined == 2
    q = eng.quarantine_dataset().to_pandas()
    assert list(q["_qreason"].unique()) == ["invalid_op"]
