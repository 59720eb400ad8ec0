"""Incremental view maintenance: folding changelog deltas equals recompute.

The canonical CDC-consumer pattern — a downstream aggregate (per-repo live
file count + total content bytes) kept in sync by folding per-epoch deltas
instead of rescanning the table. The law pinned here: for every epoch prefix
E, the cumulative fold of ``view_deltas`` equals the aggregate recomputed
from ``dataset_as_of(E)``, and the final fold equals the final table.
"""

import pandas as pd
import pytest

from oregonwaterdataportal_etl_ray.cdc import CdcEngine
from oregonwaterdataportal_etl_ray.fixtures import (
    GeneratorSpec,
    generate_change_events,
)


@pytest.fixture(scope="module")
def engine(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("events")
    corpus = generate_change_events(str(d), GeneratorSpec(
        n_events=8_000, n_repos=20, paths_per_repo=25, n_batches=6,
        seed=37, dup_rate=0.05, shuffle_frac=0.3, delete_rate=0.10))
    state = str(tmp_path_factory.mktemp("state") / "s")
    eng = CdcEngine(state, num_buckets=8, compact_every=2,
                    retain_changelog=True)
    eng.replay(corpus["files"], epoch_size=1)
    return eng


def _recompute(df: pd.DataFrame) -> pd.DataFrame:
    g = df.groupby("repo", as_index=False).agg(
        n_files=("path", "size"),
        # UTF-8 BYTES, matching pc.binary_length (not char count)
        n_bytes=("content", lambda s: int(
            s.str.encode("utf-8").str.len().sum())))
    return g.sort_values("repo").reset_index(drop=True)


def _fold(deltas: pd.DataFrame, hi: int) -> pd.DataFrame:
    d = deltas[deltas["epoch"] <= hi]
    g = d.groupby("repo", as_index=False).agg(
        n_files=("d_files", "sum"), n_bytes=("d_bytes", "sum"))
    g = g[g["n_files"] > 0]  # repos whose files all died drop from the view
    return g.sort_values("repo").reset_index(drop=True)


def test_fold_matches_asof_every_prefix(engine, ray_session):
    deltas = engine.view_deltas().to_pandas()
    n_epochs = int(deltas["epoch"].max())
    for cut in (0, 1, n_epochs // 2, n_epochs):
        want = _recompute(engine.dataset_as_of(cut, with_sha=False).to_pandas())
        got = _fold(deltas, cut)
        got = got.astype({"n_files": "int64", "n_bytes": "int64"})
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_fold_matches_final_table(engine, ray_session):
    deltas = engine.view_deltas().to_pandas()
    want = _recompute(engine.final_table(with_sha=False).to_pandas())
    got = _fold(deltas, int(deltas["epoch"].max()))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hi_cut_restricts_epochs(engine, ray_session):
    d2 = engine.view_deltas(hi=2).to_pandas()
    assert d2["epoch"].max() <= 2
    full = engine.view_deltas().to_pandas()
    pd.testing.assert_frame_equal(
        d2.sort_values(["repo", "epoch"]).reset_index(drop=True),
        full[full["epoch"] <= 2].sort_values(
            ["repo", "epoch"]).reset_index(drop=True))


def test_view_deltas_refuses_without_retention(tmp_path, ray_session):
    d = tmp_path / "ev"
    corpus = generate_change_events(str(d), GeneratorSpec(
        n_events=2_000, n_repos=10, paths_per_repo=10, n_batches=4, seed=5))
    eng = CdcEngine(str(tmp_path / "s"), num_buckets=4, compact_every=2)
    eng.replay(corpus["files"], epoch_size=1)
    with pytest.raises(ValueError, match="retain_changelog"):
        eng.view_deltas()
