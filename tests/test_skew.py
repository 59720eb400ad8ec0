"""Skew robustness (SURVEY.md §7.5): hot-repo Zipfian corpora must still
replay to oracle equality, and bucket load must stay bounded because the PK
includes ``path`` (hash spread) and num_buckets >> worker count."""

import numpy as np

from oregonwaterdataportal_etl_ray.cdc import CdcEngine, oracle_replay
from oregonwaterdataportal_etl_ray.fixtures import GeneratorSpec, generate_change_events


def test_heavy_skew_replay_matches_oracle(ray_session, tmp_path):
    meta = generate_change_events(str(tmp_path / "ev"), GeneratorSpec(
        n_events=20_000, n_repos=40, paths_per_repo=25, n_batches=5,
        seed=77, zipf_s=2.5, dup_rate=0.1, shuffle_frac=0.5))
    eng = CdcEngine(str(tmp_path / "state"), num_buckets=16, compact_every=2)
    eng.replay(meta["files"], epoch_size=2)

    final = eng.final_table().to_pandas().sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    want = oracle_replay(meta["files"]).sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    assert list(final["sha256"]) == list(want["sha256"])

    # hottest repo dominates the stream, yet per-bucket live rows stay spread:
    # no bucket holds more than 8x the mean (PK includes path). compact()
    # folds outstanding runs so manifest row_count is exact.
    eng.compact()
    counts = np.array([m.row_count for m in eng.lineage().values()])
    assert counts.sum() == len(final)
    assert counts.max() <= max(8 * counts.mean(), 50)
