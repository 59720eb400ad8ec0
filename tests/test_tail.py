"""Continuous tail mode: files arriving WHILE the tailer runs are picked up
and applied incrementally; the result equals a one-shot replay's."""

import os
import shutil
import threading
import time

from oregonwaterdataportal_etl_ray.cdc import CdcEngine, oracle_replay
from oregonwaterdataportal_etl_ray.fixtures import GeneratorSpec, generate_change_events


def test_tail_applies_late_arriving_files(ray_session, tmp_path):
    src = tmp_path / "all"
    live = tmp_path / "live"
    live.mkdir()
    meta = generate_change_events(str(src), GeneratorSpec(
        n_events=8000, n_repos=20, paths_per_repo=20, n_batches=6, seed=33))
    files = meta["files"]
    # first half is present when the tailer starts
    for f in files[:3]:
        shutil.copy(f, live / os.path.basename(f))

    def feed():
        for f in files[3:]:
            time.sleep(0.8)
            shutil.copy(f, str(live) + "/.tmp_" + os.path.basename(f))
            os.replace(str(live) + "/.tmp_" + os.path.basename(f),
                       live / os.path.basename(f))

    eng = CdcEngine(str(tmp_path / "state"), num_buckets=8, compact_every=3)
    feeder = threading.Thread(target=feed, daemon=True)
    feeder.start()
    res = eng.tail(str(live), epoch_size=1, poll_interval_s=0.3, max_idle_polls=6)
    feeder.join()
    assert len(res.epochs) == len(files)

    final = eng.final_table().to_pandas().sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    want = oracle_replay(files).sort_values(["repo", "path"]).reset_index(drop=True)
    assert list(final["sha256"]) == list(want["sha256"])
