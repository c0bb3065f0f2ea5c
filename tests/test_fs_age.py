"""fs.age_seconds: the vacuum grace anchor must track last ACTIVITY
(max of mtime and ctime), so a rename — the stage-to-data move —
re-enters the grace window even when the stage WRITE outlived it."""

from __future__ import annotations

import os
import time

from redis_lsm_timeseries_spark.fs import LOCAL_FS


def test_age_tracks_mtime(tmp_path):
    p = tmp_path / "f.parquet"
    p.write_text("x")
    assert LOCAL_FS.age_seconds(str(p)) < 60


def test_rename_resets_age_despite_old_mtime(tmp_path):
    """A slow stage write (old mtime) moved into data/ moments ago
    (fresh ctime) is IN the grace window — rename bumps ctime even
    though it preserves mtime."""
    p = tmp_path / "staged.parquet"
    p.write_text("x")
    old = time.time() - 10_000
    os.utime(p, (old, old))  # simulate a 3-hour-old write
    # sanity: mtime alone would read as ancient...
    assert time.time() - os.stat(p).st_mtime > 5_000
    q = tmp_path / "moved.parquet"
    os.rename(p, q)
    # ...but the move re-anchors the age
    assert LOCAL_FS.age_seconds(str(q)) < 60


def test_absent_path_is_none(tmp_path):
    assert LOCAL_FS.age_seconds(str(tmp_path / "nope")) is None
