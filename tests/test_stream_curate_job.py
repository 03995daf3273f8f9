"""End-to-end runs of the streaming curation job
(jobs/stream_curate_job.py): each invocation is one availableNow
catch-up pass; state and checkpoint chain across invocations."""

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LONG = ("plain unpunctuated prose about rivers and stones and boats "
        "and tides and mountain weather and village squares and tea "
        "and clocks and warm windowsills drifting toward the")


def _drop(spark, rows, src, tmp_path, stem):
    df = spark.createDataFrame(
        [(i, "web", t) for i, t in rows],
        "doc_id string, source string, text string")
    stage = tmp_path / f"stage_{stem}"
    df.coalesce(1).write.parquet(str(stage))
    for i, part in enumerate(glob.glob(str(stage / "part-*.parquet"))):
        shutil.move(part, str(src / f"{stem}_{i}.parquet"))


def test_stream_curate_job_chains_across_invocations(spark, tmp_path):
    from jobs.stream_curate_job import main

    src = tmp_path / "incoming"
    src.mkdir()
    state = str(tmp_path / "state")
    argv = ["--stream-dir", str(src), "--state-dir", state,
            "--jaccard", "0.8", "--timeout", "120"]

    _drop(spark, [("d00", LONG + " afternoon"),
                  ("d01", "short unique note on clocks")],
          src, tmp_path, "b1")
    s1 = main(argv)
    assert s1["epochs_this_run"] == 1
    assert s1["curated_total"] == 2
    assert s1["metrics"][-1]["n_input"] == 2

    # second invocation: one near-dup of a shipped doc (dropped against
    # the persisted band index) plus one fresh doc (shipped)
    _drop(spark, [("d10", LONG + " evening"),
                  ("d11", "fresh unique note on tides")],
          src, tmp_path, "b2")
    s2 = main(argv)
    assert s2["epochs_this_run"] == 1
    assert s2["curated_total"] == 3
    assert s2["metrics"][-1]["n_near_dup_dropped"] == 1

    # third invocation with nothing new: no epoch, nothing moves
    s3 = main(argv)
    assert s3["epochs_this_run"] == 0
    assert s3["curated_total"] == 3
