"""End-to-end run of the curation export job (jobs/curate_job.py)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_curate_job_end_to_end(spark, tmp_path):
    from jobs.curate_job import main

    wd = str(tmp_path / "curate")
    counts = main(["--workdir", wd, "--images", "60",
                   "--shard-bytes", "32768", "--sf-dir",
                   "/root/testdata/sf0.001"])

    # the funnel only narrows, and nothing degenerates to empty
    assert counts["input"] == 500
    assert 0 < counts["after_clean_gates"] <= counts["input"]
    assert 0 < counts["after_near_dup"] <= counts["after_clean_gates"]
    assert 0 < counts["train"] <= counts["after_near_dup"]
    assert counts["train"] + counts["heldout"] == counts["after_near_dup"]
    assert 0 < counts["train_final"] <= counts["train"]
    assert counts["blocks"] > 0
    assert counts["block_rows"] >= counts["blocks"]
    assert counts["images_ok"] == 60
    assert 0 < counts["images_kept"] <= counts["images_ok"]
    assert counts["image_shards"] > 1

    # written outputs are readable and consistent with the summary
    corpus = spark.read.parquet(f"{wd}/corpus")
    assert corpus.count() == counts["after_near_dup"]
    assert set(corpus.columns) >= {"doc_id", "source", "text", "split"}
    blocks = spark.read.parquet(f"{wd}/blocks")
    assert blocks.count() == counts["block_rows"]
    toks = spark.read.parquet(f"{wd}/block_tokens")
    assert toks.count() == counts["blocks"]
    from pyspark.sql import functions as F
    assert toks.where(F.size("tokens") != 2048).count() == 0
    shards = spark.read.parquet(f"{wd}/image_shards")
    assert shards.count() == counts["images_kept"]
    # every block slice fits its block
    bad = blocks.where((blocks.block_off < 0)
                       | (blocks.tok_end <= blocks.tok_begin)).count()
    assert bad == 0


def test_curate_job_c4_gate_documented_behavior(spark, tmp_path):
    """--c4 applies the punctuation-based page gate; the synthetic corpus
    has no sentence punctuation, so the text leg drains (the exact case
    the flag's help text warns about) while the image leg still runs."""
    from jobs.curate_job import main

    counts = main(["--workdir", str(tmp_path / "c4"), "--images", "30",
                   "--c4", "--sf-dir", "/root/testdata/sf0.001"])
    assert counts["after_clean_gates"] == 0
    assert counts["images_ok"] == 30


def test_curate_job_with_mixture(spark, tmp_path):
    """--mix resamples the cleaned corpus to target source proportions
    before splitting; the funnel arithmetic stays consistent."""
    import json

    from jobs.curate_job import main

    weights = {f"src{i}": 1.0 for i in range(10)}  # drop the other 10
    counts = main(["--workdir", str(tmp_path / "mix"), "--images", "30",
                   "--mix", json.dumps(weights),
                   "--sf-dir", "/root/testdata/sf0.001"])
    assert 0 < counts["after_mix"] <= counts["after_near_dup"]
    assert counts["train"] + counts["heldout"] == counts["after_mix"]
    corpus = spark.read.parquet(str(tmp_path / "mix" / "corpus"))
    srcs = {r["source"] for r in corpus.select("source").distinct().collect()}
    assert srcs <= set(weights)  # unweighted sources are gone
