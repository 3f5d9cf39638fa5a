"""build_index must keep exactly one survivor per content hash even
when the corpus contains FULLY identical rows (same repo/path/commit
AND content) — the slim docmap re-attach join would otherwise fan the
winner out; build_index detects the row-count mismatch and repairs."""

import json
import os
import shutil

import pytest


@pytest.fixture(scope="module")
def spark():
    from ivory_spark.session import get_spark

    return get_spark("test-build-dup", cores=4, shuffle_partitions=4)


def test_fully_identical_rows_keep_one_survivor(spark, tmp_path_factory):
    from ivory_spark.index.build import IndexConfig, build_index

    base = str(tmp_path_factory.mktemp("dupbuild"))
    corpus = os.path.join(base, "corpus.parquet")
    spark.createDataFrame(
        [
            ("r1", "a", "c1", "py", "hello world"),
            ("r1", "a", "c1", "py", "hello world"),  # fully identical row
            ("r1", "b", "c1", "py", "hello world"),  # dup content, loses dedup
            ("r2", "c", "c1", "py", "other text"),
        ],
        "repo string, path string, commit string, lang string, content string",
    ).write.mode("overwrite").parquet(corpus)
    root = os.path.join(base, "idx")
    props = build_index(
        spark, corpus, root, IndexConfig(partitions=2, n_shards=2, salt_threshold=10)
    )
    dm = spark.read.parquet(os.path.join(root, "docmap"))
    assert props["n_docs"] == 2
    assert dm.count() == 2
    assert dm.select("docno").distinct().count() == 2
    with open(os.path.join(root, "_manifests", "docmap.json")) as f:
        m = json.load(f)
    assert m["metrics"].get("duplicate_rows_repaired") == 1
    # doclens must have exactly one row per docno too
    dl = spark.read.parquet(os.path.join(root, "doclens"))
    assert dl.count() == 2
    shutil.rmtree(base, ignore_errors=True)
