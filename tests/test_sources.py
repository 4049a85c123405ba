"""Source/sink tests: typed file scans with N/A-null handling
(sources/files.py) and the checkpointed exactly-once publisher
(sources/publish.py)."""

from __future__ import annotations

import json
import os

import pytest

from se_data_pipeline_spark.plans import fixtures
from se_data_pipeline_spark.sources.files import (
    read_channels_csv,
    read_quality_jsonl,
    read_url_lines,
    write_csv,
    write_json,
)
from se_data_pipeline_spark.sources.publish import (
    CheckpointedPublisher,
    FlakyTransport,
    LocalDirPublisher,
    publish_metadata_json,
)


def test_channels_csv_roundtrip_with_na(spark, tmp_path):
    """CSV written with 'N/A' markers comes back with typed nulls and
    long-typed numerics (SURVEY §1.3)."""
    p = tmp_path / "channels.csv"
    with open(p, "w") as f:
        f.write("title,id,n_videos,n_views,n_subs,custom_url,email,url\n")
        f.write("Chan A,UC1,10,1000,50000,@a,a@x.com,https://yt/UC1\n")
        f.write("Chan B,UC2,N/A,N/A,12000,,N/A,https://yt/UC2\n")
    df = read_channels_csv(spark, str(p))
    rows = {r["id"]: r for r in df.collect()}
    assert rows["UC1"]["n_videos"] == 10
    assert rows["UC2"]["n_videos"] is None
    assert rows["UC2"]["email"] is None
    assert dict(df.dtypes)["n_subs"] == "bigint"


def test_multi_file_csv_union(spark, tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    for i in range(3):
        with open(d / f"part{i}.csv", "w") as f:
            f.write("title,id,n_videos,n_views,n_subs,custom_url,email,url\n")
            f.write(f"C{i},UC{i},1,1,20000,,,https://yt/UC{i}\n")
    df = read_channels_csv(spark, str(d))
    assert df.count() == 3


def test_quality_jsonl_schema(spark, tmp_path):
    p = tmp_path / "quality.jsonl"
    rec = {
        "url": "https://yt/UC1",
        "snrss": [21.5, 3.0],
        "acss": [[{"label": "Speech", "score": 0.9}], []],
    }
    with open(p, "w") as f:
        f.write(json.dumps(rec) + "\n")
    df = read_quality_jsonl(spark, str(p))
    row = df.collect()[0]
    assert row["snrss"] == [21.5, 3.0]
    assert row["acss"][0][0]["label"] == "Speech"


def test_url_lines_trimmed(spark, tmp_path):
    p = tmp_path / "urls.txt"
    p.write_text("  https://a \n\nhttps://b\n")
    assert [r["url"] for r in read_url_lines(spark, str(p)).collect()] == [
        "https://a",
        "https://b",
    ]


def test_csv_and_json_sinks(spark, tmp_path):
    df = fixtures.channels_df(spark).limit(5)
    out_csv = str(tmp_path / "out_csv")
    write_csv(df, out_csv, single_file=True)
    files = [f for f in os.listdir(out_csv) if f.endswith(".csv")]
    assert len(files) == 1
    out_json = str(tmp_path / "out_json")
    write_json(df, out_json)
    back = spark.read.json(out_json)
    assert back.count() == 5


# ------------------------------------------------------------ publisher


def test_publisher_idempotent_and_retrying(tmp_path):
    root = str(tmp_path / "pub")
    flaky = FlakyTransport(LocalDirPublisher(root), fail_first_n=2)
    pub = CheckpointedPublisher(
        flaky, str(tmp_path / "ledger.txt"), attempts=5, backoff_s=0.0,
        sleep=lambda s: None,
    )
    assert pub.publish("batch-000", ['{"a":1}']) is True
    assert flaky.attempts == 3  # 2 failures + 1 success
    # replay is a no-op (exactly-once per batch id)
    assert pub.publish("batch-000", ['{"a":1}']) is False
    assert flaky.attempts == 3
    assert os.path.exists(os.path.join(root, "batch-000.json"))

    # a fresh publisher instance reloads the ledger from disk
    pub2 = CheckpointedPublisher(
        LocalDirPublisher(root), str(tmp_path / "ledger.txt")
    )
    assert pub2.publish("batch-000", ["x"]) is False


def test_publisher_raises_after_exhausted_retries(tmp_path):
    flaky = FlakyTransport(LocalDirPublisher(str(tmp_path / "p")), fail_first_n=99)
    pub = CheckpointedPublisher(
        flaky, str(tmp_path / "ledger.txt"), attempts=3, backoff_s=0.0,
        sleep=lambda s: None,
    )
    with pytest.raises(ConnectionError):
        pub.publish("b1", ["x"])
    # nothing committed
    assert pub.committed() == set()


def test_publish_metadata_json_is_canonical():
    a = publish_metadata_json({"b": 1, "a": [1, 2]})
    b = publish_metadata_json({"a": [1, 2], "b": 1})
    assert a == b == b'{"a":[1,2],"b":1}'


def test_write_text_log_append_accumulates(spark, tmp_path):
    """K4: 'id|reason' text append — two writes accumulate like the
    reference's open(..., 'a') skip log."""
    from pyspark.sql import Row

    from se_data_pipeline_spark.sources.files import write_text_log

    out = str(tmp_path / "skips")
    df1 = spark.createDataFrame([Row(id="c1", reason="few_videos")])
    df2 = spark.createDataFrame([Row(id="c2", reason="low_quality")])
    write_text_log(df1, out)
    write_text_log(df2, out)
    lines = {r["value"] for r in spark.read.text(out).collect()}
    assert lines == {"c1|few_videos", "c2|low_quality"}


def test_columnar_roundtrip_parquet_and_orc(spark, tmp_path):
    """Both built-in columnar formats round-trip types exactly,
    including timestamps and nested arrays."""
    from se_data_pipeline_spark.sources.files import (
        read_columnar,
        write_columnar,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5, [1, 2]), (2, "b", 2.5, [3])],
        "id long, s string, v double, arr array<long>",
    )
    for fmt in ("parquet", "orc"):
        p = str(tmp_path / fmt)
        write_columnar(df, p, fmt=fmt)
        back = read_columnar(spark, p, fmt=fmt)
        assert back.schema == df.schema
        assert sorted(r["id"] for r in back.collect()) == [1, 2]


def test_columnar_partitioned_overwrite_replaces_under_dynamic(
    spark, tmp_path
):
    """write_columnar is replace-the-table semantics: rewriting with a
    frame that lacks some old partitions must delete them even when
    the session conf is partitionOverwriteMode=dynamic (the writer
    pins static internally; unpinned, partition k=2 would survive and
    readers would see stale rows)."""
    import glob
    import os

    from se_data_pipeline_spark.sources.files import write_columnar

    p = str(tmp_path / "t")
    full = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 2)], "id long, k int"
    )
    smaller = spark.createDataFrame([(9, 0), (8, 1)], "id long, k int")
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        write_columnar(full, p, partition_by=["k"])
        write_columnar(smaller, p, partition_by=["k"])
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    parts = sorted(
        os.path.basename(d) for d in glob.glob(os.path.join(p, "k=*"))
    )
    assert parts == ["k=0", "k=1"], parts
    assert sorted(r["id"] for r in spark.read.parquet(p).collect()) == [8, 9]


def test_columnar_schema_evolution_merge(spark, tmp_path):
    """Files written before a column existed read back as null for
    that column under mergeSchema."""
    from se_data_pipeline_spark.sources.files import read_columnar

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(
        p + "/part=old"
    )
    spark.createDataFrame(
        [(2, "b", 9.0)], "id long, s string, score double"
    ).write.parquet(p + "/part=new")
    back = read_columnar(spark, p, merge_schema=True)
    rows = {r["id"]: r for r in back.collect()}
    assert rows[2]["score"] == 9.0
    assert rows[1]["score"] is None


def test_dynamic_partition_overwrite_replaces_only_touched(spark, tmp_path):
    """partitionOverwriteMode=dynamic rewrites ONLY the partitions
    present in the incoming batch — the incremental-maintenance
    pattern for a 100 TB partitioned table (a full static overwrite
    would drop every other partition)."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "table")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, part string, v long"
    )
    base.write.partitionBy("part").parquet(p)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        spark.createDataFrame(
            [(9, "b", 99)], "id long, part string, v long"
        ).write.mode("overwrite").partitionBy("part").parquet(p)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    rows = {
        (r["part"], r["id"]): r["v"]
        for r in spark.read.parquet(p).collect()
    }
    # partition b replaced, a and c untouched
    assert rows == {("a", 1): 10, ("c", 3): 30, ("b", 9): 99}


# ------------------------------------------- distributed publisher


def test_distributed_publisher_shards_replay_and_ledger(spark, tmp_path):
    """Executor-side publish: every partition uploads its own shard,
    the union of shards is the batch, replay of a committed batch id
    is a no-op, and a fresh instance reloads the ledger."""
    from pyspark.sql import functions as F

    from se_data_pipeline_spark.sources.publish import DistributedPublisher

    pub_dir = str(tmp_path / "pub")
    ledger = str(tmp_path / "ledger.txt")
    pub = DistributedPublisher(LocalDirPublisher(pub_dir), ledger)
    df = spark.range(100).withColumn("v", F.col("id") * 2).repartition(4)

    assert pub.publish_batch(df, "b0") is True
    files = sorted(os.listdir(pub_dir))
    assert 1 <= len(files) <= 4
    assert all(f.startswith("b0-part-") and f.endswith(".json") for f in files)
    recs = []
    for f in files:
        with open(os.path.join(pub_dir, f)) as fh:
            recs += [json.loads(line) for line in fh.read().splitlines()]
    assert sorted((r["id"], r["v"]) for r in recs) == [
        (i, 2 * i) for i in range(100)
    ]

    # replay: committed batch id -> no upload, no new files
    assert pub.publish_batch(df, "b0") is False
    assert sorted(os.listdir(pub_dir)) == files

    pub2 = DistributedPublisher(LocalDirPublisher(pub_dir), ledger)
    assert pub2.publish_batch(df, "b0") is False


def test_distributed_publisher_retries_on_executor(spark, tmp_path):
    """The retry loop runs inside the partition task: a transport that
    fails its first attempts per task copy still lands every shard."""
    from se_data_pipeline_spark.sources.publish import DistributedPublisher

    pub_dir = str(tmp_path / "pub")
    flaky = FlakyTransport(LocalDirPublisher(pub_dir), fail_first_n=2)
    pub = DistributedPublisher(
        flaky, str(tmp_path / "ledger.txt"), attempts=5, backoff_s=0.0
    )
    df = spark.range(40).repartition(2)
    assert pub.publish_batch(df, "b1") is True
    files = sorted(os.listdir(pub_dir))
    assert len(files) == 2
    total = 0
    for f in files:
        with open(os.path.join(pub_dir, f)) as fh:
            total += len(fh.read().splitlines())
    assert total == 40
