"""Unit tests for the CD2 JSONL envelope codec (sources/envelope.py)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from canvas_data_2_aws_spark.sources.envelope import (
    decode_envelope,
    encode_envelope,
    read_changeset_jsonl,
)


def _sample_changeset(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(50)
    return orders.withColumn(
        "action", F.when(F.col("o_orderkey") % 5 == 0, "D").otherwise("U")
    )


def test_roundtrip_preserves_types_and_values(spark, sf_dir):
    chg = _sample_changeset(spark, sf_dir)
    wire = encode_envelope(chg, key_cols=["o_orderkey"])
    decoded = decode_envelope(wire, table="orders", key_cols=["o_orderkey"])

    # schema: key cols + value cols (incl. timestamp) + action
    assert dict(decoded.dtypes)["o_orderdate"] == "timestamp"

    orig = {r.o_orderkey: r for r in chg.collect()}
    for r in decoded.collect():
        o = orig[r.o_orderkey]
        if r.action == "D":
            # tombstone: key survives, value block absent
            assert r.o_custkey is None and r.o_totalprice is None
        else:
            assert r.o_custkey == o.o_custkey
            assert r.o_totalprice == o.o_totalprice  # exact double round-trip
            assert r.o_orderdate == o.o_orderdate  # exact timestamp round-trip
            assert r.o_orderpriority == o.o_orderpriority


def test_read_changeset_jsonl_from_disk(spark, sf_dir):
    chg = _sample_changeset(spark, sf_dir)
    wire = encode_envelope(chg, key_cols=["o_orderkey"])
    path = tempfile.mkdtemp(prefix="cda2_env_")
    try:
        wire.coalesce(1).write.mode("overwrite").text(path)
        decoded = read_changeset_jsonl(
            spark, path, table="orders", key_cols=["o_orderkey"]
        )
        assert decoded.count() == chg.count()
        assert decoded.where("action = 'D'").count() == chg.where(
            "action = 'D'"
        ).count()
        # malformed line → from_json nulls, caught as a null key
        assert decoded.where("o_orderkey IS NULL").count() == 0
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_malformed_records_surface_as_null_keys(spark):
    """Corrupt JSONL lines parse to null structs (PERMISSIVE), which
    surface as null-key rows — countable/quarantinable, never silently
    dropped or crashing the sync."""
    lines = [
        '{"key":{"o_orderkey":1},"value":{"o_custkey":7},"meta":{"action":"U","ts":0}}',
        "this is not json at all",
        '{"key":{},"value":{},"meta":{"action":"U","ts":0}}',
    ]
    records = spark.createDataFrame([(l,) for l in lines], "record string")
    decoded = decode_envelope(records, table="orders", key_cols=["o_orderkey"])
    rows = decoded.collect()
    assert len(rows) == 3
    good = [r for r in rows if r.o_orderkey is not None]
    assert len(good) == 1 and good[0].o_custkey == 7
    assert sum(1 for r in rows if r.o_orderkey is None) == 2


def test_python_datasource_equals_from_json_codec(spark, sf_dir):
    """format('cd2_envelope') must yield exactly the rows the from_json
    codec yields from the same JSONL files, with one input partition
    per part-file."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from canvas_data_2_aws_spark.queries.merge import derive_changeset
    from canvas_data_2_aws_spark.session import load_table
    from canvas_data_2_aws_spark.sources.cd2_datasource import register
    from canvas_data_2_aws_spark.sources.envelope import (
        encode_envelope,
        read_changeset_jsonl,
    )

    orders = load_table(spark, sf_dir, "orders")
    wire = encode_envelope(
        derive_changeset(orders).drop("o_orderdate"), key_cols=["o_orderkey"]
    )
    out = tempfile.mkdtemp(prefix="cda2_pysrc_t_")
    try:
        for i in range(3):
            wire.where(F.crc32("record") % 3 == i).coalesce(1).write.mode(
                "overwrite"
            ).text(f"{out}/part{i}")
        register(spark)
        via_source = (
            spark.read.format("cd2_envelope")
            .option("path", f"{out}/part*/*.txt")
            .option("table", "orders")
            .option("keys", "o_orderkey")
            .load()
        )
        assert via_source.rdd.getNumPartitions() == 3
        cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderpriority", "action"]
        got = {tuple(r) for r in via_source.select(*cols).collect()}
        want = {
            tuple(r)
            for r in read_changeset_jsonl(
                spark, f"{out}/part*/*.txt", table="orders", key_cols=["o_orderkey"]
            ).select(*cols).collect()
        }
        assert got == want and len(want) > 0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_streaming_python_source_resumes_from_checkpoint(spark, sf_dir):
    """Two trigger-once runs over one checkpoint must split the parts
    between them (offset persisted = since-token semantics) and land
    exactly the full changeset."""
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = registry.QUERIES["stream_python_source"](spark, sf_dir).collect()
    assert rows, "no actions landed"
    total = sum(r.n for r in rows)
    run1, run2 = rows[0].run1_rows, rows[0].run2_rows
    assert run1 > 0 and run2 > 0  # both runs consumed a part
    assert run1 + run2 == total

    from pyspark.sql import functions as F

    from canvas_data_2_aws_spark.queries.merge import derive_changeset
    from canvas_data_2_aws_spark.session import load_table

    expected = derive_changeset(load_table(spark, sf_dir, "orders")).count()
    assert total == expected


def test_python_datasource_permissive_skips_malformed(spark, tmp_path):
    """mode=permissive skips corrupt lines; strict mode fails the read."""
    import pytest

    from canvas_data_2_aws_spark.sources.cd2_datasource import register

    good = '{"key": {"o_orderkey": %d}, "value": {"o_custkey": 7, "o_orderstatus": "O", "o_totalprice": 1.5, "o_orderdate": "1995-01-01 00:00:00", "o_orderpriority": "1-URGENT"}, "meta": {"action": "U", "ts": 0}}'
    lines = [good % 1, "{not json at all", good % 2, '{"key": {}, "value": {}}']
    part = tmp_path / "parts"
    part.mkdir()
    (part / "p0.txt").write_text("\n".join(lines) + "\n")
    register(spark)

    def reader(mode):
        return (
            spark.read.format("cd2_envelope")
            .option("path", f"{part}/*.txt")
            .option("table", "orders")
            .option("keys", "o_orderkey")
            .option("mode", mode)
            .load()
        )

    rows = reader("permissive").collect()
    assert sorted(r.o_orderkey for r in rows) == [1, 2]
    with pytest.raises(Exception):
        reader("strict").collect()
