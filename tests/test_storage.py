"""Storage adapter edge cases: manifest corruption, config-hash mismatch,
metrics accumulation (SURVEY.md A2/A3 resume semantics)."""

import json
import os

from webcrawler_spark.io import Storage


def _mk(spark, tmp_path, config_hash="h1"):
    return Storage(
        spark=spark,
        warehouse=str(tmp_path),
        config_hash=config_hash,
        run_id="t",
    )


def test_stage_commit_and_skip(spark, tmp_path):
    st = _mk(spark, tmp_path)
    calls = []

    def build():
        calls.append(1)
        return spark.range(5).withColumnRenamed("id", "doc_id")

    out1 = st.stage("s1", build)
    assert out1.count() == 5 and calls == [1]
    out2 = st.stage("s1", build)  # committed => build not called again
    assert out2.count() == 5 and calls == [1]


def test_corrupt_manifest_rebuilds(spark, tmp_path):
    st = _mk(spark, tmp_path)
    calls = []

    def build():
        calls.append(1)
        return spark.range(3).withColumnRenamed("id", "doc_id")

    st.stage("s2", build)
    mpath = os.path.join(st.stage_path("s2"), "_MANIFEST.json")
    with open(mpath, "w") as fh:
        fh.write("{not json")
    st.stage("s2", build)
    assert calls == [1, 1]  # rebuilt


def test_config_change_rebuilds(spark, tmp_path):
    calls = []

    def build():
        calls.append(1)
        return spark.range(2).withColumnRenamed("id", "doc_id")

    _mk(spark, tmp_path, "cfgA").stage("s3", build)
    _mk(spark, tmp_path, "cfgB").stage("s3", build)  # hash mismatch => rerun
    _mk(spark, tmp_path, "cfgB").stage("s3", build)  # now committed
    assert calls == [1, 1]


def test_metrics_accumulate(spark, tmp_path):
    st = _mk(spark, tmp_path)
    st.stage("s4", lambda: spark.range(7).withColumnRenamed("id", "doc_id"))
    st.record_partition_skew("s4", st.read_stage("s4"))
    m = st.read_metrics()
    metrics = {r["metric"] for r in m.collect()}
    assert {"rows_out", "commit_secs", "partition_rows_max"} <= metrics
    rows_out = [r for r in m.collect() if r["metric"] == "rows_out"]
    assert rows_out[0]["value"] == 7.0


def test_iceberg_stage_roundtrip(spark, tmp_path):
    """Catalog-based Iceberg stage commit/read/resume. Skips when the
    iceberg-spark-runtime jar is not on the classpath (this sandbox ships
    none); with the jar present it exercises the real writeTo/createOrReplace
    + spark.table path end-to-end."""
    import pytest

    from webcrawler_spark.session import iceberg_available, iceberg_catalog_conf

    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on the session classpath")
    for k, v in iceberg_catalog_conf("it_test", str(tmp_path / "icb")).items():
        spark.conf.set(k, v)
    st = Storage(
        spark=spark,
        warehouse=str(tmp_path),
        config_hash="h1",
        run_id="t",
        table_format="iceberg",
        iceberg_catalog="it_test",
    )
    calls = []

    def build():
        calls.append(1)
        return spark.range(7).withColumnRenamed("id", "doc_id")

    out1 = st.stage("s1", build)
    assert out1.count() == 7 and calls == [1]
    assert spark.table(st.stage_table("s1")).count() == 7
    out2 = st.stage("s1", build)  # manifest commit point => resume skips
    assert out2.count() == 7 and calls == [1]


def test_iceberg_identifier_and_commit_flow_without_jar(tmp_path):
    """Pins the jar-independent ~95% of the iceberg branch with a recording
    fake session: fully-qualified identifier construction, CREATE NAMESPACE,
    writeTo(...).using('iceberg').partitionedBy(...).createOrReplace()
    ordering, reads through spark.table on the SAME identifier, and the
    manifest-written-LAST commit point (io.py commit_stage)."""
    calls = []

    class FakeDF:
        def count(self):
            return 7

    class FakeWriter:
        def __init__(self, ident):
            self.ident = ident

        def using(self, fmt):
            calls.append(("using", self.ident, fmt))
            return self

        def partitionedBy(self, *cols):
            calls.append(("partitionedBy", len(cols)))
            return self

        def createOrReplace(self):
            calls.append(("createOrReplace", self.ident))

    class FakeStageDF(FakeDF):
        def writeTo(self, ident):
            calls.append(("writeTo", ident))
            return FakeWriter(ident)

    class FakeParquetWriter:
        def mode(self, m):
            return self

        def parquet(self, path):
            calls.append(("metrics_parquet", path))

    class FakeMetricsDF:
        def coalesce(self, n):
            return self

        @property
        def write(self):
            return FakeParquetWriter()

    class FakeSpark:
        def sql(self, q):
            calls.append(("sql", " ".join(q.split())))
            return FakeDF()

        def table(self, ident):
            calls.append(("table", ident))
            return FakeDF()

        def createDataFrame(self, rows, schema):
            return FakeMetricsDF()

    st = Storage(
        spark=FakeSpark(),
        warehouse=str(tmp_path),
        config_hash="cfg1",
        run_id="r7",
        table_format="iceberg",
        iceberg_catalog="prodcat",
        iceberg_namespace="dedup",
    )
    ident = st.stage_table("sigs")
    assert ident == "prodcat.dedup.r7_sigs"  # catalog.namespace.run_stage

    class FakeCol:  # stands in for F.col without a live JVM
        pass

    import webcrawler_spark.io as io_mod

    orig_col = io_mod.F.col
    io_mod.F.col = lambda c: FakeCol()
    try:
        out = st.commit_stage("sigs", FakeStageDF(), partition_by=["domain"])
    finally:
        io_mod.F.col = orig_col

    assert ("sql", "CREATE NAMESPACE IF NOT EXISTS prodcat.dedup") in calls
    assert ("writeTo", "prodcat.dedup.r7_sigs") in calls
    assert ("using", "prodcat.dedup.r7_sigs", "iceberg") in calls
    assert ("partitionedBy", 1) in calls
    assert ("createOrReplace", "prodcat.dedup.r7_sigs") in calls
    # reads go through spark.table on the same identifier
    assert ("table", "prodcat.dedup.r7_sigs") in calls
    assert isinstance(out, FakeDF)
    # write happened before the manifest (commit point is the manifest)
    assert calls.index(("createOrReplace", "prodcat.dedup.r7_sigs")) < calls.index(
        ("metrics_parquet", os.path.join(str(tmp_path), "_metrics"))
    )
    mpath = os.path.join(st.stage_path("sigs"), "_MANIFEST.json")
    with open(mpath) as fh:
        manifest = json.load(fh)
    assert manifest["config_hash"] == "cfg1" and manifest["rows"] == 7
    assert st.is_committed("sigs")
    # resume path: stage() must NOT rebuild once committed
    rebuilds = []
    got = st.stage("sigs", lambda: rebuilds.append(1))
    assert rebuilds == [] and isinstance(got, FakeDF)
