"""Live smoke tests of the Spark Thrift JDBC endpoint — the engine's
drop-in for the reference's primary UX, Trino's JDBC server at :8060
(reference trino/conf/trino/config.properties:1-15, README.md:52-76).

`tools/sql_shell.py` documents the external launch line
(`$SPARK_HOME/sbin/start-thriftserver.sh`); these tests prove the same
endpoint live without a second JVM by starting HiveThriftServer2
*in-process* on the test session (`startWithContext`), then driving
statements through a real JDBC client (beeline) over the wire protocol
a BI tool would use. HiveThriftServer2 is a JVM SINGLETON — a second
startWithContext after stop() never rebinds (r18 find) — so one
module-scoped server serves every test here. Skips cleanly where the
sandbox lacks beeline or forbids the listener.
"""

from __future__ import annotations

import os
import socket
import subprocess
import time

import pytest

_BEELINE = os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "beeline")


@pytest.fixture(scope="module")
def thrift_port(spark):
    """Start the in-process JDBC endpoint once for the whole module
    (JVM-singleton constraint) and yield its port."""
    if not os.path.exists(_BEELINE):
        pytest.skip("no beeline client in this environment")
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    spark.conf.set("hive.server2.thrift.port", str(port))
    spark.conf.set("hive.server2.thrift.bind.host", "127.0.0.1")
    try:
        server = (
            spark._jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
            .startWithContext(spark._jsparkSession.sqlContext())
        )
    except Exception as exc:  # daemon forbidden / jar absent
        pytest.skip(f"thriftserver not startable here: {exc}")
    yield port
    try:
        server.stop()
    except Exception:
        pass


def _beeline(port: int, stmt: str, want: str, deadline_s: int = 60) -> str:
    """Run stmt through beeline, retrying while the listener binds;
    returns combined output once ``want`` appears (or on timeout)."""
    deadline = time.time() + deadline_s
    out = ""
    while time.time() < deadline:
        proc = subprocess.run(
            [_BEELINE, "-u", f"jdbc:hive2://127.0.0.1:{port}",
             "-e", stmt, "--silent=true"],
            capture_output=True, text=True, timeout=120,
        )
        out = proc.stdout + proc.stderr
        if proc.returncode == 0 and want in out:
            break
        time.sleep(2)
    return out


def test_thriftserver_jdbc_roundtrip(spark, tables, thrift_port):
    # global temp view: visible to every JDBC session on this context
    # (plain temp views are per-session and would 42P01 from beeline)
    tables["nation"].createOrReplaceGlobalTempView("ts_nation")
    expected = tables["nation"].count()

    # tagged result so the assertion can't false-positive on log noise
    stmt = "SELECT concat('N_EQ_', count(*)) AS tag FROM global_temp.ts_nation;"
    out = _beeline(thrift_port, stmt, f"N_EQ_{expected}")
    assert f"N_EQ_{expected}" in out, out[-2000:]


def test_thriftserver_runs_certified_query_verbatim(spark, tables, thrift_port):
    """r17 verdict #4: the interactive-surface parity claim, kept
    honest round-to-round — the certified `sql_interactive` registry
    query (its verbatim ANSI text, `_INTERACTIVE_SQL`) is driven
    through the JDBC endpoint and its result must equal the in-process
    DataFrame result. Both sides evaluate the SAME deterministic tag
    aggregate (count + modular xxhash64 sum over every output column),
    so a single string comparison certifies full-result equality."""
    import shutil

    import __spark_entry__ as entrymod

    # JDBC connections are separate sessions: they see the shared
    # CATALOG, not this session's temp views (and
    # spark.sql.hive.thriftServer.singleSession is static — cannot be
    # flipped on a live context). Publish the three tables the
    # certified SQL reads as catalog tables so the text runs VERBATIM
    # over the wire; in-process, the temp views shadow them with the
    # same parquet data.
    for t in ("orders", "customer", "nation"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        orphan = os.path.join("spark-warehouse", t)
        if os.path.isdir(orphan):  # outlives a previous session's catalog
            shutil.rmtree(orphan)
        tables[t].write.saveAsTable(t)

    tag_sql = (
        "SELECT concat('TAG_', CAST(count(*) AS STRING), '_', "
        "CAST(sum(pmod(xxhash64(concat_ws('|', nation, n_customers, "
        "total_order_value)), 1000000007)) AS STRING)) AS tag "
        f"FROM ({entrymod._INTERACTIVE_SQL}) q"
    )
    try:
        expected_tag = spark.sql(tag_sql).collect()[0]["tag"]
        assert expected_tag.startswith("TAG_") and expected_tag != "TAG_0_"
        out = _beeline(thrift_port, tag_sql + ";", expected_tag)
        assert expected_tag in out, out[-2000:]
    finally:
        for t in ("orders", "customer", "nation"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
