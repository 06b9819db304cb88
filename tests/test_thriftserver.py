"""Live smoke test of the Spark Thrift JDBC endpoint — the engine's
drop-in for the reference's primary UX, Trino's JDBC server at :8060
(reference trino/conf/trino/config.properties:1-15, README.md:52-76).

`tools/sql_shell.py` documents the external launch line
(`$SPARK_HOME/sbin/start-thriftserver.sh`); this test proves the same
endpoint live without a second JVM by starting HiveThriftServer2
*in-process* on the test session (`startWithContext`), then driving a
statement through a real JDBC client (beeline) over the wire protocol a
BI tool would use. Skips cleanly where the sandbox lacks beeline or
forbids the listener.
"""

from __future__ import annotations

import os
import socket
import subprocess
import time

import pytest


def test_thriftserver_jdbc_roundtrip(spark, tables):
    beeline = os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "beeline")
    if not os.path.exists(beeline):
        pytest.skip("no beeline client in this environment")

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    # global temp view: visible to every JDBC session on this context
    # (plain temp views are per-session and would 42P01 from beeline)
    tables["nation"].createOrReplaceGlobalTempView("ts_nation")
    expected = tables["nation"].count()

    spark.conf.set("hive.server2.thrift.port", str(port))
    spark.conf.set("hive.server2.thrift.bind.host", "127.0.0.1")
    try:
        server = (
            spark._jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
            .startWithContext(spark._jsparkSession.sqlContext())
        )
    except Exception as exc:  # daemon forbidden / jar absent
        pytest.skip(f"thriftserver not startable here: {exc}")

    try:
        # tagged result so the assertion can't false-positive on log noise
        stmt = "SELECT concat('N_EQ_', count(*)) AS tag FROM global_temp.ts_nation;"
        deadline = time.time() + 60
        out = ""
        while time.time() < deadline:
            proc = subprocess.run(
                [beeline, "-u", f"jdbc:hive2://127.0.0.1:{port}",
                 "-e", stmt, "--silent=true"],
                capture_output=True, text=True, timeout=120,
            )
            out = proc.stdout + proc.stderr
            if proc.returncode == 0 and f"N_EQ_{expected}" in out:
                break
            time.sleep(2)  # listener may still be binding
        assert f"N_EQ_{expected}" in out, out[-2000:]
    finally:
        try:
            server.stop()
        except Exception:
            pass
