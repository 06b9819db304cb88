"""Ingestion-subsystem tests: CSV semi-structured pipeline, JSON source,
catalog provenance, Excel gating."""

import pytest
from pyspark.sql import functions as F

from datalake_local_spark.catalog import InfoCatalog
from datalake_local_spark.sources import csv_lines, excel, json_source

SALES_FILE = """HEADER JUNK
1/2/2024 Venta Animales: 12 Documento salida: 777 vaca blanca
nota que no es venta
15/3 Venta Animales: 3 Documento salida: 888
RECRIASIN fin de seccion
9/9/2024 Venta Animales: 99 Documento salida: 999 despues del sentinel
"""


def test_csv_lines_parse_and_sentinel(spark, tmp_path):
    p = tmp_path / "granja_sur.csv"
    p.write_text(SALES_FILE, encoding="latin-1")
    out = csv_lines.ingest_csv_lines(spark, str(p), prefix="pfx").collect()
    # sentinel cuts the third sale; non-matching lines filtered
    assert len(out) == 2
    by_doc = {r["documento_salida"]: r for r in out}
    assert by_doc[777]["fecha"] == "1/2/2024"
    assert by_doc[777]["n_animales"] == 12
    assert by_doc[777]["extra"] == "vaca blanca"
    assert by_doc[777]["name_farm"] == "granja_sur"
    assert by_doc[888]["fecha"] == "15/3"
    assert 999 not in by_doc


def test_csv_lines_schema(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("1/1 Venta Animales: 1 Documento salida: 2\n")
    df = csv_lines.ingest_csv_lines(spark, str(p))
    assert [f.name for f in df.schema.fields] == [
        "name_farm", "prefix", "fecha", "n_animales", "documento_salida", "extra",
    ]
    assert dict((f.name, f.dataType.typeName()) for f in df.schema.fields)["n_animales"] == "long"


def test_json_ingest_roundtrip(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    df = json_source.ingest_json(spark, str(p), "testdb_json", "t1")
    assert df.count() == 2
    assert spark.table("testdb_json.t1").count() == 2
    files = spark.table("info.files")
    assert files.filter(F.col("table_name") == "testdb_json.t1").count() == 1


def test_parse_props_column(tables):
    out = json_source.parse_props_column(tables["events"].limit(10))
    rows = out.select("props", "props_struct.k").collect()
    for r in rows:
        import json

        assert r["k"] == json.loads(r["props"])["k"]


def test_catalog_provenance_and_audit(spark):
    cat = InfoCatalog(spark)
    df = spark.range(5).withColumnRenamed("id", "v")
    fqn = cat.save_ingested(df, "testdb_prov", "numbers")
    assert fqn == "testdb_prov.numbers"
    assert spark.table(fqn).count() == 5
    assert cat.database_exists("testdb_prov")
    ops = spark.table("info.operations").filter(F.col("target") == fqn)
    assert ops.filter(F.col("op") == "ingest").count() >= 1
    # idempotent overwrite re-run (reference D2 'IF NOT EXISTS' semantics)
    cat.save_ingested(df, "testdb_prov", "numbers")
    assert spark.table(fqn).count() == 5


def test_landing_discovery_and_dispatch(spark, tmp_path):
    from datalake_local_spark.sources import landing

    root = tmp_path / "landing"
    (root / "granja%uno").mkdir(parents=True)
    (root / "configuration").mkdir()  # P1: must be excluded
    (root / "granja%uno" / "ventas.csv").write_text(
        "1/2/2024 Venta Animales: 5 Documento salida: 10\n"
    )
    (root / "granja%uno" / "extra.jsonl").write_text('{"a": 7}\n')
    (root / "configuration" / "skip.csv").write_text("x\n")

    inv = landing.discover_landing(spark, str(root)).collect()
    assert {r["bucket"] for r in inv} == {"granja%uno"}
    assert {r["ext"] for r in inv} == {"csv", "jsonl"}

    written = landing.ingest_landing(spark, str(root))
    assert written == {"granjaporcentaje_uno.ventas": 1, "granjaporcentaje_uno.extra": 1}
    assert spark.table("granjaporcentaje_uno.ventas").collect()[0]["n_animales"] == 5


def test_landing_discovery_from_uri_root(spark, tmp_path):
    """URI roots (file:// here; s3a:// config-identically) route through
    the Hadoop FileSystem client and must yield the same inventory and
    ingest results as the plain-path walk."""
    from datalake_local_spark.sources import landing

    root = tmp_path / "landing_uri"
    (root / "farm_a" / "nested").mkdir(parents=True)
    (root / "configuration").mkdir()
    (root / "farm_a" / "ventas.csv").write_text(
        "1/2/2024 Venta Animales: 5 Documento salida: 10\n"
    )
    (root / "farm_a" / "nested" / "extra.jsonl").write_text('{"a": 7}\n')
    (root / "configuration" / "skip.csv").write_text("x\n")

    uri_root = f"file://{root}"
    inv = landing.discover_landing(spark, uri_root).collect()
    assert {r["bucket"] for r in inv} == {"farm_a"}
    assert {r["ext"] for r in inv} == {"csv", "jsonl"}  # nested file found (S2)
    assert all(r["path"].startswith("file:") for r in inv)

    plain = landing.discover_landing(spark, str(root)).collect()
    assert {(r["bucket"], r["name"], r["size_bytes"]) for r in inv} == {
        (r["bucket"], r["name"], r["size_bytes"]) for r in plain
    }

    written = landing.ingest_landing(spark, uri_root)
    assert written == {"farm_a.ventas": 1, "farm_a.extra": 1}
    assert spark.table("farm_a.ventas").collect()[0]["n_animales"] == 5


def _write_minimal_xlsx(path, sheets):
    """Hand-rolled SpreadsheetML writer (tests only): sheets is
    {name: (header, rows)}; strings go inline, ints/floats as numbers."""
    import zipfile

    def cell_xml(ref, v):
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>'

    def col_letter(i):
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(ord("A") + r) + s
        return s

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rid_ns = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    with zipfile.ZipFile(path, "w") as zf:
        sheet_tags, rel_tags = [], []
        for i, name in enumerate(sheets, 1):
            sheet_tags.append(f'<sheet name="{name}" sheetId="{i}" r:id="rId{i}"/>')
            rel_tags.append(
                f'<Relationship Id="rId{i}" Target="worksheets/sheet{i}.xml" '
                'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet"/>'
            )
        zf.writestr(
            "xl/workbook.xml",
            f'<workbook {ns} {rid_ns}><sheets>{"".join(sheet_tags)}</sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + "".join(rel_tags)
            + "</Relationships>",
        )
        for i, (name, (header, rows)) in enumerate(sheets.items(), 1):
            all_rows = [header] + rows
            body = "".join(
                "<row r=\"%d\">%s</row>"
                % (ri + 1, "".join(cell_xml(f"{col_letter(ci)}{ri + 1}", v) for ci, v in enumerate(row)))
                for ri, row in enumerate(all_rows)
            )
            zf.writestr(
                f"xl/worksheets/sheet{i}.xml",
                f"<worksheet {ns}><sheetData>{body}</sheetData></worksheet>",
            )


def test_native_xlsx_parse_and_ingest(spark, tmp_path):
    """Full Excel entry point without openpyxl: stdlib parse → stringify →
    infer → managed tables (the reference's Insert_excel_tables shape)."""
    from datalake_local_spark.sources import xlsx_native

    bucket = tmp_path / "granja uno"
    bucket.mkdir()
    fpath = bucket / "ventas 2024.xlsx"
    _write_minimal_xlsx(
        fpath,
        {
            "resumen": (
                ["animales", "precio", "fecha", "nota"],
                [[5, 12.5, "2024-01-02", "ok"], [7, 9.25, "2024-01-03", None]],
            ),
            "vacia": (["a"], []),
        },
    )
    parsed = xlsx_native.parse_xlsx(fpath.read_bytes())
    assert parsed["resumen"][0] == ["animales", "precio", "fecha", "nota"]
    assert parsed["resumen"][1][0] == ["5", "12.5", "2024-01-02", "ok"]

    df = excel.read_sheet(spark, str(fpath), "resumen")
    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    assert types == {"animales": "long", "precio": "string", "fecha": "date", "nota": "string"}
    assert df.count() == 2

    written = excel.ingest_excel_dir(spark, str(tmp_path))
    assert written == ["granja_uno.ventas_2024_resumen"]  # empty sheet skipped
    assert spark.table("granja_uno.ventas_2024_resumen").count() == 2


def test_excel_mixed_type_column_degrades_to_string(spark, tmp_path):
    """A column whose first cell parses as int but later cells don't must
    fall back to varchar instead of aborting the ingest (compat
    best-effort semantics)."""
    fpath = tmp_path / "m.xlsx"
    _write_minimal_xlsx(fpath, {"s": (["k", "v"], [[1, 123], [2, "abc"]])})
    df = excel.read_sheet(spark, str(fpath), "s")
    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    assert types == {"k": "long", "v": "string"}
    assert [r["v"] for r in df.orderBy("k").collect()] == ["123", "abc"]


def test_xlsx_distributed_long_form(spark, tmp_path):
    fpath = tmp_path / "w.xlsx"
    _write_minimal_xlsx(fpath, {"s1": (["a", "b"], [[1, "x"], [2, "y"]])})
    out = excel.xlsx_long_form(spark, str(tmp_path))
    rows = {(r["sheet"], r["row_idx"], r["column"]): r["value"] for r in out.collect()}
    assert rows[("s1", 0, "a")] == "1" and rows[("s1", 1, "b")] == "y"


def test_xlsx_distributed_keeps_ragged_trailing_cells(spark, tmp_path):
    """Rows wider than the header must keep trailing cells (generated
    col_N names) in the long form — parse_xlsx's width contract."""
    fpath = tmp_path / "ragged.xlsx"
    _write_minimal_xlsx(
        fpath, {"s1": (["a", "b"], [[1, "x", "overflow", 9], [2, "y"]])}
    )
    out = excel.xlsx_long_form(spark, str(tmp_path))
    rows = {(r["row_idx"], r["column"]): r["value"] for r in out.collect()}
    assert rows[(0, "col_2")] == "overflow" and rows[(0, "col_3")] == "9"
    assert (1, "col_2") not in rows


def test_json_quarantine_splits_bad_lines(spark, tmp_path):
    src = tmp_path / "data.jsonl"
    src.write_text(
        '{"id": 1, "v": "ok"}\n'
        'this is not json\n'
        '{"id": 2, "v": "also ok"}\n'
        '{"id": "NOT_A_NUMBER_&_unclosed\n'
    )
    clean, quarantine = json_source.ingest_json_with_quarantine(
        spark, str(src), "id long, v string"
    )
    assert {(r["id"], r["v"]) for r in clean.collect()} == {(1, "ok"), (2, "also ok")}
    bad = [r["raw_line"] for r in quarantine.collect()]
    assert len(bad) == 2 and any("not json" in b for b in bad)


def test_sql_shell_executes_statements(spark, tables):
    """The SQL endpoint façade: two statements driven through the REPL
    programmatically (the reference's interactive-JDBC role)."""
    import io
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import sql_shell

    tables["orders"].createOrReplaceTempView("orders_shell")
    script = io.StringIO(
        "SELECT count(*) AS n FROM orders_shell;\n"
        "SELECT o_orderpriority, count(*) AS n FROM orders_shell\n"
        "GROUP BY 1 ORDER BY 1 LIMIT 2;\n"
        "\\q\n"
    )
    out = io.StringIO()
    sql_shell.repl(spark, instream=script, outstream=out)
    text = out.getvalue()
    expected_n = tables["orders"].count()
    assert f"{expected_n}" in text and "(1 row)" in text
    assert "o_orderpriority" in text and "(2 rows)" in text

    cols, rows = sql_shell.run_statement(spark, "SELECT 1 AS one, NULL AS nothing")
    assert cols == ["one", "nothing"] and rows == [(1, None)]
    rendered = sql_shell.format_table(cols, rows)
    assert "NULL" in rendered


def test_landing_to_query_oracle_parity(spark, tmp_path):
    """End-to-end seam (r4 verdict #3): a multi-format landing drop
    (jsonl + xlsx + sale-line csv) ingested via ``ingest_landing`` from a
    file:// URI root, then §2 queries (aggregate, join, window) run over
    the INGESTED managed tables and checked against DuckDB on the same
    generated data. The pieces are unit-tested individually; this pins
    the composition — discovery naming, sanitization, type inference and
    provenance writes all sit between the drop and the query."""
    import duckdb
    import pandas as pd

    from datalake_local_spark.sources import landing

    statuses = ["open", "shipped", "returned"]
    orders = [
        {"order_id": i, "cust_id": i % 12, "amount": (i * 37) % 500 + 1, "status": statuses[i % 3]}
        for i in range(60)
    ]
    segments = ["retail", "corp", "gov"]
    customers = [(c, segments[c % 3]) for c in range(12)]

    root = tmp_path / "landing_e2e"
    (root / "e2e_sales").mkdir(parents=True)
    (root / "e2e_farm").mkdir()
    (root / "configuration").mkdir()
    (root / "e2e_sales" / "orders.jsonl").write_text(
        "\n".join(
            f'{{"order_id": {o["order_id"]}, "cust_id": {o["cust_id"]}, '
            f'"amount": {o["amount"]}, "status": "{o["status"]}"}}'
            for o in orders
        )
        + "\n"
    )
    _write_minimal_xlsx(
        root / "e2e_sales" / "customers.xlsx",
        {"clientes": (["cust_id", "segment"], [list(c) for c in customers])},
    )
    (root / "e2e_farm" / "ventas.csv").write_text(
        "1/2/2024 Venta Animales: 5 Documento salida: 10\n"
        "3/4/2024 Venta Animales: 7 Documento salida: 11\n"
        "RECRIASIN\n"
        "5/6/2024 Venta Animales: 9 Documento salida: 12\n"
    )
    (root / "configuration" / "skip.csv").write_text("x\n")

    written = landing.ingest_landing(spark, f"file://{root}")
    assert written["e2e_sales.orders"] == 60
    assert written["e2e_sales.customers_clientes"] == 12
    assert written["e2e_farm.ventas"] == 2  # sentinel early-stop (P5)
    assert spark.sql("SELECT SUM(n_animales) AS s FROM e2e_farm.ventas").first()["s"] == 12

    con = duckdb.connect()
    con.register("orders", pd.DataFrame(orders))
    con.register("customers", pd.DataFrame(customers, columns=["cust_id", "segment"]))

    cases = {
        # A-family aggregate over an ingested table
        "agg": (
            "SELECT status, COUNT(*) AS n_orders, SUM(amount) AS revenue "
            "FROM {o} GROUP BY status ORDER BY status",
        ),
        # J-family join: jsonl-ingested fact × xlsx-ingested dim
        "join": (
            "SELECT c.segment, COUNT(*) AS n, SUM(o.amount) AS revenue "
            "FROM {o} o JOIN {c} c ON o.cust_id = c.cust_id "
            "GROUP BY c.segment ORDER BY c.segment",
        ),
        # §2.5 ranking window over the join
        "window": (
            "SELECT * FROM (SELECT c.segment, o.order_id, o.amount, "
            "ROW_NUMBER() OVER (PARTITION BY c.segment ORDER BY o.amount DESC, o.order_id) AS rn "
            "FROM {o} o JOIN {c} c ON o.cust_id = c.cust_id) WHERE rn <= 2 "
            "ORDER BY segment, rn",
        ),
    }
    for name, (sql,) in cases.items():
        got = [
            tuple(r)
            for r in spark.sql(
                sql.format(o="e2e_sales.orders", c="e2e_sales.customers_clientes")
            ).collect()
        ]
        want = [
            tuple(r) for r in con.execute(sql.format(o="orders", c="customers")).fetchall()
        ]
        assert got == want, f"{name}: spark={got} oracle={want}"


def test_python_datasource_xlsx_matches_distributed_reader(spark, tmp_path):
    """Spark 4 Python DataSource (format('xlsx')) must produce the same
    long-form cells as the binaryFile+mapInPandas path — two routes, one
    contract — and must parallelize by file (one partition per book)."""
    from datalake_local_spark.sources import pyds

    root = tmp_path / "pyds_zone"
    (root / "sub").mkdir(parents=True)
    _write_minimal_xlsx(
        root / "book1.xlsx",
        {"s1": (["a", "b"], [[1, "x"], [2, "y"]]), "s2": (["c"], [[3]])},
    )
    _write_minimal_xlsx(root / "sub" / "book2.xlsx", {"only": (["d"], [[4], [5]])})

    pyds.register(spark)
    via_pyds = spark.read.format("xlsx").load(str(root))
    assert via_pyds.rdd.getNumPartitions() == 2  # one per workbook
    cells_pyds = {
        (r["sheet"], r["row_idx"], r["column"], r["value"]) for r in via_pyds.collect()
    }
    from datalake_local_spark.sources import xlsx_native

    cells_dist = {
        (r["sheet"], r["row_idx"], r["column"], r["value"])
        for r in xlsx_native.read_xlsx_distributed(spark, str(root)).collect()
    }
    assert cells_pyds == cells_dist
    assert len(cells_pyds) == 4 + 1 + 2  # book1.s1 4 cells, s2 1, book2 2
    # "interchangeable" must hold at SCHEMA level too (unionByName-safe),
    # not just collected values — row_idx long in both paths
    assert (
        via_pyds.schema == xlsx_native.read_xlsx_distributed(spark, str(root)).schema
    )

    # column pruning + filter compose above the source
    vals = (
        spark.read.format("xlsx")
        .load(str(root))
        .filter("sheet = 'only'")
        .select("value")
        .collect()
    )
    assert sorted(r["value"] for r in vals) == ["4", "5"]


def test_python_datasource_xlsx_file_uri_and_remote_rejection(spark, tmp_path):
    """file:// roots map to local paths (the URI string would silently
    list nothing); non-file schemes fail loudly with the distributed
    alternative named."""
    from datalake_local_spark.sources import pyds

    root = tmp_path / "pyds_uri"
    root.mkdir()
    _write_minimal_xlsx(root / "b.xlsx", {"s": (["a"], [[1]])})
    pyds.register(spark)
    rows = spark.read.format("xlsx").load(f"file://{root}").collect()
    assert len(rows) == 1 and rows[0]["value"] == "1"
    import pytest

    with pytest.raises(Exception, match="local paths only"):
        spark.read.format("xlsx").load("s3a://bucket/zone").collect()
