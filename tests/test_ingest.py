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


def test_excel_gated_when_openpyxl_missing(spark, tmp_path):
    if excel.HAS_XLSX:
        pytest.skip("openpyxl present; gating path not applicable")
    with pytest.raises(NotImplementedError):
        excel.ingest_excel_dir(spark, str(tmp_path))
