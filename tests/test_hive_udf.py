"""Hive Java UDF jar execution (reference `be/src/exprs/hive-udf-call.cc`,
`fe/.../hive/executor/`): compile a tiny UDF against the bundled hive-exec,
then CREATE TEMPORARY FUNCTION ... USING JAR and call it from SQL.

Runs in a SUBPROCESS because the jar path needs
spark.sql.catalogImplementation=hive and a same-process getOrCreate would
inherit the suite session's in-memory catalog. Skips cleanly when javac or
hive-exec is absent (the Avro-style documented gate)."""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys
import textwrap

import pytest

JAVA_SRC = """
package i2s;

import org.apache.hadoop.hive.ql.exec.UDF;

public final class RepeatUdf extends UDF {
  public String evaluate(String s, int n) {
    if (s == null) return null;
    StringBuilder b = new StringBuilder();
    for (int i = 0; i < n; i++) b.append(s);
    return b.toString();
  }
}
"""


def _hive_exec_jar() -> str | None:
    hits = glob.glob("/opt/spark/jars/hive-exec-*.jar")
    return hits[0] if hits else None


@pytest.fixture(scope="module")
def udf_jar(tmp_path_factory):
    if shutil.which("javac") is None or shutil.which("jar") is None:
        pytest.skip("javac/jar not available")
    hive_exec = _hive_exec_jar()
    if hive_exec is None:
        pytest.skip("hive-exec jar not bundled with this Spark")
    d = tmp_path_factory.mktemp("udfjar")
    pkg = d / "i2s"
    pkg.mkdir()
    (pkg / "RepeatUdf.java").write_text(JAVA_SRC)
    subprocess.run(
        ["javac", "-cp", hive_exec, "i2s/RepeatUdf.java"], cwd=d, check=True
    )
    subprocess.run(
        ["jar", "cf", "repeat-udf.jar", "i2s/RepeatUdf.class"], cwd=d, check=True
    )
    return str(d / "repeat-udf.jar")


def test_hive_udf_jar_end_to_end(udf_jar, tmp_path):
    code = textwrap.dedent(
        f"""
        from pyspark.sql import SparkSession
        from impalatogo_spark.engine import Engine
        spark = (SparkSession.builder.master("local[2]")
                 .config("spark.ui.enabled", "false")
                 .config("spark.sql.warehouse.dir", r"{tmp_path}/wh")
                 .config("spark.sql.catalogImplementation", "hive")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        eng = Engine(spark)
        eng.create_java_function("repeat_udf", "i2s.RepeatUdf", r"{udf_jar}")
        rows = spark.sql(
            "SELECT repeat_udf(c, 3) AS r FROM VALUES ('ab'), (NULL) AS t(c)"
        ).collect()
        assert [r.r for r in rows] == ["ababab", None], rows
        print("HIVE_UDF_OK")
        """
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300,
        cwd=str(tmp_path), env=env,
    )
    assert "HIVE_UDF_OK" in out.stdout, out.stdout + out.stderr


def test_java_function_requires_hive_catalog(spark):
    """On the in-memory catalog the engine must fail with the documented
    actionable error, not Spark's opaque NO_HANDLER_FOR_UDAF."""
    from impalatogo_spark.engine import Engine

    eng = Engine(spark)
    with pytest.raises(RuntimeError, match="hive"):
        eng.create_java_function("f_nope", "i2s.RepeatUdf", "/tmp/x.jar")
