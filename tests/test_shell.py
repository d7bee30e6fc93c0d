"""i2s-shell (impala-shell equivalent) driven via subprocess stdin."""

from __future__ import annotations

import subprocess
import sys


def test_shell_end_to_end():
    script = (
        "SELECT n_name FROM nation WHERE n_nationkey = 1;\n"
        "set NUM_NODES=4;\n"
        "bad sql here;\n"
        "version;\n"
        "quit;\n"
    )
    proc = subprocess.run(
        [sys.executable, "tools/i2s_shell.py", "--sf-dir", "/root/testdata/sf0.001"],
        input=script,
        capture_output=True,
        text=True,
        timeout=180,
        cwd="/root/repo",
    )
    assert proc.returncode == 0
    assert "NATION_1" in proc.stdout
    assert "NUM_NODES=4" in proc.stdout
    assert "i2s-shell on Spark" in proc.stdout  # survived the bad statement
    assert "ERROR" in proc.stderr


def test_shell_one_shot_query():
    proc = subprocess.run(
        [
            sys.executable,
            "tools/i2s_shell.py",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "-q",
            "SELECT count(*) AS n FROM region",
        ],
        capture_output=True,
        text=True,
        timeout=180,
        cwd="/root/repo",
    )
    assert proc.returncode == 0
    assert "| 5" in proc.stdout


def test_shell_one_shot_error_exit_code():
    proc = subprocess.run(
        [sys.executable, "tools/i2s_shell.py", "-q", "SELECT * FROM does_not_exist"],
        capture_output=True,
        text=True,
        timeout=180,
        cwd="/root/repo",
    )
    assert proc.returncode == 1
    assert "ERROR" in proc.stderr


def test_shell_rerun_source_profile_and_delimited(tmp_path):
    """Round-2 parity pass (verdict #8/#9): source <file>, rerun/@N,
    -B delimited output, and a `profile` command whose output carries the
    executed plan's per-operator runtime metrics."""
    sql_file = tmp_path / "script.sql"
    sql_file.write_text("SELECT n_nationkey FROM nation WHERE n_nationkey < 2;")
    script = (
        "SELECT count(*) AS n FROM region;\n"
        "profile;\n"
        f"source {sql_file};\n"
        "rerun 1;\n"
        "@-1;\n"
        "quit;\n"
    )
    proc = subprocess.run(
        [sys.executable, "tools/i2s_shell.py", "--sf-dir",
         "/root/testdata/sf0.001", "-B"],
        input=script,
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    out = proc.stdout
    # -B: bare value rows, no ascii box
    assert "| 5" not in out and "\n5\n" in out
    # profile: per-operator metrics of the executed plan
    assert "number of output rows" in out
    assert "Scan parquet" in out or "HashAggregate" in out
    # source: the script's rows appear
    assert "\n0\n" in out and "\n1\n" in out
    # rerun 1 re-executes the count (a second bare 5); @-1 re-runs rerun's
    # target again (a third 5)
    assert out.count("\n5") >= 3


def test_shell_rerun_bad_index_reports_error():
    proc = subprocess.run(
        [sys.executable, "tools/i2s_shell.py", "-q", "rerun 99"],
        capture_output=True,
        text=True,
        timeout=180,
        cwd="/root/repo",
    )
    assert proc.returncode == 1
    assert "history has" in proc.stderr


def test_shell_escape_command():
    proc = subprocess.run(
        [sys.executable, "tools/i2s_shell.py", "-q", "shell echo i2s_$((40+2))"],
        capture_output=True,
        text=True,
        timeout=180,
        cwd="/root/repo",
    )
    assert proc.returncode == 0
    assert "i2s_42" in proc.stdout


def test_shell_summary_and_unset():
    script = (
        "SELECT count(*) AS n FROM region;\n"
        "summary;\n"
        "set NUM_NODES=4;\n"
        "unset NUM_NODES;\n"
        "set;\n"
        "quit;\n"
    )
    proc = subprocess.run(
        [sys.executable, "tools/i2s_shell.py", "--sf-dir",
         "/root/testdata/sf0.001"],
        input=script,
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    assert "rows=" in proc.stdout            # summary carries row counts
    assert "unset NUM_NODES" in proc.stdout
    # after unset, `set` listing no longer shows it
    assert "NUM_NODES=4\n(no session options set)" not in proc.stdout
    tail = proc.stdout.split("unset NUM_NODES", 1)[1]
    assert "NUM_NODES" not in tail


def test_shell_output_file(tmp_path):
    out = tmp_path / "result.txt"
    proc = subprocess.run(
        [sys.executable, "tools/i2s_shell.py", "--sf-dir",
         "/root/testdata/sf0.001", "-B", "-o", str(out),
         "-q", "SELECT count(*) AS n FROM region"],
        capture_output=True,
        text=True,
        timeout=180,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    assert "5" in proc.stdout          # still printed to stdout
    assert "5" in out.read_text()      # and duplicated to the file


def test_shell_authorization_statements():
    """The GRANT/REVOKE surface (sql-parser.y:647-747) flows through the
    shell's SQL path like any statement — roles catalog lives on the
    engine for the session's lifetime."""
    script = (
        "CREATE ROLE analyst;\n"
        "GRANT ROLE analyst TO GROUP eng;\n"
        "GRANT SELECT ON TABLE default.orders TO ROLE analyst;\n"
        "SHOW ROLES;\n"
        "SHOW GRANT ROLE analyst;\n"
        "quit;\n"
    )
    proc = subprocess.run(
        [sys.executable, "tools/i2s_shell.py", "--sf-dir", "/root/testdata/sf0.001"],
        input=script,
        capture_output=True,
        text=True,
        timeout=180,
        cwd="/root/repo",
    )
    assert proc.returncode == 0
    assert "analyst" in proc.stdout
    assert "SELECT" in proc.stdout


def test_connect_command():
    proc = subprocess.run(
        [sys.executable, "tools/i2s_shell.py", "-q", "connect"],
        capture_output=True,
        text=True,
        timeout=180,
        cwd="/root/repo",
    )
    assert proc.returncode == 0
    assert "Connected to local Spark" in proc.stdout


def test_run_workload_harness(tmp_path):
    """tools/run_workload.py (bin/run-workload.py parity): workload:sf
    selection, query_names filter, exec_options, concurrent clients,
    results JSON."""
    import json

    out = tmp_path / "res.json"
    proc = subprocess.run(
        [
            sys.executable, "tools/run_workload.py",
            "-w", "tpch:0.001",
            "--query_names", "tpch_q1,tpch_q6",
            "--num_clients", "2",
            "-i", "2",
            "--exec_options", "NUM_NODES=8",
            "--results_json_file", str(out),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "workload tpch sf=0.001 (2 queries" in proc.stdout
    res = json.loads(out.read_text())
    assert {r["query"] for r in res} == {"tpch_q1", "tpch_q6"}
    assert all(r["median_sec"] > 0 and r["error"] is None for r in res)
