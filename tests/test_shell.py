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
