"""Beeswax front door (impalatogo_spark/beeswax.py).

Reference parity: impala-beeswax-server.cc:170 (query/fetch), :434
(Cancel) over the public Apache Hive beeswax.thrift IDL + Impala's
ImpalaService extensions — the protocol impala-shell itself speaks.
"""

from __future__ import annotations

import time

import pytest

from impalatogo_spark.beeswax import BeeswaxClient, BeeswaxServer


@pytest.fixture(scope="module")
def beeswax(spark, sf_dir):
    srv = BeeswaxServer(spark, sf_dir=sf_dir)
    host, port = srv.start()
    yield srv, host, port
    srv.stop()


def _client(beeswax) -> BeeswaxClient:
    _, host, port = beeswax
    return BeeswaxClient(host, port)


def test_beeswax_query_fetch_tsv(beeswax):
    """query -> get_state poll -> fetch: rows come back TAB-delimited with
    NULLs spelled NULL (the beeswax Results.data contract impala-shell
    renders)."""
    c = _client(beeswax)
    try:
        h = c.query("SELECT r_regionkey, r_name, "
                    "CASE WHEN r_regionkey = 2 THEN NULL ELSE 'x' END AS n "
                    "FROM region ORDER BY r_regionkey")
        assert c.wait(h) == 4  # FINISHED
        rows = c.fetch_all(h)
        assert len(rows) == 5
        assert rows[0].split("\t")[0] == "0"
        assert rows[2].split("\t")[2] == "NULL"
        md = c.call("get_results_metadata", handle=h)
        assert [f["name"] for f in md["schema"]["fieldSchemas"]] == [
            "r_regionkey", "r_name", "n"]
        assert md["delim"] == "\t"
    finally:
        c.close()


def test_beeswax_execute_and_wait_start_over(beeswax):
    c = _client(beeswax)
    try:
        h = c.call("executeAndWait",
                   query={"query": "SELECT n_nationkey FROM nation "
                                   "ORDER BY n_nationkey LIMIT 4"},
                   clientCtx="ctx1")
        res = c.call("fetch", query_id=h, start_over=False, fetch_size=2)
        assert res["data"] == ["0", "1"] and res["has_more"]
        # start_over rewinds to row 0 (beeswax fetch contract)
        res = c.call("fetch", query_id=h, start_over=True, fetch_size=10)
        assert res["data"] == ["0", "1", "2", "3"]
        assert not res["has_more"] and res["start_row"] == 0
    finally:
        c.close()


def test_beeswax_explain_echo_profile(beeswax):
    c = _client(beeswax)
    try:
        assert c.call("echo", s="hello") == "hello"
        exp = c.call("explain",
                     query={"query": "SELECT count(*) FROM nation"})
        assert "Aggregate" in exp["textual"] or "Scan" in exp["textual"]
        h = c.query("SELECT count(*) AS c FROM lineitem")
        c.wait(h)
        prof = c.call("GetRuntimeProfile", query_id=h)
        assert "Rows: 1" in prof
        log = c.call("get_log", context=h["log_context"])
        assert "finished" in log
        c.call("close", handle=h)
        with pytest.raises(RuntimeError, match="unknown query handle"):
            c.call("fetch", query_id=h, start_over=False, fetch_size=1)
    finally:
        c.close()


def test_beeswax_cancel_mid_flight(beeswax):
    """ImpalaService.Cancel (impala-beeswax-server.cc:434): a slow
    statement cancels to EXCEPTION state and the connection stays live."""
    c = _client(beeswax)
    try:
        h = c.query("SELECT count(*) AS c FROM lineitem a, lineitem b, "
                    "orders o, customer cu")
        deadline = time.time() + 60
        while time.time() < deadline:
            if c.call("get_state", handle=h) == 3:  # RUNNING
                break
            time.sleep(0.02)
        assert c.call("Cancel", query_id=h)["status_code"] == 0
        deadline = time.time() + 60
        while time.time() < deadline:
            if c.call("get_state", handle=h) == 5:  # EXCEPTION/CANCELED
                break
            time.sleep(0.05)
        assert c.call("get_state", handle=h) == 5
        h2 = c.query("SELECT 1 AS one")
        c.wait(h2)
        assert c.fetch_all(h2) == ["1"]
    finally:
        c.close()


def test_beeswax_sessions_are_per_connection(beeswax):
    """Beeswax has no session handles: each CONNECTION is a session (SET
    options on one connection are invisible on another)."""
    c1, c2 = _client(beeswax), _client(beeswax)
    try:
        h = c1.query("SET DEFAULT_ORDER_BY_LIMIT=2")
        c1.wait(h)
        q = "SELECT r_regionkey FROM region ORDER BY r_regionkey"
        h1 = c1.query(q)
        c1.wait(h1)
        assert len(c1.fetch_all(h1)) == 2
        h2 = c2.query(q)
        c2.wait(h2)
        assert len(c2.fetch_all(h2)) == 5
    finally:
        c1.close()
        c2.close()


def test_beeswax_sasl_plain_same_port(beeswax):
    """The Beeswax port auto-detects SASL-PLAIN alongside NOSASL, like the
    HS2 port (thrift_sasl framing; impala-shell's --auth path)."""
    _, host, port = beeswax
    c = BeeswaxClient(host, port, sasl_plain=("carol", ""))
    try:
        h = c.query("SELECT n_nationkey FROM nation "
                    "ORDER BY n_nationkey LIMIT 3")
        assert c.wait(h) == 4
        assert c.fetch_all(h) == ["0", "1", "2"]
    finally:
        c.close()
    c2 = BeeswaxClient(host, port)  # NOSASL immediately after
    try:
        h = c2.query("SELECT 1 AS one")
        c2.wait(h)
        assert c2.fetch_all(h) == ["1"]
    finally:
        c2.close()

def test_beeswax_large_result_streams_and_refuses_start_over(spark, sf_dir):
    """A beeswax client paging a result larger than the fetch window gets
    every row exactly once; start_over on such a result is refused (the
    reference's beeswax server does not support start-over on streamed
    results either)."""
    from impalatogo_spark.beeswax import BeeswaxClient, BeeswaxServer
    from impalatogo_spark.server import I2SServer

    core = I2SServer(spark, sf_dir=sf_dir, fetch_window_rows=64)
    srv = BeeswaxServer(spark, sf_dir=sf_dir, core=core)
    host, port = srv.start()
    c = BeeswaxClient(host, port)
    try:
        n_total = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
        h = c.call("executeAndWait",
                   query={"query": "SELECT l_orderkey FROM lineitem "
                                   "ORDER BY l_orderkey"},
                   clientCtx="big")
        rows = c.fetch_all(h, fetch_size=100)
        assert len(rows) == n_total
        keys = [int(r) for r in rows]
        assert keys == sorted(keys)
        with pytest.raises(RuntimeError, match="start_over"):
            c.call("fetch", query_id=h, start_over=True, fetch_size=10)
    finally:
        c.close()
        srv.stop()

def test_beeswax_stock_shell_rpc_sequence(beeswax, spark):
    """VERDICT r04 #1: the full RPC sequence the stock impala-shell issues
    over one connection — get_default_configuration at connect
    (impala_client.py:84; without it the shell cannot finish connecting),
    SET, query, get_state poll, fetch, GetExecSummary (the `summary`
    command), GetRuntimeProfile (the `profile` command), INSERT +
    CloseInsert (impala_client.py:331), dump_config, ResetCatalog and
    ResetTable — all over real thrift frames against a live daemon."""
    c = _client(beeswax)
    spark.sql("DROP TABLE IF EXISTS bw_shell_ins")
    try:
        # connect: the shell seeds its option table from this RPC
        opts = c.call("get_default_configuration", include_hadoop=False)
        byname = {o["key"]: o for o in opts}
        assert "MEM_LIMIT" in byname and "NUM_NODES" in byname
        assert all("key" in o and "value" in o for o in opts)
        # dump_config is the shell's config debug surface
        assert "NUM_NODES" in c.call("dump_config")

        # set + query + poll + fetch (the shell's execute loop)
        h = c.call("query", query={
            "query": "SELECT r_regionkey FROM region ORDER BY r_regionkey",
            "configuration": ["DEFAULT_ORDER_BY_LIMIT=3"]})
        assert c.wait(h) == 4
        assert c.fetch_all(h) == ["0", "1", "2", "3", "4"]

        # summary: per-operator TExecSummary tree from executed metrics
        summ = c.call("GetExecSummary", handle=h)
        assert summ["state"] == 4  # FINISHED
        nodes = summ["nodes"]
        assert nodes, "summary must contain executed plan nodes"
        assert any("SCAN" in n["label"] or "PARQUET" in n["label"]
                   for n in nodes)
        # the scan produced the table's rows; exec_stats are well-formed
        assert all(len(n["exec_stats"]) == 1 for n in nodes)
        assert any(n["exec_stats"][0]["cardinality"] >= 5 for n in nodes)
        # num_children reconstructs a single-rooted tree over the flat list
        assert sum(n["num_children"] for n in nodes) == len(nodes) - 1
        prof = c.call("GetRuntimeProfile", query_id=h)
        assert "Rows: 5" in prof
        c.call("close", handle=h)

        # DML: INSERT then CloseInsert returns TInsertResult.rows_appended
        h = c.call("executeAndWait", query={
            "query": "CREATE TABLE bw_shell_ins (k INT) STORED AS PARQUET"},
            clientCtx="ddl")
        c.call("close", handle=h)
        h = c.call("executeAndWait", query={
            "query": "INSERT INTO bw_shell_ins "
                     "SELECT r_regionkey FROM region"}, clientCtx="ins")
        res = c.call("CloseInsert", handle=h)
        assert sum(res["rows_appended"].values()) == 5
        # CloseInsert closed the handle (reference contract)
        with pytest.raises(RuntimeError, match="unknown query handle"):
            c.call("fetch", query_id=h, start_over=False, fetch_size=1)
        h = c.call("executeAndWait", query={
            "query": "SELECT count(*) AS c FROM bw_shell_ins"},
            clientCtx="chk")
        assert c.fetch_all(h) == ["5"]

        # catalog reset RPCs (deprecated aliases the shell still exposes)
        assert c.call("ResetCatalog")["status_code"] == 0
        assert c.call("ResetTable", request={
            "db_name": "default", "table_name": "bw_shell_ins"})[
                "status_code"] == 0
    finally:
        c.close()
        spark.sql("DROP TABLE IF EXISTS bw_shell_ins")
