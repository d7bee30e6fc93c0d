"""LDAP-shaped pluggable authentication (impalatogo_spark/auth.py).

Reference parity: be/src/rpc/authentication.cc SaslLdapCheckPass — DN
construction precedence (--ldap_domain > --ldap_baseDN >
--ldap_bind_pattern), anonymous-bind rejection
(--ldap_allow_anonymous_binds default off), simple bind against a
directory. Real-LDAP is environment-limited (no ldap3 library, no
server); the policy layer is exercised over FakeDirectory, including
stock-client connects on BOTH SASL thrift doors and the i2s_shell
--ldap-* flag path end-to-end.
"""

from __future__ import annotations

import json

import pytest

from impalatogo_spark.auth import (
    FakeDirectory,
    Ldap3Directory,
    LdapAuthenticator,
    build_ldap_authenticator,
)


def _auth(entries, **kw):
    return LdapAuthenticator(FakeDirectory(entries), **kw)


def test_bind_name_mapping_matches_reference():
    """authentication.cc:220-232 DN mapping, one flag at a time (setting
    more than one is a startup error since r07 — see
    test_conflicting_dn_flags_rejected_at_startup); domain is not
    appended when the user already has an @."""
    a = _auth({}, domain="corp.example.com")
    assert a.bind_name("alice") == "alice@corp.example.com"
    assert a.bind_name("bob@other.org") == "bob@other.org"
    b = _auth({}, base_dn="ou=people,dc=example,dc=com")
    assert b.bind_name("alice") == "uid=alice,ou=people,dc=example,dc=com"
    c = _auth({}, bind_pattern="cn=#UID,ou=eng,dc=example,dc=com")
    assert c.bind_name("carol") == "cn=carol,ou=eng,dc=example,dc=com"
    assert _auth({}).bind_name("dave") == "dave"


def test_anonymous_binds_rejected_unless_flagged():
    """authentication.cc:188: empty password fails closed; the
    --ldap_allow_anonymous_binds escape hatch admits it (directory still
    decides)."""
    d = FakeDirectory({"alice": ""})
    strict = LdapAuthenticator(d)
    assert strict("alice", "") is False
    assert d.bind_attempts == []  # rejected BEFORE any bind
    loose = LdapAuthenticator(d, allow_anonymous_binds=True)
    assert loose("alice", "") is True


def test_bind_success_and_failure_paths():
    a = _auth({"uid=alice,dc=example,dc=com": "secret"},
              base_dn="dc=example,dc=com")
    assert a("alice", "secret") is True
    assert a("alice", "wrong") is False
    assert a("mallory", "secret") is False
    # a directory that raises fails closed
    class Boom:
        def bind(self, dn, password):
            raise OSError("server unreachable")
    assert LdapAuthenticator(Boom())("alice", "x") is False


def test_uri_validation_and_real_ldap_env_limit():
    """--ldap_uri must be ldap:// or ldaps:// (authentication.cc:117-119);
    the real-bind directory states the environment limitation when ldap3
    is absent."""
    with pytest.raises(ValueError, match="ldap_uri"):
        _auth({}, uri="http://directory.example.com")
    _auth({}, uri="ldaps://directory.example.com")  # accepted
    try:
        import ldap3  # noqa: F401
        pytest.skip("ldap3 installed; env-limit path not applicable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="ldap3"):
        Ldap3Directory("ldap://directory.example.com")
    with pytest.raises(RuntimeError, match="ldap3"):
        build_ldap_authenticator(uri="ldap://directory.example.com")


def test_both_thrift_doors_enforce_ldap_bind(spark, sf_dir):
    """Stock-client connects succeed/fail BY DIRECTORY CONTENTS on both
    SASL doors (HS2 TCLIService and Beeswax), sharing one authenticator."""
    from impalatogo_spark.beeswax import BeeswaxClient, BeeswaxServer
    from impalatogo_spark.thrift_hs2 import HS2ThriftClient, HS2ThriftServer

    auth = _auth({"uid=alice,ou=people,dc=example,dc=com": "secret"},
                 base_dn="ou=people,dc=example,dc=com")
    hs2 = HS2ThriftServer(spark, sf_dir=sf_dir, sasl_check=auth)
    bw = BeeswaxServer(spark, sf_dir=sf_dir, core=hs2.core, sasl_check=auth)
    h_host, h_port = hs2.start()
    b_host, b_port = bw.start()
    try:
        c = HS2ThriftClient(h_host, h_port, sasl_plain=("alice", "secret"))
        try:
            c.open_session()
            op = c.execute("SELECT count(*) AS c FROM region")
            assert c.fetch_all(op) == [[5]]
        finally:
            c.close()
        with pytest.raises(ConnectionError, match="authentication failed"):
            HS2ThriftClient(h_host, h_port, sasl_plain=("alice", "nope"))
        with pytest.raises(ConnectionError, match="authentication failed"):
            HS2ThriftClient(h_host, h_port, sasl_plain=("eve", "secret"))

        bc = BeeswaxClient(b_host, b_port, sasl_plain=("alice", "secret"))
        h = bc.call("executeAndWait", query={"query": "SELECT 1 AS one"},
                    clientCtx="authn")
        assert bc.call("fetch", query_id=h, start_over=False,
                       fetch_size=10)["data"] == ["1"]
        with pytest.raises(ConnectionError, match="authentication failed"):
            BeeswaxClient(b_host, b_port, sasl_plain=("alice", "bad"))
    finally:
        bw.stop()
        hs2.stop()


def test_shell_ldap_flags_end_to_end(tmp_path):
    """Boot the daemon with --ldap-base-dn + --ldap-fake-directory and
    drive a stock SASL client against the HS2 door: good credentials
    connect and query, bad credentials are refused at the handshake."""
    import os
    import subprocess
    import sys
    import time

    from impalatogo_spark.thrift_hs2 import HS2ThriftClient

    directory = tmp_path / "directory.json"
    directory.write_text(json.dumps(
        {"uid=alice,ou=people,dc=example,dc=com": "secret"}))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    srv = subprocess.Popen(
        [sys.executable, os.path.join(repo, "tools", "i2s_shell.py"),
         "--listen", "127.0.0.1:0", "--hs2-port", "0", "--sf-dir", sf,
         "--ldap-uri", "ldap://fake.example.com",
         "--ldap-base-dn", "ou=people,dc=example,dc=com",
         "--ldap-fake-directory", str(directory)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
    )
    try:
        hs2_port = None
        saw_ldap_banner = False
        deadline = time.time() + 180
        while time.time() < deadline:
            line = srv.stdout.readline()
            if not line:
                time.sleep(0.2)
                continue
            if line.startswith("ldap authentication enabled"):
                saw_ldap_banner = True
            if line.startswith("hs2-thrift listening on "):
                hs2_port = int(line.rsplit(":", 1)[1])
                break
        assert hs2_port, "daemon never reported its hs2 port"
        assert saw_ldap_banner
        c = HS2ThriftClient("127.0.0.1", hs2_port,
                            sasl_plain=("alice", "secret"))
        try:
            c.open_session()
            op = c.execute("SELECT 40 + 2 AS x")
            assert c.fetch_all(op) == [[42]]
        finally:
            c.close()
        with pytest.raises(ConnectionError, match="authentication failed"):
            HS2ThriftClient("127.0.0.1", hs2_port,
                            sasl_plain=("alice", "wrong"))
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=30)
        except subprocess.TimeoutExpired:
            srv.kill()


def test_conflicting_dn_flags_rejected_at_startup():
    """authentication.cc InitAuth rejects setting more than one of
    --ldap_domain/--ldap_baseDN/--ldap_bind_pattern (r06 ADVICE: silent
    precedence was not reference behavior)."""
    with pytest.raises(ValueError, match="at most one"):
        _auth({}, domain="corp.example", base_dn="dc=example")
    with pytest.raises(ValueError, match="at most one"):
        _auth({}, base_dn="dc=example", bind_pattern="uid=#UID")
    with pytest.raises(ValueError, match="at most one"):
        _auth({}, domain="corp.example", bind_pattern="uid=#UID")
    # one at a time stays fine
    for kw in ({"domain": "corp"}, {"base_dn": "dc=x"},
               {"bind_pattern": "#UID"}):
        _auth({}, **kw)
