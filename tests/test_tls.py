"""TLS on the serving doors + HTTPS webserver (impalatogo_spark/tls.py).

Reference parity targets:
  * be/src/rpc/thrift-server.cc EnableSsl / ssl socket paths
    (--ssl_server_certificate / --ssl_private_key / --ssl_minimum_version)
  * be/src/util/webserver.cc --webserver_certificate_file (HTTPS debug UI)

Drives the committed clients over real TLS sockets against live daemons
with a self-signed certificate, and asserts the reference's TLS-only
semantics: a configured certificate makes plaintext clients fail.
"""

from __future__ import annotations

import json
import socket
import ssl
import subprocess
import urllib.request

import pytest

from impalatogo_spark.server import I2SClient, I2SServer
from impalatogo_spark.tls import TlsConfig


@pytest.fixture(scope="module")
def certpair(tmp_path_factory):
    d = tmp_path_factory.mktemp("tls")
    cert, key = str(d / "server.pem"), str(d / "server.key")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", key, "-out", cert, "-days", "1", "-subj",
         "/CN=i2s-test", "-addext", "subjectAltName=IP:127.0.0.1"],
        check=True, capture_output=True)
    return cert, key


@pytest.fixture(scope="module")
def tls_server(spark, sf_dir, certpair):
    cert, key = certpair
    srv = I2SServer(spark, sf_dir=sf_dir,
                    tls=TlsConfig(certificate_file=cert, private_key_file=key))
    host, port = srv.start()
    yield srv, host, port, cert
    srv.stop()


def test_json_door_over_tls_verified(tls_server):
    """I2SClient with the CA bundle: full session + query round-trip over
    a VERIFIED TLS channel."""
    _, host, port, cert = tls_server
    c = I2SClient(host, port, tls=cert)
    try:
        c.open_session()
        resp = c.execute("SELECT 1 AS one")
        assert resp["rows"] == [[1]]
    finally:
        c.close()


def test_json_door_refuses_plaintext(tls_server):
    """Reference TLS-only semantics: a plaintext client on a TLS port gets
    a dead connection, never a protocol response."""
    _, host, port, _ = tls_server
    s = socket.create_connection((host, port), timeout=10)
    try:
        s.sendall(b'{"op": "ping"}\n')
        s.settimeout(10)
        # the server's TLS handshake fails on the JSON bytes and closes;
        # any bytes that do come back must not be a JSON protocol reply
        try:
            data = s.recv(1024)
        except (ConnectionResetError, TimeoutError, OSError):
            return
        assert not data.startswith(b'{"ok"')
    finally:
        s.close()


def test_json_door_rejects_wrong_ca(tls_server, tmp_path):
    """Verification is real: a client pinned to a DIFFERENT CA fails the
    handshake."""
    _, host, port, _ = tls_server
    other_cert = str(tmp_path / "other.pem")
    other_key = str(tmp_path / "other.key")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", other_key, "-out", other_cert, "-days", "1",
         "-subj", "/CN=not-the-server"],
        check=True, capture_output=True)
    with pytest.raises(ssl.SSLError):
        I2SClient(host, port, tls=other_cert)


def test_hs2_thrift_door_over_tls_with_sasl(spark, sf_dir, certpair):
    """HS2 binary Thrift + SASL-PLAIN composed INSIDE the TLS channel
    (authentication and encryption stack like the reference daemon)."""
    from impalatogo_spark.thrift_hs2 import HS2ThriftClient, HS2ThriftServer

    cert, key = certpair
    srv = HS2ThriftServer(
        spark, sf_dir=sf_dir,
        tls=TlsConfig(certificate_file=cert, private_key_file=key))
    host, port = srv.start()
    try:
        c = HS2ThriftClient(host, port, sasl_plain=("alice", "secret"),
                            tls=cert)
        c.open_session()
        op = c.execute("SELECT 2 AS two")
        rows = c.fetch_all(op)
        assert rows == [[2]]
        c.close()
        # plaintext client refused on the same port
        with pytest.raises((RuntimeError, OSError, EOFError)):
            pc = HS2ThriftClient(host, port)
            pc.open_session()
    finally:
        srv.stop()


def test_beeswax_door_over_tls(spark, sf_dir, certpair):
    from impalatogo_spark.beeswax import BeeswaxClient, BeeswaxServer

    cert, key = certpair
    srv = BeeswaxServer(
        spark, sf_dir=sf_dir,
        tls=TlsConfig(certificate_file=cert, private_key_file=key))
    host, port = srv.start()
    try:
        c = BeeswaxClient(host, port, tls=cert)
        h = c.query("SELECT 3 AS three")
        rows = c.fetch_all(h)
        assert rows == ["3"]  # beeswax rows are TSV lines
        c.close()
    finally:
        srv.stop()


def test_webui_https(spark, sf_dir, certpair):
    """HTTPS debug webserver (webserver.cc certificate flags): verified
    GET works, plaintext HTTP on the same port fails."""
    from impalatogo_spark.webui import WebUI

    cert, key = certpair
    core = I2SServer(spark, sf_dir=sf_dir)
    ui = WebUI(core, tls=TlsConfig(certificate_file=cert,
                                   private_key_file=key))
    host, port = ui.start()
    try:
        ctx = ssl.create_default_context(cafile=cert)
        ctx.check_hostname = False
        with urllib.request.urlopen(f"https://{host}:{port}/metrics?json",
                                    context=ctx, timeout=10) as r:
            data = json.loads(r.read().decode())
        assert "process" in data or data  # metrics payload parsed over TLS
        with pytest.raises(Exception):
            urllib.request.urlopen(f"http://{host}:{port}/metrics?json",
                                   timeout=10)
    finally:
        ui.stop()


def test_minimum_version_validation(certpair):
    cert, key = certpair
    with pytest.raises(ValueError):
        TlsConfig(certificate_file=cert, private_key_file=key,
                  minimum_version="sslv3").server_context()
    ctx = TlsConfig(certificate_file=cert, private_key_file=key,
                    minimum_version="tlsv1.3").server_context()
    assert ctx.minimum_version == ssl.TLSVersion.TLSv1_3


def test_shell_daemon_tls_subprocess(certpair):
    """Full deployment shape over TLS: boot i2s_shell --listen with the
    reference-named --ssl_server_certificate/--ssl_private_key flags and
    drive a query through the remote shell's --ssl --ca_cert path plus a
    verified HTTPS /metrics fetch."""
    import os
    import sys
    import time

    cert, key = certpair
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    srv = subprocess.Popen(
        [sys.executable, os.path.join(repo, "tools", "i2s_shell.py"),
         "--listen", "127.0.0.1:0", "--webui-port", "0", "--sf-dir", sf,
         "--ssl_server_certificate", cert, "--ssl_private_key", key],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
    )
    try:
        port = web_port = None
        saw_ssl_banner = False
        deadline = time.time() + 180
        while time.time() < deadline and (port is None or web_port is None):
            line = srv.stdout.readline()
            if not line:
                time.sleep(0.2)
                continue
            if line.startswith("ssl enabled"):
                saw_ssl_banner = True
            elif line.startswith("i2s-server listening on "):
                port = int(line.rsplit(":", 1)[1])
            elif line.startswith("webui listening on "):
                web_port = int(line.rsplit(":", 1)[1])
        assert saw_ssl_banner and port and web_port
        # committed client over verified TLS
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "i2s_shell.py"),
             "--connect", f"127.0.0.1:{port}", "--ssl", "--ca_cert", cert,
             "-B", "-q", "SELECT 41 + 1 AS a"],
            capture_output=True, text=True, timeout=120, env=env)
        assert out.returncode == 0 and "42" in out.stdout, out.stderr[-500:]
        # HTTPS debug fetch, verified
        ctx = ssl.create_default_context(cafile=cert)
        ctx.check_hostname = False
        with urllib.request.urlopen(
                f"https://127.0.0.1:{web_port}/metrics?json",
                context=ctx, timeout=30) as r:
            assert json.loads(r.read().decode())["server"] == "i2s-server"
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=30)
        except subprocess.TimeoutExpired:
            srv.kill()
