"""TLS for the serving doors and the debug webserver.

Capability parity target: the reference's SSL-wrapped thrift servers and
HTTPS webserver — `be/src/rpc/thrift-server.cc` (EnableSsl /
CreateSocket ssl paths, --ssl_server_certificate / --ssl_private_key /
--ssl_minimum_version / --ssl_cipher_list flags, thrift-server.h
ssl_enabled()) and `be/src/util/webserver.cc` (--webserver_certificate_file).
Spark-native shape: Python's `ssl` module wraps the listening sockets the
four doors (JSON, HS2 Thrift, Beeswax, HTTP debug) already bind, so every
protocol handler is transport-agnostic — exactly how the reference layers
TSSLServerSocket under the same TProcessor.

Semantics mirrored from the reference:
  * TLS-only per port: a configured certificate makes the port refuse
    plaintext (the reference's EnableSsl socket accepts only TLS; there is
    no opportunistic dual-mode).
  * SASL-PLAIN still runs INSIDE the TLS channel (authentication and
    encryption compose, authentication.cc + thrift-server.cc).
  * The handshake happens on the connection's handler thread, never the
    accept loop — a slow or malicious client cannot stall accept()
    (do_handshake_on_connect=False; the reference gets this from
    per-connection thrift transports).
"""

from __future__ import annotations

import ssl
from dataclasses import dataclass

_MIN_VERSIONS = {
    "tlsv1.2": ssl.TLSVersion.TLSv1_2,
    "tlsv1.3": ssl.TLSVersion.TLSv1_3,
}


@dataclass
class TlsConfig:
    """Server-side TLS settings, named after the reference daemon flags."""

    certificate_file: str  # --ssl_server_certificate
    private_key_file: str  # --ssl_private_key
    private_key_password: str | None = None  # --ssl_private_key_password_cmd
    minimum_version: str = "tlsv1.2"  # --ssl_minimum_version
    cipher_list: str | None = None  # --ssl_cipher_list

    def server_context(self) -> ssl.SSLContext:
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        min_v = _MIN_VERSIONS.get(self.minimum_version.lower())
        if min_v is None:
            raise ValueError(
                f"unsupported --ssl_minimum_version {self.minimum_version!r}"
                f" (one of {sorted(_MIN_VERSIONS)})"
            )
        ctx.minimum_version = min_v
        if self.cipher_list:
            ctx.set_ciphers(self.cipher_list)
        ctx.load_cert_chain(
            self.certificate_file,
            self.private_key_file,
            password=self.private_key_password,
        )
        return ctx


def wrap_tcp_server(tcp, tls: TlsConfig) -> None:
    """Make a socketserver.TCPServer speak TLS: accepted sockets are
    wrapped with do_handshake_on_connect=False, so the handshake runs
    lazily on the handler thread's first read/write and a handshake
    failure kills only that connection (socketserver's handle_error),
    never the accept loop."""
    ctx = tls.server_context()
    orig_get_request = tcp.get_request

    def get_request():
        sock, addr = orig_get_request()
        return (
            ctx.wrap_socket(sock, server_side=True,
                            do_handshake_on_connect=False),
            addr,
        )

    tcp.get_request = get_request
    tcp.tls_enabled = True


def client_context(ca_file: str | None = None) -> ssl.SSLContext:
    """Client context: verify against ca_file when given (the impala-shell
    --ca_cert flag), else accept any certificate (impala-shell's default
    --ssl posture: encrypted, unverified, with its own warning)."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    if ca_file:
        ctx.load_verify_locations(ca_file)
        ctx.check_hostname = False  # daemons bind by address, not name
        ctx.verify_mode = ssl.CERT_REQUIRED
    else:
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    return ctx


def wrap_client_socket(sock, ca_file: str | None = None,
                       server_hostname: str | None = None):
    return client_context(ca_file).wrap_socket(
        sock, server_hostname=server_hostname
    )
