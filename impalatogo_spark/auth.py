"""Pluggable LDAP-shaped authentication for the SASL-PLAIN thrift doors.

Reference parity: be/src/rpc/authentication.cc SaslLdapCheckPass — the
reference daemon authenticates SASL-PLAIN credentials by performing a
simple LDAP bind with a DN derived from the username via the
--ldap_domain / --ldap_baseDN / --ldap_bind_pattern gflags (precedence in
that order, authentication.cc:220-232), rejecting empty passwords unless
--ldap_allow_anonymous_binds (authentication.cc:188).

Both thrift servers (HS2ThriftServer, BeeswaxServer) accept an
`sasl_check(user, password) -> bool` callback; this module supplies the
bind-style implementation. The actual bind is delegated to a *directory*
object so the policy layer (DN mapping, anonymous-bind rejection) is
testable without a live LDAP server:

* `FakeDirectory` — an in-memory DN -> password map (the test double and
  the `--ldap-fake-directory <json>` deployment shape).
* `Ldap3Directory` — binds against a real server via the `ldap3` library
  when it is installed. This container ships no LDAP client library and
  no LDAP server, so real-LDAP is an ENVIRONMENT-LIMITED path: the class
  raises a clear error at construction when `ldap3` is missing. The
  policy code above it is identical either way.

Kerberos/GSSAPI (the reference's other SASL path) remains
environment-impossible here and is documented out in SURVEY.md.
"""

from __future__ import annotations

import json
import logging

logger = logging.getLogger(__name__)

LDAP_URI_PREFIXES = ("ldap://", "ldaps://")  # authentication.cc:118-119


class FakeDirectory:
    """In-memory bind target: dn -> password. Stands in for the LDAP
    server in tests and air-gapped deployments (--ldap-fake-directory)."""

    def __init__(self, entries: dict[str, str]):
        self.entries = dict(entries)
        self.bind_attempts: list[tuple[str, bool]] = []  # (dn, ok) audit

    @classmethod
    def from_json_file(cls, path: str) -> "FakeDirectory":
        with open(path) as fh:
            return cls(json.load(fh))

    def bind(self, dn: str, password: str) -> bool:
        ok = self.entries.get(dn) == password
        self.bind_attempts.append((dn, ok))
        return ok


class Ldap3Directory:
    """Real simple-bind directory via the public `ldap3` library
    (equivalent of authentication.cc's ldap_sasl_bind_s(LDAP_SASL_SIMPLE)).
    Not usable in this container (no ldap3, no server) — constructing it
    without the library raises immediately with the environment note."""

    def __init__(self, uri: str):
        try:
            import ldap3  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "real-LDAP bind requires the 'ldap3' library, which this "
                "environment does not ship; use --ldap-fake-directory for "
                "an in-process directory (see impalatogo_spark/auth.py)"
            ) from e
        self._uri = uri

    def bind(self, dn: str, password: str) -> bool:
        import ldap3

        server = ldap3.Server(self._uri)
        conn = ldap3.Connection(server, user=dn, password=password)
        try:
            return bool(conn.bind())
        finally:
            conn.unbind()


class LdapAuthenticator:
    """The DN-mapping + bind policy of SaslLdapCheckPass
    (authentication.cc:187-240), directory-agnostic.

    DN construction (one of, matching the reference):
      * `domain`      -> append @domain unless the user already has an @
      * `base_dn`     -> uid=<user>,<base_dn>
      * `bind_pattern`-> pattern with #UID replaced by the user
      * none          -> the raw username
    Setting MORE than one is a startup error, exactly the reference's
    InitAuth validation (authentication.cc ~901-906 rejects combining
    --ldap_domain/--ldap_baseDN/--ldap_bind_pattern; r06 ADVICE — the
    silent precedence this class used to apply was NOT reference
    behavior). Empty passwords are rejected unless allow_anonymous_binds
    (authentication.cc:188 'Disable anonymous binds')."""

    def __init__(self, directory, uri: str = "",
                 domain: str = "", base_dn: str = "",
                 bind_pattern: str = "",
                 allow_anonymous_binds: bool = False):
        if uri and not uri.startswith(LDAP_URI_PREFIXES):
            # authentication.cc InitAuth: --ldap_uri must be ldap:// or
            # ldaps://
            raise ValueError(
                f"--ldap_uri must start with one of {LDAP_URI_PREFIXES}: "
                f"{uri!r}")
        n_set = sum(1 for v in (domain, base_dn, bind_pattern) if v)
        if n_set > 1:
            raise ValueError(
                "at most one of --ldap_domain, --ldap_baseDN and "
                "--ldap_bind_pattern may be set (authentication.cc InitAuth)")
        self.directory = directory
        self.uri = uri
        self.domain = domain
        self.base_dn = base_dn
        self.bind_pattern = bind_pattern
        self.allow_anonymous_binds = allow_anonymous_binds

    def bind_name(self, user: str) -> str:
        if self.domain:
            return user if "@" in user else f"{user}@{self.domain}"
        if self.base_dn:
            return f"uid={user},{self.base_dn}"
        if self.bind_pattern:
            return self.bind_pattern.replace("#UID", user)
        return user

    def __call__(self, user: str, password: str) -> bool:
        if not password and not self.allow_anonymous_binds:
            return False  # disable anonymous binds
        dn = self.bind_name(user)
        try:
            ok = bool(self.directory.bind(dn, password))
        except Exception as e:
            logger.warning("LDAP bind error for %s: %s", dn, e)
            return False
        if not ok:
            logger.info("LDAP bind REJECTED for %s", dn)
        return ok


def build_ldap_authenticator(uri: str = "", domain: str = "",
                             base_dn: str = "", bind_pattern: str = "",
                             allow_anonymous_binds: bool = False,
                             fake_directory_path: str | None = None):
    """Assemble the authenticator from flag values (the i2s_shell
    --ldap-* flags, the reference's --enable_ldap_auth + --ldap_* gflags).
    A fake-directory path selects the in-process directory; otherwise the
    uri must point at a real server reachable via ldap3."""
    if fake_directory_path:
        directory = FakeDirectory.from_json_file(fake_directory_path)
    else:
        directory = Ldap3Directory(uri)
    return LdapAuthenticator(
        directory, uri=uri, domain=domain, base_dn=base_dn,
        bind_pattern=bind_pattern,
        allow_anonymous_binds=allow_anonymous_binds)
