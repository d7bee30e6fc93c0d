"""Role-based authorization: GRANT/REVOKE/SHOW ROLES surface + enforcement.

Reference parity map (the Sentry-backed authorization DDL):
  * grammar         <- fe/src/main/cup/sql-parser.y:647-747 (show_roles_stmt,
                       show_grant_role_stmt, create_drop_role_stmt,
                       grant_role_stmt, revoke_role_stmt,
                       grant_privilege_stmt, revoke_privilege_stmt,
                       privilege_spec, privilege = SELECT | INSERT | ALL)
  * semantics       <- fe/.../analysis/GrantRevokePrivStmt.java,
                       GrantRevokeRoleStmt.java, ShowGrantRoleStmt.java:
                       privileges attach to ROLES, roles are granted to
                       GROUPS, users acquire privileges through their groups.
  * enforcement     <- the reference delegates the privilege check to the
                       Sentry policy engine at analysis time; here the same
                       role->group->user resolution runs driver-side against
                       the ANALYZED Catalyst plan's catalog tables (catalog
                       metadata scale, never data scale).

Spark-first shape: the catalog is a plain driver-side dict (roles and grants
are metadata, bounded by administrator input, never sharded); the only Spark
interaction is (a) SHOW statements materialized as DataFrames, mirroring the
reference's result-set-returning DDL, and (b) plan traversal to find which
catalog tables a query reads. Temp views are session-local scratch and are
not privilege-checked (they have no catalog identity in Spark, same as the
reference's WITH-clause aliases).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from pyspark.sql import DataFrame, SparkSession

_PRIVS = ("SELECT", "INSERT", "ALL")


class AuthorizationException(Exception):
    """Raised when enforcement is on and the user lacks a privilege."""


@dataclass(frozen=True)
class Privilege:
    """One granted privilege row: level on a scope, with/without grant opt.

    scope is ('server', '') | ('database', db) | ('table', 'db.tbl') |
    ('uri', uri) — the four alternatives of privilege_spec in the grammar.
    """

    level: str
    scope_kind: str
    scope_name: str
    grant_option: bool = False

    def implies(self, level: str, kind: str, name: str) -> bool:
        """Does this grant satisfy a required (level, scope)?

        ALL implies SELECT and INSERT; SERVER scope implies every database,
        DATABASE scope implies every table in it (hierarchical implication,
        matching the Sentry model the reference delegates to).
        """
        if self.level != "ALL" and self.level != level:
            return False
        if self.scope_kind == "server":
            return True
        if self.scope_kind == "database":
            if kind == "database":
                return self.scope_name == name
            if kind == "table":
                return name.split(".", 1)[0] == self.scope_name
            return False
        return self.scope_kind == kind and self.scope_name == name


class AuthzCatalog:
    """Driver-side role/privilege catalog with user->group resolution."""

    def __init__(self) -> None:
        self.roles: dict[str, set[Privilege]] = {}
        self.role_groups: dict[str, set[str]] = {}  # role -> groups
        self.user_groups: dict[str, set[str]] = {}  # user -> groups

    # -- role DDL ------------------------------------------------------------

    def create_role(self, role: str) -> None:
        if role in self.roles:
            raise ValueError(f"Role '{role}' already exists")
        self.roles[role] = set()
        self.role_groups[role] = set()

    def drop_role(self, role: str) -> None:
        self._require_role(role)
        del self.roles[role]
        del self.role_groups[role]

    def grant_role(self, role: str, group: str) -> None:
        self._require_role(role)
        self.role_groups[role].add(group)

    def revoke_role(self, role: str, group: str) -> None:
        self._require_role(role)
        self.role_groups[role].discard(group)

    def grant_priv(self, role: str, priv: Privilege) -> None:
        self._require_role(role)
        self.roles[role].add(priv)

    def revoke_priv(self, role: str, priv: Privilege,
                    grant_option_for: bool = False) -> None:
        """REVOKE [GRANT OPTION FOR] — the latter downgrades grant_option
        to False instead of removing the privilege (GrantRevokePrivStmt)."""
        self._require_role(role)
        match = {p for p in self.roles[role]
                 if p.level == priv.level and p.scope_kind == priv.scope_kind
                 and p.scope_name == priv.scope_name}
        self.roles[role] -= match
        if grant_option_for:
            for p in match:
                self.roles[role].add(Privilege(p.level, p.scope_kind,
                                               p.scope_name, False))

    def _require_role(self, role: str) -> None:
        if role not in self.roles:
            raise ValueError(f"Role '{role}' does not exist")

    # -- resolution ----------------------------------------------------------

    def set_user_groups(self, user: str, groups: set[str]) -> None:
        self.user_groups[user] = set(groups)

    def roles_of_user(self, user: str) -> set[str]:
        groups = self.user_groups.get(user, set())
        return {r for r, gs in self.role_groups.items() if gs & groups}

    def check(self, user: str, level: str, kind: str, name: str) -> bool:
        for role in self.roles_of_user(user):
            for p in self.roles[role]:
                if p.implies(level, kind, name):
                    return True
        return False


# statement regexes — mirror the grammar alternatives one-for-one
_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_TBL = rf"{_IDENT}(?:\.{_IDENT})?"
_RE = {
    "create_role": re.compile(rf"\s*CREATE\s+ROLE\s+({_IDENT})\s*;?\s*$", re.I),
    "drop_role": re.compile(rf"\s*DROP\s+ROLE\s+({_IDENT})\s*;?\s*$", re.I),
    "grant_role": re.compile(
        rf"\s*GRANT\s+ROLE\s+({_IDENT})\s+TO\s+GROUP\s+({_IDENT})\s*;?\s*$", re.I),
    "revoke_role": re.compile(
        rf"\s*REVOKE\s+ROLE\s+({_IDENT})\s+FROM\s+GROUP\s+({_IDENT})\s*;?\s*$", re.I),
    "grant_priv": re.compile(
        rf"\s*GRANT\s+(SELECT|INSERT|ALL)\s+ON\s+"
        rf"(SERVER(?:\s+{_IDENT})?|DATABASE\s+{_IDENT}|TABLE\s+{_TBL}|URI\s+'[^']*')"
        rf"\s+TO\s+(?:ROLE\s+)?({_IDENT})(\s+WITH\s+GRANT\s+OPTION)?\s*;?\s*$", re.I),
    "revoke_priv": re.compile(
        rf"\s*REVOKE\s+(GRANT\s+OPTION\s+FOR\s+)?(SELECT|INSERT|ALL)\s+ON\s+"
        rf"(SERVER(?:\s+{_IDENT})?|DATABASE\s+{_IDENT}|TABLE\s+{_TBL}|URI\s+'[^']*')"
        rf"\s+FROM\s+(?:ROLE\s+)?({_IDENT})\s*;?\s*$", re.I),
    "show_roles": re.compile(r"\s*SHOW\s+ROLES\s*;?\s*$", re.I),
    "show_current_roles": re.compile(r"\s*SHOW\s+CURRENT\s+ROLES\s*;?\s*$", re.I),
    "show_role_grant": re.compile(
        rf"\s*SHOW\s+ROLE\s+GRANT\s+GROUP\s+({_IDENT})\s*;?\s*$", re.I),
    "show_grant_role": re.compile(
        rf"\s*SHOW\s+GRANT\s+ROLE\s+({_IDENT})"
        rf"(?:\s+ON\s+(SERVER(?:\s+{_IDENT})?|DATABASE\s+{_IDENT}|TABLE\s+{_TBL}|URI\s+'[^']*'))?"
        rf"\s*;?\s*$", re.I),
}


def _parse_scope(text: str) -> tuple[str, str]:
    up = text.strip()
    head = up.split(None, 1)[0].upper()
    if head == "SERVER":
        return "server", ""
    rest = up.split(None, 1)[1].strip()
    if head == "URI":
        return "uri", rest[1:-1]
    return head.lower(), rest


def dispatch(catalog: AuthzCatalog, spark: SparkSession, user: str,
             text: str) -> DataFrame | None:
    """If `text` is an authorization statement, execute it and return its
    result set (empty single-column frame for non-SHOW DDL, mirroring the
    reference's OK result); else return None so Engine.sql proceeds."""
    def ok() -> DataFrame:
        return spark.createDataFrame([("OK",)], "summary string")

    if m := _RE["create_role"].match(text):
        catalog.create_role(m.group(1))
        return ok()
    if m := _RE["drop_role"].match(text):
        catalog.drop_role(m.group(1))
        return ok()
    if m := _RE["grant_role"].match(text):
        catalog.grant_role(m.group(1), m.group(2))
        return ok()
    if m := _RE["revoke_role"].match(text):
        catalog.revoke_role(m.group(1), m.group(2))
        return ok()
    if m := _RE["grant_priv"].match(text):
        kind, name = _parse_scope(m.group(2))
        catalog.grant_priv(m.group(3), Privilege(
            m.group(1).upper(), kind, name, bool(m.group(4))))
        return ok()
    if m := _RE["revoke_priv"].match(text):
        kind, name = _parse_scope(m.group(3))
        catalog.revoke_priv(m.group(4), Privilege(m.group(2).upper(), kind, name),
                            grant_option_for=bool(m.group(1)))
        return ok()
    if _RE["show_roles"].match(text):
        return spark.createDataFrame(
            [(r,) for r in sorted(catalog.roles)], "role_name string")
    if _RE["show_current_roles"].match(text):
        return spark.createDataFrame(
            [(r,) for r in sorted(catalog.roles_of_user(user))],
            "role_name string")
    if m := _RE["show_role_grant"].match(text):
        g = m.group(1)
        return spark.createDataFrame(
            [(r,) for r in sorted(catalog.role_groups)
             if g in catalog.role_groups[r]], "role_name string")
    if m := _RE["show_grant_role"].match(text):
        catalog._require_role(m.group(1))
        privs = catalog.roles[m.group(1)]
        if m.group(2):
            kind, name = _parse_scope(m.group(2))
            privs = {p for p in privs
                     if p.scope_kind == kind and (kind == "server"
                                                  or p.scope_name == name)}
        rows = sorted(
            (p.scope_kind,
             p.scope_name if p.scope_kind == "database"
             else (p.scope_name.split(".", 1)[0] if p.scope_kind == "table"
                   and "." in p.scope_name else ""),
             p.scope_name.split(".", 1)[-1] if p.scope_kind == "table" else "",
             p.scope_name if p.scope_kind == "uri" else "",
             p.level, p.grant_option)
            for p in privs)
        return spark.createDataFrame(
            rows, "scope string, database string, `table` string, uri string,"
                  " privilege string, grant_option boolean")
    return None


def catalog_tables(df: DataFrame) -> set[str]:
    """Catalog tables the analyzed plan reads (db.table, unqualified default
    db normalized away). Traverses children + subquery plans via py4j —
    driver-side, plan-size bounded. Temp views resolve to non-catalog leaf
    relations and are intentionally not reported."""
    names: set[str] = set()
    stack = [df._jdf.queryExecution().analyzed()]  # noqa: SLF001
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls == "LogicalRelation":
            opt = node.catalogTable()
            if opt.isDefined():
                names.add(opt.get().identifier().unquotedString())
        elif cls == "HiveTableRelation":
            names.add(node.tableMeta().identifier().unquotedString())
        for seq_getter in ("children", "subqueries"):
            try:
                seq = getattr(node, seq_getter)()
            except Exception:  # expressions-only nodes
                continue
            for i in range(seq.size()):
                stack.append(seq.apply(i))
    return {n.removeprefix("spark_catalog.") for n in names}


def enforce(catalog: AuthzCatalog, user: str, level: str,
            tables: set[str]) -> None:
    """Raise AuthorizationException unless `user` holds `level` (or ALL) on
    every table (directly, via its database, or server-wide)."""
    for t in sorted(tables):
        if not catalog.check(user, level, "table", t):
            raise AuthorizationException(
                f"User '{user}' does not have privileges to execute "
                f"'{level}' on: {t}")
