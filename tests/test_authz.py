"""GRANT/REVOKE role catalog + enforcement (sql-parser.y:647-747; Sentry
role->group->user model per GrantRevokePrivStmt.java / ShowGrantRoleStmt.java).
"""

import pytest

from impalatogo_spark.authz import AuthorizationException, Privilege
from impalatogo_spark.engine import Engine


@pytest.fixture()
def engine(spark):
    e = Engine(spark)
    yield e
    # roles live on the engine, not the session — nothing global to undo
    e.enforce_authz = False


def test_role_ddl_and_show_roles(engine):
    engine.sql("CREATE ROLE analyst")
    engine.sql("CREATE ROLE etl")
    assert [r.role_name for r in engine.sql("SHOW ROLES").collect()] == [
        "analyst", "etl"]
    engine.sql("DROP ROLE etl")
    assert [r.role_name for r in engine.sql("SHOW ROLES").collect()] == [
        "analyst"]
    with pytest.raises(ValueError):
        engine.sql("DROP ROLE etl")
    with pytest.raises(ValueError):
        engine.sql("CREATE ROLE analyst")


def test_grant_role_to_group_and_show_role_grant(engine):
    engine.sql("CREATE ROLE analyst")
    engine.sql("GRANT ROLE analyst TO GROUP data_team")
    assert [r.role_name
            for r in engine.sql("SHOW ROLE GRANT GROUP data_team").collect()
            ] == ["analyst"]
    engine.sql("REVOKE ROLE analyst FROM GROUP data_team")
    assert engine.sql("SHOW ROLE GRANT GROUP data_team").count() == 0


def test_grant_privilege_show_grant_and_revoke(engine):
    engine.sql("CREATE ROLE analyst")
    engine.sql("GRANT SELECT ON TABLE default.orders TO ROLE analyst")
    engine.sql("GRANT ALL ON DATABASE sales TO analyst WITH GRANT OPTION")
    engine.sql("GRANT INSERT ON URI 'hdfs://nn/warehouse/x' TO ROLE analyst")
    rows = engine.sql("SHOW GRANT ROLE analyst").collect()
    assert {(r.scope, r.privilege, r.grant_option) for r in rows} == {
        ("table", "SELECT", False),
        ("database", "ALL", True),
        ("uri", "INSERT", False),
    }
    # scoped SHOW GRANT filters to the one scope
    tbl = engine.sql("SHOW GRANT ROLE analyst ON TABLE default.orders").collect()
    assert len(tbl) == 1 and tbl[0].database == "default" and tbl[0].table == "orders"
    # REVOKE GRANT OPTION FOR downgrades, does not remove
    engine.sql("REVOKE GRANT OPTION FOR ALL ON DATABASE sales FROM analyst")
    db = engine.sql("SHOW GRANT ROLE analyst ON DATABASE sales").collect()
    assert len(db) == 1 and db[0].grant_option is False
    engine.sql("REVOKE SELECT ON TABLE default.orders FROM ROLE analyst")
    assert engine.sql("SHOW GRANT ROLE analyst ON TABLE default.orders").count() == 0


def test_show_current_roles_resolves_through_groups(engine):
    engine.sql("CREATE ROLE analyst")
    engine.sql("CREATE ROLE admin")
    engine.sql("GRANT ROLE analyst TO GROUP eng")
    engine.sql("GRANT ROLE admin TO GROUP ops")
    engine.authz.set_user_groups(engine.authz_user, {"eng"})
    assert [r.role_name
            for r in engine.sql("SHOW CURRENT ROLES").collect()] == ["analyst"]


def test_privilege_implication_hierarchy():
    p_server = Privilege("ALL", "server", "")
    p_db = Privilege("SELECT", "database", "sales")
    p_tbl = Privilege("INSERT", "table", "sales.orders")
    assert p_server.implies("SELECT", "table", "any.tbl")
    assert p_server.implies("INSERT", "database", "x")
    assert p_db.implies("SELECT", "table", "sales.orders")
    assert not p_db.implies("INSERT", "table", "sales.orders")
    assert not p_db.implies("SELECT", "table", "hr.orders")
    assert p_tbl.implies("INSERT", "table", "sales.orders")
    assert not p_tbl.implies("SELECT", "table", "sales.orders")


def test_enforcement_on_catalog_tables(engine, spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS authz_t")
    spark.sql(
        f"CREATE TABLE authz_t (k INT, v STRING) USING parquet"
        f" LOCATION '{tmp_path}/authz_t'")
    try:
        spark.sql("INSERT INTO authz_t VALUES (1, 'a'), (2, 'b')")
        engine.sql("CREATE ROLE reader")
        engine.sql("GRANT ROLE reader TO GROUP readers")
        engine.enforce_authz = True
        # no groups -> no roles -> denied
        engine.authz.set_user_groups(engine.authz_user, set())
        with pytest.raises(AuthorizationException):
            engine.sql("SELECT count(*) AS n FROM authz_t")
        # group member but role has no privilege -> still denied
        engine.authz.set_user_groups(engine.authz_user, {"readers"})
        with pytest.raises(AuthorizationException):
            engine.sql("SELECT count(*) AS n FROM authz_t")
        # table-level SELECT -> allowed (and subquery references are caught)
        engine.sql("GRANT SELECT ON TABLE default.authz_t TO ROLE reader")
        assert engine.sql(
            "SELECT count(*) AS n FROM (SELECT * FROM authz_t) s"
        ).first().n == 2
        # INSERT path needs INSERT, SELECT is not enough
        df = spark.createDataFrame([(3, "c")], "k int, v string")
        with pytest.raises(AuthorizationException):
            engine.insert_into("authz_t", df)
        engine.sql("GRANT INSERT ON DATABASE default TO ROLE reader")
        engine.insert_into("authz_t", df)
        assert spark.table("authz_t").count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS authz_t")


def test_enforcement_ignores_temp_views(engine, spark):
    engine.enforce_authz = True
    engine.authz.set_user_groups(engine.authz_user, set())
    spark.createDataFrame([(1,)], "x int").createOrReplaceTempView("authz_tmp")
    # temp views have no catalog identity -> not privilege-checked
    assert engine.sql("SELECT x FROM authz_tmp").count() == 1
    spark.catalog.dropTempView("authz_tmp")
