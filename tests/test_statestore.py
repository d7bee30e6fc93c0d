"""Statestore + catalog propagation (impalatogo_spark/statestore.py).

Reference parity targets:
  * be/src/statestore/statestore.h:50-231 — versioned topics, delta
    updates [from, to), transient entries, re-registration supersession
  * be/src/statestore/failure-detector.h — MissedHeartbeatFailureDetector
  * catalog-server / JniCatalog — catalog objects propagated to every
    impalad's local catalog cache

Unit tests drive statestore cycles deterministically (no sleeps on the
assertion path); the integration test wires two live serving cores into
one statestore and observes catalog DDL + membership propagate.
"""

from __future__ import annotations

import json
import time

import pytest

from impalatogo_spark.statestore import (CATALOG_TOPIC, MEMBERSHIP_TOPIC,
                                         Statestore, StatestoreSubscriber,
                                         Topic)


def test_topic_versioning_and_deltas():
    t = Topic("t")
    assert t.put("a", "1") == 1
    assert t.put("b", "2") == 2
    assert t.put("a", "3") == 3  # overwrite bumps version, drops old log row
    # full topic for a fresh subscriber (from_version=0, is_delta=False)
    full = t.delta_since(0)
    assert not full["is_delta"] and full["to_version"] == 3
    assert {(i["key"], i["value"]) for i in full["topic_entries"]} == {
        ("b", "2"), ("a", "3")}
    # delta for a caught-up-to-2 subscriber: only the newer write
    d = t.delta_since(2)
    assert d["is_delta"] and d["from_version"] == 2
    assert [(i["key"], i["value"]) for i in d["topic_entries"]] == [
        ("a", "3")]
    # deletion rides the delta as a topic_deletions key
    t.put("b", None)
    d = t.delta_since(3)
    assert d["topic_deletions"] == ["b"] and not d["topic_entries"]
    # version-matched delete refuses to clobber a newer write
    v = t.put("c", "x")
    t.put("c", "y")
    t.delete_if_version_matches("c", v)  # stale version: no-op
    assert t.entries["c"].value == "y"


def test_subscriber_exchange_and_min_version():
    """Two subscribers on one topic: A's published entry reaches B on the
    next cycle; processed versions advance; min_subscriber_topic_version
    reflects the slowest subscriber."""
    ss = Statestore()
    seen_a, seen_b = [], []
    a, b = StatestoreSubscriber("a"), StatestoreSubscriber("b")
    a.subscribe("shared", lambda d: seen_a.append(d))
    b.subscribe("shared", lambda d: seen_b.append(d))
    a.register(ss, [{"topic_name": "shared"}])
    b.register(ss, [{"topic_name": "shared"}])

    a.publish("shared", entries=[{"key": "k1", "value": "v1"}])
    ss.run_update_cycle()   # collects A's publish (response path)
    ss.run_update_cycle()   # delivers it to both
    assert any(i["key"] == "k1" for d in seen_b
               for i in d["topic_entries"])
    # A receives its own entry back too (the reference does not suppress)
    assert any(i["key"] == "k1" for d in seen_a
               for i in d["topic_entries"])
    # both advanced: min subscriber version == topic version
    v = ss.topics["shared"].last_version
    assert ss._min_subscriber_version("shared") == v
    # an empty round still carries min_subscriber_topic_version
    seen_b.clear()
    ss.run_update_cycle()
    assert seen_b and seen_b[-1]["min_subscriber_topic_version"] == v


def test_missed_heartbeats_fail_subscriber_and_drop_transient():
    """A subscriber that stops acking heartbeats is declared failed after
    max_missed beats, unregistered, and its TRANSIENT entries are deleted
    — the surviving peer observes the deletion (cluster self-healing)."""
    ss = Statestore(max_missed_heartbeats=3)
    a, b = StatestoreSubscriber("a"), StatestoreSubscriber("b")
    b_deltas = []
    b.subscribe(MEMBERSHIP_TOPIC, lambda d: b_deltas.append(d))
    a.register(ss, [{"topic_name": MEMBERSHIP_TOPIC, "is_transient": True}])
    b.register(ss, [{"topic_name": MEMBERSHIP_TOPIC, "is_transient": True}])
    a.publish(MEMBERSHIP_TOPIC, entries=[{"key": "a", "value": "host-a"}])
    b.publish(MEMBERSHIP_TOPIC, entries=[{"key": "b", "value": "host-b"}])
    for _ in range(2):
        ss.run_update_cycle()
    assert {i["key"] for d in b_deltas for i in d["topic_entries"]} == {
        "a", "b"}

    a.heartbeat_ok = False  # peer goes dark
    for _ in range(2):
        ss.run_heartbeat_cycle()
    assert "a" in ss.subscribers  # below the threshold: still registered
    ss.run_heartbeat_cycle()      # third miss crosses max_missed=3
    assert "a" not in ss.subscribers and ss.failed_subscribers == ["a"]
    ss.run_update_cycle()
    assert any("a" in d["topic_deletions"] for d in b_deltas)
    # the survivor's entry is untouched
    assert ss.topics[MEMBERSHIP_TOPIC].entries["b"].value == "host-b"


def test_reregistration_supersedes_old_registration():
    """statestore.h:100: re-registering invalidates the old registration;
    an update carrying the old registration_id is skipped by the
    subscriber and must not advance its processed versions."""
    ss = Statestore()
    a = StatestoreSubscriber("a")
    a.register(ss, [{"topic_name": "t"}])
    old_reg = a.registration_id
    ss.topics["t"].put("k", "v")
    a.registration_id = "someone-newer"  # simulate supersession client-side
    ss.run_update_cycle()
    assert ss.subscribers["a"]["topics"]["t"]["last_version"] == 0
    # resync: register again, updates flow under the new registration
    a.register(ss, [{"topic_name": "t"}])
    assert a.registration_id != old_reg
    got = []
    a.subscribe("t", lambda d: got.append(d))
    ss.run_update_cycle()
    assert any(i["key"] == "k" for d in got for i in d["topic_entries"])
    assert ss.subscribers["a"]["topics"]["t"]["last_version"] == 1


def test_two_cores_catalog_and_membership_propagation(spark, sf_dir):
    """Two live serving daemons + one statestore: engine-level catalog DDL
    (CREATE DATA SOURCE) executed on daemon A becomes visible to NEW
    sessions on daemon B after statestore rounds; both daemons learn the
    cluster membership; a daemon going dark is shed from membership."""
    from impalatogo_spark.server import I2SClient, I2SServer
    from impalatogo_spark.statestore import attach_statestore

    ss = Statestore(max_missed_heartbeats=3)
    core_a = I2SServer(spark, sf_dir=sf_dir)
    core_b = I2SServer(spark, sf_dir=sf_dir)
    ha, pa = core_a.start()
    hb, pb = core_b.start()
    sub_a = attach_statestore(core_a, ss, subscriber_id="impalad-a",
                              address=f"{ha}:{pa}")
    sub_b = attach_statestore(core_b, ss, subscriber_id="impalad-b",
                              address=f"{hb}:{pb}")
    try:
        for _ in range(3):
            ss.run_update_cycle()
        assert set(core_a.cluster_membership) == {"impalad-a", "impalad-b"}
        assert set(core_b.cluster_membership) == {"impalad-a", "impalad-b"}

        # catalog DDL on daemon A ...
        ca = I2SClient(ha, pa)
        ca.open_session()
        ca.execute(
            "CREATE DATA SOURCE ss_probe LOCATION '/tmp/x' CLASS "
            "'impalatogo_spark.sources.external.SyntheticDocsDataSource' "
            "API_VERSION 'V1'")
        sources_a = [r[0] for r in ca.fetch_all(
            ca.execute("SHOW DATA SOURCES"))]
        assert "ss_probe" in sources_a
        ca.close()
        for _ in range(3):
            ss.run_update_cycle()
        # ... visible to a NEW session on daemon B (local catalog replay)
        cb = I2SClient(hb, pb)
        cb.open_session()
        sources_b = [r[0] for r in cb.fetch_all(
            cb.execute("SHOW DATA SOURCES"))]
        assert "ss_probe" in sources_b
        cb.close()

        # daemon B goes dark: shed from membership on daemon A's view
        sub_b.heartbeat_ok = False
        for _ in range(4):
            ss.run_heartbeat_cycle()
        ss.run_update_cycle()
        assert "impalad-b" not in core_a.cluster_membership
        assert "impalad-a" in core_a.cluster_membership
        assert ss.failed_subscribers == ["impalad-b"]
    finally:
        core_a.stop()
        core_b.stop()


def test_background_loop_propagates_without_manual_cycles(spark, sf_dir):
    """The start()ed statestore loop (statestore.cc:628 update/heartbeat
    threads) propagates with no manual cycle calls — gated on observed
    state, not sleep-stagger."""
    from impalatogo_spark.server import I2SServer
    from impalatogo_spark.statestore import attach_statestore

    ss = Statestore()
    core_a = I2SServer(spark, sf_dir=sf_dir)
    core_b = I2SServer(spark, sf_dir=sf_dir)
    attach_statestore(core_a, ss, subscriber_id="bg-a", address="a:1")
    attach_statestore(core_b, ss, subscriber_id="bg-b", address="b:2")
    ss.start(update_frequency_s=0.02, heartbeat_frequency_s=0.02)
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if (set(core_a.cluster_membership) == {"bg-a", "bg-b"}
                    and set(core_b.cluster_membership) == {"bg-a", "bg-b"}):
                break
            time.sleep(0.02)
        else:
            raise AssertionError("membership never propagated")
    finally:
        ss.stop()

def test_tcp_transport_update_heartbeat_and_failure():
    """The subscriber's endpoint over real TCP (JSON-lines): the statestore
    registers a connecting proxy, updates and publishes flow over the
    wire, and killing the subscriber's server surfaces as missed
    heartbeats -> failure + transient shedding (an unreachable subscriber
    and a dead one are indistinguishable, as in the reference)."""
    from impalatogo_spark.statestore import (SubscriberTcpProxy,
                                             SubscriberTcpServer)

    ss = Statestore(max_missed_heartbeats=2)
    a, b = StatestoreSubscriber("a"), StatestoreSubscriber("b")
    got_b = []
    b.subscribe(MEMBERSHIP_TOPIC, lambda d: got_b.append(d))
    srv_a = SubscriberTcpServer(a)
    srv_b = SubscriberTcpServer(b)
    try:
        # register with wire proxies instead of in-process objects
        proxy_a = SubscriberTcpProxy(srv_a.address)
        a.registration_id = ss.register_subscriber(
            "a", proxy_a,
            [{"topic_name": MEMBERSHIP_TOPIC, "is_transient": True}])
        b.registration_id = ss.register_subscriber(
            "b", SubscriberTcpProxy(srv_b.address),
            [{"topic_name": MEMBERSHIP_TOPIC, "is_transient": True}])
        a.publish(MEMBERSHIP_TOPIC, entries=[{"key": "a", "value": "ha:1"}])
        for _ in range(2):
            ss.run_update_cycle()
        assert any(i["key"] == "a" for d in got_b
                   for i in d["topic_entries"])
        ss.run_heartbeat_cycle()
        assert "a" in ss.subscribers and "b" in ss.subscribers

        # subscriber A's endpoint dies: stop accepting AND sever the
        # established connection (reconnect now refuses)
        srv_a.stop()
        proxy_a.close()
        for _ in range(2):
            ss.run_heartbeat_cycle()
        assert "a" not in ss.subscribers  # 2 missed beats = failed
        ss.run_update_cycle()
        assert any("a" in d["topic_deletions"] for d in got_b)
    finally:
        try:
            srv_a.stop()
        except Exception:
            pass
        srv_b.stop()

def test_failover_client_survives_daemon_death(spark, sf_dir):
    """FailoverClient (the impala-shell reconnect pattern): statements run
    against one cluster member; killing that daemon severs the connection
    and the NEXT statement transparently reconnects to a surviving member
    and succeeds — catalog state already propagated via the statestore."""
    from impalatogo_spark.server import FailoverClient, I2SServer
    from impalatogo_spark.statestore import attach_statestore

    ss = Statestore()
    core_a = I2SServer(spark, sf_dir=sf_dir)
    core_b = I2SServer(spark, sf_dir=sf_dir)
    ha, pa = core_a.start()
    hb, pb = core_b.start()
    attach_statestore(core_a, ss, subscriber_id="fo-a", address=f"{ha}:{pa}")
    attach_statestore(core_b, ss, subscriber_id="fo-b", address=f"{hb}:{pb}")
    fc = None
    try:
        for _ in range(3):
            ss.run_update_cycle()
        # the member list IS the membership topic's values
        members = sorted(core_a.cluster_membership.values())
        assert members == sorted([f"{ha}:{pa}", f"{hb}:{pb}"])
        fc = FailoverClient(members, sf_dir=sf_dir)
        first = fc.connected_to
        assert fc.fetch_all(fc.execute("SELECT 1 AS x")) == [[1]]
        # kill the daemon the client is talking to
        (core_a if first == f"{ha}:{pa}" else core_b).stop()
        resp = fc.execute("SELECT r_regionkey FROM region "
                          "ORDER BY r_regionkey")
        assert [r[0] for r in fc.fetch_all(resp)] == [0, 1, 2, 3, 4]
        assert fc.failovers == 1 and fc.connected_to != first
        # a server-side SQL error still raises (no bogus failover)
        before = fc.failovers
        with pytest.raises(RuntimeError):
            fc.execute("SELECT * FROM definitely_missing_table")
        assert fc.failovers == before
    finally:
        if fc is not None:
            try:
                fc.close()
            except Exception:
                pass
        core_a.stop()
        core_b.stop()
