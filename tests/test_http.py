"""HTTP API tests — the reference's QueryApi/DataApi/CommandApi shapes
(nsdb-http/src/test/.../QueryApiSpec.scala, DataApiTest.scala) driven
through real sockets."""
import json
import urllib.request

import pytest

from nsdb_spark import http_api


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def server(engine):
    srv, _ = http_api.serve(engine)
    yield srv.server_address[1]
    srv.shutdown()


def test_data_insert_then_query(server):
    port = server
    for ts, v, city in [(1000, 21.5, "rome"), (2000, 30.0, "milan")]:
        code, body = _post(port, "/data", {
            "db": "db1", "namespace": "ns1", "metric": "temps",
            "bit": {"timestamp": ts, "value": v,
                    "dimensions": {"city": city}, "tags": {"sensor": "a"}},
        })
        assert code == 200 and body["status"] == "OK"

    code, body = _post(port, "/query", {
        "db": "db1", "namespace": "ns1", "metric": "temps",
        "queryString": "select * from temps order by timestamp",
    })
    assert code == 200
    assert [r["value"] for r in body["records"]] == [21.5, 30.0]


def test_query_enrichment_from_to_filters(server):
    port = server
    for ts, v in [(1000, 1.0), (2000, 2.0), (3000, 3.0)]:
        _post(port, "/data", {
            "metric": "m", "bit": {"timestamp": ts, "value": v,
                                   "dimensions": {}, "tags": {"g": "x"}},
        })
    code, body = _post(port, "/query", {
        "metric": "m",
        "queryString": "select * from m",
        "from": 1500, "to": 3500,
        "filters": [{"dimension": "value", "value": 2.5, "operator": ">"}],
    })
    assert code == 200
    assert [r["timestamp"] for r in body["records"]] == [3000]


def test_commands_routes(server):
    port = server
    _post(port, "/data", {
        "db": "db9", "namespace": "nsx", "metric": "cpu",
        "bit": {"timestamp": 1, "value": 5, "dimensions": {"host": "a"},
                "tags": {"dc": "eu"}},
    })
    assert _get(port, "/commands/dbs")[1]["dbs"] == ["db9"]
    assert _get(port, "/commands/db9/namespaces")[1]["namespaces"] == ["nsx"]
    assert _get(port, "/commands/db9/nsx/metrics")[1]["metrics"] == ["cpu"]
    code, body = _get(port, "/commands/db9/nsx/cpu/describe")
    assert code == 200
    fields = {f["name"]: f for f in body["fields"]}
    assert fields["dc"]["fieldClass"] == "tag"
    assert fields["host"]["fieldClass"] == "dimension"
    assert fields["timestamp"]["type"] == "BIGINT"


def test_error_paths(server):
    port = server
    code, body = _post(port, "/query", {
        "metric": "nope", "queryString": "select * frm nope"})
    assert code == 400 and "SQLParseError" in body["error"]
    code, body = _get(port, "/no/such/route")
    assert code == 404


def test_query_validate_route(server):
    port = server
    _post(port, "/data", {
        "metric": "vm", "bit": {"timestamp": 1, "value": 5.0,
                                "dimensions": {}, "tags": {"g": "x"}},
    })
    code, body = _post(port, "/query/validate",
                       {"metric": "vm", "queryString": "select * from vm"})
    assert code == 200 and body["valid"] is True
    # parse error → invalid
    code, body = _post(port, "/query/validate",
                       {"metric": "vm", "queryString": "select * frm vm"})
    assert code == 400 and body["valid"] is False
    # analyzer error (group by a non-tag) → invalid with the exact message
    code, body = _post(port, "/query/validate",
                       {"metric": "vm", "queryString": "select sum(value) from vm group by nope"})
    assert code == 400 and "invalid" in body["error"]


def test_subscribe_poll_unsubscribe(engine):
    import threading
    import urllib.request

    from nsdb_spark.streaming.subscribe import SubscriptionManager

    sub = SubscriptionManager(engine)
    srv, _ = http_api.serve(engine, subscription_manager=sub)
    port = srv.server_address[1]
    try:
        _post(port, "/data", {
            "metric": "live", "bit": {"timestamp": 1000, "value": 50.0,
                                      "dimensions": {}, "tags": {"k": "a"}}})
        code, body = _post(port, "/subscribe", {
            "metric": "live", "queryString": "select * from live where value > 20"})
        assert code == 200
        uuid = body["uuid"]
        assert [r["value"] for r in body["historical"]] == [50.0]

        # long-poll in a thread, then insert matching + non-matching records
        result = {}
        def poll():
            result.update(_get(port, f"/poll/{uuid}?timeout_ms=8000")[1])
        t = threading.Thread(target=poll)
        t.start()
        _post(port, "/data", {
            "metric": "live", "bit": {"timestamp": 2000, "value": 99.0,
                                      "dimensions": {}, "tags": {"k": "b"}}})
        _post(port, "/data", {
            "metric": "live", "bit": {"timestamp": 3000, "value": 1.0,
                                      "dimensions": {}, "tags": {"k": "c"}}})
        t.join(timeout=15)
        pushed = [r for batch in result["batches"] for r in batch]
        assert [r["value"] for r in pushed] == [99.0]  # 1.0 filtered out

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/subscribe/{uuid}", method="DELETE")
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        assert _get(port, f"/poll/{uuid}?timeout_ms=100")[0] == 404
    finally:
        srv.shutdown()


def _get_with_body(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="GET",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_get_query_select_only(server):
    # QueryApi.scala:140-163 — GET /query executes SELECT, refuses DELETE
    _post(server, "/data", {"bit": {"timestamp": 5, "value": 2,
                                    "dimensions": {"h": "x"}}, "metric": "gm"})
    code, out = _get_with_body(
        server, "/query", {"metric": "gm", "queryString": "select * from gm"}
    )
    assert code == 200 and len(out["records"]) == 1
    code, out = _get_with_body(
        server, "/query",
        {"metric": "gm", "queryString": "delete from gm where timestamp = 5"},
    )
    assert code == 405 and "not a select statement" in out["error"]
    # the bit survived the refused DELETE
    code, out = _get_with_body(
        server, "/query", {"metric": "gm", "queryString": "select * from gm"}
    )
    assert len(out["records"]) == 1
