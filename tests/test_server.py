import json
import threading
import urllib.request

import pytest

from rag_dpo_tpu.app.server import build_system, serve


@pytest.fixture(scope="module")
def server(tmp_path_factory, monkeypatch_module=None):
    import os

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path_factory.mktemp("srv"))
    system = build_system(agent_too=False)
    srv = serve(port=0, system=system)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, path, payload):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        data = json.loads(r.read())
    assert data["status"] == "ok"
    assert data["n_chunks"] == 8


def test_query_and_feedback_flow(server):
    code, data = _post(server, "/query",
                       {"question": "Quel délai pour notifier une "
                                    "violation à la CNIL ?"})
    assert code == 200
    assert data["answer"] and data["query_id"]
    assert data["timings"]["total"] > 0
    code, fb = _post(server, "/feedback",
                     {"query_id": data["query_id"], "rating": 1})
    assert code == 200 and fb["ok"]
    with urllib.request.urlopen(server + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["n_queries"] >= 1


def test_query_validation(server):
    code, data = _post(server, "/query", {})
    assert code == 400 and "question" in data["error"]
    code, data = _post(server, "/feedback", {"rating": 1})
    assert code == 400
    req = urllib.request.Request(server + "/query", data=b"not json",
                                 headers={"Content-Type":
                                          "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_unknown_route(server):
    try:
        urllib.request.urlopen(server + "/nope", timeout=30)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404
