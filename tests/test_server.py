"""HTTP serving front-end (serve/server.py): loopback integration tests."""
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import pytest

from quip_tpu.models import get_config
from quip_tpu.models import model as M
from quip_tpu.serve.engine import Engine
from quip_tpu.serve.server import serve_http


@pytest.fixture(scope="module")
def http_server():
    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(0), cfg)
    eng = Engine(params, cfg, max_batch=2, max_seq=64)
    httpd, loop = serve_http(eng, port=0)          # port 0: auto-assign
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    yield cfg, params, port
    httpd.shutdown()
    loop.shutdown()


def _post(port, body, path="/generate"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_generate_greedy(http_server):
    cfg, params, port = http_server
    code, out = _post(port, {"prompt": [1, 2, 3], "max_new_tokens": 5})
    assert code == 200, out
    want = [1, 2, 3]
    for _ in range(5):
        lg = M.forward(params, jnp.asarray([want], jnp.int32), cfg)
        want.append(int(jnp.argmax(lg[0, -1])))
    assert out["tokens"][:5] == want[3:8], out


def test_http_concurrent_requests(http_server):
    cfg, params, port = http_server
    results = {}

    def go(i, prompt):
        results[i] = _post(port, {"prompt": prompt, "max_new_tokens": 4,
                                  "temperature": 0.7, "top_p": 0.9})

    threads = [threading.Thread(target=go, args=(i, [i + 1, i + 2]))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert all(results[i][0] == 200 for i in range(4)), results
    assert all(len(results[i][1]["tokens"]) >= 4 for i in range(4))


def test_http_health_and_errors(http_server):
    _, _, port = http_server
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    code, out = _post(port, {"prompt": []})
    assert code == 400
    code, out = _post(port, {"text": "hi"})     # no tokenizer loaded
    assert code == 400
    code, out = _post(port, {"prompt": [1], "top_p": 0.0})
    assert code == 400 and "top_p" in out["error"]
    code, out = _post(port, {"prompt": [1]}, path="/nope")
    assert code == 404


def test_http_stop_tokens(http_server):
    cfg, params, port = http_server
    want = [1, 2, 3]
    for _ in range(6):
        lg = M.forward(params, jnp.asarray([want], jnp.int32), cfg)
        want.append(int(jnp.argmax(lg[0, -1])))
    gen = want[3:]
    code, out = _post(port, {"prompt": [1, 2, 3], "max_new_tokens": 6,
                             "stop": [gen[2]]})
    assert code == 200
    assert out["tokens"] == gen[:3], (out, gen)


def test_http_streaming(http_server):
    """stream=true returns NDJSON: one {"token": id} line per emitted
    token, then a final line with the full result; the incremental tokens
    equal the batch result."""
    cfg, params, port = http_server
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps({"prompt": [1, 2, 3], "max_new_tokens": 5,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "application/x-ndjson"
        lines = [json.loads(l) for l in r.read().splitlines()]
    *toks, final = lines
    assert [t["token"] for t in toks] == final["tokens"]
    code, batch = _post(port, {"prompt": [1, 2, 3], "max_new_tokens": 5})
    assert code == 200 and final["tokens"] == batch["tokens"]
    # bad request still yields a single error line, not a hang
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps({"prompt": [1], "top_p": 0.0,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        lines = [json.loads(l) for l in r.read().splitlines()]
    assert len(lines) == 1 and "error" in lines[0]


def test_http_metrics(http_server):
    _, _, port = http_server
    # at least one request has completed by the time this test runs
    _post(port, {"prompt": [9, 9], "max_new_tokens": 3})
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=30) as r:
        m = json.loads(r.read())
    assert m["completed"] >= 1 and m["tokens"] >= 3
    assert m["mean_ttft_s"] >= 0.0
    assert m["mean_request_s"] >= m["mean_ttft_s"]
