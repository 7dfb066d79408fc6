"""HTTP server end-to-end tests (in-process, CPU)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from llama2_tpu.config import GenerationConfig
from llama2_tpu.io.checkpoint import load_checkpoint
from llama2_tpu.runtime.batch_engine import BatchEngine
from llama2_tpu.runtime.server import _Handler
from llama2_tpu.tokenizer.tokenizer import Tokenizer

from conftest import TOKENIZER_BIN


@pytest.fixture(scope="module")
def server(tiny_checkpoint):
    path, config, _ = tiny_checkpoint
    _, params, _ = load_checkpoint(path)
    engine = BatchEngine(config, params, batch_size=2)
    tokenizer = Tokenizer.from_file(TOKENIZER_BIN, config.vocab_size)
    _Handler.engine = engine
    _Handler.tokenizer = tokenizer
    engine.start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()
    engine.stop()


def _post(url, obj, timeout=240):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(), headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def test_health(server):
    code, body = _get(server + "/health")
    assert code == 200
    assert body["status"] == "ok"
    assert body["slots"] == 2


def test_generate(server):
    code, body = _post(server + "/generate", {"prompt": "a", "temperature": 0.0, "steps": 8})
    assert code == 200, body
    assert body["prompt_len"] == 1
    assert 1 <= len(body["tokens"]) <= 8
    assert body["ttft_ms"] > 0
    assert isinstance(body["text"], str)


def test_generate_deterministic(server):
    a = _post(server + "/generate", {"prompt": "a", "temperature": 0.0, "steps": 8})[1]
    b = _post(server + "/generate", {"prompt": "a", "temperature": 0.0, "steps": 8})[1]
    assert a["tokens"] == b["tokens"]


def test_concurrent_requests(server):
    results = {}

    def hit(i):
        results[i] = _post(
            server + "/generate",
            {"prompt": "a", "temperature": 0.0, "steps": 6 + i},
        )

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=240)
    assert len(results) == 4
    for i, (code, body) in results.items():
        assert code == 200
        assert len(body["tokens"]) <= 6 + i


def test_bad_json(server):
    req = urllib.request.Request(
        server + "/generate", data=b"{not json", headers={"Content-Type": "application/json"}
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_bad_params(server):
    code, body = _post(server + "/generate", {"prompt": "a", "temperature": "hot"})
    assert code == 400
    assert "bad parameter" in body["error"]


def test_unknown_codepoint_is_400(server):
    code, body = _post(server + "/generate", {"prompt": "😀"})
    assert code == 400


def test_metrics(server):
    code, body = _get(server + "/metrics")
    assert code == 200
    assert body["requests"] >= 1
    assert body["ttft_p50_ms"] is None or body["ttft_p50_ms"] >= 0


def test_404(server):
    try:
        urllib.request.urlopen(server + "/nope", timeout=30)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_mesh_served_tokens_match_single_device(tiny_checkpoint, server):
    """--mesh serving: the same engine class over a (data, model) mesh must
    stream identical tokens through the HTTP surface (north star: continuous
    batching across hosts; parallel/sharding.py)."""
    from llama2_tpu.parallel.mesh import make_mesh

    path, config, _ = tiny_checkpoint
    _, params, _ = load_checkpoint(path)
    engine = BatchEngine(config, params, batch_size=2, mesh=make_mesh(2, 4))
    engine.start()

    class MeshHandler(_Handler):
        pass

    MeshHandler.engine = engine
    MeshHandler.tokenizer = _Handler.tokenizer
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), MeshHandler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_port}"
        body = {"prompt": "a", "temperature": 0.0, "steps": 8}
        want = _post(server + "/generate", body)[1]["tokens"]
        code, got = _post(url + "/generate", body)
        assert code == 200, got
        assert got["tokens"] == want
    finally:
        httpd.shutdown()
        engine.stop()


def test_mesh_flag_errors(tiny_checkpoint, capsys):
    from llama2_tpu.runtime import server as srv

    path, _, _ = tiny_checkpoint
    assert srv.main([path, "--mesh", "banana"]) == 1
    assert "--mesh" in capsys.readouterr().err
    assert srv.main([path, "--kernels", "cuda"]) == 1
    assert "--kernels" in capsys.readouterr().err


def test_precompile_flag_errors(tiny_checkpoint):
    import llama2_tpu.runtime.server as srv

    path, _, _ = tiny_checkpoint
    assert srv.main([path, "--precompile", "16", "--paged"]) == 1
    assert srv.main([path, "--precompile", "16", "--mesh", "2x4"]) == 1
