"""Provider tests: noop determinism + wire parity, facade routing, and
ollama/openai HTTP clients (including streams and zstd) against a local
fake server."""
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from vectorsearch_tpu import config as cfg_mod
from vectorsearch_tpu.embed import (
    AI,
    AIError,
    EndpointPool,
    NoopAI,
    OllamaAI,
    OpenAIAI,
)
from vectorsearch_tpu.quant import codec
from vectorsearch_tpu.store.db import decompress


class _Fake(BaseHTTPRequestHandler):
    calls = []

    def log_message(self, *a):
        pass

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        if self.headers.get("Content-Encoding", "") == "zstd":
            body = decompress(body)
        req = json.loads(body)
        _Fake.calls.append((self.path, req))

        if self.path == "/api/embed":
            inputs = req["input"]
            out = {"embeddings": [[0.1 * (i + 1), -0.2, 0.3] for i in range(len(inputs))]}
            self._json(out)
        elif self.path == "/api/chat":
            if req.get("stream"):
                chunks = [
                    {"message": {"content": "hel"}, "done": False},
                    {"message": {"content": "lo"}, "done": True},
                ]
                self._lines(chunks)
            else:
                self._json({"message": {"content": "hi"}})
        elif self.path == "/api/generate":
            self._json({"response": "gen"})
        elif self.path == "/v1/embeddings":
            out = {
                "data": [
                    {"index": 1, "embedding": [0.5, 0.5, 0.0]},
                    {"index": 0, "embedding": [1.0, 0.0, 0.0]},
                ]
            }
            self._json(out)
        elif self.path == "/v1/chat/completions":
            if req.get("stream"):
                self._sse(
                    [
                        {"choices": [{"index": 0, "delta": {"content": "ab"}}]},
                        {
                            "choices": [
                                {
                                    "index": 0,
                                    "delta": {"content": "c"},
                                    "finish_reason": "stop",
                                }
                            ]
                        },
                    ]
                )
            else:
                self._json({"choices": [{"message": {"content": "world"}}]})
        elif self.path == "/v1/completions":
            self._json({"choices": [{"text": "done"}]})
        else:
            self.send_response(404)
            self.end_headers()

    def _json(self, obj):
        raw = json.dumps(obj).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)

    def _lines(self, objs):
        raw = b"".join(json.dumps(o).encode() + b"\n" for o in objs)
        self.send_response(200)
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)

    def _sse(self, objs):
        raw = b"".join(b"data: " + json.dumps(o).encode() + b"\n\n" for o in objs)
        raw += b"data: [DONE]\n\n"
        self.send_response(200)
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Fake)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def provider_cfg(url, compression=False):
    p = cfg_mod.Provider(
        api_base=[url], model="m", num_ctx=1000, request_compression=compression
    )
    return cfg_mod.AIConfig(embed=p, generate=p, chat=p)


class TestNoop:
    def test_deterministic_and_wire_format(self):
        a = NoopAI(seed=1)
        b = NoopAI(seed=1)
        ra = a.embed(["x", "y"])
        rb = b.embed(["x", "y"])
        for va, vb in zip(ra, rb):
            np.testing.assert_array_equal(va, vb)
        assert ra[0].shape == (8 + 512,)
        vmin, vmax = codec.parse_header(ra[0][None])
        assert vmin[0] == -1.0 and vmax[0] == 1.0

    def test_empty_input_raises(self):
        with pytest.raises(AIError):
            NoopAI(seed=0).embed([])

    def test_chat_is_hex(self):
        out = NoopAI(seed=0).chat([{"role": "user", "content": "hi"}])
        int(out or "0", 16)  # parses as hex


class TestOllama:
    def test_embed_quantizes_at_boundary(self, server):
        ai = OllamaAI(provider_cfg(server))
        rows = ai.embed(["a", "b"])
        assert len(rows) == 2
        want = codec.quantize(np.array([0.1, -0.2, 0.3], np.float32))
        np.testing.assert_array_equal(rows[0], want)

    def test_num_ctx_injected(self, server):
        _Fake.calls.clear()
        OllamaAI(provider_cfg(server)).embed(["a"])
        path, req = _Fake.calls[-1]
        assert req["options"]["num_ctx"] == 1000

    def test_chat_and_stream(self, server):
        ai = OllamaAI(provider_cfg(server))
        assert ai.chat([{"role": "user", "content": "q"}]) == "hi"
        assert "".join(ai.chat_stream([{"role": "user", "content": "q"}])) == "hello"

    def test_zstd_request(self, server):
        _Fake.calls.clear()
        ai = OllamaAI(provider_cfg(server, compression=True))
        ai.generate("p")
        # server decompressed it fine and recorded the call
        assert _Fake.calls[-1][0] == "/api/generate"


class TestOpenAI:
    def test_embed_sorts_by_index(self, server):
        ai = OpenAIAI(provider_cfg(server))
        rows = ai.embed(["a", "b"])
        want0 = codec.quantize(np.array([1.0, 0.0, 0.0], np.float32))
        np.testing.assert_array_equal(rows[0], want0)

    def test_chat_stream_sse(self, server):
        ai = OpenAIAI(provider_cfg(server))
        assert "".join(ai.chat_stream([{"role": "user", "content": "q"}])) == "abc"

    def test_generate(self, server):
        assert OpenAIAI(provider_cfg(server)).generate("p") == "done"


class TestFacade:
    def test_noop_fallback_when_unconfigured(self):
        cfg = cfg_mod.Config()
        ai = AI.from_config(cfg, noop_seed=0)
        assert ai.embed_model() == "noai"
        assert len(ai.embed(["x"])) == 1

    def test_ollama_first(self, server):
        cfg = cfg_mod.Config(
            ollama=provider_cfg(server), openai=cfg_mod.AIConfig()
        )
        ai = AI.from_config(cfg)
        assert ai.chat([{"role": "user", "content": "q"}]) == "hi"

    def test_openai_fallback(self, server):
        cfg = cfg_mod.Config(
            ollama=cfg_mod.AIConfig(), openai=provider_cfg(server)
        )
        ai = AI.from_config(cfg)
        assert ai.chat([{"role": "user", "content": "q"}]) == "world"
        assert ai.embed_ctx_num() == 1000


def test_endpoint_pool_least_connections():
    pool = EndpointPool(["a", "b"])
    with pool.acquire() as first:
        with pool.acquire() as second:
            assert {first, second} == {"a", "b"}


def test_config_sample_roundtrip(tmp_path):
    path = str(tmp_path / "config.json")
    cfg_mod.create_sample(path)
    cfg = cfg_mod.load(path)
    assert cfg.ollama.embed.model == "nomic-embed-text"
    assert cfg.server.http_address == ":7500"
    assert cfg.database.sqlite == "./vectorstore.db"
