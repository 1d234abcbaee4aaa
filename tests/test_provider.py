"""OpenAI-compatible embedding provider: retry matrix, batching, ordering,
timeout — against an injected transport AND a real in-process HTTP stub
(no external network anywhere).  End-to-end: a dense index build whose
embedding column comes from the stub provider, with dense self-retrieval
as the quality gate (reference semantics: vexor/providers/openai.py)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from vexor_ray.providers import (
    OpenAIEmbeddingProvider,
    ProviderError,
    make_provider,
)

DIM = 32


def _fake_embedding(text: str) -> list[float]:
    """Deterministic per-text vector (letter-count style, like the
    reference's offline DummyBackend, tests/unit/test_search_service.py)."""
    v = np.zeros(DIM, dtype=np.float64)
    for i, ch in enumerate(text.encode()):
        v[(ch + i) % DIM] += 1.0
    n = np.linalg.norm(v)
    return (v / n if n else v).tolist()


def _provider(transport, **kw):
    kw.setdefault("require_key", False)
    kw.setdefault("sleep", lambda s: None)
    return OpenAIEmbeddingProvider(
        "http://unused", "fake-model", transport=transport, **kw
    )


def _ok_body(inputs):
    return {
        "data": [
            {"index": i, "embedding": _fake_embedding(t)}
            for i, t in enumerate(inputs)
        ]
    }


# ---------------------------------------------------------------------------
# retry / batching policy via the transport seam
# ---------------------------------------------------------------------------


def test_retry_matrix():
    """{408, 429, 5xx} and transport errors retry (≤2 retries, backoff
    0.5→1→capped); other statuses fail fast."""
    for status in (408, 429, 500, 502, 503):
        calls = []

        def flaky(payload, _s=status):
            calls.append(1)
            if len(calls) < 3:
                return _s, None
            return 200, _ok_body(payload["input"])

        sleeps: list[float] = []
        p = _provider(flaky, sleep=sleeps.append)
        out = p.embed(["a", "b"])
        assert out.shape == (2, DIM) and len(calls) == 3
        assert sleeps == [0.5, 1.0]  # exponential, from 0.5

    # budget exhausted → ProviderError after exactly 3 attempts
    calls = []

    def always_503(payload):
        calls.append(1)
        return 503, None

    with pytest.raises(ProviderError, match="after 3 attempts"):
        _provider(always_503).embed(["x"])
    assert len(calls) == 3

    # non-retryable fails fast, one attempt only
    calls = []

    def bad_request(payload):
        calls.append(1)
        return 400, None

    with pytest.raises(ProviderError, match="status 400"):
        _provider(bad_request).embed(["x"])
    assert len(calls) == 1

    # transport exception is retryable
    calls = []

    def flaky_conn(payload):
        calls.append(1)
        if len(calls) == 1:
            raise ConnectionError("refused")
        return 200, _ok_body(payload["input"])

    assert _provider(flaky_conn).embed(["x"]).shape == (1, DIM)


def test_batching_order_and_index_field():
    """Inputs split into batch_size batches (reference default 64), results
    reassembled in input order even when the server returns rows shuffled."""
    batches = []

    def shuffled(payload):
        batches.append(list(payload["input"]))
        body = _ok_body(payload["input"])
        body["data"] = body["data"][::-1]  # protocol allows any order
        return 200, body

    texts = [f"text number {i}" for i in range(10)]
    p = _provider(shuffled, batch_size=4, concurrency=3)
    out = p.embed(texts)
    assert [len(b) for b in batches] == [4, 4, 2]
    want = np.asarray([_fake_embedding(t) for t in texts], dtype=np.float32)
    np.testing.assert_array_equal(out, want)
    p.close()


def test_count_mismatch_and_key_requirements(monkeypatch):
    with pytest.raises(ProviderError, match="2 embeddings for 1"):
        _provider(lambda p: (200, _ok_body(["a", "b"]))).embed(["only one"])
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    with pytest.raises(ProviderError, match="no API key"):
        OpenAIEmbeddingProvider("http://x", "m")
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    OpenAIEmbeddingProvider("http://x", "m")  # key found → constructs


def test_make_provider_specs():
    p = make_provider({"kind": "hash", "dim": 64, "mode": "word_mix"})
    out = p.embed(["hello world"])
    assert out.shape == (1, 64) and out.dtype == np.float32
    with pytest.raises(ValueError, match="unknown provider kind"):
        make_provider({"kind": "nope"})


# ---------------------------------------------------------------------------
# real HTTP path against an in-process stub server
# ---------------------------------------------------------------------------


class _StubHandler(BaseHTTPRequestHandler):
    fail_first: list[int] = []  # mutated per test: status codes to emit first
    seen_auth: list[str] = []
    slow_first_s: float = 0.0

    def do_POST(self):
        assert self.path == "/v1/embeddings"
        type(self).seen_auth.append(self.headers.get("Authorization", ""))
        if self.fail_first:
            code = type(self).fail_first.pop(0)
            self.send_response(code)
            self.end_headers()
            return
        if type(self).slow_first_s:
            import time as _t

            delay, type(self).slow_first_s = type(self).slow_first_s, 0.0
            _t.sleep(delay)
        payload = json.loads(
            self.rfile.read(int(self.headers["Content-Length"]))
        )
        body = json.dumps(_ok_body(payload["input"])).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def stub_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StubHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _StubHandler.fail_first = []
    _StubHandler.seen_auth = []
    _StubHandler.slow_first_s = 0.0
    yield f"http://127.0.0.1:{srv.server_port}/v1"
    srv.shutdown()


def test_http_stub_roundtrip_with_retries(stub_server, monkeypatch):
    monkeypatch.setenv("FAKE_KEY", "sk-fake")
    _StubHandler.fail_first = [429, 503]
    p = OpenAIEmbeddingProvider(
        stub_server, "fake-model", api_key_env="FAKE_KEY",
        batch_size=8, sleep=lambda s: None,
    )
    texts = [f"doc {i}" for i in range(5)]
    out = p.embed(texts)
    want = np.asarray([_fake_embedding(t) for t in texts], dtype=np.float32)
    np.testing.assert_array_equal(out, want)
    assert p.n_retries == 2
    assert all(a == "Bearer sk-fake" for a in _StubHandler.seen_auth)


def test_http_timeout_retries_then_succeeds(stub_server):
    _StubHandler.slow_first_s = 1.5
    p = OpenAIEmbeddingProvider(
        stub_server, "fake-model", require_key=False,
        timeout_s=0.3, sleep=lambda s: None,
    )
    out = p.embed(["slow once"])
    assert out.shape == (1, DIM) and p.n_retries >= 1


# ---------------------------------------------------------------------------
# dense build end-to-end via the stub provider
# ---------------------------------------------------------------------------


def test_dense_build_via_stub_provider(ray_session, tmp_path, stub_server):
    from vexor_ray.fixtures.pages import write_pages
    from vexor_ray.index.build import BuildConfig, build_index
    from vexor_ray.query.searcher import Searcher
    from vexor_ray.refimpl.textnorm import extract_text

    import pyarrow.parquet as pq

    pages = write_pages(tmp_path / "pages", 200, seed=42, rows_per_file=100)
    idx = tmp_path / "idx"
    build_index(
        pages,
        idx,
        BuildConfig(
            embed_provider={
                "kind": "openai",
                "base_url": stub_server,
                "model": "fake-model",
                "batch_size": 64,
                "require_key": False,
            },
            num_waves=1,
            partitions_per_wave=2,
            shard_group_size=2,
            tokenize_concurrency=2,
            salt_shift=8,
        ),
    )
    s = Searcher(idx)
    tbl = s._docs_ds.to_table(columns=["embedding"])
    assert len(tbl.column("embedding")[0]) == DIM

    # quality gate: querying with a doc's own text must self-retrieve
    f = sorted(pages.glob("part-*.parquet"))[1]
    t = pq.read_table(f, columns=["url", "html"])
    row = 3
    text = extract_text(t["html"][row].as_py())
    url = t["url"][row].as_py()
    res = s.search_dense(f"{url} {text}", k=3)
    assert res[0][0] == (1 << 32) | row
    assert res[0][1] > 0.999  # provider-identical query vector


def test_hybrid_text_via_stub_provider(ray_session, tmp_path, stub_server):
    """search_hybrid_text end-to-end through the provider seam: the dense
    arm embeds the QUERY via the same HTTP provider the index was built
    with, fuses with BM25 via RRF, and self-retrieval ranks first."""
    from vexor_ray.fixtures.pages import write_pages
    from vexor_ray.index.build import BuildConfig, build_index
    from vexor_ray.query.searcher import Searcher
    from vexor_ray.refimpl.textnorm import extract_text

    import pyarrow.parquet as pq

    pages = write_pages(tmp_path / "pages_h", 200, seed=7, rows_per_file=100)
    idx = tmp_path / "idx_h"
    build_index(
        pages,
        idx,
        BuildConfig(
            embed_provider={
                "kind": "openai",
                "base_url": stub_server,
                "model": "fake-model",
                "batch_size": 64,
                "require_key": False,
            },
            num_waves=1,
            partitions_per_wave=2,
            shard_group_size=2,
            tokenize_concurrency=2,
            salt_shift=8,
        ),
    )
    s = Searcher(idx)
    f = sorted(pages.glob("part-*.parquet"))[0]
    t = pq.read_table(f, columns=["url", "html"])
    row = 5
    text = extract_text(t["html"][row].as_py())
    url = t["url"][row].as_py()
    res = s.search_hybrid_text(f"{url} {text}", k=5)
    assert res and res[0][0] == row  # file 0 → docID == row
    # the dense arm inside the fusion really used the provider
    assert getattr(s, "_dense_provider", None) is not None
    assert s._dense_provider.n_requests > 0


# ---------------------------------------------------------------------------
# Gemini / Voyage wire variants (same retry core, different shapes)
# ---------------------------------------------------------------------------


def test_voyage_payload_and_parse():
    from vexor_ray.providers import VoyageEmbeddingProvider

    seen = []

    def transport(payload):
        seen.append(payload)
        return 200, _ok_body(payload["input"])

    p = VoyageEmbeddingProvider(
        "https://api.example/v1", "voyage-3", require_key=False,
        transport=transport, sleep=lambda s: None,
        input_type="document", dimensions=DIM,
    )
    out = p.embed(["a", "b"])
    assert out.shape == (2, DIM)
    assert seen[0]["input_type"] == "document"
    assert seen[0]["output_dimension"] == DIM
    assert "dimensions" not in seen[0]


def test_gemini_payload_parse_and_endpoint(monkeypatch):
    from vexor_ray.providers import GeminiEmbeddingProvider

    monkeypatch.setenv("GEMINI_API_KEY", "g-key")
    seen = []

    def transport(payload):
        seen.append(payload)
        vecs = [_fake_embedding(r["content"]["parts"][0]["text"])
                for r in payload["requests"]]
        return 200, {"embeddings": [{"values": v} for v in vecs]}

    p = GeminiEmbeddingProvider(
        "https://api.example/v1beta", "emb-001",
        transport=transport, sleep=lambda s: None,
    )
    texts = ["hello", "world", "three"]
    out = p.embed(texts)
    want = np.asarray([_fake_embedding(t) for t in texts], dtype=np.float32)
    np.testing.assert_array_equal(out, want)
    assert seen[0]["requests"][0]["model"] == "models/emb-001"
    assert p._endpoint().endswith("/models/emb-001:batchEmbedContents")
    assert p._headers()["x-goog-api-key"] == "g-key"


def test_gemini_retry_and_count_mismatch(monkeypatch):
    from vexor_ray.providers import GeminiEmbeddingProvider
    from vexor_ray.providers.openai_http import ProviderError

    monkeypatch.setenv("GEMINI_API_KEY", "g-key")
    calls = {"n": 0}

    def flaky(payload):
        calls["n"] += 1
        if calls["n"] == 1:
            return 429, None
        return 200, {"embeddings": [{"values": _fake_embedding("x")}]}

    p = GeminiEmbeddingProvider(
        "https://api.example/v1beta", "emb-001",
        transport=flaky, sleep=lambda s: None,
    )
    assert p.embed(["x"]).shape == (1, DIM)
    assert p.n_retries == 1

    def short(payload):
        return 200, {"embeddings": []}

    p2 = GeminiEmbeddingProvider(
        "https://api.example/v1beta", "emb-001",
        transport=short, sleep=lambda s: None,
    )
    with pytest.raises(ProviderError, match="0 embeddings"):
        p2.embed(["x"])


def test_make_provider_new_kinds(monkeypatch):
    from vexor_ray.providers import make_provider
    from vexor_ray.providers.openai_http import (
        GeminiEmbeddingProvider,
        ProviderError,
        VoyageEmbeddingProvider,
    )

    monkeypatch.setenv("VOYAGE_API_KEY", "v")
    monkeypatch.setenv("GEMINI_API_KEY", "g")
    assert isinstance(
        make_provider({"kind": "voyage", "base_url": "u", "model": "m"}),
        VoyageEmbeddingProvider,
    )
    assert isinstance(
        make_provider({"kind": "gemini", "base_url": "u", "model": "m"}),
        GeminiEmbeddingProvider,
    )
    # local-onnx import-gates cleanly in this environment
    with pytest.raises((ProviderError, NotImplementedError)):
        make_provider({"kind": "local-onnx", "model_path": "/tmp/x.onnx"})
