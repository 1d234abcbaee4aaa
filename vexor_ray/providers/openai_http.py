"""OpenAI-compatible ``/embeddings`` client — stdlib HTTP, reference parity.

Re-implements, from scratch, the semantics of the reference's OpenAI
backend (``vexor/providers/openai.py:16-163``):

- texts are split into batches (reference default batch size 64,
  ``vexor/config.py:45``) and embedded concurrently on a persistent
  ``ThreadPoolExecutor`` (default 4 workers, ``config.py:46``), results
  reassembled in input order;
- per-batch retry: at most 2 retries after the first attempt, exponential
  backoff 0.5 s → 4 s (factor 2, capped), retrying only on HTTP
  {408, 429, 5xx} or transport errors (connection refused, timeouts) —
  any other status fails fast (``openai.py:117-163``);
- optional ``dimensions`` request parameter; response rows re-ordered by
  the protocol's ``index`` field; output ``np.float32 (n, dim)``;
- the API key comes from an environment variable named in the spec
  (``api_key_env``), never from the spec itself — provider specs are
  persisted into build manifests and must stay secret-free.  A missing
  key raises, as the reference does (``openai.py:34-35``).

The wire transport is a single injectable ``_post`` seam so the retry /
batching / ordering policy is unit-testable without sockets; the real
``urllib`` path is exercised against an in-process HTTP stub server in
``tests/test_provider.py`` (no external network anywhere).
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Sequence

import numpy as np

DEFAULT_BATCH_SIZE = 64  # reference DEFAULT_BATCH_SIZE, vexor/config.py:45
DEFAULT_CONCURRENCY = 4  # reference DEFAULT_EMBED_CONCURRENCY, config.py:46
MAX_RETRIES = 2
BACKOFF_INITIAL_S = 0.5
BACKOFF_CAP_S = 4.0
RETRYABLE_STATUSES = frozenset({408, 429}) | frozenset(range(500, 600))


class ProviderError(RuntimeError):
    """Embedding provider failed (after retries, or non-retryably)."""


class OpenAIEmbeddingProvider:
    """``embed(texts) -> (n, dim) float32`` via an OpenAI-compatible API."""

    def __init__(
        self,
        base_url: str,
        model: str,
        *,
        api_key: str | None = None,
        api_key_env: str | None = "OPENAI_API_KEY",
        batch_size: int = DEFAULT_BATCH_SIZE,
        concurrency: int = DEFAULT_CONCURRENCY,
        dimensions: int | None = None,
        timeout_s: float = 30.0,
        require_key: bool = True,
        sleep: Callable[[float], None] = time.sleep,
        transport: Callable[[dict], tuple[int, dict | None]] | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.batch_size = max(1, int(batch_size))
        self.concurrency = max(1, int(concurrency))
        self.dimensions = dimensions if dimensions and dimensions > 0 else None
        self.timeout_s = float(timeout_s)
        self._sleep = sleep
        self._transport = transport
        key = api_key or (os.environ.get(api_key_env) if api_key_env else None)
        if require_key and not key:
            raise ProviderError(
                f"no API key: set {api_key_env or 'api_key'} in the environment"
            )
        self._api_key = key or ""
        self._executor: ThreadPoolExecutor | None = None
        # introspection for tests/metrics
        self.n_requests = 0
        self.n_retries = 0

    # -- wire hooks (overridden by the Gemini/Voyage variants) ---------------
    def _endpoint(self) -> str:
        return f"{self.base_url}/embeddings"

    def _headers(self) -> dict:
        return {
            "Content-Type": "application/json",
            "Authorization": f"Bearer {self._api_key}",
        }

    def _payload(self, batch: Sequence[str]) -> dict:
        payload: dict = {"model": self.model, "input": list(batch)}
        if self.dimensions is not None:
            payload["dimensions"] = self.dimensions
        return payload

    def _parse(self, body: dict, n: int) -> np.ndarray:
        """200-response body → (n, dim) float32 in input order."""
        data = body.get("data") or []
        if len(data) != n:
            raise ProviderError(
                f"provider returned {len(data)} embeddings for {n} inputs"
            )
        data = sorted(data, key=lambda d: d.get("index", 0))
        return np.asarray([d["embedding"] for d in data], dtype=np.float32)

    def _post(self, payload: dict) -> tuple[int, dict | None]:
        """One POST to the endpoint → (status, parsed body).

        Transport-level failures (refused connection, socket timeout) raise —
        the retry loop treats them as retryable, mirroring the reference's
        timeout/ratelimit message matching.
        """
        if self._transport is not None:
            return self._transport(payload)
        req = urllib.request.Request(
            self._endpoint(),
            data=json.dumps(payload).encode(),
            headers=self._headers(),
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return resp.status, json.load(resp)
        except urllib.error.HTTPError as exc:
            return exc.code, None

    def _embed_batch(self, batch: Sequence[str]) -> np.ndarray:
        payload = self._payload(batch)
        delay = BACKOFF_INITIAL_S
        last = "no attempt"
        for attempt in range(MAX_RETRIES + 1):
            self.n_requests += 1
            try:
                status, body = self._post(payload)
            except Exception as exc:  # transport error → retryable
                status, body = -1, None
                last = f"transport error: {exc}"
            else:
                if status == 200 and body is not None:
                    return self._parse(body, len(batch))
                last = f"status {status}"
                if status != -1 and status not in RETRYABLE_STATUSES:
                    raise ProviderError(f"embedding request failed ({last})")
            if attempt < MAX_RETRIES:
                self.n_retries += 1
                self._sleep(delay)
                delay = min(delay * 2.0, BACKOFF_CAP_S)
        raise ProviderError(
            f"embedding request failed after {MAX_RETRIES + 1} attempts ({last})"
        )

    # -- public --------------------------------------------------------------
    def embed(self, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            return np.empty((0, 0), dtype=np.float32)
        batches = [
            texts[i : i + self.batch_size]
            for i in range(0, len(texts), self.batch_size)
        ]
        if len(batches) == 1 or self.concurrency == 1:
            parts = [self._embed_batch(b) for b in batches]
        else:
            if self._executor is None:  # persistent, like the reference
                self._executor = ThreadPoolExecutor(max_workers=self.concurrency)
            parts = list(self._executor.map(self._embed_batch, batches))
        return np.vstack(parts)

    def close(self) -> None:
        if self._executor is not None:
            self._executor.shutdown(wait=False)
            self._executor = None


class HashEmbeddingProvider:
    """Offline arm: the deterministic hash featurizer behind the same
    ``embed()`` protocol (``functions/embed.py`` — eval MRR@10 0.93 in
    word_mix mode), so pipelines swap providers with one spec change."""

    def __init__(self, dim: int = 4096, mode: str = "word_mix"):
        self.dim = int(dim)
        self.mode = mode

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        from ..functions.embed import hash_embed

        return hash_embed(list(texts), dim=self.dim, n=2, mode=self.mode)

    def close(self) -> None:  # protocol symmetry
        pass


class VoyageEmbeddingProvider(OpenAIEmbeddingProvider):
    """Voyage AI wire variant (public REST: ``POST /v1/embeddings``).

    OpenAI-shaped request/response with two extra parameters:
    ``input_type`` ("document" at index time, "query" at search time) and
    ``output_dimension``.  Auth is the same Bearer header, key from
    ``VOYAGE_API_KEY`` by default (reference arm: ``providers/``; wire
    format from the public Voyage API docs)."""

    def __init__(self, *args, input_type: str | None = None, **kw):
        kw.setdefault("api_key_env", "VOYAGE_API_KEY")
        super().__init__(*args, **kw)
        self.input_type = input_type

    def _payload(self, batch: Sequence[str]) -> dict:
        payload: dict = {"model": self.model, "input": list(batch)}
        if self.input_type:
            payload["input_type"] = self.input_type
        if self.dimensions is not None:
            payload["output_dimension"] = self.dimensions
        return payload


class GeminiEmbeddingProvider(OpenAIEmbeddingProvider):
    """Gemini wire variant (public Generative Language REST API).

    ``POST {base}/models/{model}:batchEmbedContents`` with
    ``{"requests": [{"model": "models/<m>", "content": {"parts":
    [{"text": t}]}}]}``; the response's ``embeddings[].values`` are in
    request order (no index field).  Auth via the ``x-goog-api-key``
    header, key from ``GEMINI_API_KEY`` by default (reference arm:
    ``vexor/providers/gemini.py``; wire format from the public API docs).
    """

    def __init__(self, *args, **kw):
        kw.setdefault("api_key_env", "GEMINI_API_KEY")
        super().__init__(*args, **kw)

    def _endpoint(self) -> str:
        return f"{self.base_url}/models/{self.model}:batchEmbedContents"

    def _headers(self) -> dict:
        return {
            "Content-Type": "application/json",
            "x-goog-api-key": self._api_key,
        }

    def _payload(self, batch: Sequence[str]) -> dict:
        reqs = []
        for t in batch:
            r: dict = {
                "model": f"models/{self.model}",
                "content": {"parts": [{"text": t}]},
            }
            if self.dimensions is not None:
                r["outputDimensionality"] = self.dimensions
            reqs.append(r)
        return {"requests": reqs}

    def _parse(self, body: dict, n: int) -> np.ndarray:
        rows = body.get("embeddings") or []
        if len(rows) != n:
            raise ProviderError(
                f"provider returned {len(rows)} embeddings for {n} inputs"
            )
        return np.asarray([r["values"] for r in rows], dtype=np.float32)


class LocalOnnxEmbeddingProvider:
    """Local ONNX inference arm (reference ``providers/local.py:75-133``).

    The sandbox has no ``onnxruntime``/``tokenizers``; the constructor
    import-gates and raises a clear error when they are absent, keeping
    the spec registrable (the actor-pool pattern it would run under is the
    same as every other provider: construct once per actor, batch in
    ``__call__``)."""

    def __init__(self, model_path: str, tokenizer_path: str | None = None):
        try:
            import onnxruntime  # noqa: F401
        except ImportError as exc:
            raise ProviderError(
                "local-onnx provider needs the onnxruntime package, which "
                "is not installed in this environment"
            ) from exc
        raise NotImplementedError(
            "local-onnx inference not wired in this environment"
        )


def make_provider(spec: dict):
    """Provider from a JSON-safe spec dict (persisted in build manifests).

    ``{"kind": "openai" | "voyage" | "gemini", "base_url": ..., "model":
    ..., "batch_size": 64, "concurrency": 4, "dimensions": ...,
    "timeout_s": 30, "api_key_env": <env var>, "require_key": true}``,
    ``{"kind": "hash", "dim": 4096, "mode": "word_mix"}``, or
    ``{"kind": "local-onnx", "model_path": ...}`` (import-gated).
    """
    spec = dict(spec)
    kind = spec.pop("kind")
    if kind == "openai":
        return OpenAIEmbeddingProvider(**spec)
    if kind == "voyage":
        return VoyageEmbeddingProvider(**spec)
    if kind == "gemini":
        return GeminiEmbeddingProvider(**spec)
    if kind == "hash":
        return HashEmbeddingProvider(**spec)
    if kind == "local-onnx":
        return LocalOnnxEmbeddingProvider(**spec)
    raise ValueError(f"unknown provider kind {kind!r}")
