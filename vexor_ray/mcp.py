"""MCP stdio server: the agent-integration surface (tools-only subset).

Implements the tools-only subset of the Model Context Protocol —
``initialize``, ``ping``, ``tools/list``, ``tools/call`` — as
newline-delimited JSON-RPC 2.0 over stdio, the same surface the reference
exposes to agent clients (``vexor/services/mcp_service.py:3-4,626-637``;
protocol from the public MCP specification).  Hand-rolled on stdlib only:
no SDK dependency, nothing to install.

Tools map onto THIS engine's model (committed index directories over
pages parquet, not the reference's per-directory file scan):

- ``vexor_search``  — BM25 top-k over a committed index
  (query, index_dir, k, method=auto|exact|wand).
- ``vexor_build``   — build/resume an index from pages parquet shards
  (input, out, pre_extracted, text_only, waves); resumable, atomic.
- ``vexor_phrase``  — exact phrase counts via the positions sidecar
  (positions_dir, phrase).

Run: ``python -m vexor_ray mcp`` (serves on real stdin/stdout; logs to
stderr so the protocol stream stays clean).  Searchers are cached per
index directory for the life of the server process — the warm-serving
contract agents expect from repeated tool calls.
"""

from __future__ import annotations

import json
import sys
from typing import Any, IO, Iterable

PROTOCOL_VERSION = "2025-06-18"
SERVER_INFO = {"name": "vexor-ray", "version": "1.0"}

SEARCH_TOOL = "vexor_search"
BUILD_TOOL = "vexor_build"
PHRASE_TOOL = "vexor_phrase"

# JSON-RPC 2.0 error codes (public spec)
PARSE_ERROR = -32700
INVALID_REQUEST = -32600
METHOD_NOT_FOUND = -32601
INVALID_PARAMS = -32602
INTERNAL_ERROR = -32603


def build_tool_definitions() -> list[dict[str, Any]]:
    """Tool definitions advertised by ``tools/list``."""
    return [
        {
            "name": SEARCH_TOOL,
            "description": (
                "BM25 top-k search over a committed vexor-ray index "
                "directory.  Returns ranked (doc_id, url, preview, score)."
            ),
            "inputSchema": {
                "type": "object",
                "properties": {
                    "query": {"type": "string", "minLength": 1},
                    "index_dir": {"type": "string", "minLength": 1},
                    "k": {
                        "type": "integer",
                        "minimum": 1,
                        "maximum": 100,
                        "default": 10,
                    },
                    "method": {
                        "type": "string",
                        "enum": ["auto", "exact", "wand", "impact"],
                        "default": "auto",
                    },
                    "at": {
                        "type": "string",
                        "description": (
                            "Pin a retained snapshot manifest name "
                            "(time-travel read; see `python -m vexor_ray "
                            "snapshots`)."
                        ),
                    },
                },
                "required": ["query", "index_dir"],
                "additionalProperties": False,
            },
        },
        {
            "name": BUILD_TOOL,
            "description": (
                "Build (or resume) a vexor-ray index from pages parquet "
                "shards.  Atomic pointer-swap commit; safe to re-run."
            ),
            "inputSchema": {
                "type": "object",
                "properties": {
                    "input": {"type": "string", "minLength": 1},
                    "out": {"type": "string", "minLength": 1},
                    "pre_extracted": {"type": "boolean", "default": False},
                    "text_only": {"type": "boolean", "default": False},
                    "waves": {"type": "integer", "minimum": 1, "default": 1},
                },
                "required": ["input", "out"],
                "additionalProperties": False,
            },
        },
        {
            "name": PHRASE_TOOL,
            "description": (
                "Exact phrase occurrence counts via a positional sidecar "
                "directory (build with `python -m vexor_ray positions`)."
            ),
            "inputSchema": {
                "type": "object",
                "properties": {
                    "phrase": {"type": "string", "minLength": 1},
                    "positions_dir": {"type": "string", "minLength": 1},
                    "limit": {
                        "type": "integer",
                        "minimum": 1,
                        "maximum": 1000,
                        "default": 20,
                    },
                },
                "required": ["phrase", "positions_dir"],
                "additionalProperties": False,
            },
        },
    ]


def _text_result(payload: dict, *, is_error: bool = False) -> dict[str, Any]:
    out: dict[str, Any] = {
        "content": [
            {"type": "text", "text": json.dumps(payload, ensure_ascii=False)}
        ],
        "isError": is_error,
    }
    if not is_error:
        out["structuredContent"] = payload
    return out


def _result(request_id: Any, result: dict) -> dict[str, Any]:
    return {"jsonrpc": "2.0", "id": request_id, "result": result}


def _error(request_id: Any, code: int, message: str) -> dict[str, Any]:
    return {
        "jsonrpc": "2.0",
        "id": request_id,
        "error": {"code": code, "message": message},
    }


class InvalidToolArguments(ValueError):
    pass


class McpServer:
    """Stateful tools-only MCP server (one per process)."""

    def __init__(self) -> None:
        self.initialized = False
        self._searchers: dict[str, Any] = {}

    # -- protocol dispatch -------------------------------------------------
    def handle_message(self, message: Any) -> dict[str, Any] | None:
        if not isinstance(message, dict) or message.get("jsonrpc") != "2.0":
            return _error(None, INVALID_REQUEST, "not a JSON-RPC 2.0 message")
        method = message.get("method")
        request_id = message.get("id")
        if not isinstance(method, str):
            return _error(request_id, INVALID_REQUEST, "missing method")
        if request_id is None:
            return None  # notifications (e.g. notifications/initialized)
        params = message.get("params") or {}
        if not isinstance(params, dict):
            return _error(request_id, INVALID_REQUEST, "params must be an object")
        if method == "initialize":
            self.initialized = True
            return _result(
                request_id,
                {
                    "protocolVersion": PROTOCOL_VERSION,
                    "serverInfo": SERVER_INFO,
                    "capabilities": {"tools": {}},
                },
            )
        if method == "ping":
            return _result(request_id, {})
        if not self.initialized:
            return _error(
                request_id, INVALID_REQUEST, "server not initialized"
            )
        if method == "tools/list":
            return _result(request_id, {"tools": build_tool_definitions()})
        if method == "tools/call":
            name = (params or {}).get("name")
            arguments = (params or {}).get("arguments") or {}
            try:
                if name == SEARCH_TOOL:
                    return _result(request_id, self._tool_search(arguments))
                if name == BUILD_TOOL:
                    return _result(request_id, self._tool_build(arguments))
                if name == PHRASE_TOOL:
                    return _result(request_id, self._tool_phrase(arguments))
            except InvalidToolArguments as exc:
                return _error(request_id, INVALID_PARAMS, str(exc))
            except Exception as exc:  # tool errors surface in-band
                return _result(
                    request_id,
                    _text_result({"error": str(exc)}, is_error=True),
                )
            return _error(request_id, INVALID_PARAMS, f"unknown tool {name!r}")
        return _error(request_id, METHOD_NOT_FOUND, f"unknown method {method!r}")

    # -- tools -------------------------------------------------------------
    @staticmethod
    def _req_str(arguments: dict, key: str) -> str:
        v = arguments.get(key)
        if not isinstance(v, str) or not v.strip():
            raise InvalidToolArguments(f"{key!r} must be a non-empty string")
        return v.strip()

    @staticmethod
    def _int_arg(
        arguments: dict, key: str, default: int, lo: int, hi: int
    ) -> int:
        """Integer argument validated against the ADVERTISED inputSchema
        bounds (hand-rolled server: enforce what tools/list promises)."""
        v = arguments.get(key)
        if v is None:
            return default
        if isinstance(v, bool) or not isinstance(v, int):
            raise InvalidToolArguments(f"{key!r} must be an integer")
        if not (lo <= v <= hi):
            raise InvalidToolArguments(
                f"{key!r} must be between {lo} and {hi}"
            )
        return v

    def _searcher(self, index_dir: str, at: str | None = None):
        key = (index_dir, at)
        s = self._searchers.get(key)
        if s is None:
            from .query.searcher import Searcher

            s = self._searchers[key] = Searcher(index_dir, manifest_name=at)
        return s

    def _tool_search(self, arguments: dict) -> dict[str, Any]:
        query = self._req_str(arguments, "query")
        index_dir = self._req_str(arguments, "index_dir")
        k = self._int_arg(arguments, "k", 10, 1, 100)
        method = str(arguments.get("method") or "auto")
        if method not in ("auto", "exact", "wand", "impact"):
            raise InvalidToolArguments(f"unknown method {method!r}")
        at = arguments.get("at") or None
        s = self._searcher(index_dir, at)
        hits = s.search(query, k=k, method=method)
        meta = s.lookup_meta([d for d, _ in hits])
        return _text_result(
            {
                "query": query,
                "index_dir": index_dir,
                "results": [
                    {
                        "rank": rank,
                        "doc_id": int(d),
                        "score": round(float(sc), 4),
                        "url": meta.get(d, (None, None))[0],
                        "preview": meta.get(d, (None, None))[1],
                    }
                    for rank, (d, sc) in enumerate(hits, start=1)
                ],
            }
        )

    def _tool_build(self, arguments: dict) -> dict[str, Any]:
        from .index.build import BuildConfig, build_index

        inp = self._req_str(arguments, "input")
        out = self._req_str(arguments, "out")
        cfg = BuildConfig(
            pre_extracted=bool(arguments.get("pre_extracted")),
            text_only=bool(arguments.get("text_only")),
            num_waves=self._int_arg(arguments, "waves", 1, 1, 64),
        )
        man = build_index(inp, out, cfg)
        # a rebuilt index must be re-opened by later searches (any pin)
        for key in [k for k in self._searchers if k[0] == out]:
            self._searchers.pop(key, None)
        return _text_result(
            {
                "out": out,
                "doc_count": man["stats"]["doc_count"],
                "avg_doc_len": man["stats"]["avg_doc_len"],
            }
        )

    def _tool_phrase(self, arguments: dict) -> dict[str, Any]:
        from .index.positions import PositionsIndex

        phrase = self._req_str(arguments, "phrase")
        pos_dir = self._req_str(arguments, "positions_dir")
        limit = self._int_arg(arguments, "limit", 20, 1, 1000)
        idx = PositionsIndex(pos_dir)
        tbl = idx.phrase_occurrences(phrase)
        pairs = sorted(
            zip(
                tbl.column("doc_id").to_pylist(),
                tbl.column("n_occ").to_pylist(),
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )[:limit]
        return _text_result(
            {
                "phrase": phrase,
                "matches": [
                    {"doc_id": int(d), "count": int(c)} for d, c in pairs
                ],
                "total_docs": tbl.num_rows,
            }
        )


def serve(server: McpServer, stdin: Iterable[bytes], stdout: IO) -> None:
    """Newline-delimited JSON-RPC loop until EOF."""
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            message = json.loads(line)
        except json.JSONDecodeError:
            response: dict | None = _error(None, PARSE_ERROR, "parse error")
        else:
            response = server.handle_message(message)
        if response is not None:
            stdout.write(json.dumps(response, ensure_ascii=False).encode() + b"\n")
            stdout.flush()


def serve_stdio() -> None:
    """Serve MCP on the process's real stdin/stdout (stderr for logs)."""
    server = McpServer()
    stdin = getattr(sys.stdin, "buffer", sys.stdin)
    stdout = getattr(sys.stdout, "buffer", sys.stdout)
    print("vexor-ray MCP server ready (ndjson on stdio)", file=sys.stderr, flush=True)
    serve(server, stdin, stdout)
