"""MCP stdio server (vexor_ray/mcp.py): protocol + tool behavior.

The reference serves a tools-only MCP subset over newline-delimited
JSON-RPC 2.0 stdio (``vexor/services/mcp_service.py``); these tests pin
the same protocol contract on our from-scratch server, with tools mapped
to the Ray engine's index model.
"""

from __future__ import annotations

import io
import json

import pytest

from vexor_ray.mcp import (
    INVALID_PARAMS,
    INVALID_REQUEST,
    METHOD_NOT_FOUND,
    PARSE_ERROR,
    McpServer,
    serve,
)


def _init(server: McpServer):
    return server.handle_message(
        {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}}
    )


class TestProtocol:
    def test_initialize_and_ping(self):
        s = McpServer()
        r = _init(s)
        assert r["result"]["protocolVersion"]
        assert r["result"]["capabilities"] == {"tools": {}}
        assert s.handle_message(
            {"jsonrpc": "2.0", "id": 2, "method": "ping"}
        )["result"] == {}

    def test_requests_before_initialize_rejected(self):
        s = McpServer()
        r = s.handle_message({"jsonrpc": "2.0", "id": 1, "method": "tools/list"})
        assert r["error"]["code"] == INVALID_REQUEST

    def test_tools_list_schema(self):
        s = McpServer()
        _init(s)
        r = s.handle_message({"jsonrpc": "2.0", "id": 2, "method": "tools/list"})
        tools = {t["name"]: t for t in r["result"]["tools"]}
        assert set(tools) == {"vexor_search", "vexor_build", "vexor_phrase"}
        assert tools["vexor_search"]["inputSchema"]["required"] == [
            "query",
            "index_dir",
        ]

    def test_unknown_method_and_tool(self):
        s = McpServer()
        _init(s)
        r = s.handle_message({"jsonrpc": "2.0", "id": 3, "method": "nope"})
        assert r["error"]["code"] == METHOD_NOT_FOUND
        r = s.handle_message(
            {
                "jsonrpc": "2.0",
                "id": 4,
                "method": "tools/call",
                "params": {"name": "bogus", "arguments": {}},
            }
        )
        assert r["error"]["code"] == INVALID_PARAMS

    def test_notifications_get_no_response(self):
        s = McpServer()
        assert (
            s.handle_message(
                {"jsonrpc": "2.0", "method": "notifications/initialized"}
            )
            is None
        )

    def test_bad_arguments(self):
        s = McpServer()
        _init(s)
        r = s.handle_message(
            {
                "jsonrpc": "2.0",
                "id": 5,
                "method": "tools/call",
                "params": {"name": "vexor_search", "arguments": {"query": " "}},
            }
        )
        assert r["error"]["code"] == INVALID_PARAMS

    def test_ndjson_serve_loop(self):
        """serve(): parse error in-band, then a full init/list exchange."""
        lines = [
            b"this is not json\n",
            json.dumps(
                {"jsonrpc": "2.0", "id": 1, "method": "initialize"}
            ).encode()
            + b"\n",
            b"\n",  # blank lines skipped
            json.dumps(
                {"jsonrpc": "2.0", "id": 2, "method": "tools/list"}
            ).encode()
            + b"\n",
        ]
        out = io.BytesIO()
        serve(McpServer(), iter(lines), out)
        responses = [
            json.loads(l) for l in out.getvalue().splitlines() if l.strip()
        ]
        assert responses[0]["error"]["code"] == PARSE_ERROR
        assert responses[1]["result"]["protocolVersion"]
        assert len(responses[2]["result"]["tools"]) == 3


class TestTools:
    @pytest.fixture(scope="class")
    def served_index(self, ray_session, pages_1k, tmp_path_factory):
        from vexor_ray.index.build import BuildConfig, build_index

        idx = tmp_path_factory.mktemp("mcp") / "idx"
        build_index(
            pages_1k,
            idx,
            BuildConfig(num_waves=1, shard_group_size=4, tokenize_concurrency=2),
        )
        return idx

    def test_search_tool_matches_searcher(self, served_index):
        from vexor_ray.query.searcher import Searcher

        s = McpServer()
        _init(s)
        r = s.handle_message(
            {
                "jsonrpc": "2.0",
                "id": 2,
                "method": "tools/call",
                "params": {
                    "name": "vexor_search",
                    "arguments": {
                        "query": "needledften",
                        "index_dir": str(served_index),
                        "k": 5,
                    },
                },
            }
        )
        payload = r["result"]["structuredContent"]
        assert not r["result"]["isError"]
        want = Searcher(served_index).search("needledften", k=5)
        assert [h["doc_id"] for h in payload["results"]] == [d for d, _ in want]
        assert all(h["url"] for h in payload["results"])
        # in-band text mirrors the structured payload (MCP contract)
        assert json.loads(r["result"]["content"][0]["text"]) == payload
        # searcher is cached for the follow-up call
        assert (str(served_index), None) in s._searchers

    def test_tool_error_surfaces_in_band(self, served_index):
        s = McpServer()
        _init(s)
        r = s.handle_message(
            {
                "jsonrpc": "2.0",
                "id": 3,
                "method": "tools/call",
                "params": {
                    "name": "vexor_search",
                    "arguments": {
                        "query": "x",
                        "index_dir": "/nonexistent/idx",
                    },
                },
            }
        )
        assert r["result"]["isError"]
        assert "error" in json.loads(r["result"]["content"][0]["text"])

    def test_build_tool_roundtrip(self, ray_session, pages_1k, tmp_path):
        s = McpServer()
        _init(s)
        out = tmp_path / "mcp_built"
        r = s.handle_message(
            {
                "jsonrpc": "2.0",
                "id": 4,
                "method": "tools/call",
                "params": {
                    "name": "vexor_build",
                    "arguments": {"input": str(pages_1k), "out": str(out)},
                },
            }
        )
        payload = r["result"]["structuredContent"]
        assert payload["doc_count"] > 0
        # build → search through the same server session
        r2 = s.handle_message(
            {
                "jsonrpc": "2.0",
                "id": 5,
                "method": "tools/call",
                "params": {
                    "name": "vexor_search",
                    "arguments": {
                        "query": "needledfone",
                        "index_dir": str(out),
                        "k": 3,
                    },
                },
            }
        )
        assert r2["result"]["structuredContent"]["results"]

    def test_search_tool_snapshot_pin(self, served_index, tmp_path):
        """The `at` argument pins a retained snapshot (the serving story's
        consistency anchor, reachable from the agent surface)."""
        from vexor_ray.index.manifest import list_manifests

        s = McpServer()
        _init(s)
        name = [m["name"] for m in list_manifests(served_index)][-1]
        r = s.handle_message(
            {
                "jsonrpc": "2.0",
                "id": 7,
                "method": "tools/call",
                "params": {
                    "name": "vexor_search",
                    "arguments": {
                        "query": "needledften",
                        "index_dir": str(served_index),
                        "at": name,
                        "k": 3,
                    },
                },
            }
        )
        assert r["result"]["structuredContent"]["results"]
        assert (str(served_index), name) in s._searchers

    def test_phrase_tool(self, pos_index):
        s = McpServer()
        _init(s)
        r = s.handle_message(
            {
                "jsonrpc": "2.0",
                "id": 6,
                "method": "tools/call",
                "params": {
                    "name": "vexor_phrase",
                    "arguments": {
                        "phrase": "needledfone",
                        "positions_dir": str(pos_index),
                    },
                },
            }
        )
        payload = r["result"]["structuredContent"]
        assert payload["total_docs"] == 1  # df=1 needle
        assert payload["matches"][0]["count"] >= 1


def test_fuzz_malformed_messages_never_crash():
    """Robustness: arbitrary malformed JSON-RPC shapes get an error (or
    None for notifications) — the server must never raise."""
    import random

    rng = random.Random(13)
    s = McpServer()
    _init(s)
    shapes = [
        {},
        [],
        42,
        "x",
        None,
        {"jsonrpc": "1.0", "id": 1, "method": "ping"},
        {"jsonrpc": "2.0"},
        {"jsonrpc": "2.0", "id": 1},
        {"jsonrpc": "2.0", "id": 1, "method": 7},
        {"jsonrpc": "2.0", "id": 1, "method": "tools/call"},
        {"jsonrpc": "2.0", "id": 1, "method": "tools/call", "params": 3},
        {"jsonrpc": "2.0", "id": 1, "method": "tools/call",
         "params": {"name": "vexor_search", "arguments": None}},
        {"jsonrpc": "2.0", "id": 1, "method": "tools/call",
         "params": {"name": "vexor_search", "arguments": {"query": 5, "index_dir": 6}}},
        {"jsonrpc": "2.0", "id": 1, "method": "tools/call",
         "params": {"name": "vexor_build", "arguments": {"input": "", "out": ""}}},
        {"jsonrpc": "2.0", "id": [1, 2], "method": "ping"},
    ]
    for _ in range(200):
        msg = rng.choice(shapes)
        out = s.handle_message(msg)
        if isinstance(msg, dict) and msg.get("jsonrpc") == "2.0" and msg.get("id") is None:
            assert out is None or "error" in out
        else:
            assert out is None or ("error" in out or "result" in out)


def test_numeric_bounds_enforced():
    """The advertised inputSchema bounds are enforced, not just displayed:
    k=0, k=100000 and negative phrase limits are INVALID_PARAMS."""
    s = McpServer()
    _init(s)
    for args in (
        {"query": "x", "index_dir": "/i", "k": 0},
        {"query": "x", "index_dir": "/i", "k": 100000},
        {"query": "x", "index_dir": "/i", "k": "ten"},
    ):
        r = s.handle_message(
            {
                "jsonrpc": "2.0",
                "id": 1,
                "method": "tools/call",
                "params": {"name": "vexor_search", "arguments": args},
            }
        )
        assert r["error"]["code"] == INVALID_PARAMS, args
    r = s.handle_message(
        {
            "jsonrpc": "2.0",
            "id": 2,
            "method": "tools/call",
            "params": {
                "name": "vexor_phrase",
                "arguments": {"phrase": "x", "positions_dir": "/p", "limit": -1},
            },
        }
    )
    assert r["error"]["code"] == INVALID_PARAMS
