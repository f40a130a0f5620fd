"""MCP client/manager: JSON-RPC handshake, tool listing + namespaced
dispatch, error handling, stdio transport against a real subprocess."""

import asyncio
import json
import sys

import pytest

from candle_vllm_tpu.mcp.client import MCPClient, MCPError
from candle_vllm_tpu.mcp.manager import MCPManager
from candle_vllm_tpu.mcp.transport import InMemoryTransport, StdioTransport

pytest_plugins = ("aiohttp.pytest_plugin",)


def fake_server(tools):
    """Returns (transport, server_task_coroutine) over in-memory queues."""
    to_client: asyncio.Queue = asyncio.Queue()
    to_server: asyncio.Queue = asyncio.Queue()
    transport = InMemoryTransport(to_client, to_server)

    async def serve():
        while True:
            msg = await to_server.get()
            method = msg.get("method")
            mid = msg.get("id")
            if method == "initialize":
                await to_client.put({
                    "jsonrpc": "2.0", "id": mid,
                    "result": {"serverInfo": {"name": "fake", "version": "1"},
                               "protocolVersion": "2024-11-05",
                               "capabilities": {}},
                })
            elif method == "tools/list":
                await to_client.put({
                    "jsonrpc": "2.0", "id": mid, "result": {"tools": tools}
                })
            elif method == "tools/call":
                name = msg["params"]["name"]
                if name == "boom":
                    await to_client.put({
                        "jsonrpc": "2.0", "id": mid,
                        "error": {"code": -1, "message": "kaput"},
                    })
                else:
                    await to_client.put({
                        "jsonrpc": "2.0", "id": mid,
                        "result": {"content": [{"type": "text",
                                                "text": f"ran {name}"}]},
                    })
            # notifications get no reply

    return transport, serve


async def test_client_handshake_and_tools():
    tools = [{"name": "echo", "description": "Echo",
              "inputSchema": {"type": "object"}}]
    transport, serve = fake_server(tools)
    server = asyncio.create_task(serve())
    client = MCPClient(transport)
    await client.start()
    assert client.server_info["name"] == "fake"
    listed = await client.list_tools()
    assert listed[0]["name"] == "echo"
    result = await client.call_tool("echo", {"x": 1})
    assert result["content"][0]["text"] == "ran echo"
    with pytest.raises(MCPError):
        await client.call_tool("boom", {})
    await client.close()
    server.cancel()


async def test_manager_cache_and_dispatch():
    t1, s1 = fake_server([{"name": "alpha", "inputSchema": {}}])
    t2, s2 = fake_server([{"name": "beta", "inputSchema": {}}])
    tasks = [asyncio.create_task(s1()), asyncio.create_task(s2())]
    mgr = MCPManager(refresh_secs=0)
    mgr.add_client("one", MCPClient(t1))
    mgr.add_client("two", MCPClient(t2))
    await mgr.start()
    names = [t["function"]["name"] for t in mgr.cached_tools]
    assert names == ["alpha", "beta"]
    assert mgr.cached_tools[0]["type"] == "function"
    out = await mgr.call_tool("beta", {})
    assert out["content"][0]["text"] == "ran beta"
    with pytest.raises(KeyError):
        await mgr.call_tool("gamma", {})
    await mgr.close()
    for t in tasks:
        t.cancel()


async def test_stdio_transport_real_subprocess():
    """Spin a minimal MCP server as a real child process."""
    server_code = r"""
import sys, json
for line in sys.stdin:
    msg = json.loads(line)
    mid = msg.get("id")
    m = msg.get("method")
    if m == "initialize":
        out = {"jsonrpc": "2.0", "id": mid, "result": {
            "serverInfo": {"name": "subproc"}, "capabilities": {}}}
    elif m == "tools/list":
        out = {"jsonrpc": "2.0", "id": mid,
               "result": {"tools": [{"name": "pid", "inputSchema": {}}]}}
    elif m == "tools/call":
        out = {"jsonrpc": "2.0", "id": mid,
               "result": {"content": [{"type": "text", "text": "ok"}]}}
    else:
        continue
    print(json.dumps(out), flush=True)
"""
    client = MCPClient(StdioTransport(sys.executable, ["-c", server_code]))
    await client.start()
    tools = await client.list_tools()
    assert tools[0]["name"] == "pid"
    out = await client.call_tool("pid", {})
    assert out["content"][0]["text"] == "ok"
    await client.close()


# ---------------------------------------------------------------------------
# MCP server (reference: src/mcp/server.rs)
# ---------------------------------------------------------------------------


def _loopback_pair():
    """(client_transport, server_transport) wired through two queues."""
    a: asyncio.Queue = asyncio.Queue()
    b: asyncio.Queue = asyncio.Queue()
    return InMemoryTransport(a, b), InMemoryTransport(b, a)


def test_mcp_server_client_loopback():
    from candle_vllm_tpu.mcp.server import MCPServer

    async def run():
        srv = MCPServer(name="test-srv")
        srv.register_tool(
            "add", "add two ints",
            {"type": "object", "properties": {"a": {"type": "integer"},
                                              "b": {"type": "integer"}},
             "required": ["a", "b"]},
            lambda args: args["a"] + args["b"],
        )
        srv.register_prompt({"name": "sys", "description": "d"})
        ct, st = _loopback_pair()
        task = asyncio.create_task(srv.serve(st))
        client = MCPClient(ct)
        await client.start()
        tools = await client.list_tools()
        assert [t["name"] for t in tools] == ["add"]
        out = await client.call_tool("add", {"a": 2, "b": 40})
        assert out["content"][0]["text"] == "42"
        assert out["isError"] is False
        prompts = await client.request("prompts/list", {})
        assert prompts["prompts"][0]["name"] == "sys"
        # unknown tool -> JSON-RPC error surfaces as MCPError
        try:
            await client.call_tool("nope", {})
            raise AssertionError("expected MCPError")
        except MCPError as e:
            assert "Unknown tool" in str(e)
        task.cancel()

    asyncio.run(run())


def test_mcp_server_async_handler_and_errors():
    from candle_vllm_tpu.mcp.server import MCPServer

    async def run():
        srv = MCPServer()

        async def boom(args):
            raise ValueError("kaput")

        srv.register_tool("boom", "always fails", None, boom)

        r = await srv.handle({"jsonrpc": "2.0", "id": 1,
                              "method": "initialize", "params": {}})
        assert r["result"]["serverInfo"]["name"] == "candle-vllm-tpu"
        assert await srv.handle(
            {"jsonrpc": "2.0", "method": "notifications/initialized"}
        ) is None
        assert srv.initialized
        r = await srv.handle({"jsonrpc": "2.0", "id": 2,
                              "method": "tools/call",
                              "params": {"name": "boom", "arguments": {}}})
        assert r["result"]["isError"] is True
        assert "kaput" in r["result"]["content"][0]["text"]
        r = await srv.handle({"jsonrpc": "2.0", "id": 3, "method": "wat"})
        assert r["error"]["code"] == -32601

    asyncio.run(run())


def test_engine_mcp_server_generate_tool():
    from candle_vllm_tpu.mcp.server import engine_mcp_server

    class FakeOut:
        class O:
            text = "hello world"
        outputs = [O()]

    class FakeEngine:
        def generate(self, prompts, sp):
            assert prompts == ["hi"] and sp.max_tokens == 8
            return [FakeOut()]

    async def run():
        srv = engine_mcp_server(FakeEngine(), "m1")
        r = await srv.handle({"jsonrpc": "2.0", "id": 1,
                              "method": "tools/call",
                              "params": {"name": "generate",
                                         "arguments": {"prompt": "hi",
                                                       "max_tokens": 8}}})
        assert r["result"]["content"][0]["text"] == "hello world"

    asyncio.run(run())


async def test_sse_transport_roundtrip(aiohttp_server):
    """Legacy HTTP+SSE transport: endpoint event -> POST requests ->
    responses arrive over the event stream (reference: transport.rs SSE)."""
    import asyncio
    import json as _json

    from aiohttp import web

    from candle_vllm_tpu.mcp.transport import SSETransport

    queues = {}

    async def sse(request):
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream"}
        )
        await resp.prepare(request)
        q = asyncio.Queue()
        queues["q"] = q
        await resp.write(b"event: endpoint\ndata: /messages\n\n")
        while True:
            msg = await q.get()
            if msg is None:
                break
            payload = _json.dumps(msg).encode()
            await resp.write(b"data: " + payload + b"\n\n")
        return resp

    async def messages(request):
        body = await request.json()
        # echo a JSON-RPC result for each request id
        await queues["q"].put(
            {"jsonrpc": "2.0", "id": body.get("id"),
             "result": {"echo": body.get("method")}}
        )
        return web.Response(status=202)

    app = web.Application()
    app.router.add_get("/sse", sse)
    app.router.add_post("/messages", messages)
    server = await aiohttp_server(app)

    t = SSETransport(str(server.make_url("/sse")))
    await t.start()
    await t.send({"jsonrpc": "2.0", "id": 7, "method": "ping"})
    got = await asyncio.wait_for(t.receive(), timeout=10)
    assert got["id"] == 7 and got["result"]["echo"] == "ping"
    await queues["q"].put(None)
    await t.close()
