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
