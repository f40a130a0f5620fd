"""Multi-server MCP manager with a cached tool list.

Reference: ``/root/reference/src/mcp/manager.rs:18-343`` (background tool
cache refresh, per-server namespacing, cached tools injected into chat
requests at openai/mod.rs:201-247).
"""

from __future__ import annotations

import asyncio
import json
import time
from typing import Any, Dict, List, Optional

from candle_vllm_tpu.mcp.client import MCPClient
from candle_vllm_tpu.mcp.transport import HTTPTransport, StdioTransport


class MCPManager:
    def __init__(self, refresh_secs: float = 60.0):
        self.clients: Dict[str, MCPClient] = {}
        self.refresh_secs = refresh_secs
        self._tools: List[Dict[str, Any]] = []
        self._tool_owner: Dict[str, str] = {}
        self._refresher: Optional[asyncio.Task] = None

    @classmethod
    def from_config(cls, path: str) -> "MCPManager":
        """Config format (reference --mcp-config): {"servers": [{"name":
        ..., "command": ...}|{"name": ..., "url": ...}]}"""
        with open(path) as f:
            cfg = json.load(f)
        mgr = cls(refresh_secs=float(cfg.get("refresh_secs", 60)))
        for s in cfg.get("servers", []):
            if "command" in s:
                t = StdioTransport(s["command"], s.get("args"), s.get("env"))
            elif s.get("transport") == "sse" or str(s.get("url", "")).endswith("/sse"):
                from candle_vllm_tpu.mcp.transport import SSETransport

                t = SSETransport(s["url"], s.get("headers"))
            else:
                t = HTTPTransport(s["url"], s.get("headers"))
            mgr.clients[s["name"]] = MCPClient(t)
        return mgr

    def add_client(self, name: str, client: MCPClient) -> None:
        self.clients[name] = client

    async def start(self) -> None:
        for client in self.clients.values():
            await client.start()
        await self.refresh_tools()
        if self.refresh_secs > 0:
            self._refresher = asyncio.create_task(self._refresh_loop())

    async def _refresh_loop(self) -> None:
        while True:
            await asyncio.sleep(self.refresh_secs)
            try:
                await self.refresh_tools()
            except Exception:
                pass  # keep the stale cache on refresh failure

    async def refresh_tools(self) -> None:
        tools: List[Dict[str, Any]] = []
        owners: Dict[str, str] = {}
        for name, client in self.clients.items():
            for t in await client.list_tools():
                tool = {
                    "type": "function",
                    "function": {
                        "name": t["name"],
                        "description": t.get("description", ""),
                        "parameters": t.get("inputSchema", {}),
                    },
                }
                tools.append(tool)
                owners[t["name"]] = name
        self._tools = tools
        self._tool_owner = owners

    @property
    def cached_tools(self) -> List[Dict[str, Any]]:
        return list(self._tools)

    async def call_tool(self, name: str, arguments: Dict[str, Any]) -> Any:
        owner = self._tool_owner.get(name)
        if owner is None:
            raise KeyError(f"unknown MCP tool {name!r}")
        return await self.clients[owner].call_tool(name, arguments)

    async def close(self) -> None:
        if self._refresher:
            self._refresher.cancel()
        for client in self.clients.values():
            await client.close()
