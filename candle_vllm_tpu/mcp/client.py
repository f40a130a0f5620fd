"""MCP JSON-RPC client (initialize / tools/list / tools/call).

Reference: ``/root/reference/src/mcp/client.rs``.
"""

from __future__ import annotations

import asyncio
import itertools
from typing import Any, Dict, List, Optional

from candle_vllm_tpu.mcp.transport import Transport

PROTOCOL_VERSION = "2024-11-05"


class MCPError(RuntimeError):
    pass


class MCPClient:
    def __init__(self, transport: Transport, name: str = "candle-vllm-tpu"):
        self.transport = transport
        self.name = name
        self._ids = itertools.count(1)
        self._pending: Dict[int, asyncio.Future] = {}
        self._reader: Optional[asyncio.Task] = None
        self.server_info: Dict[str, Any] = {}

    async def start(self) -> None:
        await self.transport.start()
        self._reader = asyncio.create_task(self._read_loop())
        result = await self.request(
            "initialize",
            {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {},
                "clientInfo": {"name": self.name, "version": "0.1"},
            },
        )
        self.server_info = result.get("serverInfo", {})
        await self.notify("notifications/initialized", {})

    async def _read_loop(self) -> None:
        try:
            while True:
                msg = await self.transport.receive()
                mid = msg.get("id")
                fut = self._pending.pop(mid, None) if mid is not None else None
                if fut is not None and not fut.done():
                    fut.set_result(msg)
                # requests/notifications from the server are ignored (we
                # advertise no client capabilities)
        except (ConnectionError, asyncio.CancelledError):
            for fut in self._pending.values():
                if not fut.done():
                    fut.set_exception(ConnectionError("transport closed"))

    async def request(self, method: str, params: Dict[str, Any],
                      timeout: float = 30.0) -> Dict[str, Any]:
        mid = next(self._ids)
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        self._pending[mid] = fut
        await self.transport.send(
            {"jsonrpc": "2.0", "id": mid, "method": method, "params": params}
        )
        msg = await asyncio.wait_for(fut, timeout)
        if "error" in msg:
            raise MCPError(str(msg["error"]))
        return msg.get("result", {})

    async def notify(self, method: str, params: Dict[str, Any]) -> None:
        await self.transport.send(
            {"jsonrpc": "2.0", "method": method, "params": params}
        )

    async def list_tools(self) -> List[Dict[str, Any]]:
        result = await self.request("tools/list", {})
        return result.get("tools", [])

    async def call_tool(self, name: str, arguments: Dict[str, Any]) -> Any:
        return await self.request(
            "tools/call", {"name": name, "arguments": arguments}
        )

    async def close(self) -> None:
        if self._reader:
            self._reader.cancel()
        await self.transport.close()
