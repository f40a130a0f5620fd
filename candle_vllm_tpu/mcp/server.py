"""MCP *server*: expose tools / resources / prompts to MCP clients.

Reference: ``/root/reference/src/mcp/server.rs`` (tool registry with
handlers, JSON-RPC dispatch for initialize / tools/list / tools/call /
resources/list / prompts/list, transport-driven run loop).  Ours is an
asyncio re-design sharing the client's Transport abstraction, so it can
serve over stdio, HTTP, or the in-memory test transport.
"""

from __future__ import annotations

import asyncio
import inspect
import json
from typing import Any, Awaitable, Callable, Dict, List, Optional

from candle_vllm_tpu.mcp.transport import Transport

PROTOCOL_VERSION = "2024-11-05"

Handler = Callable[[Dict[str, Any]], Any]


def _error(mid: Any, code: int, message: str) -> Dict[str, Any]:
    return {
        "jsonrpc": "2.0",
        "id": mid,
        "error": {"code": code, "message": message},
    }


class MCPServer:
    """Minimal-but-complete MCP server (tools + resources + prompts)."""

    def __init__(self, name: str = "candle-vllm-tpu", version: str = "0.1"):
        self.name = name
        self.version = version
        self.tools: Dict[str, Dict[str, Any]] = {}
        self._handlers: Dict[str, Handler] = {}
        self.resources: List[Dict[str, Any]] = []
        self.prompts: List[Dict[str, Any]] = []
        self.initialized = False

    # -- registry -----------------------------------------------------------
    def register_tool(
        self,
        name: str,
        description: str,
        input_schema: Optional[Dict[str, Any]] = None,
        handler: Optional[Handler] = None,
    ) -> None:
        self.tools[name] = {
            "name": name,
            "description": description,
            "inputSchema": input_schema
            or {"type": "object", "properties": {}},
        }
        if handler is not None:
            self._handlers[name] = handler

    def register_resource(self, resource: Dict[str, Any]) -> None:
        self.resources.append(resource)

    def register_prompt(self, prompt: Dict[str, Any]) -> None:
        self.prompts.append(prompt)

    # -- dispatch -----------------------------------------------------------
    async def handle(self, msg: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        """Handle one JSON-RPC message; returns the response dict, or
        None for notifications (reference: server.rs handle_request)."""
        method = msg.get("method")
        mid = msg.get("id")
        params = msg.get("params") or {}
        if mid is None:  # notification
            if method == "notifications/initialized":
                self.initialized = True
            return None
        try:
            if method == "initialize":
                result = {
                    "protocolVersion": params.get(
                        "protocolVersion", PROTOCOL_VERSION
                    ),
                    "capabilities": {
                        "tools": {"listChanged": False},
                        "resources": {},
                        "prompts": {},
                    },
                    "serverInfo": {
                        "name": self.name,
                        "version": self.version,
                    },
                    "instructions": (
                        f"{self.name} MCP server - "
                        f"{len(self.tools)} available tools"
                    ),
                }
            elif method == "ping":
                result = {}
            elif method == "tools/list":
                result = {"tools": list(self.tools.values())}
            elif method == "tools/call":
                return await self._call_tool(mid, params)
            elif method == "resources/list":
                result = {"resources": self.resources}
            elif method == "prompts/list":
                result = {"prompts": self.prompts}
            else:
                return _error(mid, -32601, f"method not found: {method}")
        except Exception as e:  # handler/dispatch crash -> JSON-RPC error
            return _error(mid, -32603, f"internal error: {e}")
        return {"jsonrpc": "2.0", "id": mid, "result": result}

    async def _call_tool(
        self, mid: Any, params: Dict[str, Any]
    ) -> Dict[str, Any]:
        name = params.get("name")
        if name not in self.tools:
            return _error(mid, -32602, f"Unknown tool: {name}")
        handler = self._handlers.get(name)
        if handler is None:
            return _error(mid, -32602, f"Tool has no handler: {name}")
        args = params.get("arguments") or {}
        try:
            out = handler(args)
            if inspect.isawaitable(out):
                out = await out
            text = out if isinstance(out, str) else json.dumps(out)
            result = {
                "content": [{"type": "text", "text": text}],
                "isError": False,
            }
        except Exception as e:
            result = {
                "content": [{"type": "text", "text": f"tool error: {e}"}],
                "isError": True,
            }
        return {"jsonrpc": "2.0", "id": mid, "result": result}

    # -- run loop -----------------------------------------------------------
    async def serve(self, transport: Transport) -> None:
        """Receive/dispatch until the transport closes
        (reference: server.rs run)."""
        await transport.start()
        while True:
            try:
                msg = await transport.receive()
            except (EOFError, asyncio.CancelledError):
                break
            if msg is None:
                break
            resp = await self.handle(msg)
            if resp is not None:
                await transport.send(resp)


def engine_mcp_server(engine, model_name: str = "model") -> MCPServer:
    """An MCP server exposing the inference engine as a ``generate``
    tool — the serving-side analogue of the reference registering its
    internal tools (server.rs register_internal_tool)."""
    from candle_vllm_tpu.sampling_params import SamplingParams

    srv = MCPServer(name=f"candle-vllm-tpu/{model_name}")

    def generate(args: Dict[str, Any]) -> str:
        prompt = args.get("prompt", "")
        sp = SamplingParams(
            temperature=float(args.get("temperature", 0.0)),
            max_tokens=int(args.get("max_tokens", 256)),
        )
        out = engine.generate([prompt], sp)[0]
        return out.outputs[0].text

    srv.register_tool(
        "generate",
        f"Generate a completion with {model_name}",
        {
            "type": "object",
            "properties": {
                "prompt": {"type": "string"},
                "max_tokens": {"type": "integer"},
                "temperature": {"type": "number"},
            },
            "required": ["prompt"],
        },
        generate,
    )
    return srv
