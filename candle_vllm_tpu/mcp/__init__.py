"""Model Context Protocol (MCP) client.

Re-designs the reference's ``src/mcp/`` (manager/client/transport/types,
~2.2 kLoC): JSON-RPC 2.0 framing, stdio and HTTP transports, a
multi-server manager with a cached tool list that gets injected into chat
requests (reference: openai/mod.rs:201-247), and tool-call dispatch.
"""

from candle_vllm_tpu.mcp.client import MCPClient  # noqa: F401
from candle_vllm_tpu.mcp.manager import MCPManager  # noqa: F401
from candle_vllm_tpu.mcp.server import MCPServer, engine_mcp_server  # noqa: F401
