"""MCP transports: stdio subprocess and HTTP POST.

Reference: ``/root/reference/src/mcp/transport.rs`` (stdio/HTTP/SSE).
"""

from __future__ import annotations

import asyncio
import json
from typing import Any, Dict, Optional


class Transport:
    async def start(self) -> None: ...

    async def send(self, message: Dict[str, Any]) -> None: ...

    async def receive(self) -> Dict[str, Any]: ...

    async def close(self) -> None: ...


class StdioTransport(Transport):
    """Newline-delimited JSON-RPC over a child process' stdio."""

    def __init__(self, command: str, args: Optional[list] = None,
                 env: Optional[dict] = None):
        self.command = command
        self.args = args or []
        self.env = env
        self._proc: Optional[asyncio.subprocess.Process] = None

    async def start(self) -> None:
        import os

        env = dict(os.environ)
        if self.env:
            env.update(self.env)
        self._proc = await asyncio.create_subprocess_exec(
            self.command,
            *self.args,
            stdin=asyncio.subprocess.PIPE,
            stdout=asyncio.subprocess.PIPE,
            env=env,
        )

    async def send(self, message: Dict[str, Any]) -> None:
        assert self._proc and self._proc.stdin
        self._proc.stdin.write((json.dumps(message) + "\n").encode())
        await self._proc.stdin.drain()

    async def receive(self) -> Dict[str, Any]:
        assert self._proc and self._proc.stdout
        while True:
            line = await self._proc.stdout.readline()
            if not line:
                raise ConnectionError("MCP server closed stdout")
            line = line.strip()
            if line:
                return json.loads(line)

    async def close(self) -> None:
        if self._proc:
            if self._proc.stdin:
                self._proc.stdin.close()
            try:
                await asyncio.wait_for(self._proc.wait(), timeout=3)
            except asyncio.TimeoutError:
                self._proc.kill()


class HTTPTransport(Transport):
    """Streamable-HTTP style: one POST per JSON-RPC message."""

    def __init__(self, url: str, headers: Optional[dict] = None):
        self.url = url
        self.headers = headers or {}
        self._session = None
        self._responses: asyncio.Queue = asyncio.Queue()

    async def start(self) -> None:
        import aiohttp

        self._session = aiohttp.ClientSession(headers=self.headers)

    async def send(self, message: Dict[str, Any]) -> None:
        assert self._session is not None
        async with self._session.post(self.url, json=message) as resp:
            resp.raise_for_status()
            if resp.content_type and "json" in resp.content_type:
                data = await resp.json()
                if data is not None:
                    await self._responses.put(data)

    async def receive(self) -> Dict[str, Any]:
        return await self._responses.get()

    async def close(self) -> None:
        if self._session is not None:
            await self._session.close()


class SSETransport(Transport):
    """Legacy MCP HTTP+SSE transport (reference: mcp/transport.rs SSE
    arm): a long-lived GET event stream delivers server->client JSON-RPC
    messages; the first ``endpoint`` event names the POST url for
    client->server messages."""

    def __init__(self, url: str, headers: Optional[dict] = None):
        self.url = url
        self.headers = headers or {}
        self._session = None
        self._post_url: Optional[str] = None
        self._responses: asyncio.Queue = asyncio.Queue()
        self._reader: Optional[asyncio.Task] = None
        self._endpoint_ready = asyncio.Event()

    async def start(self) -> None:
        import aiohttp

        self._session = aiohttp.ClientSession(headers=self.headers)
        self._reader = asyncio.create_task(self._read_events())
        await asyncio.wait_for(self._endpoint_ready.wait(), timeout=30)
        if self._reader.done() and self._reader.exception() is not None:
            raise self._reader.exception()

    async def _read_events(self) -> None:
        try:
            await self._read_events_inner()
        except asyncio.CancelledError:
            raise
        except BaseException:
            # poison the queue so pending receive() calls fail fast
            # instead of hanging on a dead stream
            await self._responses.put(None)
            self._endpoint_ready.set()
            raise

    async def _read_events_inner(self) -> None:
        from urllib.parse import urljoin

        assert self._session is not None
        async with self._session.get(
            self.url, headers={"Accept": "text/event-stream"}
        ) as resp:
            resp.raise_for_status()
            event, data_lines = "message", []
            async for raw in resp.content:
                line = raw.decode().rstrip("\r\n")
                if line.startswith("event:"):
                    event = line[6:].strip()
                elif line.startswith("data:"):
                    data_lines.append(line[5:].strip())
                elif line == "":
                    data = "\n".join(data_lines)
                    data_lines = []
                    if not data:
                        continue
                    if event == "endpoint":
                        self._post_url = urljoin(self.url, data)
                        self._endpoint_ready.set()
                    else:
                        try:
                            await self._responses.put(json.loads(data))
                        except ValueError:
                            pass
                    event = "message"

    async def send(self, message: Dict[str, Any]) -> None:
        assert self._session is not None and self._post_url is not None
        async with self._session.post(self._post_url, json=message) as resp:
            resp.raise_for_status()

    async def receive(self) -> Dict[str, Any]:
        msg = await self._responses.get()
        if msg is None:
            raise ConnectionError("MCP SSE stream closed")
        return msg

    async def close(self) -> None:
        if self._reader is not None:
            self._reader.cancel()
        if self._session is not None:
            await self._session.close()


class InMemoryTransport(Transport):
    """Paired queues for tests (reference tests use the same trick)."""

    def __init__(self, inbox: asyncio.Queue, outbox: asyncio.Queue):
        self.inbox = inbox
        self.outbox = outbox

    async def start(self) -> None:
        pass

    async def send(self, message: Dict[str, Any]) -> None:
        await self.outbox.put(message)

    async def receive(self) -> Dict[str, Any]:
        return await self.inbox.get()

    async def close(self) -> None:
        pass
