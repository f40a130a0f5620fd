"""Async engine: asyncio front-end over the synchronous step loop.

Re-designs the reference's tokio engine task
(``/root/reference/src/openai/pipelines/llm_engine.rs:886-1011``: Notify
wake-up + ``holding_time`` batching delay + per-group SSE senders) as a
single asyncio background task.  Device steps run in a worker thread so the
event loop keeps serving HTTP; incoming requests land in a thread-safe
intake queue drained before each step (the analogue of
``move_waiting_tasks_to_scheduler``, llm_engine.rs:1026).
"""

from __future__ import annotations

import asyncio
import threading
import time
from dataclasses import dataclass, field
from typing import Any, AsyncIterator, Dict, List, Optional

from candle_vllm_tpu.engine.llm_engine import LLMEngine, RequestOutput
from candle_vllm_tpu.engine.sequence import Sequence, SequenceGroup
from candle_vllm_tpu.sampling_params import SamplingParams


@dataclass
class StreamEvent:
    """One token (or final) event pushed to a request's stream."""

    request_id: str
    token_id: int
    text_delta: str
    finished: bool
    finish_reason: Optional[str] = None
    output: Optional[RequestOutput] = None  # set on the final event


class RequestStream:
    """Async iterator of StreamEvents for one request."""

    def __init__(self, request_id: str, loop: asyncio.AbstractEventLoop):
        self.request_id = request_id
        self._queue: asyncio.Queue = asyncio.Queue()
        self._loop = loop
        self.cancelled = False

    def put_threadsafe(self, event: StreamEvent) -> None:
        self._loop.call_soon_threadsafe(self._queue.put_nowait, event)

    def __aiter__(self) -> AsyncIterator[StreamEvent]:
        return self

    async def __anext__(self) -> StreamEvent:
        ev = await self._queue.get()
        if ev is None:  # sentinel on abort
            raise StopAsyncIteration
        if ev.finished:
            # deliver the final event, then stop on the next pull
            self._loop.call_soon(self._queue.put_nowait, None)
        return ev


class AsyncLLMEngine:
    def __init__(self, engine: LLMEngine, holding_time_ms: float = 0.0,
                 bridge=None):
        self.engine = engine
        self.holding_time_ms = holding_time_ms
        # multi-host leader: intake/step events fan out to follower hosts
        # (parallel/multihost.RequestBridge; reference: communicator.rs
        # daemon broadcast)
        self.bridge = bridge
        self._intake: List[tuple] = []
        self._intake_lock = threading.Lock()
        self._device_lock = threading.Lock()  # step vs embed serialization
        self._streams: Dict[str, RequestStream] = {}
        self._wakeup = asyncio.Event()
        self._task: Optional[asyncio.Task] = None
        self._shutdown = False

    # -- lifecycle ----------------------------------------------------------
    async def start(self) -> None:
        if self._task is None:
            self._task = asyncio.create_task(self._run())

    async def stop(self) -> None:
        self._shutdown = True
        self._wakeup.set()
        if self._task is not None:
            await self._task
            self._task = None

    # -- request API ---------------------------------------------------------
    async def add_request(
        self,
        request_id: str,
        prompt: Optional[str] = None,
        prompt_token_ids: Optional[List[int]] = None,
        sampling_params: Optional[SamplingParams] = None,
        mm_inputs=None,
    ) -> RequestStream:
        loop = asyncio.get_running_loop()
        stream = RequestStream(request_id, loop)
        self._streams[request_id] = stream
        with self._intake_lock:
            self._intake.append(
                (request_id, prompt, prompt_token_ids, sampling_params,
                 mm_inputs)
            )
        self._wakeup.set()
        return stream

    def abort(self, request_id: str) -> None:
        stream = self._streams.pop(request_id, None)
        if stream is not None:
            stream.cancelled = True
            stream.put_threadsafe(None)  # type: ignore[arg-type]
        group = self.engine._groups.get(request_id)
        if group is not None:
            group.cancelled = True
        if self.bridge is not None:
            from candle_vllm_tpu.parallel.multihost import IntakeEvent

            self.bridge.publish(
                IntakeEvent(kind="abort", request_id=request_id)
            )

    async def generate(
        self,
        request_id: str,
        prompt: Optional[str] = None,
        prompt_token_ids: Optional[List[int]] = None,
        sampling_params: Optional[SamplingParams] = None,
        mm_inputs=None,
    ) -> RequestOutput:
        """Await the full completion (non-streaming path)."""
        stream = await self.add_request(
            request_id, prompt, prompt_token_ids, sampling_params,
            mm_inputs=mm_inputs,
        )
        final: Optional[RequestOutput] = None
        async for ev in stream:
            if ev.finished:
                if ev.output is None:
                    raise RuntimeError(ev.text_delta or "engine error")
                final = ev.output
        assert final is not None
        return final

    # -- engine loop ----------------------------------------------------------
    def _drain_intake(self) -> None:
        with self._intake_lock:
            batch, self._intake = self._intake, []
        for request_id, prompt, token_ids, params, mm in batch:
            try:
                self.engine.add_request(
                    request_id,
                    prompt=prompt,
                    prompt_token_ids=token_ids,
                    sampling_params=params,
                    mm_inputs=mm,
                )
            except Exception as e:  # tokenization/validation errors
                stream = self._streams.pop(request_id, None)
                if stream is not None:
                    stream.put_threadsafe(
                        StreamEvent(request_id, -1, f"error: {e}", True, "error")
                    )
                continue
            group = self.engine._groups[request_id]
            if self.bridge is not None:
                from candle_vllm_tpu.parallel.multihost import IntakeEvent

                seq0 = group.get_seqs()[0]
                self.bridge.publish(IntakeEvent(
                    kind="add",
                    request_id=request_id,
                    prompt_token_ids=list(seq0.prompt_token_ids),
                    sampling=group.sampling_params.to_dict(),
                    mm=IntakeEvent.encode_mm(mm),
                ))
            stream = self._streams.get(request_id)
            if stream is not None:
                group.on_token = self._make_on_token(stream)

    def _make_on_token(self, stream: RequestStream):
        def on_token(
            seq: Sequence, token_id: int, delta: str, finished: bool
        ) -> None:
            if stream.cancelled or finished:
                return  # the final event (with usage) is sent from _run
            stream.put_threadsafe(
                StreamEvent(stream.request_id, token_id, delta, False)
            )

        return on_token

    def _step_once(self) -> List[RequestOutput]:
        with self._device_lock:
            if self.bridge is not None:
                from candle_vllm_tpu.parallel.multihost import IntakeEvent

                # a follower that failed its previous step must fail the
                # batch BEFORE the leader dispatches the next collective
                self.bridge.raise_if_follower_failed()
                self.bridge.publish(IntakeEvent(kind="step"))
            outs = self.engine.step()
            if self.bridge is not None:
                self.bridge.raise_if_follower_failed()
            return outs

    async def embed(self, prompts, pooling: str = "last"):
        def run():
            with self._device_lock:
                return self.engine.embed(prompts, pooling)

        return await asyncio.to_thread(run)

    async def _run(self) -> None:
        while not self._shutdown:
            if not self.engine.has_unfinished_requests() and not self._intake:
                self._wakeup.clear()
                await self._wakeup.wait()
                if self._shutdown:
                    break
                if self.holding_time_ms > 0:
                    # batching delay: let more requests arrive before the
                    # first step (reference: holding_time, llm_engine.rs:919)
                    await asyncio.sleep(self.holding_time_ms / 1e3)
            self._drain_intake()
            try:
                outputs = await asyncio.to_thread(self._step_once)
            except Exception as e:
                # a failed step fails the in-flight requests, not the server
                # (reference: fail_current_scheduled_groups,
                # llm_engine.rs:1655-1682)
                import logging
                import traceback

                logging.getLogger(__name__).error(
                    "engine step failed: %s\n%s", e, traceback.format_exc()
                )
                for request_id, stream in list(self._streams.items()):
                    stream.put_threadsafe(
                        StreamEvent(
                            request_id, -1, f"engine error: {e}", True, "error",
                            output=None,
                        )
                    )
                    self.engine.abort_request(request_id)
                self._streams.clear()
                continue
            for out in outputs:
                stream = self._streams.pop(out.request_id, None)
                if stream is None:
                    continue
                o = out.outputs[0]
                stream.put_threadsafe(
                    StreamEvent(
                        out.request_id,
                        o.token_ids[-1] if o.token_ids else -1,
                        "",
                        True,
                        o.finish_reason,
                        output=out,
                    )
                )
            await asyncio.sleep(0)
