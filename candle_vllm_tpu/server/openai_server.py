"""OpenAI-compatible HTTP server on aiohttp.

Re-designs ``/root/reference/src/openai/openai_server.rs`` (axum routes,
SSE streaming via ``src/openai/streaming.rs``): chat-template rendering,
token-length validation, KV admission control with prefix-cache-aware
eviction, request intake into the async engine, and SSE emission with the
``[DONE]`` sentinel, keep-alive, and disconnect-driven aborts.
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid
from typing import Any, AsyncIterator, Dict, List, Optional, Tuple, Union

from aiohttp import web

from candle_vllm_tpu.engine.async_engine import AsyncLLMEngine, StreamEvent
from candle_vllm_tpu.engine.llm_engine import RequestOutput
from candle_vllm_tpu.sampling_params import SamplingParams
from candle_vllm_tpu.server.api_types import (
    APIError,
    APIErrorResponse,
    ChatChoice,
    ChatChoiceMessage,
    ChatChunkChoice,
    ChatCompletionChunk,
    ChatCompletionRequest,
    ChatCompletionResponse,
    ChatMessage,
    CompletionChoice,
    CompletionRequest,
    CompletionResponse,
    CompletionTokensDetails,
    DeltaMessage,
    EmbeddingObject,
    EmbeddingsRequest,
    EmbeddingsResponse,
    ModelCard,
    ModelList,
    PromptTokensDetails,
    Usage,
)
from candle_vllm_tpu.server.chat_template import ChatTemplate, TemplateError
from candle_vllm_tpu.tools import (
    StreamToolParser,
    family_for_model,
    parse_complete,
    build_invalid_call_feedback,
    filter_forced_calls,
    validate_tool_call,
)

import os as _os

# env knobs (reference: KEEP_ALIVE_INTERVAL / CANDLE_VLLM_SSE_BUFFER_SIZE,
# openai_server.rs:363-431)
KEEPALIVE_SECS = float(_os.environ.get("CVT_KEEP_ALIVE_INTERVAL", "10"))
MIN_DECODE_RESERVE = int(
    _os.environ.get("CVT_MIN_DECODE_RESERVE", "4096")
)  # reference: openai_server.rs admission reserve


def delta_for_parser_event(pe, forced_tool=None) -> Optional[DeltaMessage]:
    """Map one StreamToolParser event to an OpenAI streaming delta.

    tool_call_delta events follow the OpenAI wire format: the first delta
    of a call carries index + id + type + function.name (with arguments
    ""), later deltas carry index + a function.arguments fragment
    (reference: stream_parser.rs ParserState streaming deltas)."""
    if pe.kind == "content" and pe.text:
        return DeltaMessage(content=pe.text)
    if pe.kind == "reasoning" and pe.text:
        return DeltaMessage(reasoning_content=pe.text)
    if pe.kind == "tool_call_delta":
        fn: Dict[str, Any] = {}
        if pe.name is not None:
            fn["name"] = pe.name
            fn["arguments"] = pe.text or ""
        elif pe.text:
            fn["arguments"] = pe.text
        tc: Dict[str, Any] = {"index": pe.index, "function": fn}
        if pe.name is not None:
            tc["id"] = pe.call_id
            tc["type"] = "function"
        return DeltaMessage(tool_calls=[tc])
    if pe.kind == "tool_calls":
        kept = filter_forced_calls(list(pe.calls or []), forced_tool)
        if not kept:
            return None
        return DeltaMessage(
            tool_calls=[
                {**c.to_openai(), "index": pe.base_index + i}
                for i, c in enumerate(kept)
            ]
        )
    return None


class ServerState:
    def __init__(
        self,
        async_engine: AsyncLLMEngine,
        model_name: str,
        chat_template: ChatTemplate,
        mcp_manager=None,
        tool_parser: str = None,
    ):
        self.async_engine = async_engine
        self.engine = async_engine.engine
        self.model_name = model_name
        self.chat_template = chat_template
        self.tokenizer = self.engine.tokenizer
        self.mcp_manager = mcp_manager
        # forced tool-parser family (reference: --enforce-parser,
        # main.rs:176); None = infer from model_type
        self.tool_family = family_for_model(
            tool_parser or self.engine.model_config.model_type
        )
        # reasoning-scaffold repair for replayed assistant turns
        # (reference: conversation/mod.rs RenderedPromptRepairer)
        from candle_vllm_tpu.server.prompt_repair import PromptRepairer

        self.prompt_repairer = PromptRepairer.from_template(
            getattr(chat_template, "source", None),
            eos_token=getattr(chat_template, "eos_token", None) or None,
        )


def _error(status: int, message: str, type_: str = "invalid_request_error"):
    return web.json_response(
        APIErrorResponse(error=APIError(message=message, type=type_)).model_dump(),
        status=status,
    )


def _sampling_from_chat(
    req: ChatCompletionRequest, max_model_len: int, prompt_len: int,
    gen_defaults: Optional[dict] = None,
) -> SamplingParams:
    max_tokens = req.max_tokens or req.max_completion_tokens
    if max_tokens is None:
        max_tokens = max(max_model_len - prompt_len, 1)
    # unset request fields inherit the checkpoint's generation_config.json
    # (reference: openai_server.rs:329-359), then the API defaults
    gd = gen_defaults or {}

    def pick(value, key, fallback):
        if value is not None:
            return value
        return gd.get(key, fallback)

    return SamplingParams(
        n=req.n,
        presence_penalty=pick(req.presence_penalty, "presence_penalty", 0.0),
        frequency_penalty=pick(req.frequency_penalty, "frequency_penalty", 0.0),
        repetition_penalty=pick(req.repetition_penalty,
                                "repetition_penalty", 1.0),
        temperature=pick(req.temperature, "temperature", 0.7),
        top_p=pick(req.top_p, "top_p", 1.0),
        top_k=pick(req.top_k, "top_k", -1),
        min_p=pick(req.min_p, "min_p", 0.0),
        seed=req.seed,
        stop=req.stop,
        ignore_eos=req.ignore_eos,
        max_tokens=max_tokens,
        logprobs=(req.top_logprobs or 1) if req.logprobs else None,
        skip_special_tokens=req.skip_special_tokens,
        decode_steps=getattr(req, "decode_steps", None),
    )


def _check_length(
    prompt_ids: List[int], max_tokens: int, max_model_len: int
) -> Optional[str]:
    """Reference: check_length, openai_server.rs:111-144."""
    if len(prompt_ids) >= max_model_len:
        return (
            f"prompt ({len(prompt_ids)} tokens) is longer than "
            f"max_model_len ({max_model_len})"
        )
    if len(prompt_ids) + max_tokens > max_model_len:
        return (
            f"prompt ({len(prompt_ids)}) + max_tokens ({max_tokens}) exceeds "
            f"max_model_len ({max_model_len}); reduce max_tokens"
        )
    return None


def _admission_check(
    state: ServerState, prompt_ids: List[int], seed: int = 0
) -> Optional[Tuple[int, str]]:
    """KV admission control (reference: openai_server.rs:239-326): query
    the prefix cache for the part of the prompt already resident, then
    require the *new* prompt tokens plus a decode reserve to fit in
    free-or-evictable KV blocks.  Physically-impossible requests get a
    400; an overloaded cache gets a 503 instead of queueing unboundedly.
    Returns (status_code, message) on rejection."""
    eng = state.engine
    be = eng.block_engine
    block = eng.cache_config.block_size
    prompt_len = len(prompt_ids)
    reserve = min(
        MIN_DECODE_RESERVE, eng.scheduler_config.max_model_len - prompt_len
    )
    needed_blocks = (prompt_len + reserve + block - 1) // block
    if needed_blocks > be.gpu_allocator.num_blocks:
        return 400, (
            f"request needs {needed_blocks} KV blocks but the cache has "
            f"{be.gpu_allocator.num_blocks}"
        )
    cached = 0
    if eng.scheduler_config.enable_prefix_caching:
        cached = be.prefix_cache.match_tokens(list(prompt_ids), block, seed=seed)
    new_blocks = (prompt_len - cached + reserve + block - 1) // block
    # get_num_free counts evictable prefix blocks too (the allocator
    # reclaims them on demand — the reference's explicit evict loop,
    # ensure_available_kv_tokens, is subsumed by that accounting)
    free = be.get_num_free_gpu_blocks()
    if new_blocks > free:
        return 503, (
            f"KV cache overloaded: request needs {new_blocks} new blocks "
            f"({cached} prompt tokens already cached) but only {free} are "
            "free or evictable; retry later"
        )
    return None


def _usage(out: RequestOutput) -> Usage:
    m = out.metrics
    completion = sum(len(o.token_ids) for o in out.outputs)
    prompt_ms = None
    completion_ms = None
    if m.first_token_time is not None:
        prompt_ms = int((m.first_token_time - m.arrival_time) * 1e3)
        if m.finished_time is not None:
            completion_ms = int((m.finished_time - m.first_token_time) * 1e3)
    return Usage(
        prompt_tokens=m.prompt_tokens,
        completion_tokens=completion,
        total_tokens=m.prompt_tokens + completion,
        prompt_time_costs=prompt_ms,
        completion_time_costs=completion_ms,
        prompt_tokens_details=PromptTokensDetails(cached_tokens=m.cached_tokens),
        completion_tokens_details=CompletionTokensDetails(reasoning_tokens=0),
    )


# ---------------------------------------------------------------------------
# handlers
# ---------------------------------------------------------------------------



def _flatten_image_parts(messages):
    """Flatten OpenAI list-content messages: text parts concatenate, image
    parts become IMAGE_PLACEHOLDER markers; returns (messages, sources)
    (reference: multimodal.rs get_image_data + conversation content
    flattening)."""
    from candle_vllm_tpu.multimodal.processor import IMAGE_PLACEHOLDER

    sources: List[str] = []
    out = []
    for m in messages:
        c = m.get("content")
        if isinstance(c, list):
            text = []
            for part in c:
                t = part.get("type")
                if t == "text":
                    text.append(part.get("text", ""))
                elif t == "image_url":
                    url = part.get("image_url")
                    url = url.get("url") if isinstance(url, dict) else url
                    sources.append(url)
                    text.append(IMAGE_PLACEHOLDER)
            m = dict(m, content="".join(text))
        out.append(m)
    return out, sources


def _process_images(state: "ServerState", sources: List[str], prompt: str):
    """Decode + patchify request images and expand the prompt's
    placeholders into <vision_start><image_pad>*N<vision_end> runs."""
    from candle_vllm_tpu.multimodal.processor import (
        get_image_processor,
        load_image,
    )

    mc = state.engine.model_config
    if mc.vision is None:
        raise ValueError(
            f"model {mc.architecture} does not accept image input"
        )
    proc = get_image_processor(mc)
    images = [load_image(s) for s in sources]
    return proc.process(images, prompt)


async def chat_completions(request: web.Request) -> web.StreamResponse:
    state: ServerState = request.app["state"]
    try:
        body = await request.json()
        req = ChatCompletionRequest.model_validate(body)
    except Exception as e:
        return _error(400, f"invalid request: {e}")

    # request tools + cached MCP tools (request wins on a name clash —
    # reference: helpers.rs test_resolve_tools_prefers_request), then
    # tool_choice resolution (openai/mod.rs:187-247)
    if state.mcp_manager is not None and state.mcp_manager.cached_tools:
        have = {
            (t.get("function") or {}).get("name")
            for t in (req.tools or [])
        }
        req.tools = (req.tools or []) + [
            t for t in state.mcp_manager.cached_tools
            if (t.get("function") or {}).get("name") not in have
        ]
    from candle_vllm_tpu.tools.parser import resolve_tool_choice

    try:
        resolved_tools, tc_mode, forced_tool = resolve_tool_choice(
            req.tools, req.tool_choice
        )
    except ValueError as e:
        return _error(400, str(e))
    req.tools = resolved_tools or None
    messages, image_srcs = _flatten_image_parts(
        [m.model_dump(exclude_none=True) for m in req.messages]
    )
    # replayed assistant turns: strip stale <think> blocks and mask raw
    # tool-markup envelopes so neither re-enters the prompt (reference:
    # stream_parser.rs strip_reasoning_blocks / mask_tool_envelopes;
    # conversation history handling in conversation/mod.rs)
    from candle_vllm_tpu.tools.parser import (
        detect_prefilled_reasoning,
        mask_tool_envelopes,
        strip_reasoning_blocks,
    )

    fam = state.tool_family
    for m in messages:
        if m.get("role") == "assistant" and isinstance(m.get("content"), str):
            raw = m["content"]
            cleaned = strip_reasoning_blocks(raw, fam)
            # templates that re-render reasoning (e.g. MiniMax) consume
            # message.reasoning_content — extract it rather than lose it
            # (reference: reasoning_content_extracted_from_assistant_
            # content, default_conversation.rs:893-940)
            if cleaned != raw and not m.get("reasoning_content"):
                o, c = fam.think_open, fam.think_close
                i, j = raw.find(o), raw.find(c)
                if 0 <= i < j:
                    m["reasoning_content"] = raw[i + len(o): j].strip("\n")
            # keep markup when the turn carries structured tool_calls —
            # the template renders those itself
            if not m.get("tool_calls"):
                cleaned = mask_tool_envelopes(cleaned, fam)
            m["content"] = cleaned
    try:
        prompt = state.chat_template.render(
            messages,
            add_generation_prompt=True,
            tools=req.tools,
            **(req.chat_template_kwargs or {}),
        )
    except TemplateError as e:
        return _error(400, f"chat template error: {e}")

    if (
        state.prompt_repairer is not None
        and state.prompt_repairer.has_reasoning_scaffold
    ):
        repaired = state.prompt_repairer.repair(prompt)
        if repaired is not None:
            prompt = repaired
    mm = None
    if image_srcs:
        try:
            mm, prompt = _process_images(state, image_srcs, prompt)
        except Exception as e:
            return _error(400, f"image input error: {e}")
    prompt_ids = state.tokenizer.encode(prompt)
    max_model_len = state.engine.scheduler_config.max_model_len
    sp = _sampling_from_chat(
        req, max_model_len, len(prompt_ids),
        gen_defaults=state.engine.model_config.generation_defaults,
    )
    err = _check_length(prompt_ids, sp.max_tokens, max_model_len)
    if err is not None:
        return _error(400, err)
    rej = _admission_check(state, prompt_ids, seed=mm.seed if mm else 0)
    if rej is not None:
        return _error(rej[0], rej[1])
    if sp.n != 1 and req.stream:
        return _error(400, "streaming with n>1 is not supported")

    request_id = f"chatcmpl-{uuid.uuid4().hex[:24]}"
    if req.stream:
        # a generation prompt ending in the think-open marker (MiniMax
        # style) means the stream starts INSIDE reasoning; only the close
        # marker will arrive (reference: extract_reasoning_content
        # standalone-close arm)
        return await _stream_chat(
            request, state, request_id, prompt_ids, sp, req, mm=mm,
            forced_tool=forced_tool,
            start_in_thinking=detect_prefilled_reasoning(
                prompt, state.tool_family
            ),
        )

    out = await state.async_engine.generate(
        request_id, prompt=None, prompt_token_ids=prompt_ids,
        sampling_params=sp, mm_inputs=mm,
    )
    family = state.tool_family
    choices = []
    for i, o in enumerate(out.outputs):
        content, reasoning, calls = parse_complete(o.text, family)
        calls = filter_forced_calls(calls, forced_tool)
        valid, invalid = [], []
        for c in calls:
            err = validate_tool_call(c, req.tools)
            if err is None:
                valid.append(c)
            else:
                invalid.append((c, err))
        calls = valid
        if invalid and not calls:
            # schema feedback to the client (reference: helpers.rs
            # build_invalid_tool_call_feedback)
            fb = build_invalid_call_feedback(invalid, req.tools, forced_tool)
            content = ((content + "\n\n") if content else "") + (fb or "")
        logprobs = None
        if req.logprobs and o.logprobs:
            logprobs = {
                "content": [
                    {
                        "token": state.tokenizer.decode([lp["token"]]),
                        "logprob": lp["logprob"],
                        "top_logprobs": [
                            {
                                "token": state.tokenizer.decode([tid]),
                                "logprob": tlp,
                            }
                            for tid, tlp in lp["top"].items()
                        ],
                    }
                    for lp in o.logprobs
                ]
            }
        choices.append(
            ChatChoice(
                index=i,
                message=ChatChoiceMessage(
                    role="assistant",
                    content=content or None,
                    reasoning_content=reasoning,
                    tool_calls=[c.to_openai() for c in calls] or None,
                ),
                finish_reason="tool_calls" if calls else o.finish_reason,
                logprobs=logprobs,
            )
        )
    usage = _usage(out)
    # reasoning token accounting (reference: responses.rs
    # completion_tokens_details.reasoning_tokens): re-encode the routed
    # reasoning text — cheap relative to generation
    r_toks = sum(
        len(state.tokenizer.encode(c.message.reasoning_content))
        for c in choices
        if c.message.reasoning_content
    )
    if r_toks:
        usage.completion_tokens_details = CompletionTokensDetails(
            reasoning_tokens=r_toks
        )
    resp = ChatCompletionResponse(
        id=request_id,
        model=req.model or state.model_name,
        choices=choices,
        usage=usage,
    )
    return web.json_response(resp.model_dump())


async def _stream_chat(
    request: web.Request,
    state: ServerState,
    request_id: str,
    prompt_ids: List[int],
    sp: SamplingParams,
    req: ChatCompletionRequest,
    mm=None,
    forced_tool=None,
    start_in_thinking: bool = False,
) -> web.StreamResponse:
    response = web.StreamResponse(
        status=200,
        headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
            "Connection": "keep-alive",
        },
    )
    await response.prepare(request)
    model = req.model or state.model_name
    include_usage = bool(req.stream_options and req.stream_options.include_usage)

    async def send(obj) -> None:
        await response.write(
            b"data: " + json.dumps(obj.model_dump(exclude_none=True)).encode() + b"\n\n"
        )

    # role-start chunk (reference: streaming.rs role chunk)
    await send(
        ChatCompletionChunk(
            id=request_id,
            model=model,
            choices=[ChatChunkChoice(index=0, delta=DeltaMessage(role="assistant"))],
        )
    )

    stream = await state.async_engine.add_request(
        request_id, prompt_token_ids=prompt_ids, sampling_params=sp,
        mm_inputs=mm,
    )
    family = state.tool_family
    # incremental name/argument deltas (reference: stream_parser.rs
    # ParserState streaming) — disabled under a forced tool_choice, where
    # non-matching calls must be filtered before the client sees them
    parser = StreamToolParser(family, req.tools,
                              stream_deltas=forced_tool is None,
                              start_in_thinking=start_in_thinking)
    final: Optional[RequestOutput] = None
    reasoning_chars = [0]

    async def send_events(events) -> None:
        for pe in events:
            if pe.kind == "reasoning" and pe.text:
                reasoning_chars[0] += len(pe.text)
            delta = delta_for_parser_event(pe, forced_tool)
            if delta is None:
                continue
            await send(
                ChatCompletionChunk(
                    id=request_id,
                    model=model,
                    choices=[ChatChunkChoice(index=0, delta=delta)],
                )
            )

    try:
        it = stream.__aiter__()
        while True:
            try:
                ev: StreamEvent = await asyncio.wait_for(
                    it.__anext__(), timeout=KEEPALIVE_SECS
                )
            except asyncio.TimeoutError:
                await response.write(b": keep-alive\n\n")
                continue
            except StopAsyncIteration:
                break
            if ev.finished:
                final = ev.output
                await send_events(parser.finish())
                reason = parser.finish_reason or ev.finish_reason
                await send(
                    ChatCompletionChunk(
                        id=request_id,
                        model=model,
                        choices=[
                            ChatChunkChoice(
                                index=0,
                                delta=DeltaMessage(),
                                finish_reason=reason,
                            )
                        ],
                    )
                )
            elif ev.text_delta:
                await send_events(parser.feed(ev.text_delta))
        if include_usage and final is not None:
            usage = _usage(final)
            if reasoning_chars[0] and final.outputs:
                # chars routed to reasoning / chars total scales the
                # completion token count (token-exact re-encode would
                # double-tokenize the stream)
                total_chars = max(len(final.outputs[0].text), 1)
                frac = min(reasoning_chars[0] / total_chars, 1.0)
                usage.completion_tokens_details = CompletionTokensDetails(
                    reasoning_tokens=int(round(usage.completion_tokens * frac))
                )
            await send(
                ChatCompletionChunk(
                    id=request_id, model=model, choices=[], usage=usage
                )
            )
        await response.write(b"data: [DONE]\n\n")
    except (ConnectionResetError, asyncio.CancelledError):
        # client went away mid-stream: abort generation
        # (reference: llm_engine.rs:265-311 disconnect detection)
        state.async_engine.abort(request_id)
        raise
    await response.write_eof()
    return response


async def completions(request: web.Request) -> web.StreamResponse:
    state: ServerState = request.app["state"]
    try:
        req = CompletionRequest.model_validate(await request.json())
    except Exception as e:
        return _error(400, f"invalid request: {e}")

    prompts: List[List[int]] = []
    raw = req.prompt
    if isinstance(raw, str):
        prompts = [state.tokenizer.encode(raw)]
    elif raw and isinstance(raw[0], int):
        prompts = [list(raw)]  # type: ignore[arg-type]
    elif raw and isinstance(raw[0], str):
        prompts = [state.tokenizer.encode(p) for p in raw]  # type: ignore[union-attr]
    else:
        prompts = [list(p) for p in raw]  # type: ignore[union-attr]

    max_model_len = state.engine.scheduler_config.max_model_len
    gd = state.engine.model_config.generation_defaults or {}
    sp = SamplingParams(
        temperature=req.temperature if req.temperature is not None
        else gd.get("temperature", 0.7),
        top_p=req.top_p if req.top_p is not None else gd.get("top_p", 1.0),
        top_k=req.top_k if req.top_k is not None else gd.get("top_k", -1),
        presence_penalty=req.presence_penalty
        if req.presence_penalty is not None
        else gd.get("presence_penalty", 0.0),
        frequency_penalty=req.frequency_penalty
        if req.frequency_penalty is not None
        else gd.get("frequency_penalty", 0.0),
        stop=req.stop,
        seed=req.seed,
        ignore_eos=req.ignore_eos,
        max_tokens=req.max_tokens or 256,
    )
    for ids in prompts:
        err = _check_length(ids, sp.max_tokens, max_model_len)
        if err:
            return _error(400, err)

    outs = await asyncio.gather(
        *(
            state.async_engine.generate(
                f"cmpl-{uuid.uuid4().hex[:16]}", prompt_token_ids=ids,
                sampling_params=sp,
            )
            for ids in prompts
        )
    )
    choices = []
    usage = Usage()
    for i, out in enumerate(outs):
        o = out.outputs[0]
        text = o.text
        if req.echo:
            text = state.tokenizer.decode(out.prompt_token_ids) + text
        choices.append(
            CompletionChoice(index=i, text=text, finish_reason=o.finish_reason)
        )
        u = _usage(out)
        usage.prompt_tokens += u.prompt_tokens
        usage.completion_tokens += u.completion_tokens
        usage.total_tokens += u.total_tokens
    resp = CompletionResponse(
        model=req.model or state.model_name, choices=choices, usage=usage
    )
    return web.json_response(resp.model_dump())


async def embeddings(request: web.Request) -> web.Response:
    state: ServerState = request.app["state"]
    try:
        req = EmbeddingsRequest.model_validate(await request.json())
    except Exception as e:
        return _error(400, f"invalid request: {e}")

    raw = req.input
    if isinstance(raw, str):
        inputs = [state.tokenizer.encode(raw)]
    elif raw and isinstance(raw[0], int):
        inputs = [list(raw)]  # type: ignore[arg-type]
    elif raw and isinstance(raw[0], str):
        inputs = [state.tokenizer.encode(p) for p in raw]  # type: ignore[union-attr]
    else:
        inputs = [list(p) for p in raw]  # type: ignore[union-attr]
    max_model_len = state.engine.scheduler_config.max_model_len
    for ids in inputs:
        if not ids:
            return _error(400, "empty embedding input")
        if len(ids) > max_model_len:
            return _error(400, f"input ({len(ids)} tokens) exceeds max_model_len")

    try:
        vecs = await state.async_engine.embed(inputs, pooling=req.pooling)
    except ValueError as e:
        return _error(400, str(e))
    data = []
    for i, v in enumerate(vecs):
        if req.encoding_format == "base64":
            import base64

            import numpy as np

            emb = base64.b64encode(
                np.asarray(v, np.float32).tobytes()
            ).decode()
        else:
            emb = [float(f) for f in v]
        data.append(EmbeddingObject(index=i, embedding=emb))
    total = sum(len(ids) for ids in inputs)
    resp = EmbeddingsResponse(
        data=data,
        model=req.model or state.model_name,
        usage=Usage(prompt_tokens=total, total_tokens=total),
    )
    return web.json_response(resp.model_dump())


async def list_models(request: web.Request) -> web.Response:
    state: ServerState = request.app["state"]
    return web.json_response(
        ModelList(data=[ModelCard(id=state.model_name)]).model_dump()
    )


async def health(request: web.Request) -> web.Response:
    return web.json_response({"status": "ok"})


async def metrics(request: web.Request) -> web.Response:
    state: ServerState = request.app["state"]
    eng = state.engine
    body = eng.stats.prometheus(
        eng.kv_usage(), len(eng.scheduler.running), len(eng.scheduler.waiting)
    )
    return web.Response(text=body, content_type="text/plain")


def build_app(state: ServerState) -> web.Application:
    app = web.Application()
    app["state"] = state
    app.router.add_post("/v1/chat/completions", chat_completions)
    app.router.add_post("/v1/completions", completions)
    app.router.add_post("/v1/embeddings", embeddings)
    app.router.add_get("/v1/models", list_models)
    app.router.add_get("/health", health)
    app.router.add_get("/metrics", metrics)

    from candle_vllm_tpu.server.ui import ui_page

    app.router.add_get("/ui", ui_page)

    # MCP server endpoint: the engine exposed as MCP tools over HTTP
    # JSON-RPC (reference implements an MCP server in src/mcp/server.rs)
    from candle_vllm_tpu.mcp.server import MCPServer

    mcp_srv = MCPServer(name=f"candle-vllm-tpu/{state.model_name}")

    async def _mcp_generate(args):
        import uuid

        out = await state.async_engine.generate(
            f"mcp-{uuid.uuid4().hex[:8]}",
            prompt=args.get("prompt", ""),
            sampling_params=SamplingParams(
                temperature=float(args.get("temperature", 0.0)),
                max_tokens=int(args.get("max_tokens", 256)),
            ),
        )
        return out.outputs[0].text

    mcp_srv.register_tool(
        "generate",
        f"Generate a completion with {state.model_name}",
        {
            "type": "object",
            "properties": {
                "prompt": {"type": "string"},
                "max_tokens": {"type": "integer"},
                "temperature": {"type": "number"},
            },
            "required": ["prompt"],
        },
        _mcp_generate,
    )

    async def mcp_endpoint(request: web.Request) -> web.Response:
        try:
            msg = await request.json()
        except Exception:
            return web.json_response(
                {"jsonrpc": "2.0", "id": None,
                 "error": {"code": -32700, "message": "parse error"}},
                status=400,
            )
        resp = await mcp_srv.handle(msg)
        if resp is None:  # notification
            return web.Response(status=202)
        return web.json_response(resp)

    app.router.add_post("/mcp", mcp_endpoint)

    async def on_startup(app):
        await state.async_engine.start()
        if state.mcp_manager is not None:
            await state.mcp_manager.start()

    async def on_cleanup(app):
        await state.async_engine.stop()
        if state.mcp_manager is not None:
            await state.mcp_manager.close()

    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)
    return app
