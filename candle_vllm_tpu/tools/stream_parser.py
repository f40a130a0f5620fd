"""Incremental tool/reasoning stream parser.

Reference: ``/root/reference/src/tools/stream_parser.rs`` (StreamToolParser,
ParserState Normal/Buffering, FlushBuffer false-positive handling, nested
``<think>`` tracking).  Feed text deltas; receive routed events.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

from candle_vllm_tpu.tools.parser import (
    ToolCall,
    ToolFamily,
    parse_payload,
    validate_tool_call,
)


@dataclass
class StreamEventOut:
    kind: str          # "content" | "reasoning" | "tool_calls" | "tool_call_delta"
    text: str = ""     # content/reasoning text, or argument-JSON fragment
    calls: Optional[List[ToolCall]] = None
    # tool_call_delta / tool_calls indexing (OpenAI streaming wire format:
    # the first delta of a call carries id + function.name, later deltas
    # append raw function.arguments fragments)
    index: Optional[int] = None
    call_id: Optional[str] = None
    name: Optional[str] = None
    base_index: int = 0   # for "tool_calls": index of calls[0] in the turn


def _partial_suffix(text: str, marker: str) -> int:
    """Length of the longest suffix of `text` that is a proper prefix of
    `marker` (how much to hold back)."""
    max_len = min(len(text), len(marker) - 1)
    for n in range(max_len, 0, -1):
        if marker.startswith(text[-n:]):
            return n
    return 0


def _json_incomplete(payload: str) -> bool:
    """True when a JSON-ish payload has unbalanced structure outside
    string literals — the signature of an end marker appearing INSIDE an
    argument string (reference: stream_parser.rs
    test_false_end_marker_inside_arguments_requires_confirmation /
    test_fake_end_marker_inside_parameter_keeps_buffering)."""
    s = payload.lstrip()
    if not s or s[0] not in "{[":
        return False
    depth = 0
    in_str = False
    esc = False
    for ch in s:
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch in "{[":
            depth += 1
        elif ch in "}]":
            depth -= 1
    return depth > 0 or in_str


def _pythonic_incomplete(s: str) -> bool:
    """Paren/bracket/quote balance for pythonic call payloads
    (``[f(a="x")]`` — llama4/gemma): an end marker inside an argument
    string leaves the structure open (reference: stream_parser.rs
    per-grammar false-end-marker confirmation)."""
    if not s or ("(" not in s and "[" not in s):
        return False
    depth = 0
    quote = None
    esc = False
    for ch in s:
        if quote is not None:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
    return depth > 0 or quote is not None


def _xml_incomplete(s: str, tags: Tuple[str, ...]) -> bool:
    """Open/close balance for XML-form payloads (minimax ``<invoke>``
    trees, GLM ``<arg_key>/<arg_value>`` bodies)."""
    for tag in tags:
        if s.count(f"<{tag}") > s.count(f"</{tag}>"):
            return True
    return False


def _payload_incomplete(payload: str, family: ToolFamily) -> bool:
    """Per-grammar end-marker confirmation: is this payload structurally
    unfinished (meaning the end marker we just saw sits INSIDE an
    argument)?  Dispatches on the family's wire format (reference:
    stream_parser.rs ParserState per-family buffering)."""
    s = payload.lstrip()
    if family.payload == "pythonic":
        return _pythonic_incomplete(s)
    if family.payload == "xml_invoke":
        return _xml_incomplete(s, ("invoke", "parameter"))
    if s.startswith("<") or "<arg_" in s:
        # GLM-4.7 XML body inside a json-family envelope (the body leads
        # with the function name, then <arg_key>/<arg_value> pairs)
        return _xml_incomplete(s, ("arg_key", "arg_value"))
    return _json_incomplete(payload)


@dataclass
class _CallDelta:
    index: int
    call_id: str
    name: Optional[str]   # set on the first delta of a call only
    args: str             # raw argument-text fragment ("" on the name delta)


class _JsonCallStreamer:
    """Incremental scanner over a growing JSON tool payload (one call
    object, or an array of them) that yields OpenAI-style streaming
    deltas: one name delta per call as soon as the complete ``"name"``
    string value has arrived, then raw argument-text fragments as the
    ``arguments`` value grows — so the client-side concatenation of the
    fragments is the argument JSON exactly as the model wrote it.

    Anything it cannot stream safely (non-object payload, unknown tool
    name, XML body) sets ``failed`` and the envelope-close whole-call
    path takes over.  Reference: stream_parser.rs ParserState incremental
    name/argument deltas (VERDICT r3 missing #4).
    """

    def __init__(self, args_key: str, tool_names: Optional[set],
                 base_index: int):
        self.args_key = args_key
        self.tool_names = tool_names   # None = no validation possible
        self.base_index = base_index
        self.failed = False
        self.pos = 0                   # chars of the payload consumed
        self.state = "ws_root"
        self.array = False
        # per-call state
        self._new_call()
        # fully-streamed calls: [(id, name, raw_args)]
        self.completed: List[Tuple[str, str, str]] = []
        self.emitted_any = False

    def _new_call(self):
        self.cur_id: Optional[str] = None
        self.cur_name: Optional[str] = None
        self.name_emitted = False
        self.args_done = False
        self.args_held = ""    # args chars seen before the name was known
        self.args_acc = ""     # full raw args streamed for this call
        self._key = ""
        self._str_esc = False
        self._v_depth = 0
        self._v_in_str = False
        self._v_kind = ""      # "container" | "string" | "primitive"

    # -- emission helpers --------------------------------------------------
    def _emit_name(self, out: List[_CallDelta]) -> None:
        import json as _json
        import uuid

        try:
            name = _json.loads('"' + self.cur_name + '"')
        except Exception:
            name = self.cur_name
        if self.tool_names is not None and name not in self.tool_names:
            # unknown tool: do not stream — the whole-call path will
            # reject it and build the invalid-call feedback
            self.failed = True
            return
        self.cur_name = name
        self.cur_id = f"call_{uuid.uuid4().hex[:24]}"
        self.name_emitted = True
        self.emitted_any = True
        idx = self.base_index + len(self.completed)
        out.append(_CallDelta(idx, self.cur_id, name, ""))
        if self.args_held:
            out.append(_CallDelta(idx, self.cur_id, None, self.args_held))
            self.args_held = ""

    def _emit_args(self, text: str, out: List[_CallDelta]) -> None:
        if not text:
            return
        if not self.name_emitted:
            self.args_held += text
            return
        self.emitted_any = True
        self.args_acc += text
        out.append(_CallDelta(self.base_index + len(self.completed),
                              self.cur_id, None, text))

    def _end_object(self, out: List[_CallDelta]) -> None:
        """A call object closed."""
        if self.name_emitted:
            if not self.args_done:
                # no arguments key in the object: stream the empty-object
                # form so the client's accumulated arguments stay valid
                self._emit_args("{}", out)
            self.completed.append(
                (self.cur_id, self.cur_name, self.args_acc)
            )
        elif self.args_held or self.cur_name is not None:
            # object we could not stream (e.g. no name key): fall back for
            # the rest of the envelope — order-based reconciliation still
            # matches the streamed prefix
            self.failed = True
        self._new_call()
        self.state = "ws_obj" if self.array else "root_done"

    def finalize(self) -> None:
        """Envelope text ended: a call whose name was emitted and whose
        args value closed counts as fully streamed even when the object's
        own closing brace was truncated — the client already has it."""
        if self.name_emitted and self.args_done:
            self.completed.append(
                (self.cur_id, self.cur_name, self.args_acc)
            )
            self._new_call()

    # -- the scanner ---------------------------------------------------------
    def feed(self, payload: str) -> List[_CallDelta]:
        """Consume payload[self.pos:]; return new deltas."""
        out: List[_CallDelta] = []
        if self.failed:
            return out
        i = self.pos
        n = len(payload)
        while i < n and not self.failed:
            ch = payload[i]
            st = self.state
            if st == "ws_root":
                if ch.isspace():
                    pass
                elif ch == "{":
                    self.state = "obj_key_ws"
                elif ch == "[":
                    self.array = True
                    self.state = "ws_obj"
                else:
                    self.failed = True
            elif st == "ws_obj":
                if ch.isspace() or ch == ",":
                    pass
                elif ch == "{":
                    self.state = "obj_key_ws"
                elif ch == "]":
                    self.state = "root_done"
                else:
                    self.failed = True
            elif st == "obj_key_ws":
                if ch.isspace() or ch == ",":
                    pass
                elif ch == '"':
                    self._key = ""
                    self._str_esc = False
                    self.state = "key_str"
                elif ch == "}":
                    self._end_object(out)
                else:
                    self.failed = True
            elif st == "key_str":
                if self._str_esc:
                    self._key += ch
                    self._str_esc = False
                elif ch == "\\":
                    self._key += ch
                    self._str_esc = True
                elif ch == '"':
                    self.state = "colon_ws"
                else:
                    self._key += ch
            elif st == "colon_ws":
                if ch.isspace():
                    pass
                elif ch == ":":
                    self.state = "value_ws"
                else:
                    self.failed = True
            elif st == "value_ws":
                if ch.isspace():
                    pass
                else:
                    is_name = self._key == "name"
                    is_args = self._key == self.args_key
                    self._v_in_str = False
                    self._str_esc = False
                    if is_name:
                        if ch != '"':
                            self.failed = True
                        else:
                            self.cur_name = ""
                            self.state = "name_str"
                    else:
                        self.state = "args_value" if is_args else "skip_value"
                        if ch in "{[":
                            self._v_kind = "container"
                            self._v_depth = 1
                        elif ch == '"':
                            self._v_kind = "string"
                            self._v_in_str = True
                        else:
                            self._v_kind = "primitive"
                        if is_args:
                            self._emit_args(ch, out)
            elif st == "name_str":
                if self._str_esc:
                    self.cur_name += ch
                    self._str_esc = False
                elif ch == "\\":
                    self.cur_name += ch
                    self._str_esc = True
                elif ch == '"':
                    self._emit_name(out)
                    self.state = "obj_key_ws"
                else:
                    self.cur_name += ch
            elif st in ("args_value", "skip_value"):
                emit = st == "args_value"
                done = False
                consume = True
                if self._v_kind == "primitive":
                    if ch in ",}" or ch.isspace():
                        done = True
                        consume = ch.isspace()  # , and } reprocess above
                elif self._v_in_str:
                    if self._str_esc:
                        self._str_esc = False
                    elif ch == "\\":
                        self._str_esc = True
                    elif ch == '"':
                        self._v_in_str = False
                        if self._v_kind == "string":
                            done = True
                else:
                    if ch == '"':
                        self._v_in_str = True
                    elif ch in "{[":
                        self._v_depth += 1
                    elif ch in "}]":
                        self._v_depth -= 1
                        if self._v_depth == 0:
                            done = True
                if emit and consume:
                    self._emit_args(ch, out)
                if done:
                    if emit:
                        self.args_done = True
                    self.state = "obj_key_ws"
                    if not consume:
                        continue  # reprocess ch ("," or "}") as obj_key_ws
            elif st == "root_done":
                if not ch.isspace():
                    self.failed = True
            i += 1
            self.pos = i
        if not self.failed:
            self.pos = n
        return out


class StreamToolParser:
    """State machine over text deltas.

    States: normal (pass through, watch for markers), thinking (route to
    reasoning until think_close), buffering (inside tool markup until end
    marker).  With ``stream_deltas=True`` JSON-payload envelopes also
    stream OpenAI-style incremental name/argument deltas while buffering
    (reference: stream_parser.rs ParserState streaming)."""

    def __init__(self, family: ToolFamily,
                 tools: Optional[List[Dict[str, Any]]] = None,
                 stream_deltas: bool = False,
                 start_in_thinking: bool = False):
        self.family = family
        self.tools = tools
        self.stream_deltas = stream_deltas and family.payload == "json"
        # start_in_thinking: the rendered prompt ended with the think-open
        # marker (MiniMax-style generation prompts), so the stream begins
        # INSIDE reasoning and only a close marker will arrive (reference:
        # extract_reasoning_content standalone-close arm)
        self.state = "thinking" if start_in_thinking else "normal"
        self.pending = ""     # held-back text (possible marker prefix)
        self.buffer = ""      # tool markup being accumulated
        self.tool_calls: List[ToolCall] = []
        self.errors: List[str] = []
        self._streamer: Optional[_JsonCallStreamer] = None
        # ``` code-fence parity across the CONTENT stream: a tool start
        # marker inside an open fence is documentation, not a call
        # (reference: incremental code-block tracking in normal mode +
        # code_block_state_not_corrupted_by_tool_buffer)
        self._fence_ticks = 0
        self._fence_carry = 0  # trailing backtick run carried to next chunk

    def in_code_block(self) -> bool:
        return self._fence_ticks % 2 == 1

    def _update_fences(self, s: str) -> None:
        """Count disjoint ``` fences, carrying split backtick runs."""
        if self._fence_carry:
            s = "`" * self._fence_carry + s
            self._fence_carry = 0
        import re as _re

        for m in _re.finditer(r"`+", s):
            L = len(m.group())
            self._fence_ticks += L // 3
            if m.end() == len(s):
                self._fence_carry = L % 3

    def _tool_names(self) -> Optional[set]:
        if self.tools is None:
            return None
        names = set()
        for t in self.tools:
            fn = t.get("function", t) if isinstance(t, dict) else {}
            if isinstance(fn, dict) and fn.get("name"):
                names.add(fn["name"])
        return names or None

    def _start_streamer(self) -> None:
        if self.stream_deltas:
            self._streamer = _JsonCallStreamer(
                self.family.args_key, self._tool_names(),
                base_index=len(self.tool_calls),
            )
        else:
            self._streamer = None

    def _drain_streamer(self, events: List[StreamEventOut]) -> None:
        sc = self._streamer
        if sc is None or sc.failed:
            return
        for d in sc.feed(self.buffer):
            events.append(StreamEventOut(
                "tool_call_delta", text=d.args, index=d.index,
                call_id=d.call_id, name=d.name,
            ))

    # -- helpers -------------------------------------------------------------
    def _watch_markers(self) -> List[str]:
        markers = [self.family.think_open]
        if self.family.start:
            markers.append(self.family.start)
        return markers

    def feed(self, delta: str) -> List[StreamEventOut]:
        events: List[StreamEventOut] = []
        text = self.pending + delta
        self.pending = ""
        while text:
            if self.state == "normal":
                text = self._feed_normal(text, events)
            elif self.state == "thinking":
                text = self._feed_until(
                    text, self.family.think_close, "reasoning", events
                )
            else:  # buffering tool markup
                text = self._feed_tool(text, events)
        return events

    def _feed_normal(self, text: str, events: List[StreamEventOut]) -> str:
        # earliest full marker occurrence wins
        hits: List[Tuple[int, str]] = []
        for m in self._watch_markers():
            i = text.find(m)
            if i != -1:
                hits.append((i, m))
        if hits:
            i, m = min(hits)
            self._update_fences(text[:i])
            if m == self.family.start and self.in_code_block():
                # the start marker sits inside an open ``` fence: it is
                # literal content (model-written documentation), not a
                # call — pass it through and keep scanning
                events.append(StreamEventOut("content", text[: i + len(m)]))
                return text[i + len(m):]
            if i > 0:
                events.append(StreamEventOut("content", text[:i]))
            rest = text[i + len(m):]
            if m == self.family.think_open:
                self.state = "thinking"
            else:
                self.state = "buffering"
                self.buffer = ""
                self._start_streamer()
            return rest
        # hold back a partial marker suffix
        hold = max(_partial_suffix(text, m) for m in self._watch_markers())
        emit = text[: len(text) - hold] if hold else text
        self.pending = text[len(text) - hold:] if hold else ""
        if emit:
            self._update_fences(emit)
            events.append(StreamEventOut("content", emit))
        return ""

    def _feed_until(
        self, text: str, close: str, kind: str, events: List[StreamEventOut]
    ) -> str:
        i = text.find(close)
        if i != -1:
            if i > 0:
                events.append(StreamEventOut(kind, text[:i]))
            self.state = "normal"
            return text[i + len(close):]
        hold = _partial_suffix(text, close)
        emit = text[: len(text) - hold] if hold else text
        self.pending = text[len(text) - hold:] if hold else ""
        if emit:
            events.append(StreamEventOut(kind, emit))
        return ""

    def _feed_tool(self, text: str, events: List[StreamEventOut]) -> str:
        end = self.family.end
        if not end:
            # endless families (mistral): buffer to EOS; finish() parses
            self.buffer += text
            self._drain_streamer(events)
            return ""
        i = text.find(end)
        if i == -1:
            hold = _partial_suffix(text, end)
            self.buffer += text[: len(text) - hold] if hold else text
            self.pending = text[len(text) - hold:] if hold else ""
            self._drain_streamer(events)
            return ""
        candidate = self.buffer + text[:i]
        if _payload_incomplete(candidate, self.family):
            # end marker sits INSIDE an argument string (unbalanced JSON):
            # consume it into the buffer and wait for a confirmed end
            # (reference: false_end_marker_inside_arguments)
            self.buffer = candidate + end
            self._drain_streamer(events)
            return text[i + len(end):]
        self.buffer = candidate
        rest = text[i + len(end):]
        self._drain_streamer(events)
        self._emit_calls(self.buffer, events)
        self.buffer = ""
        self.state = "normal"
        return rest

    def _emit_calls(self, payload: str, events: List[StreamEventOut]) -> None:
        calls = parse_payload(payload, self.family)
        # reconcile with incrementally-streamed deltas: the first
        # len(completed) parsed calls were already delivered (same text,
        # same order) — take their ids, validate, record, but do NOT
        # re-emit them as whole calls
        sc = self._streamer
        self._streamer = None
        if sc is not None:
            sc.finalize()
        n_streamed = 0
        if sc is not None and sc.completed:
            if len(calls) < len(sc.completed):
                # the envelope text failed to parse whole (e.g. truncated
                # trailing object) but these calls were already streamed
                # complete — reconstruct them from the streamed record so
                # finish_reason/usage see what the client saw
                calls = [
                    ToolCall(name=name, arguments=args, id=cid)
                    for cid, name, args in sc.completed
                ] + calls[len(sc.completed):]
            n_streamed = len(sc.completed)
            for c, (cid, _name, _args) in zip(calls[:n_streamed],
                                              sc.completed):
                c.id = cid
                err = validate_tool_call(c, self.tools)
                if err is None:
                    self.tool_calls.append(c)
                else:
                    # the client already saw the streamed deltas; record
                    # the error for invalid-call feedback anyway
                    self.errors.append(err)
            calls = calls[n_streamed:]
        valid = []
        for c in calls:
            err = validate_tool_call(c, self.tools)
            if err is None:
                valid.append(c)
            else:
                self.errors.append(err)
        if valid:
            base = len(self.tool_calls)
            self.tool_calls.extend(valid)
            events.append(
                StreamEventOut("tool_calls", calls=valid, base_index=base)
            )
        elif not calls and not n_streamed and not (
            sc is not None and sc.emitted_any
        ):
            # false positive: flush the raw markup back as content
            # (reference: StreamResult::FlushBuffer).  The flushed text
            # joins the content stream, so fence parity must include it
            # (reference: resync_reasoning_and_code_block_state after a
            # buffering exit); reasoning markers inside it stay literal —
            # state returns to normal regardless.
            self._update_fences(payload)
            events.append(
                StreamEventOut(
                    "content",
                    f"{self.family.start}{payload}{self.family.end}",
                )
            )

    def finish(self) -> List[StreamEventOut]:
        """Flush at end-of-generation."""
        events: List[StreamEventOut] = []
        if self.state == "buffering" and self.buffer:
            self.buffer += self.pending
            self._drain_streamer(events)
            self._emit_calls(self.buffer, events)
            self.buffer = ""
        elif self.state == "thinking":
            if self.pending:
                events.append(StreamEventOut("reasoning", self.pending))
        elif self.pending:
            events.append(StreamEventOut("content", self.pending))
        self.pending = ""
        self.state = "normal"
        return events

    @property
    def finish_reason(self) -> Optional[str]:
        return "tool_calls" if self.tool_calls else None
