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
    kind: str          # "content" | "reasoning" | "tool_calls"
    text: str = ""
    calls: Optional[List[ToolCall]] = None


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


class StreamToolParser:
    """State machine over text deltas.

    States: normal (pass through, watch for markers), thinking (route to
    reasoning until think_close), buffering (inside tool markup until end
    marker)."""

    def __init__(self, family: ToolFamily, tools: Optional[List[Dict[str, Any]]] = None):
        self.family = family
        self.tools = tools
        self.state = "normal"
        self.pending = ""     # held-back text (possible marker prefix)
        self.buffer = ""      # tool markup being accumulated
        self.tool_calls: List[ToolCall] = []
        self.errors: List[str] = []

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
            if i > 0:
                events.append(StreamEventOut("content", text[:i]))
            rest = text[i + len(m):]
            if m == self.family.think_open:
                self.state = "thinking"
            else:
                self.state = "buffering"
                self.buffer = ""
            return rest
        # hold back a partial marker suffix
        hold = max(_partial_suffix(text, m) for m in self._watch_markers())
        emit = text[: len(text) - hold] if hold else text
        self.pending = text[len(text) - hold:] if hold else ""
        if emit:
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
            return ""
        i = text.find(end)
        if i == -1:
            hold = _partial_suffix(text, end)
            self.buffer += text[: len(text) - hold] if hold else text
            self.pending = text[len(text) - hold:] if hold else ""
            return ""
        candidate = self.buffer + text[:i]
        if _payload_incomplete(candidate, self.family):
            # end marker sits INSIDE an argument string (unbalanced JSON):
            # consume it into the buffer and wait for a confirmed end
            # (reference: false_end_marker_inside_arguments)
            self.buffer = candidate + end
            return text[i + len(end):]
        self.buffer = candidate
        rest = text[i + len(end):]
        self._emit_calls(self.buffer, events)
        self.buffer = ""
        self.state = "normal"
        return rest

    def _emit_calls(self, payload: str, events: List[StreamEventOut]) -> None:
        calls = parse_payload(payload, self.family)
        valid = []
        for c in calls:
            err = validate_tool_call(c, self.tools)
            if err is None:
                valid.append(c)
            else:
                self.errors.append(err)
        if valid:
            self.tool_calls.extend(valid)
            events.append(StreamEventOut("tool_calls", calls=valid))
        elif not calls:
            # false positive: flush the raw markup back as content
            # (reference: StreamResult::FlushBuffer)
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
            self._emit_calls(self.buffer + self.pending, events)
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
