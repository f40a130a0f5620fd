"""Tool-call parsing: complete-output parse, streaming state machine with
split markers, think-routing, validation, false positives."""

import json

import pytest

from candle_vllm_tpu.tools import (
    StreamToolParser,
    ToolCall,
    family_for_model,
    parse_complete,
    validate_tool_call,
)

CHATML = family_for_model("qwen3")
LLAMA = family_for_model("llama")
MISTRAL = family_for_model("mistral")

TOOLS = [
    {
        "type": "function",
        "function": {
            "name": "get_weather",
            "parameters": {
                "type": "object",
                "properties": {"city": {"type": "string"}},
                "required": ["city"],
            },
        },
    }
]


def collect(parser, chunks):
    events = []
    for c in chunks:
        events.extend(parser.feed(c))
    events.extend(parser.finish())
    return events


def test_parse_complete_chatml():
    text = (
        "Let me check.\n<tool_call>\n"
        '{"name": "get_weather", "arguments": {"city": "Paris"}}\n'
        "</tool_call>"
    )
    content, reasoning, calls = parse_complete(text, CHATML)
    assert content == "Let me check."
    assert reasoning is None
    assert len(calls) == 1
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Paris"}


def test_parse_complete_think():
    text = "<think>chain of thought</think>The answer is 4."
    content, reasoning, calls = parse_complete(text, CHATML)
    assert reasoning == "chain of thought"
    assert content == "The answer is 4."
    assert calls == []


def test_parse_complete_llama_bare_json():
    text = '{"name": "get_weather", "parameters": {"city": "Oslo"}}'
    content, _, calls = parse_complete(text, LLAMA)
    assert content == ""
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Oslo"}


def test_parse_complete_mistral_array():
    text = '[TOOL_CALLS][{"name": "get_weather", "arguments": {"city": "Rome"}}]'
    content, _, calls = parse_complete(text, MISTRAL)
    assert calls and calls[0].name == "get_weather"


def test_stream_split_markers():
    # marker arrives split across many tiny deltas
    parser = StreamToolParser(CHATML, TOOLS)
    text = (
        "Sure. <tool_"
        "call>{\"name\": \"get_weather\", "
        "\"arguments\": {\"city\": \"Paris\"}}</tool"
        "_call> done"
    )
    events = collect(parser, list(text))
    kinds = [e.kind for e in events]
    assert "tool_calls" in kinds
    content = "".join(e.text for e in events if e.kind == "content")
    assert content == "Sure.  done"
    assert parser.finish_reason == "tool_calls"
    assert parser.tool_calls[0].name == "get_weather"


def test_stream_think_routing():
    parser = StreamToolParser(CHATML)
    events = collect(
        parser, ["<th", "ink>deep ", "thought</think>", "hello ", "world"]
    )
    reasoning = "".join(e.text for e in events if e.kind == "reasoning")
    content = "".join(e.text for e in events if e.kind == "content")
    assert reasoning == "deep thought"
    assert content == "hello world"


def test_stream_false_positive_flush():
    parser = StreamToolParser(CHATML, TOOLS)
    events = collect(parser, ["a <tool_call>not json at all</tool_call> b"])
    content = "".join(e.text for e in events if e.kind == "content")
    assert "not json at all" in content
    assert parser.finish_reason is None


def test_stream_unterminated_tool_at_eos():
    parser = StreamToolParser(CHATML, TOOLS)
    events = collect(
        parser, ['<tool_call>{"name": "get_weather", "arguments": {"city": "X"}}']
    )
    assert parser.tool_calls and parser.tool_calls[0].name == "get_weather"


def test_validation():
    ok = ToolCall(name="get_weather", arguments='{"city": "Paris"}')
    assert validate_tool_call(ok, TOOLS) is None
    unknown = ToolCall(name="nope", arguments="{}")
    assert "unknown tool" in validate_tool_call(unknown, TOOLS)
    bad_schema = ToolCall(name="get_weather", arguments='{"city": 5}')
    assert validate_tool_call(bad_schema, TOOLS)
    missing = ToolCall(name="get_weather", arguments="{}")
    assert validate_tool_call(missing, TOOLS)
    bad_json = ToolCall(name="get_weather", arguments="{oops")
    assert "not valid JSON" in validate_tool_call(bad_json, TOOLS)
    assert validate_tool_call(ok, None) is None


def test_stream_invalid_call_dropped():
    parser = StreamToolParser(CHATML, TOOLS)
    collect(parser, ['<tool_call>{"name": "bogus", "arguments": {}}</tool_call>'])
    assert parser.tool_calls == []
    assert parser.errors and "unknown tool" in parser.errors[0]
