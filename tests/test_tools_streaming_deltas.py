"""Incremental tool-call streaming deltas (OpenAI wire format): one name
delta per call as soon as the name string is complete, then raw
argument-JSON fragments whose concatenation is the arguments exactly as
the model wrote them.  Reference: ``stream_parser.rs`` ParserState
incremental name/argument deltas (VERDICT r3 missing #4)."""

import json

from candle_vllm_tpu.tools.parser import family_for_model
from candle_vllm_tpu.tools.stream_parser import StreamToolParser

CHATML = family_for_model("qwen3")
PHI = family_for_model("phi")
GLM = family_for_model("glm4_moe")
LLAMA4 = family_for_model("llama4")

TOOLS = [
    {
        "type": "function",
        "function": {
            "name": "get_weather",
            "parameters": {
                "type": "object",
                "properties": {"city": {"type": "string"},
                               "days": {"type": "integer"}},
            },
        },
    },
    {
        "type": "function",
        "function": {"name": "run", "parameters": {"type": "object"}},
    },
]


def drain_chars(parser, text):
    events = []
    for ch in text:
        events += parser.feed(ch)
    events += parser.finish()
    return events


def deltas_of(events):
    return [e for e in events if e.kind == "tool_call_delta"]


def whole_calls_of(events):
    out = []
    for e in events:
        if e.kind == "tool_calls":
            out += e.calls
    return out


def args_stream(events, index):
    return "".join(e.text for e in deltas_of(events) if e.index == index)


def test_single_call_streams_name_then_args():
    p = StreamToolParser(CHATML, TOOLS, stream_deltas=True)
    args = '{"city": "Oslo", "days": 3}'
    text = f'<tool_call>{{"name": "get_weather", "arguments": {args}}}</tool_call>'
    events = drain_chars(p, text)
    ds = deltas_of(events)
    assert ds, "expected incremental deltas"
    named = [d for d in ds if d.name is not None]
    assert len(named) == 1 and named[0].name == "get_weather"
    assert named[0].call_id.startswith("call_")
    assert named[0].index == 0
    # concatenated argument fragments == the raw args JSON
    assert args_stream(events, 0) == args
    # the call is NOT re-emitted as a whole at envelope close
    assert whole_calls_of(events) == []
    # but it is recorded, with the streamed id, for finish_reason/usage
    assert len(p.tool_calls) == 1
    assert p.tool_calls[0].id == named[0].call_id
    assert json.loads(p.tool_calls[0].arguments) == {"city": "Oslo", "days": 3}
    assert p.finish_reason == "tool_calls"


def test_false_end_marker_inside_args_still_streams():
    p = StreamToolParser(CHATML, TOOLS, stream_deltas=True)
    args = '{"city": "x</tool_call>y"}'
    text = f'<tool_call>{{"name": "get_weather", "arguments": {args}}}</tool_call>'
    events = drain_chars(p, text)
    assert args_stream(events, 0) == args
    assert len(p.tool_calls) == 1
    assert json.loads(p.tool_calls[0].arguments)["city"] == "x</tool_call>y"


def test_two_envelopes_get_increasing_indices():
    p = StreamToolParser(CHATML, TOOLS, stream_deltas=True)
    text = (
        '<tool_call>{"name": "run", "arguments": {}}</tool_call>'
        'and<tool_call>{"name": "get_weather", "arguments": {"city": "a"}}'
        "</tool_call>"
    )
    events = drain_chars(p, text)
    named = [d for d in deltas_of(events) if d.name is not None]
    assert [d.index for d in named] == [0, 1]
    assert [d.name for d in named] == ["run", "get_weather"]
    assert len(p.tool_calls) == 2
    assert args_stream(events, 1) == '{"city": "a"}'


def test_array_payload_streams_each_call():
    p = StreamToolParser(PHI, TOOLS, stream_deltas=True)
    text = (
        '<|tool_call|>[{"name": "run", "arguments": {"a": 1}},'
        ' {"name": "get_weather", "arguments": {"city": "b"}}]<|/tool_call|>'
    )
    events = drain_chars(p, text)
    named = [d for d in deltas_of(events) if d.name is not None]
    assert [d.name for d in named] == ["run", "get_weather"]
    assert args_stream(events, 0) == '{"a": 1}'
    assert args_stream(events, 1) == '{"city": "b"}'
    assert whole_calls_of(events) == []
    assert len(p.tool_calls) == 2


def test_unknown_tool_name_falls_back_silently():
    p = StreamToolParser(CHATML, TOOLS, stream_deltas=True)
    text = '<tool_call>{"name": "nope", "arguments": {}}</tool_call>'
    events = drain_chars(p, text)
    assert deltas_of(events) == []
    assert whole_calls_of(events) == []
    assert p.errors  # invalid-call feedback still recorded


def test_glm_xml_body_falls_back_to_whole_call():
    p = StreamToolParser(GLM, TOOLS, stream_deltas=True)
    text = (
        "<tool_call>get_weather<arg_key>city</arg_key>"
        "<arg_value>Paris</arg_value></tool_call>"
    )
    events = drain_chars(p, text)
    assert deltas_of(events) == []
    calls = whole_calls_of(events)
    assert len(calls) == 1 and calls[0].name == "get_weather"


def test_args_before_name_are_held_then_flushed():
    p = StreamToolParser(CHATML, TOOLS, stream_deltas=True)
    args = '{"city": "Rio"}'
    text = f'<tool_call>{{"arguments": {args}, "name": "get_weather"}}</tool_call>'
    events = drain_chars(p, text)
    named = [d for d in deltas_of(events) if d.name is not None]
    assert len(named) == 1 and named[0].name == "get_weather"
    assert args_stream(events, 0) == args
    assert len(p.tool_calls) == 1


def test_stream_deltas_off_keeps_whole_call_behavior():
    p = StreamToolParser(CHATML, TOOLS)  # default off
    text = '<tool_call>{"name": "run", "arguments": {}}</tool_call>'
    events = drain_chars(p, text)
    assert deltas_of(events) == []
    assert len(whole_calls_of(events)) == 1


def test_pythonic_family_never_streams_deltas():
    p = StreamToolParser(LLAMA4, TOOLS, stream_deltas=True)
    text = '<|python_start|>[run()]<|python_end|>'
    events = drain_chars(p, text)
    assert deltas_of(events) == []
    assert len(whole_calls_of(events)) == 1


def test_eos_truncation_mid_args_reconciles():
    p = StreamToolParser(CHATML, TOOLS, stream_deltas=True)
    # envelope never closes; finish() parses what it can
    text = '<tool_call>{"name": "get_weather", "arguments": {"city": "Oslo"'
    events = drain_chars(p, text)
    named = [d for d in deltas_of(events) if d.name is not None]
    assert len(named) == 1
    # the streamed fragments are a prefix of the (unclosed) args
    assert args_stream(events, 0) == '{"city": "Oslo"'


def test_nested_object_args_stream_exactly():
    p = StreamToolParser(CHATML, TOOLS, stream_deltas=True)
    args = '{"q": {"a": [1, 2, {"b": "}"}], "c": "{\\"d\\": 1}"}}'
    text = f'<tool_call>{{"name": "run", "arguments": {args}}}</tool_call>'
    events = drain_chars(p, text)
    assert args_stream(events, 0) == args
    assert len(p.tool_calls) == 1
    assert json.loads(p.tool_calls[0].arguments) == json.loads(args)


def test_truncated_envelope_keeps_streamed_calls():
    """A complete call streamed before the envelope text was truncated
    (missing final brace) still lands in tool_calls/finish_reason —
    reconstructed from the streamed record when the whole-payload parse
    fails."""
    p = StreamToolParser(CHATML, TOOLS, stream_deltas=True)
    text = '<tool_call>{"name": "run", "arguments": {"a": 1}'  # no final }
    events = drain_chars(p, text)
    named = [d for d in deltas_of(events) if d.name is not None]
    assert len(named) == 1
    assert args_stream(events, 0) == '{"a": 1}'
    assert len(p.tool_calls) == 1
    assert p.tool_calls[0].id == named[0].call_id
    assert json.loads(p.tool_calls[0].arguments) == {"a": 1}
    assert p.finish_reason == "tool_calls"
    assert whole_calls_of(events) == []


def test_close_only_reasoning_minimax_style():
    """The generation prompt ended with the think-open marker, so the
    stream starts INSIDE reasoning and only a close marker arrives
    (reference: extract_reasoning_content standalone-close arm)."""
    p = StreamToolParser(CHATML, TOOLS, start_in_thinking=True)
    events = []
    for ch in "step one\nstep two</think>the answer":
        events += p.feed(ch)
    events += p.finish()
    reasoning = "".join(e.text for e in events if e.kind == "reasoning")
    content = "".join(e.text for e in events if e.kind == "content")
    assert reasoning == "step one\nstep two"
    assert content == "the answer"


def test_parse_complete_close_only_reasoning():
    from candle_vllm_tpu.tools.parser import parse_complete

    content, reasoning, calls = parse_complete(
        "thinking hard</think>hello", CHATML
    )
    assert reasoning == "thinking hard"
    assert content == "hello"
    assert calls == []
