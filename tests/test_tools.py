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


# ---------------------------------------------------------------------------
# round-2 depth: pythonic / XML formats, tool_choice, feedback
# (ports of reference scenarios, stream_parser.rs:2518-3600 + helpers.rs)
# ---------------------------------------------------------------------------

from candle_vllm_tpu.tools.parser import (
    _FAMILIES,
    build_invalid_call_feedback,
    filter_forced_calls,
    parse_glm_xml_call,
    parse_pythonic_calls,
    parse_xml_invoke_calls,
    resolve_tool_choice,
)


def test_pythonic_single_call():
    calls = parse_pythonic_calls('get_weather(city="Paris", days=3)')
    assert len(calls) == 1
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Paris", "days": 3}


def test_pythonic_list_of_calls():
    calls = parse_pythonic_calls(
        '[get_weather(city="Boston"), get_time(tz="EST")]'
    )
    assert [c.name for c in calls] == ["get_weather", "get_time"]


def test_pythonic_dotted_name():
    # gemma default_api.tool style
    calls = parse_pythonic_calls('default_api.search(query="tpu")')
    assert calls[0].name == "search"
    assert json.loads(calls[0].arguments) == {"query": "tpu"}


def test_pythonic_fenced_tool_code():
    calls = parse_pythonic_calls('```tool_code\nsearch(query="x")\n```')
    assert calls and calls[0].name == "search"


def test_llama4_complete_with_markers():
    fam = _FAMILIES["llama4"]
    text = 'Let me check. <|python_start|>[lookup(id=7)]<|python_end|>'
    content, _, calls = parse_complete(text, fam)
    assert calls[0].name == "lookup"
    assert json.loads(calls[0].arguments) == {"id": 7}
    assert "Let me check." in content


def test_llama4_bare_pythonic_fallback():
    # stream_parser.rs:1598: llama4 sometimes skips the python markers
    fam = _FAMILIES["llama4"]
    content, _, calls = parse_complete('[lookup(id=9)]', fam)
    assert calls and calls[0].name == "lookup"
    assert content == ""


def test_gemma_python_call_syntax():
    fam = _FAMILIES["gemma"]
    text = ('<start_function_call>get_weather(city="Lyon")'
            '<end_function_call>')
    content, _, calls = parse_complete(text, fam)
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Lyon"}


def test_gemma4_envelope():
    fam = _FAMILIES["gemma4"]
    text = '<|tool_call>{"name": "f", "arguments": {"a": 1}}<tool_call|>'
    _, _, calls = parse_complete(text, fam)
    assert calls[0].name == "f"


def test_minimax_invoke_envelope():
    # stream_parser.rs:3216 test_minimax_envelope_accepts_complete_invoke_block
    fam = _FAMILIES["minimax"]
    text = (
        "<minimax:tool_call>"
        '<invoke name="get_weather">'
        '<parameter name="city">Tokyo</parameter>'
        '<parameter name="days">2</parameter>'
        "</invoke></minimax:tool_call>"
    )
    _, _, calls = parse_complete(text, fam)
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Tokyo", "days": 2}


def test_glm47_xml_format():
    # stream_parser.rs:2903 test_envelope_glm47_xml_format
    calls = parse_glm_xml_call(
        "get_weather<arg_key>city</arg_key><arg_value>Berlin</arg_value>"
        "<arg_key>unit</arg_key><arg_value>\"C\"</arg_value>"
    )
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Berlin", "unit": "C"}


def test_glm_family_routes_xml_payload():
    fam = _FAMILIES["glm"]
    text = ("<tool_call>f<arg_key>x</arg_key><arg_value>1</arg_value>"
            "</tool_call>")
    _, _, calls = parse_complete(text, fam)
    assert calls[0].name == "f"
    assert json.loads(calls[0].arguments) == {"x": 1}


def test_llama3_python_tag_prefix():
    fam = _FAMILIES["llama"]
    text = '<|python_tag|>{"name": "f", "parameters": {"a": 1}}'
    content, _, calls = parse_complete(text, fam)
    assert calls and calls[0].name == "f"


TOOLS = [
    {"type": "function",
     "function": {"name": "get_weather",
                  "parameters": {"type": "object",
                                 "properties": {"city": {"type": "string"}},
                                 "required": ["city"]}}},
    {"type": "function", "function": {"name": "get_time", "parameters": {}}},
]


def test_tool_choice_none_clears_tools():
    tools, mode, forced = resolve_tool_choice(TOOLS, "none")
    assert tools == [] and mode == "none" and forced is None


def test_tool_choice_required_needs_tools():
    import pytest
    with pytest.raises(ValueError):
        resolve_tool_choice([], "required")
    tools, mode, _ = resolve_tool_choice(TOOLS, "required")
    assert mode == "required" and len(tools) == 2


def test_tool_choice_function_filters():
    import pytest
    tools, mode, forced = resolve_tool_choice(
        TOOLS, {"type": "function", "function": {"name": "get_time"}}
    )
    assert mode == "function" and forced == "get_time"
    assert len(tools) == 1
    with pytest.raises(ValueError):
        resolve_tool_choice(
            TOOLS, {"type": "function", "function": {"name": "nope"}}
        )


def test_forced_name_filtering():
    calls = [ToolCall(name="get_time", arguments="{}"),
             ToolCall(name="other", arguments="{}")]
    kept = filter_forced_calls(calls, "get_time")
    assert [c.name for c in kept] == ["get_time"]
    assert filter_forced_calls(calls, None) == calls


def test_invalid_call_feedback_message():
    bad = ToolCall(name="get_weather", arguments='{"city": 5}')
    err = validate_tool_call(bad, TOOLS)
    assert err is not None
    fb = build_invalid_call_feedback([(bad, err)], TOOLS, "get_weather")
    assert "get_weather" in fb and "Required tool_choice" in fb
    assert "Allowed tools" in fb


# ---------------------------------------------------------------------------
# Ported reference scenarios (stream_parser.rs tests)
# ---------------------------------------------------------------------------


def test_false_end_marker_inside_arguments_keeps_buffering():
    """An end marker INSIDE a JSON string argument must not terminate the
    call (reference: test_false_end_marker_inside_arguments_requires_
    confirmation / test_fake_end_marker_inside_parameter_keeps_buffering)."""
    p = StreamToolParser(CHATML, TOOLS)
    payload = (
        '<tool_call>{"name": "get_weather", "arguments": '
        '{"city": "see </tool_call> docs"}}</tool_call>'
    )
    events = collect(p, [payload])
    calls = [e for e in events if e.kind == "tool_calls"]
    assert len(calls) == 1
    args = json.loads(calls[0].calls[0].arguments)
    assert args["city"] == "see </tool_call> docs"


def test_nested_start_marker_ignored_while_buffering():
    """(reference: test_nested_start_marker_is_ignored_while_buffering)"""
    p = StreamToolParser(CHATML, TOOLS)
    events = collect(p, [
        '<tool_call>{"name": "get_weather", "arguments": '
        '{"city": "x <tool_call> y"}}</tool_call>'
    ])
    calls = [e for e in events if e.kind == "tool_calls"]
    assert len(calls) == 1


def test_code_fence_inside_args_keeps_buffering():
    """(reference: test_parser_keeps_buffering_when_args_include_code_fence)"""
    p = StreamToolParser(CHATML, TOOLS)
    events = collect(p, [
        '<tool_call>{"name": "get_weather", "arguments": {"city": ',
        '"```\\nparis\\n```"}}',
        "</tool_call>",
    ])
    calls = [e for e in events if e.kind == "tool_calls"]
    assert len(calls) == 1


def test_multiple_tool_calls_with_reasoning_between():
    """(reference: test_multiple_tool_calls_with_reasoning_between)"""
    p = StreamToolParser(CHATML, TOOLS)
    events = collect(p, [
        '<tool_call>{"name": "get_weather", "arguments": {"city": "a"}}'
        "</tool_call><think>hmm</think>"
        '<tool_call>{"name": "get_weather", "arguments": {"city": "b"}}'
        "</tool_call>"
    ])
    kinds = [e.kind for e in events]
    assert kinds.count("tool_calls") == 2
    assert "reasoning" in kinds
    assert len(p.tool_calls) == 2


def test_tool_marker_inside_reasoning_stays_reasoning():
    """A tool start marker inside an open <think> block routes to
    reasoning (reference: test_tool_call_suppressed_during_active_
    reasoning)."""
    p = StreamToolParser(CHATML, TOOLS)
    events = collect(p, [
        "<think>should I call <tool_call>? no</think>fine"
    ])
    assert not [e for e in events if e.kind == "tool_calls"]
    reasoning = "".join(e.text for e in events if e.kind == "reasoning")
    assert "<tool_call>" in reasoning
    content = "".join(e.text for e in events if e.kind == "content")
    assert content == "fine"


def test_finalize_recovers_missing_end_tag():
    """(reference: test_finalize_buffered_tool_calls_recovers_calls_on_eos
    / test_finalize_recovers_qwen3_json_missing_end_tag)"""
    p = StreamToolParser(CHATML, TOOLS)
    events = collect(p, [
        '<tool_call>{"name": "get_weather", "arguments": {"city": "p"}}'
    ])
    calls = [e for e in events if e.kind == "tool_calls"]
    assert len(calls) == 1
    assert p.finish_reason == "tool_calls"


def test_strip_reasoning_blocks():
    """(reference: test_strip_reasoning_blocks_{basic,multiple,unmatched_
    open,empty_think,no_markers})"""
    from candle_vllm_tpu.tools.parser import strip_reasoning_blocks

    assert strip_reasoning_blocks("<think>x</think>hello") == "hello"
    assert (
        strip_reasoning_blocks("a<think>1</think>b<think>2</think>c")
        == "ab\nc".replace("\n", "")
    )
    assert strip_reasoning_blocks("keep<think>dangling") == "keep"
    assert strip_reasoning_blocks("<think></think>done") == "done"
    assert strip_reasoning_blocks("no markers") == "no markers"


def test_mask_tool_envelopes():
    """(reference: test_mask_tool_envelopes_{basic,multiple,no_tags,
    unclosed,empty_tags})"""
    from candle_vllm_tpu.tools.parser import mask_tool_envelopes

    assert (
        mask_tool_envelopes('a<tool_call>{"x":1}</tool_call>b', CHATML)
        == "ab"
    )
    assert (
        mask_tool_envelopes(
            "x<tool_call>1</tool_call>y<tool_call>2</tool_call>z", CHATML
        )
        == "xyz"
    )
    assert mask_tool_envelopes("plain", CHATML) == "plain"
    assert mask_tool_envelopes("pre<tool_call>dangling", CHATML) == "pre"
    assert mask_tool_envelopes("a<tool_call></tool_call>b", CHATML) == "ab"


def test_minimax_xml_array_value_and_multiple_invokes():
    """(reference: test_parse_minimax_xml_with_array_value /
    test_parse_minimax_xml_multiple_invokes)"""
    from candle_vllm_tpu.tools.parser import parse_payload

    fam = family_for_model("minimax")
    payload = (
        '<invoke name="get_weather"><parameter name="city">["a", "b"]'
        "</parameter></invoke>"
        '<invoke name="get_weather"><parameter name="city">paris'
        "</parameter></invoke>"
    )
    calls = parse_payload(payload, fam)
    assert len(calls) == 2
    assert json.loads(calls[0].arguments)["city"] == ["a", "b"]
    assert json.loads(calls[1].arguments)["city"] == "paris"
