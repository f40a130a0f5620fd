"""Tool-parser hardening: the reference's nastiest streaming cases ported
as behavioral tests (``/root/reference/src/tools/stream_parser.rs``
tests at lines 2583-4300 — nested markers, false end markers across
chunk boundaries, EOS recovery, reasoning interleave, pythonic/XML
families)."""

import json

import pytest

from candle_vllm_tpu.tools.parser import (
    family_for_model,
    parse_payload,
    parse_pythonic_calls,
)
from candle_vllm_tpu.tools.stream_parser import StreamToolParser

CHATML = family_for_model("qwen3")
MINIMAX = family_for_model("minimax")
LLAMA4 = family_for_model("llama4")
GEMMA4 = family_for_model("gemma4")
PHI = family_for_model("phi")
GLM = family_for_model("glm4_moe")

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


def drain(parser, chunks):
    events = []
    for c in chunks:
        events += parser.feed(c)
    events += parser.finish()
    return events


def text_of(events, kind="content"):
    return "".join(e.text for e in events if e.kind == kind)


def calls_of(events):
    out = []
    for e in events:
        if e.kind == "tool_calls":
            out += e.calls
    return out


# -- chunk-boundary false markers (ref: 2791, 2973) -------------------------


def test_false_end_marker_inside_string_split_across_chunks():
    payload = '{"name": "get_weather", "arguments": {"city": "a</tool'
    tail = '_call>b"}}'
    p = StreamToolParser(CHATML, TOOLS)
    ev = drain(p, ["<tool_call>", payload, tail, "</tool_call>"])
    calls = calls_of(ev)
    assert len(calls) == 1
    assert json.loads(calls[0].arguments)["city"] == "a</tool_call>b"


def test_fake_end_marker_with_code_fence_in_args():
    # ref: test_parser_keeps_buffering_when_args_include_code_fence
    args = {"city": "```\n</tool_call>\n```"}
    payload = json.dumps({"name": "get_weather", "arguments": args})
    cut = payload.index("</tool_call>") + 5
    p = StreamToolParser(CHATML, TOOLS)
    ev = drain(p, ["<tool_call>", payload[:cut], payload[cut:],
                   "</tool_call>"])
    calls = calls_of(ev)
    assert len(calls) == 1
    assert json.loads(calls[0].arguments) == args


def test_nested_start_marker_while_buffering_is_inert():
    # ref: test_nested_start_marker_is_ignored_while_buffering
    args = {"city": "<tool_call>oops"}
    payload = json.dumps({"name": "get_weather", "arguments": args})
    p = StreamToolParser(CHATML, TOOLS)
    ev = drain(p, ["<tool_call>" + payload + "</tool_call>after"])
    calls = calls_of(ev)
    assert len(calls) == 1
    assert json.loads(calls[0].arguments) == args
    assert text_of(ev) == "after"


def test_partial_start_marker_held_across_many_tiny_chunks():
    # ref: test_parser_partial_start_text_mode
    payload = json.dumps({"name": "run", "arguments": {}})
    stream = "hello <tool_call>" + payload + "</tool_call>"
    p = StreamToolParser(CHATML, TOOLS)
    ev = drain(p, list(stream))  # one char at a time
    assert text_of(ev) == "hello "
    assert len(calls_of(ev)) == 1


def test_lt_only_content_not_swallowed():
    p = StreamToolParser(CHATML, TOOLS)
    ev = drain(p, ["a < b and c <t", "ool paragraphs < done"])
    assert text_of(ev) == "a < b and c <tool paragraphs < done"
    assert not calls_of(ev)


# -- EOS recovery (ref: 2724, 3028, 3065) -----------------------------------


def test_eos_recovers_missing_end_tag():
    payload = json.dumps({"name": "get_weather",
                          "arguments": {"city": "x"}})
    p = StreamToolParser(CHATML, TOOLS)
    ev = drain(p, ["<tool_call>", payload])  # no closing tag, EOS
    calls = calls_of(ev)
    assert len(calls) == 1
    assert calls[0].name == "get_weather"


def test_eos_with_garbage_buffer_does_not_emit_calls():
    p = StreamToolParser(CHATML, TOOLS)
    ev = drain(p, ["<tool_call>", "not json at all"])
    assert not calls_of(ev)


# -- reasoning interleave (ref: 3242, 3355, 3480) ---------------------------


def test_reasoning_markers_inside_tool_args_do_not_corrupt_state():
    args = {"city": "<think>plan</think>"}
    payload = json.dumps({"name": "get_weather", "arguments": args})
    p = StreamToolParser(CHATML, TOOLS)
    ev = drain(p, ["<tool_call>" + payload + "</tool_call>", "tail"])
    calls = calls_of(ev)
    assert len(calls) == 1
    assert json.loads(calls[0].arguments) == args
    assert text_of(ev) == "tail"
    assert text_of(ev, "reasoning") == ""


def test_tool_marker_inside_reasoning_is_reasoning_text():
    # ref: test_tool_call_suppressed_during_active_reasoning
    p = StreamToolParser(CHATML, TOOLS)
    ev = drain(p, ["<think>use <tool_call> maybe</think>done"])
    assert "use <tool_call> maybe" in text_of(ev, "reasoning")
    assert not calls_of(ev)
    assert text_of(ev) == "done"


def test_multiple_tool_calls_with_reasoning_between():
    pay = lambda c: json.dumps(  # noqa: E731
        {"name": "get_weather", "arguments": {"city": c}}
    )
    p = StreamToolParser(CHATML, TOOLS)
    ev = drain(p, [
        "<think>first</think>",
        "<tool_call>" + pay("a") + "</tool_call>",
        "<think>second</think>",
        "<tool_call>" + pay("b") + "</tool_call>",
    ])
    calls = calls_of(ev)
    assert [json.loads(c.arguments)["city"] for c in calls] == ["a", "b"]
    assert text_of(ev, "reasoning") == "firstsecond"


def test_reasoning_split_across_chunks_with_partial_close():
    p = StreamToolParser(CHATML, TOOLS)
    ev = drain(p, ["<think>abc</th", "ink>xyz"])
    assert text_of(ev, "reasoning") == "abc"
    assert text_of(ev) == "xyz"


# -- family grammars ---------------------------------------------------------


def test_llama4_pythonic_multiple_calls():
    # ref: test_llama4_parse_multiple_pythonic_tool_calls
    txt = '[get_weather(city="sf", days=3), run()]'
    calls = parse_pythonic_calls(txt)
    assert [c.name for c in calls] == ["get_weather", "run"]
    assert json.loads(calls[0].arguments) == {"city": "sf", "days": 3}


def test_llama4_streamed_python_envelope():
    p = StreamToolParser(LLAMA4, TOOLS)
    ev = drain(p, ["<|python_start|>[get_weather(city=",
                   '"sf")]<|python_end|>'])
    calls = calls_of(ev)
    assert len(calls) == 1
    assert json.loads(calls[0].arguments) == {"city": "sf"}


def test_minimax_xml_multiple_invokes():
    # ref: test_parse_minimax_xml_multiple_invokes
    xml = (
        '<invoke name="get_weather"><parameter name="city">sf</parameter>'
        '</invoke><invoke name="run"></invoke>'
    )
    calls = parse_payload(xml, MINIMAX)
    assert [c.name for c in calls] == ["get_weather", "run"]


def test_minimax_xml_array_value_and_type_coercion():
    # ref: test_parse_minimax_xml_with_array_value / type coercion
    xml = (
        '<invoke name="get_weather">'
        '<parameter name="days">3</parameter>'
        '<parameter name="city">["a", "b"]</parameter>'
        "</invoke>"
    )
    calls = parse_payload(xml, MINIMAX)
    args = json.loads(calls[0].arguments)
    assert args["days"] == 3
    assert args["city"] == ["a", "b"]


def test_minimax_stream_end_to_end():
    xml = ('<invoke name="get_weather">'
           '<parameter name="city">sf</parameter></invoke>')
    p = StreamToolParser(MINIMAX, TOOLS)
    ev = drain(p, ["before <minimax:tool_call>", xml,
                   "</minimax:tool_call> after"])
    assert text_of(ev) == "before  after"
    calls = calls_of(ev)
    assert len(calls) == 1 and calls[0].name == "get_weather"


def test_glm_xml_arg_key_format():
    # ref: test_envelope_glm47_xml_format
    payload = ("run\n<arg_key>cmd</arg_key>\n<arg_value>ls -la</arg_value>")
    calls = parse_payload(payload, GLM)
    assert calls and calls[0].name == "run"
    assert json.loads(calls[0].arguments)["cmd"] == "ls -la"


def test_phi_array_payload():
    payload = json.dumps([
        {"name": "get_weather", "arguments": {"city": "x"}},
        {"name": "run", "arguments": {}},
    ])
    p = StreamToolParser(PHI, TOOLS)
    ev = drain(p, ["<|tool_call|>" + payload + "<|/tool_call|>"])
    assert [c.name for c in calls_of(ev)] == ["get_weather", "run"]


def test_gemma4_bare_values_coerce():
    # ref: test_gemma4_parse_bare_value_case_insensitive
    payload = '{"name": "get_weather", "arguments": {"city": "sf"}}'
    p = StreamToolParser(GEMMA4, TOOLS)
    ev = drain(p, ["<|tool_call>" + payload + "<tool_call|>"])
    assert len(calls_of(ev)) == 1


# -- false positives flush back as content (ref: FlushBuffer) ---------------


def test_unparseable_markup_flushes_as_content_midstream():
    p = StreamToolParser(CHATML, TOOLS)
    ev = drain(p, ["<tool_call>", "plain prose", "</tool_call>", " tail"])
    # no calls; the raw envelope comes back as content
    assert not calls_of(ev)
    assert "plain prose" in text_of(ev)
    assert "tail" in text_of(ev)


def test_unknown_tool_name_is_error_not_call():
    payload = json.dumps({"name": "nope", "arguments": {}})
    p = StreamToolParser(CHATML, TOOLS)
    ev = drain(p, ["<tool_call>" + payload + "</tool_call>"])
    assert not calls_of(ev)
    assert p.errors


def test_multiple_sequential_calls_single_chunk():
    pay = lambda c: json.dumps(  # noqa: E731
        {"name": "get_weather", "arguments": {"city": c}}
    )
    p = StreamToolParser(CHATML, TOOLS)
    ev = drain(p, [
        "<tool_call>" + pay("a") + "</tool_call>"
        "<tool_call>" + pay("b") + "</tool_call>"
    ])
    assert len(calls_of(ev)) == 2


# -- per-grammar end-marker confirmation (VERDICT r3 weak #8 / next #7:
# pythonic and XML payloads must keep buffering when the end marker sits
# inside an argument; ref stream_parser.rs per-family false-end tests) ------


def test_pythonic_end_marker_inside_string_keeps_buffering():
    p = StreamToolParser(LLAMA4, TOOLS)
    ev = drain(p, [
        '<|python_start|>[get_weather(city="literally ',
        '<|python_end|> is not the end")]<|python_end|>',
    ])
    calls = calls_of(ev)
    assert len(calls) == 1
    assert "<|python_end|>" in json.loads(calls[0].arguments)["city"]


def test_gemma_pythonic_end_marker_inside_string():
    gemma = family_for_model("gemma3")
    p = StreamToolParser(gemma, TOOLS)
    ev = drain(p, [
        '<start_function_call>get_weather(city="a<end_function_call>b")',
        "<end_function_call>",
    ])
    calls = calls_of(ev)
    assert len(calls) == 1
    assert json.loads(calls[0].arguments)["city"] == "a<end_function_call>b"


def test_pythonic_marker_inside_nested_list_string():
    p = StreamToolParser(LLAMA4, TOOLS)
    ev = drain(p, [
        '<|python_start|>[run(code=[1, 2, "',
        "<|python_end|>", '", 3])]<|python_end|>',
    ])
    # first marker arrives at bracket depth 2 with a quote open ->
    # consumed into the buffer; the confirmed payload parses whole
    calls = calls_of(ev)
    assert len(calls) == 1 and calls[0].name == "run"
    assert "<|python_end|>" in json.loads(calls[0].arguments)["code"][2]


def test_minimax_end_marker_inside_parameter_keeps_buffering():
    p = StreamToolParser(MINIMAX, TOOLS)
    ev = drain(p, [
        '<minimax:tool_call><invoke name="get_weather">'
        '<parameter name="city">half </minimax:tool_call> city'
        "</parameter></invoke></minimax:tool_call>",
    ])
    calls = calls_of(ev)
    assert len(calls) == 1
    assert "</minimax:tool_call>" in json.loads(calls[0].arguments)["city"]


def test_glm_xml_end_marker_inside_arg_value():
    p = StreamToolParser(GLM, TOOLS)
    ev = drain(p, [
        "<tool_call>get_weather\n<arg_key>city</arg_key>\n"
        "<arg_value>see </tool_call> tag</arg_value>\n</tool_call>",
    ])
    calls = calls_of(ev)
    assert len(calls) == 1
    assert json.loads(calls[0].arguments)["city"] == "see </tool_call> tag"


def test_pythonic_balanced_payload_ends_at_marker():
    """A complete pythonic payload must NOT over-buffer past its marker."""
    p = StreamToolParser(LLAMA4, TOOLS)
    ev = drain(p, [
        '<|python_start|>[get_weather(city="x")]<|python_end|> after',
    ])
    assert len(calls_of(ev)) == 1
    assert "after" in text_of(ev)
