"""Round-5 stream-parser parity: code-fence tracking, state resync after
buffering exits, prefilled-reasoning detection, and the reasoning/tool
interleave loop (reference ``stream_parser.rs`` tests at 3304-3708:
resync_reasoning_and_code_block_state, incremental code-block tracking,
detect_prefilled_reasoning_end_marker, full agentic loop)."""

from candle_vllm_tpu.tools.parser import (
    detect_prefilled_reasoning,
    family_for_model,
    strip_reasoning_blocks,
)
from candle_vllm_tpu.tools.stream_parser import StreamToolParser

CHATML = family_for_model("qwen3")
MINIMAX = family_for_model("minimax")

TOOLS = [
    {"type": "function",
     "function": {"name": "test", "parameters": {"type": "object"}}},
    {"type": "function",
     "function": {"name": "get_weather", "parameters": {"type": "object"}}},
]


def drain(parser, chunks, finish=True):
    events = []
    for c in chunks:
        events += parser.feed(c)
    if finish:
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


# ---------------------------------------------------------------------------
# code-fence tracking in normal mode
# ---------------------------------------------------------------------------


def test_tool_marker_inside_code_fence_is_content():
    """A start marker inside an open ``` fence is documentation, not a
    call (reference: code_block_state_not_corrupted_by_tool_buffer)."""
    p = StreamToolParser(CHATML, tools=TOOLS)
    ev = drain(p, [
        "Example:\n```\n<tool_call>\n{\"name\": \"test\"}\n</tool_call>\n"
        "```\ndone"
    ])
    assert calls_of(ev) == []
    content = text_of(ev)
    assert "<tool_call>" in content
    assert content.endswith("done")


def test_fence_split_across_chunks_still_suppresses():
    """Incremental fence tracking: the ``` arrives split across deltas
    (reference: incremental_code_block_tracking_in_normal_mode)."""
    p = StreamToolParser(CHATML, tools=TOOLS)
    ev = drain(p, [
        "look:\n`", "`", "`python\n",
        "<tool_call>", '{"name": "test", "arguments": {}}',
        "</tool_call>\n`", "``\n",
    ])
    assert calls_of(ev) == []
    assert "<tool_call>" in text_of(ev)


def test_marker_after_closed_fence_parses_again():
    p = StreamToolParser(CHATML, tools=TOOLS)
    ev = drain(p, [
        "```\nfenced <tool_call> stays\n</tool_call>\n```\n",
        '<tool_call>{"name": "test", "arguments": {}}</tool_call>',
    ])
    calls = calls_of(ev)
    assert [c.name for c in calls] == ["test"]
    assert "fenced <tool_call> stays" in text_of(ev)


def test_inline_backticks_do_not_open_a_block():
    """Single/double backtick inline code never flips the fence state."""
    p = StreamToolParser(CHATML, tools=TOOLS)
    ev = drain(p, [
        "use `tool` or ``x``\n",
        '<tool_call>{"name": "test", "arguments": {}}</tool_call>',
    ])
    assert [c.name for c in calls_of(ev)] == ["test"]


def test_reasoning_marker_still_routes_inside_fence():
    """Only TOOL detection is fence-gated (matching the reference's
    tested surface); think markers route regardless."""
    p = StreamToolParser(CHATML, tools=TOOLS)
    ev = drain(p, ["```\n<think>hidden</think>\n```"])
    assert text_of(ev, "reasoning") == "hidden"


# ---------------------------------------------------------------------------
# state resync after buffering exits
# ---------------------------------------------------------------------------


def test_think_in_tool_args_leaves_reasoning_closed():
    """reference: reasoning_state_resyncs_after_buffering_exit — a
    <think> inside JSON arguments is data; after the call completes the
    parser is back in normal (not reasoning) state."""
    p = StreamToolParser(CHATML, tools=TOOLS)
    ev = drain(p, [
        "<think>thought</think>\n",
        "<tool_call>",
        '{"name": "test", "arguments": {"q": "<think>"}}',
        "</tool_call>",
        "after",
    ], finish=False)
    assert p.state == "normal"
    assert [c.name for c in calls_of(ev)] == ["test"]
    assert text_of(ev, "reasoning") == "thought"
    assert text_of(ev).endswith("after")


def test_flushed_false_positive_with_think_stays_normal():
    """A flushed (unparseable) buffer containing <think> is literal
    content; a later real <think> still routes to reasoning."""
    p = StreamToolParser(CHATML, tools=TOOLS)
    ev = drain(p, [
        "<tool_call>not json <think> here</tool_call>",
        "<think>real</think>",
    ], finish=False)
    assert p.state == "normal"
    assert "<think> here" in text_of(ev)
    assert text_of(ev, "reasoning") == "real"


def test_flushed_buffer_fence_counts_toward_parity():
    """Fences inside a flushed buffer join the content stream, so a
    following marker is inside an open block (reference: resync counts
    the accumulated output, code-fence arm)."""
    p = StreamToolParser(CHATML, tools=TOOLS)
    ev = drain(p, [
        "<tool_call>``` not a call</tool_call>",
        "<tool_call>fenced too</tool_call>",
    ])
    assert calls_of(ev) == []
    assert p.in_code_block()


# ---------------------------------------------------------------------------
# prefilled reasoning detection (server-side start_in_thinking)
# ---------------------------------------------------------------------------


def test_detect_prefilled_reasoning_think():
    assert detect_prefilled_reasoning(
        "...<|im_start|>assistant\n<think>", CHATML
    )


def test_detect_prefilled_reasoning_trailing_whitespace():
    assert detect_prefilled_reasoning(
        "...<|im_start|>assistant\n<think>  \n", CHATML
    )


def test_detect_prefilled_reasoning_none():
    assert not detect_prefilled_reasoning(
        "...<|im_start|>assistant\n", CHATML
    )


def test_detect_prefilled_reasoning_family_marker():
    assert detect_prefilled_reasoning(
        "...]~b]ai~[" + MINIMAX.think_open, MINIMAX
    )
    assert not detect_prefilled_reasoning("<think>", MINIMAX) or \
        MINIMAX.think_open == "<think>"


# ---------------------------------------------------------------------------
# full agentic interleave (reference: full_agentic_loop test)
# ---------------------------------------------------------------------------


def test_full_agentic_loop_reasoning_tool_interleave():
    p = StreamToolParser(CHATML, tools=TOOLS)
    ev = drain(p, [
        "<think>plan step 1</think>",
        "Let me check the weather.",
        '<tool_call>{"name": "get_weather", "arguments": {"city": "SF"}}'
        "</tool_call>",
        "<think>plan step 2</think>",
        '<tool_call>{"name": "test", "arguments": {}}</tool_call>',
        "All done.",
    ])
    assert [c.name for c in calls_of(ev)] == ["get_weather", "test"]
    assert text_of(ev, "reasoning") == "plan step 1plan step 2"
    content = text_of(ev)
    assert "Let me check the weather." in content
    assert content.endswith("All done.")
    assert p.finish_reason == "tool_calls"


# ---------------------------------------------------------------------------
# strip_reasoning_blocks long tail (reference: double think + empty)
# ---------------------------------------------------------------------------


def test_strip_reasoning_blocks_double_think_with_tool():
    s = ("<think>a</think>keep1<think>b</think>"
         '<tool_call>{"name": "t"}</tool_call>keep2')
    out = strip_reasoning_blocks(s, CHATML)
    assert "<think>" not in out and "</think>" not in out
    assert "keep1" in out and "keep2" in out
    assert "<tool_call>" in out


def test_strip_reasoning_blocks_empty_and_unmatched():
    assert strip_reasoning_blocks("<think></think>x", CHATML).strip() == "x"
    # unmatched open: everything after it is reasoning-in-progress
    out = strip_reasoning_blocks("pre<think>dangling", CHATML)
    assert "dangling" not in out and "pre" in out
