"""Reasoning-scaffold prompt repair (reference: conversation/mod.rs
RenderedPromptRepairer + its repair_tests)."""

from candle_vllm_tpu.server.prompt_repair import (
    PromptRepairer,
    extract_generation_prompt_literal,
)

QWEN_THINKING_TMPL = """
{%- for message in messages %}
    {{- '<|im_start|>' + message.role + '\\n' + message.content + '<|im_end|>' + '\\n' }}
{%- endfor %}
{%- if add_generation_prompt %}
    {{- '<|im_start|>assistant\\n' }}
    {{- '<think>\\n' }}
{%- endif %}
"""

QWEN35_BRANCH_TMPL = """
{%- for message in messages %}
    {%- if message.role == "assistant" %}
        {{- '<|im_start|>' + message.role + '\\n' + message.content }}
        {{- '<|im_end|>' + '\\n' }}
    {%- endif %}
{%- endfor %}
{%- if add_generation_prompt %}
    {{- '<|im_start|>assistant\\n' }}
    {%- if enable_thinking is false %}
        {{- '<think>\\n\\n</think>\\n\\n' }}
    {%- else %}
        {{- '<think>\\n' }}
    {%- endif %}
{%- endif %}
"""

PLAIN_TMPL = """
{%- if add_generation_prompt %}
    {{- '<|im_start|>assistant\\n' }}
{%- endif %}
"""


def test_extract_plain_literal():
    lit = extract_generation_prompt_literal(QWEN_THINKING_TMPL, True)
    assert lit == "<|im_start|>assistant\n<think>\n"


def test_extract_thinking_branch():
    on = extract_generation_prompt_literal(QWEN35_BRANCH_TMPL, True)
    off = extract_generation_prompt_literal(QWEN35_BRANCH_TMPL, False)
    assert on == "<|im_start|>assistant\n<think>\n"
    assert off == "<|im_start|>assistant\n<think>\n\n</think>\n\n"


def test_repairer_construction():
    r = PromptRepairer.from_template(QWEN_THINKING_TMPL)
    assert r is not None and r.has_reasoning_scaffold
    assert r.assistant_header == "<|im_start|>assistant\n"
    assert r.start_marker == "<think>"
    # no-scaffold template -> no repair possible
    r2 = PromptRepairer.from_template(PLAIN_TMPL)
    assert r2 is not None and not r2.has_reasoning_scaffold


def test_repair_inserts_missing_scaffold():
    r = PromptRepairer.from_template(QWEN_THINKING_TMPL,
                                     eos_token="<|im_end|>")
    prompt = (
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\nHello!<|im_end|>\n"
        "<|im_start|>user\nmore<|im_end|>\n"
        "<|im_start|>assistant\n<think>\n"
    )
    fixed = r.repair(prompt)
    assert fixed is not None
    # the historical turn gains the full scaffold; the trailing
    # generation header (already scaffolded) is untouched
    assert "<|im_start|>assistant\n<think>\nHello!<|im_end|>" in fixed
    assert fixed.endswith("<|im_start|>assistant\n<think>\n")


def test_repair_keeps_already_scaffolded():
    r = PromptRepairer.from_template(QWEN_THINKING_TMPL,
                                     eos_token="<|im_end|>")
    prompt = (
        "<|im_start|>assistant\n<think>\nplan</think>\nHello<|im_end|>\n"
    )
    assert r.repair(prompt) is None  # nothing to change


def test_repair_partial_scaffold_when_end_present():
    """A block containing </think> but missing the opener only gets the
    opening part of the scaffold (conversation/mod.rs:287-300)."""
    r = PromptRepairer.from_template(QWEN_THINKING_TMPL,
                                     eos_token="<|im_end|>")
    prompt = "<|im_start|>assistant\nplan</think>\nHello<|im_end|>\n"
    fixed = r.repair(prompt)
    assert fixed.startswith("<|im_start|>assistant\n<think>\nplan</think>")


def test_repair_untouched_non_assistant_blocks():
    r = PromptRepairer.from_template(QWEN_THINKING_TMPL,
                                     eos_token="<|im_end|>")
    prompt = "<|im_start|>user\nno scaffold here<|im_end|>\n"
    assert r.repair(prompt) is None
