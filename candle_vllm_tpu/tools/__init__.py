"""Tool calling: per-family markup parsers + streaming state machine.

Re-designs the reference's ``src/tools/`` (6.5 kLoC: ToolModelType
configs, StreamToolParser state machine, schema validation, forced
tool_choice filtering) in a compact form: a declarative ``ToolFamily``
table plus one incremental parser that buffers marker-delimited tool
markup, routes ``<think>`` spans to reasoning_content, and validates
arguments against the request's JSON schemas.
"""

from candle_vllm_tpu.tools.parser import (  # noqa: F401
    ToolCall,
    ToolFamily,
    build_invalid_call_feedback,
    family_for_model,
    filter_forced_calls,
    parse_complete,
    resolve_tool_choice,
    validate_tool_call,
)
from candle_vllm_tpu.tools.stream_parser import StreamToolParser  # noqa: F401
