"""Tool-call markup parsing per model family.

Reference: ``/root/reference/src/tools/stream_parser.rs`` ToolModelType
configs (start/end markers per family, stream_parser.rs:363-575) and
``parser.rs`` complete-output fallback parsing.
"""

from __future__ import annotations

import json
import re
import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class ToolCall:
    name: str
    arguments: str  # JSON-encoded string (OpenAI wire format)
    id: str = field(default_factory=lambda: f"call_{uuid.uuid4().hex[:24]}")

    def to_openai(self) -> Dict[str, Any]:
        return {
            "id": self.id,
            "type": "function",
            "function": {"name": self.name, "arguments": self.arguments},
        }


@dataclass(frozen=True)
class ToolFamily:
    """Markup convention for one model family."""

    name: str
    start: str                   # tool-call start marker ("" = bare JSON)
    end: str                     # end marker ("" = brace matching / EOS)
    array: bool = False          # payload is a JSON array of calls
    args_key: str = "arguments"  # or "parameters" (llama)
    think_open: str = "<think>"
    think_close: str = "</think>"


_FAMILIES: Dict[str, ToolFamily] = {
    "chatml": ToolFamily("chatml", "<tool_call>", "</tool_call>"),
    "llama": ToolFamily("llama", "", "", args_key="parameters"),
    "mistral": ToolFamily("mistral", "[TOOL_CALLS]", "", array=True),
    "gemma": ToolFamily("gemma", "```tool_code", "```"),
    "phi": ToolFamily("phi", "<|tool_call|>", "<|/tool_call|>", array=True),
    "glm": ToolFamily("glm", "<tool_call>", "</tool_call>"),
}


def family_for_model(model_type: str) -> ToolFamily:
    """Reference: ToolConfig::for_model_type (stream_parser.rs:325)."""
    mt = (model_type or "").lower()
    if mt.startswith(("qwen", "yi", "stablelm", "deepseek", "minimax")):
        return _FAMILIES["chatml"]
    if mt.startswith("glm") or mt.startswith("chatglm"):
        return _FAMILIES["glm"]
    if mt.startswith("llama"):
        return _FAMILIES["llama"]
    if mt.startswith(("mistral", "mixtral")):
        return _FAMILIES["mistral"]
    if mt.startswith("gemma"):
        return _FAMILIES["gemma"]
    if mt.startswith("phi"):
        return _FAMILIES["phi"]
    return _FAMILIES["chatml"]


def _normalize_payload(obj: Any, args_key: str) -> List[ToolCall]:
    calls: List[ToolCall] = []
    items = obj if isinstance(obj, list) else [obj]
    for it in items:
        if not isinstance(it, dict):
            continue
        fn = it.get("function") if isinstance(it.get("function"), dict) else it
        name = fn.get("name")
        if not name:
            continue
        args = fn.get(args_key, fn.get("arguments", fn.get("parameters", {})))
        if isinstance(args, str):
            args_str = args
        else:
            args_str = json.dumps(args or {})
        calls.append(ToolCall(name=name, arguments=args_str))
    return calls


def parse_payload(text: str, family: ToolFamily) -> List[ToolCall]:
    """Parse the text between markers into tool calls."""
    text = text.strip()
    if family.name == "gemma" and text.startswith("json"):
        text = text[4:].strip()
    try:
        return _normalize_payload(json.loads(text), family.args_key)
    except json.JSONDecodeError:
        pass
    # some models emit several concatenated objects; parse greedily
    calls: List[ToolCall] = []
    dec = json.JSONDecoder()
    i = 0
    while i < len(text):
        if text[i] in "{[":
            try:
                obj, end = dec.raw_decode(text, i)
            except json.JSONDecodeError:
                i += 1
                continue
            calls.extend(_normalize_payload(obj, family.args_key))
            i = end
        else:
            i += 1
    return calls


def parse_complete(
    text: str, family: ToolFamily
) -> Tuple[str, Optional[str], List[ToolCall]]:
    """Parse a finished completion: returns (content, reasoning, calls)
    (reference: complete-output fallback parse, parser.rs)."""
    reasoning = None
    m = re.search(
        re.escape(family.think_open) + r"(.*?)" + re.escape(family.think_close),
        text,
        re.DOTALL,
    )
    if m:
        reasoning = m.group(1).strip()
        text = (text[: m.start()] + text[m.end():]).strip()

    calls: List[ToolCall] = []
    if family.start:
        pattern = (
            re.escape(family.start)
            + r"(.*?)"
            + (re.escape(family.end) if family.end else r"$")
        )
        out = []
        last = 0
        for m in re.finditer(pattern, text, re.DOTALL):
            calls.extend(parse_payload(m.group(1), family))
            out.append(text[last : m.start()])
            last = m.end()
        out.append(text[last:])
        content = "".join(out).strip()
    else:
        # bare-JSON families (llama): the whole trailing text may be a call
        stripped = text.strip()
        if stripped.startswith("{") and '"name"' in stripped[:200]:
            calls = parse_payload(stripped, family)
            content = "" if calls else text
        else:
            content = text
    return content, reasoning, calls


# ---------------------------------------------------------------------------
# schema validation (reference: tools/schema.rs + helpers.rs)
# ---------------------------------------------------------------------------


def validate_tool_call(
    call: ToolCall, tools: Optional[List[Dict[str, Any]]]
) -> Optional[str]:
    """Returns an error string when the call is invalid for the request's
    declared tools (unknown name / malformed or schema-violating args)."""
    if not tools:
        return None
    schema = None
    for t in tools:
        fn = t.get("function", t)
        if fn.get("name") == call.name:
            schema = fn.get("parameters")
            break
    else:
        return f"unknown tool {call.name!r}"
    try:
        args = json.loads(call.arguments or "{}")
    except json.JSONDecodeError as e:
        return f"tool {call.name!r}: arguments are not valid JSON: {e}"
    if schema:
        try:
            import jsonschema

            jsonschema.validate(args, schema)
        except jsonschema.ValidationError as e:
            return f"tool {call.name!r}: {e.message}"
    return None
