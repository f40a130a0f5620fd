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
    # payload wire format between the markers (stream_parser.rs:769
    # parse strategies): "json" | "pythonic" | "xml_invoke"
    payload: str = "json"


_FAMILIES: Dict[str, ToolFamily] = {
    "chatml": ToolFamily("chatml", "<tool_call>", "</tool_call>"),
    # llama3: <|python_tag|> prefix or bare trailing JSON
    # (stream_parser.rs:332 <|python_tag|>)
    "llama": ToolFamily("llama", "", "", args_key="parameters"),
    # llama4: pythonic [f(a=1), g(b="x")] between <|python_start|>/<|python_end|>
    # (stream_parser.rs:344-351, 769 "pythonic")
    "llama4": ToolFamily("llama4", "<|python_start|>", "<|python_end|>",
                         payload="pythonic"),
    "mistral": ToolFamily("mistral", "[TOOL_CALLS]", "", array=True),
    # gemma 2/3: <start_function_call> name(arg=value) <end_function_call>
    # — python-call syntax, not JSON (stream_parser.rs:386-396)
    "gemma": ToolFamily("gemma", "<start_function_call>",
                        "<end_function_call>", payload="pythonic"),
    # gemma4 envelope tokens (stream_parser.rs:397-409)
    "gemma4": ToolFamily("gemma4", "<|tool_call>", "<tool_call|>"),
    "phi": ToolFamily("phi", "<|tool_call|>", "<|/tool_call|>", array=True),
    # glm: <tool_call> body may be JSON or the GLM-4.7 XML form
    # name<arg_key>k</arg_key><arg_value>v</arg_value> (stream_parser.rs:1512)
    "glm": ToolFamily("glm", "<tool_call>", "</tool_call>"),
    # minimax: <minimax:tool_call><invoke name=..><parameter name=..>..
    # (stream_parser.rs:179-230)
    "minimax": ToolFamily("minimax", "<minimax:tool_call>",
                          "</minimax:tool_call>", payload="xml_invoke"),
}


def family_for_model(model_type: str) -> ToolFamily:
    """Reference: ToolConfig::for_model_type (stream_parser.rs:325)."""
    mt = (model_type or "").lower()
    if mt.startswith("minimax"):
        return _FAMILIES["minimax"]
    if mt.startswith(("qwen", "yi", "stablelm", "deepseek")):
        return _FAMILIES["chatml"]
    if mt.startswith("glm") or mt.startswith("chatglm"):
        return _FAMILIES["glm"]
    if mt.startswith("llama4"):
        return _FAMILIES["llama4"]
    if mt.startswith("llama"):
        return _FAMILIES["llama"]
    if mt.startswith(("mistral", "mixtral")):
        return _FAMILIES["mistral"]
    if mt.startswith("gemma4"):
        return _FAMILIES["gemma4"]
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


def parse_pythonic_calls(text: str) -> List[ToolCall]:
    """Parse python-call syntax tool calls: ``f(a=1, b="x")`` or a list
    ``[f(a=1), g()]`` (reference: the "pythonic" parse strategy for
    Llama4 and Gemma tool_code, stream_parser.rs:769, 1598-1610)."""
    import ast

    text = text.strip()
    if text.startswith("```"):
        # fenced block (gemma tool_code style): strip the fence + tag
        text = re.sub(r"^```[a-z_]*\s*", "", text)
        text = re.sub(r"\s*```$", "", text)
    try:
        tree = ast.parse(text.strip(), mode="eval")
    except SyntaxError:
        return []

    def lit(node):
        try:
            return ast.literal_eval(node)
        except (ValueError, SyntaxError):
            return ast.unparse(node)

    def from_call(call) -> Optional[ToolCall]:
        if not isinstance(call, ast.Call):
            return None
        if isinstance(call.func, ast.Attribute):
            # dotted names (gemma's default_api.tool style): terminal attr
            name = call.func.attr
        elif isinstance(call.func, ast.Name):
            name = call.func.id
        else:
            return None
        args = {kw.arg: lit(kw.value) for kw in call.keywords if kw.arg}
        return ToolCall(name=name, arguments=json.dumps(args))

    body = tree.body
    nodes = body.elts if isinstance(body, (ast.List, ast.Tuple)) else [body]
    calls = [c for c in (from_call(n) for n in nodes) if c is not None]
    return calls


def parse_xml_invoke_calls(text: str) -> List[ToolCall]:
    """MiniMax envelope: ``<invoke name="f"><parameter name="k">v
    </parameter>...</invoke>`` (reference: stream_parser.rs:179-230)."""
    calls: List[ToolCall] = []
    for m in re.finditer(
        r"<invoke name=[\"']([^\"']+)[\"']>(.*?)</invoke>", text, re.DOTALL
    ):
        name, body = m.group(1), m.group(2)
        args: Dict[str, Any] = {}
        for pm in re.finditer(
            r"<parameter name=[\"']([^\"']+)[\"']>(.*?)</parameter>",
            body,
            re.DOTALL,
        ):
            args[pm.group(1)] = _loose_value(pm.group(2).strip())
        calls.append(ToolCall(name=name, arguments=json.dumps(args)))
    return calls


def parse_glm_xml_call(text: str) -> List[ToolCall]:
    """GLM-4.7 XML form inside <tool_call>: ``name<arg_key>k</arg_key>
    <arg_value>v</arg_value>...`` (reference: stream_parser.rs:1512)."""
    head = re.split(r"<arg_key>", text, 1)[0].strip()
    if not head:
        return []
    keys = re.findall(r"<arg_key>(.*?)</arg_key>", text, re.DOTALL)
    vals = re.findall(r"<arg_value>(.*?)</arg_value>", text, re.DOTALL)
    args = {
        k.strip(): _loose_value(v.strip()) for k, v in zip(keys, vals)
    }
    return [ToolCall(name=head, arguments=json.dumps(args))]


def _loose_value(raw: str) -> Any:
    """Best-effort typed value (reference: helpers.rs parse_loose_value)."""
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        return raw


def parse_payload(text: str, family: ToolFamily) -> List[ToolCall]:
    """Parse the text between markers into tool calls."""
    text = text.strip()
    if family.payload == "pythonic":
        calls = parse_pythonic_calls(text)
        if calls:
            return calls
        # gemma sometimes emits JSON inside tool_code fences anyway
        if text.startswith("json"):
            text = text[4:].strip()
    elif family.payload == "xml_invoke":
        calls = parse_xml_invoke_calls(text)
        if calls:
            return calls
    if family.name == "glm" and ("<arg_key>" in text or "<arg_value>" in text):
        return parse_glm_xml_call(text)
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


def detect_prefilled_reasoning(prompt: str, family: ToolFamily) -> bool:
    """True when the rendered generation prompt already ends with the
    family's think-OPEN marker (modulo trailing whitespace) — the stream
    then begins INSIDE reasoning and only a close marker will arrive
    (reference: detect_prefilled_reasoning_end_marker,
    stream_parser.rs — incl. the trailing-whitespace arm)."""
    return prompt.rstrip().endswith(family.think_open)


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
    elif family.think_close in text and family.think_open not in text:
        # standalone close marker (MiniMax-style): the open marker was part
        # of the generation prompt, so everything before the first close is
        # reasoning (reference: extract_reasoning_content standalone arm,
        # default_conversation.rs)
        i = text.find(family.think_close)
        reasoning = text[:i].strip()
        text = text[i + len(family.think_close):].strip()

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
        # bare-JSON families (llama3): an optional <|python_tag|> prefix
        # or the whole trailing text as a call (stream_parser.rs:332)
        stripped = text.strip()
        if stripped.startswith("<|python_tag|>"):
            stripped = stripped[len("<|python_tag|>"):].strip()
        if stripped.startswith("{") and '"name"' in stripped[:200]:
            calls = parse_payload(stripped, family)
            content = "" if calls else text
        else:
            content = text
    if not calls and family.payload == "pythonic":
        # llama4 sometimes skips the python markers entirely; retry the
        # pythonic parse on the full text (stream_parser.rs:1598-1610)
        bare = parse_pythonic_calls(text)
        if bare:
            calls = bare
            content = ""
    return content, reasoning, calls


# ---------------------------------------------------------------------------
# tool_choice resolution (reference: openai/mod.rs:187-247)
# ---------------------------------------------------------------------------


def resolve_tool_choice(
    tools: Optional[List[Dict[str, Any]]],
    tool_choice: Any,
) -> Tuple[List[Dict[str, Any]], str, Optional[str]]:
    """Normalize tool_choice and filter the tool list accordingly.

    Returns (tools, mode, forced_name) with mode in
    {"auto", "none", "required", "function"}; raises ValueError for
    inconsistent requests (the 400 cases of openai/mod.rs:226-245)."""
    tools = list(tools or [])
    if tool_choice is None:
        return tools, "auto", None
    if isinstance(tool_choice, dict):
        name = (tool_choice.get("function") or {}).get("name")
        if not name:
            raise ValueError("tool_choice function requires a name")
        if not tools:
            raise ValueError(
                f"tool_choice '{name}' requires tools to be provided"
            )
        kept = [
            t for t in tools
            if (t.get("function", t)).get("name") == name
        ]
        if not kept:
            raise ValueError(f"tool_choice '{name}' not found in tools")
        return kept, "function", name
    mode = str(tool_choice).lower()
    if mode == "none":
        return [], "none", None
    if mode == "required":
        if not tools:
            raise ValueError(
                "tool_choice requires at least one tool but none were "
                "provided"
            )
        return tools, "required", None
    return tools, "auto", None


def filter_forced_calls(
    calls: List[ToolCall], forced_name: Optional[str]
) -> List[ToolCall]:
    """Drop calls that don't match a forced tool_choice
    (reference: helpers.rs retain_tool_calls_forced_name)."""
    if forced_name is None:
        return calls
    return [c for c in calls if c.name == forced_name]


def build_invalid_call_feedback(
    invalid: List[Tuple[ToolCall, str]],
    tools: Optional[List[Dict[str, Any]]],
    forced_name: Optional[str] = None,
) -> Optional[str]:
    """Model/client-facing message when parsed calls were rejected
    (reference: helpers.rs build_invalid_tool_call_feedback)."""
    if not invalid:
        return None
    rejected = sorted({c.name for c, _ in invalid if c.name})
    allowed = sorted(
        (t.get("function", t)).get("name", "") for t in (tools or [])
    )
    parts = [
        f"Rejected tool call(s): {', '.join(rejected)}."
        if rejected else "Rejected tool call(s)."
    ]
    parts += [f"  - {err}" for _, err in invalid]
    if forced_name:
        parts.append(f"Required tool_choice is '{forced_name}'.")
    if allowed:
        parts.append(f"Allowed tools: {', '.join(a for a in allowed if a)}.")
    else:
        parts.append("No callable tools are available for this turn.")
    parts.append(
        "Retry with one valid tool call using a JSON object that matches "
        "the tool schema."
    )
    return " ".join(parts)


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


def strip_reasoning_blocks(text: str, family: Optional[ToolFamily] = None) -> str:
    """Remove ``<think>…</think>`` blocks (and an unmatched trailing open)
    from replayed assistant content so stale reasoning never re-enters the
    prompt (reference: stream_parser.rs strip_reasoning_blocks tests —
    basic/multiple/unmatched-open/empty/qwen markers)."""
    fam = family or _FAMILIES["chatml"]
    out: List[str] = []
    rest = text
    while True:
        i = rest.find(fam.think_open)
        if i == -1:
            out.append(rest)
            break
        out.append(rest[:i])
        j = rest.find(fam.think_close, i + len(fam.think_open))
        if j == -1:
            break  # unmatched open: drop the tail
        rest = rest[j + len(fam.think_close):]
    return "".join(out).strip()


def mask_tool_envelopes(text: str, family: Optional[ToolFamily] = None) -> str:
    """Replace tool-markup envelopes in replayed assistant content with
    their bare JSON/pythonic payload removed — history shows THAT a call
    happened without re-teaching the wire markup (reference:
    stream_parser.rs mask_tool_envelopes_* tests).  Unclosed envelopes are
    truncated at the start marker."""
    fam = family or _FAMILIES["chatml"]
    if not fam.start:
        return text
    out: List[str] = []
    rest = text
    while True:
        i = rest.find(fam.start)
        if i == -1:
            out.append(rest)
            break
        out.append(rest[:i])
        if not fam.end:
            break  # endless family: everything after start is markup
        j = rest.find(fam.end, i + len(fam.start))
        if j == -1:
            break  # unclosed envelope: truncate
        rest = rest[j + len(fam.end):]
    return "".join(out).strip()
