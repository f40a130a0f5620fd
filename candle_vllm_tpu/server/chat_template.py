"""Chat template rendering.

Re-designs the reference's conversation layer
(``/root/reference/src/openai/conversation/``): minijinja(pycompat)
rendering of the HF ``chat_template`` with SeparatorStyle fallbacks per
model family.  Here jinja2 renders the same templates; the fallback covers
tokenizers without one (chatml, llama2/3, gemma, mistral styles —
default_conversation.rs:180-1298).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Tuple

import jinja2

_FALLBACKS: Dict[str, str] = {
    # ChatML (qwen/yi/stablelm default; default_conversation.rs ChatML arm)
    "chatml": (
        "{% for message in messages %}"
        "{{ '<|im_start|>' + message['role'] + '\n' + message['content'] "
        "+ '<|im_end|>' + '\n' }}"
        "{% endfor %}"
        "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
    ),
    "llama3": (
        "{% for message in messages %}"
        "{{ '<|start_header_id|>' + message['role'] + '<|end_header_id|>\n\n' "
        "+ message['content'] + '<|eot_id|>' }}"
        "{% endfor %}"
        "{% if add_generation_prompt %}"
        "{{ '<|start_header_id|>assistant<|end_header_id|>\n\n' }}{% endif %}"
    ),
    "mistral": (
        "{% for message in messages %}"
        "{% if message['role'] == 'user' %}{{ '[INST] ' + message['content'] "
        "+ ' [/INST]' }}{% elif message['role'] == 'system' %}"
        "{{ message['content'] + '\n' }}"
        "{% else %}{{ message['content'] }}{% endif %}"
        "{% endfor %}"
    ),
    "gemma": (
        "{% for message in messages %}"
        "{{ '<start_of_turn>' + ('model' if message['role'] == 'assistant' "
        "else message['role']) + '\n' + message['content'] "
        "+ '<end_of_turn>\n' }}"
        "{% endfor %}"
        "{% if add_generation_prompt %}{{ '<start_of_turn>model\n' }}{% endif %}"
    ),
    # phi3/phi4 (default_conversation.rs Phi arm)
    "phi": (
        "{% for message in messages %}"
        "{{ '<|' + message['role'] + '|>\n' + message['content'] "
        "+ '<|end|>\n' }}"
        "{% endfor %}"
        "{% if add_generation_prompt %}{{ '<|assistant|>\n' }}{% endif %}"
    ),
    # glm4 (default_conversation.rs GLM arm)
    "glm": (
        "{{ '[gMASK]<sop>' }}"
        "{% for message in messages %}"
        "{{ '<|' + message['role'] + '|>\n' + message['content'] }}"
        "{% endfor %}"
        "{% if add_generation_prompt %}{{ '<|assistant|>\n' }}{% endif %}"
    ),
    # llama4 header tokens (default_conversation.rs Llama arm for llama4;
    # llama4 checkpoints use <|header_start|>/<|eot|>)
    "llama4": (
        "{% for message in messages %}"
        "{{ '<|header_start|>' + message['role'] + '<|header_end|>\n\n' "
        "+ message['content'] + '<|eot|>' }}"
        "{% endfor %}"
        "{% if add_generation_prompt %}"
        "{{ '<|header_start|>assistant<|header_end|>\n\n' }}{% endif %}"
    ),
    # stablelm zephyr-era markers (default_conversation.rs StableLM arm)
    "stablelm": (
        "{% for message in messages %}"
        "{% if message['role'] == 'system' %}"
        "{{ '<|SYSTEM|>' + message['content'] }}"
        "{% elif message['role'] == 'user' %}"
        "{{ '<|USER|>' + message['content'] }}"
        "{% else %}{{ '<|ASSISTANT|>' + message['content'] }}{% endif %}"
        "{% endfor %}"
        "{% if add_generation_prompt %}{{ '<|ASSISTANT|>' }}{% endif %}"
    ),
    # minimax ]~b] role markers (default_conversation.rs MINIMAX_TEMPLATE,
    # tool/reasoning scaffolding stripped to the turn structure)
    "minimax": (
        "{{ ']~!b[]~b]system\nYou are MiniMax.[e~[\n' }}"
        "{% for message in messages %}"
        "{% if message['role'] == 'user' %}"
        "{{ ']~b]user\n' + message['content'] + '[e~[\n' }}"
        "{% elif message['role'] == 'assistant' %}"
        "{{ ']~b]ai\n' + message['content'] + '[e~[\n' }}"
        "{% elif message['role'] == 'system' %}"
        "{{ ']~b]system\n' + message['content'] + '[e~[\n' }}"
        "{% endif %}{% endfor %}"
        "{% if add_generation_prompt %}{{ ']~b]ai\n' }}{% endif %}"
    ),
    # classic llama2 [INST] <<SYS>> (default_conversation.rs Llama arm)
    "llama2": (
        "{% if messages and messages[0]['role'] == 'system' %}"
        "{{ '[INST] <<SYS>>\n' + messages[0]['content'] + '\n<</SYS>>\n\n' }}"
        "{% set messages = messages[1:] %}{% else %}{{ '[INST] ' }}"
        "{% endif %}"
        "{% for message in messages %}"
        "{% if message['role'] == 'user' %}"
        "{{ message['content'] + ' [/INST]' }}"
        "{% elif message['role'] == 'assistant' %}"
        "{{ ' ' + message['content'] + ' </s><s>[INST] ' }}"
        "{% endif %}{% endfor %}"
    ),
    # deepseek v2/v3 (default_conversation.rs DeepSeek arm)
    "deepseek": (
        "{% for message in messages %}"
        "{% if message['role'] == 'system' %}{{ message['content'] }}"
        "{% elif message['role'] == 'user' %}"
        "{{ '<｜User｜>' + message['content'] }}"
        "{% else %}{{ '<｜Assistant｜>' + message['content'] "
        "+ '<｜end▁of▁sentence｜>' }}{% endif %}"
        "{% endfor %}"
        "{% if add_generation_prompt %}{{ '<｜Assistant｜>' }}"
        "{% endif %}"
    ),
}


def fallback_template(model_type: str) -> str:
    if model_type == "llama4":
        return _FALLBACKS["llama4"]
    if model_type in ("llama",):
        return _FALLBACKS["llama3"]
    if model_type in ("mistral", "mixtral", "pixtral"):
        return _FALLBACKS["mistral"]
    if model_type.startswith("gemma"):
        return _FALLBACKS["gemma"]
    if model_type.startswith("phi"):
        return _FALLBACKS["phi"]
    if model_type.startswith(("glm", "chatglm")):
        return _FALLBACKS["glm"]
    if model_type.startswith("deepseek"):
        return _FALLBACKS["deepseek"]
    if model_type.startswith("stablelm"):
        return _FALLBACKS["stablelm"]
    if model_type.startswith("minimax"):
        return _FALLBACKS["minimax"]
    # qwen/yi/internlm-class checkpoints all speak ChatML
    return _FALLBACKS["chatml"]


def _should_escape_marker(token: str) -> bool:
    """Special tokens worth neutralizing in user content (reference:
    default_conversation.rs:87-94 should_escape_marker)."""
    if not token or len(token) < 3:
        return False
    return token[0] in "<[{(" or "|" in token


def escape_special_tokens(
    content: str,
    escape_tokens: List[str],
    preserve_tokens: Tuple[str, ...] = (),
) -> str:
    """Neutralize tokenizer special/added tokens inside user-provided text
    by inserting a zero-width non-joiner, so prompt-injection via literal
    markers (e.g. a user typing ``<|im_end|>``) cannot terminate turns
    (reference: escape_special_tokens_in_text,
    default_conversation.rs:43-85).  ``preserve_tokens`` (e.g. image
    placeholders) are protected via sentinels."""
    if not escape_tokens or not content:
        return content
    sentinels = []
    for i, tok in enumerate(preserve_tokens):
        if tok and tok in content:
            s = f"__CVT_PRESERVE_{i}__"
            content = content.replace(tok, s)
            sentinels.append((s, tok))
    for tok in escape_tokens:
        if not tok or tok not in content:
            continue
        # ZWNJ inserted INSIDE the token (after the first char) so the
        # tokenizer's added-token matcher can never see the contiguous
        # span — appending after the token (the reference's non-'<' arm)
        # leaves '[INST]'-style markers matchable
        esc = tok[0] + "‌" + tok[1:]
        content = content.replace(tok, esc)
    for s, tok in sentinels:
        content = content.replace(s, tok)
    return content


class ChatTemplate:
    def __init__(
        self,
        template: Optional[str] = None,
        model_type: str = "llama",
        bos_token: str = "",
        eos_token: str = "",
        escape_tokens: Optional[List[str]] = None,
    ):
        self.source = template or fallback_template(model_type)
        self.escape_tokens = [
            t for t in (escape_tokens or []) if _should_escape_marker(t)
        ]
        env = jinja2.Environment(
            loader=jinja2.BaseLoader(),
            trim_blocks=True,
            lstrip_blocks=True,
            extensions=["jinja2.ext.loopcontrols"],
        )
        # HF templates use pythonic methods jinja lacks by default
        env.filters["tojson"] = lambda v, **kw: json.dumps(v, **kw)
        env.globals["raise_exception"] = _raise_exception
        self._template = env.from_string(self.source)
        self.bos_token = bos_token
        self.eos_token = eos_token

    @classmethod
    def from_tokenizer_config(cls, path: str, model_type: str = "llama"):
        with open(path) as f:
            cfg = json.load(f)
        tmpl = cfg.get("chat_template")
        if isinstance(tmpl, list):  # multi-template configs
            tmpl = next(
                (t["template"] for t in tmpl if t.get("name") == "default"),
                tmpl[0]["template"] if tmpl else None,
            )

        def _tok(v):
            return v["content"] if isinstance(v, dict) else (v or "")

        # special/added tokens to neutralize in user content
        esc = [
            v.get("content", "")
            for v in (cfg.get("added_tokens_decoder") or {}).values()
            if isinstance(v, dict)
        ]
        esc += [_tok(cfg.get(k)) for k in ("bos_token", "eos_token",
                                           "unk_token", "pad_token")]
        return cls(
            template=tmpl,
            model_type=model_type,
            bos_token=_tok(cfg.get("bos_token")),
            eos_token=_tok(cfg.get("eos_token")),
            escape_tokens=sorted(set(filter(None, esc))),
        )

    def render(
        self,
        messages: List[Dict[str, Any]],
        add_generation_prompt: bool = True,
        tools: Optional[List[Dict[str, Any]]] = None,
        **kwargs: Any,
    ) -> str:
        """Render messages to the prompt string
        (reference: get_gen_prompt, openai_server.rs:47-109)."""
        from candle_vllm_tpu.multimodal.processor import IMAGE_PLACEHOLDER

        msgs = []
        for m in messages:
            m = dict(m)
            c = m.get("content")
            if isinstance(c, list):  # multimodal parts: keep text parts
                m["content"] = "".join(
                    p.get("text", "") for p in c if p.get("type") == "text"
                )
            elif c is None:
                m["content"] = ""
            # user-supplied text must not smuggle special tokens
            # (reference: escaped roles, default_conversation.rs:413)
            if m.get("role") in ("user", "tool") and self.escape_tokens:
                m["content"] = escape_special_tokens(
                    m["content"], self.escape_tokens, (IMAGE_PLACEHOLDER,)
                )
            msgs.append(m)
        return self._template.render(
            messages=msgs,
            add_generation_prompt=add_generation_prompt,
            tools=tools,
            bos_token=self.bos_token,
            eos_token=self.eos_token,
            **kwargs,
        )


class TemplateError(ValueError):
    pass


def _raise_exception(message: str):
    raise TemplateError(message)
