"""Interactive terminal chat client (reference: examples/chat.py)."""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request


def stream_chat(base_url: str, messages, max_tokens: int):
    payload = json.dumps(
        {
            "messages": messages,
            "max_tokens": max_tokens,
            "temperature": 0.7,
            "stream": True,
        }
    ).encode()
    req = urllib.request.Request(
        f"{base_url}/v1/chat/completions",
        data=payload,
        headers={"Content-Type": "application/json"},
    )
    text = ""
    with urllib.request.urlopen(req) as resp:
        for raw in resp:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            data = line[len("data: "):]
            if data == "[DONE]":
                break
            chunk = json.loads(data)
            for c in chunk.get("choices", []):
                delta = c.get("delta", {}).get("content")
                if delta:
                    text += delta
                    sys.stdout.write(delta)
                    sys.stdout.flush()
    print()
    return text


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default="http://127.0.0.1:8000")
    ap.add_argument("--max-tokens", type=int, default=512)
    args = ap.parse_args()
    messages = []
    print("chat client — empty line to exit")
    while True:
        try:
            user = input("> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not user:
            break
        messages.append({"role": "user", "content": user})
        reply = stream_chat(args.base_url, messages, args.max_tokens)
        messages.append({"role": "assistant", "content": reply})


if __name__ == "__main__":
    main()
