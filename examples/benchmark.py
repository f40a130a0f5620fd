"""Async load generator against the OpenAI API server.

Parity with the reference's ``examples/benchmark.py`` (TTFT, decode tok/s,
end-to-end latency, concurrency sweeps) using aiohttp instead of the
openai client (zero-egress image).

Usage:
  python examples/benchmark.py --base-url http://127.0.0.1:8000 \
      --num-requests 16 --concurrency 4 --prompt-len 512 --max-tokens 128
"""

from __future__ import annotations

import argparse
import asyncio
import json
import random
import statistics
import string
import time

import aiohttp


def make_prompt(n_chars: int, rng: random.Random) -> str:
    words = []
    total = 0
    while total < n_chars:
        w = "".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 9)))
        words.append(w)
        total += len(w) + 1
    return " ".join(words)


async def one_request(session, base_url, prompt, max_tokens, results):
    t_start = time.monotonic()
    ttft = None
    n_tokens = 0
    payload = {
        "messages": [{"role": "user", "content": prompt}],
        "max_tokens": max_tokens,
        "temperature": 0.7,
        "stream": True,
        "stream_options": {"include_usage": True},
    }
    usage = None
    async with session.post(
        f"{base_url}/v1/chat/completions", json=payload
    ) as resp:
        resp.raise_for_status()
        async for raw in resp.content:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            data = line[len("data: "):]
            if data == "[DONE]":
                break
            chunk = json.loads(data)
            if chunk.get("usage"):
                usage = chunk["usage"]
            for c in chunk.get("choices", []):
                if c.get("delta", {}).get("content"):
                    if ttft is None:
                        ttft = time.monotonic() - t_start
                    n_tokens += 1
    e2e = time.monotonic() - t_start
    results.append(
        {
            "ttft": ttft if ttft is not None else e2e,
            "e2e": e2e,
            "completion_tokens": (usage or {}).get("completion_tokens", n_tokens),
            "prompt_tokens": (usage or {}).get("prompt_tokens", 0),
        }
    )


async def run(args) -> None:
    rng = random.Random(args.seed)
    prompts = [
        make_prompt(args.prompt_len, rng) for _ in range(args.num_requests)
    ]
    sem = asyncio.Semaphore(args.concurrency)
    results: list = []

    async with aiohttp.ClientSession(
        timeout=aiohttp.ClientTimeout(total=None)
    ) as session:
        async def guarded(p):
            async with sem:
                await one_request(session, args.base_url, p, args.max_tokens, results)

        t0 = time.monotonic()
        await asyncio.gather(*(guarded(p) for p in prompts))
        wall = time.monotonic() - t0

    ttfts = sorted(r["ttft"] for r in results)
    total_completion = sum(r["completion_tokens"] for r in results)
    total_prompt = sum(r["prompt_tokens"] for r in results)
    decode_rates = [
        (r["completion_tokens"] - 1) / max(r["e2e"] - r["ttft"], 1e-6)
        for r in results
        if r["completion_tokens"] > 1
    ]
    out = {
        "num_requests": len(results),
        "concurrency": args.concurrency,
        "wall_s": round(wall, 2),
        "throughput_req_s": round(len(results) / wall, 3),
        "completion_tok_s": round(total_completion / wall, 1),
        "total_tok_s": round((total_completion + total_prompt) / wall, 1),
        "ttft_p50_ms": round(1e3 * ttfts[len(ttfts) // 2], 1),
        "ttft_p99_ms": round(1e3 * ttfts[min(len(ttfts) - 1, int(len(ttfts) * 0.99))], 1),
        "decode_tok_s_per_req_mean": round(statistics.mean(decode_rates), 1)
        if decode_rates else None,
    }
    print(json.dumps(out, indent=2))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default="http://127.0.0.1:8000")
    ap.add_argument("--num-requests", type=int, default=16)
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--prompt-len", type=int, default=512, help="approx chars")
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    asyncio.run(run(args))


if __name__ == "__main__":
    main()
