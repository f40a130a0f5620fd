"""HF-hub model download: resolve a repo id to a local snapshot dir.

TPU-native counterpart of the reference's hub arm
(``/root/reference/src/openai/pipelines/pipeline.rs:520-702``
``download_model`` / ``download_gguf_model`` over the hf-hub crate):
a zero-dependency urllib client against the public HF REST layout

    GET {endpoint}/api/models/{repo}/revision/{rev}   -> {"siblings": [...]}
    GET {endpoint}/{repo}/resolve/{rev}/{rfilename}   -> file bytes

so it works against any server speaking that layout — including the
local HTTP fixture the tests spin up (this environment is zero-egress;
the code path is exercised end-to-end against the fixture).

Cache layout mirrors huggingface_hub:
    {cache}/models--{org}--{name}/snapshots/{revision}/{rfilename}
A complete, non-empty cached file is reused without touching the
network; downloads stream to ``.incomplete`` and rename atomically.
"""

from __future__ import annotations

import json
import os
import re
import time
import urllib.error
import urllib.request
from typing import Dict, List, Optional

DEFAULT_ENDPOINT = "https://huggingface.co"

# non-weight files worth fetching when present (reference grabs the
# tokenizer/config/generation-config/chat-template set, pipeline.rs:540+)
AUX_FILES = (
    "config.json",
    "tokenizer.json",
    "tokenizer_config.json",
    "tokenizer.model",
    "generation_config.json",
    "chat_template.jinja",
    "chat_template.json",
    "special_tokens_map.json",
    "preprocessor_config.json",
    "model.safetensors.index.json",
)


def _endpoint() -> str:
    return os.environ.get("HF_ENDPOINT", DEFAULT_ENDPOINT).rstrip("/")


def _token(explicit: Optional[str] = None,
           token_path: Optional[str] = None) -> Optional[str]:
    """Reference token resolution order: explicit > file > env
    (pipeline.rs get_token)."""
    if explicit:
        return explicit
    if token_path and os.path.exists(token_path):
        return open(token_path).read().strip()
    tok = os.environ.get("HF_TOKEN")
    if tok:
        return tok
    default = os.path.expanduser("~/.cache/huggingface/token")
    if os.path.exists(default):
        return open(default).read().strip()
    return None


def _cache_root(cache_dir: Optional[str]) -> str:
    if cache_dir:
        return cache_dir
    hf_home = os.environ.get(
        "HF_HOME", os.path.expanduser("~/.cache/huggingface")
    )
    return os.path.join(hf_home, "hub")


def _open(url: str, token: Optional[str]):
    req = urllib.request.Request(url)
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    return urllib.request.urlopen(req, timeout=60)


def repo_files(model_id: str, revision: str = "main",
               token: Optional[str] = None) -> List[str]:
    """List the repo's rfilenames (the reference's repo.info().siblings)."""
    url = f"{_endpoint()}/api/models/{model_id}/revision/{revision}"
    try:
        with _open(url, token) as r:
            info = json.load(r)
    except urllib.error.HTTPError as e:  # pragma: no cover - msg shaping
        raise FileNotFoundError(
            f"hub repo {model_id}@{revision}: HTTP {e.code} from {url}"
        ) from e
    return [s["rfilename"] for s in info.get("siblings", [])]


def _fetch(model_id: str, revision: str, rfilename: str, dest: str,
           token: Optional[str]) -> str:
    if os.path.exists(dest) and os.path.getsize(dest) > 0:
        return dest
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    url = f"{_endpoint()}/{model_id}/resolve/{revision}/{rfilename}"
    tmp = dest + ".incomplete"
    t0 = time.time()
    done = 0
    with _open(url, token) as r, open(tmp, "wb") as f:
        total = int(r.headers.get("Content-Length") or 0)
        next_decile = total // 10 if total else 0
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
            done += len(chunk)
            if total and done >= next_decile:
                dt = max(time.time() - t0, 1e-9)
                print(
                    f"[hub] {rfilename}: {done/1e9:.2f}/{total/1e9:.2f} GB "
                    f"({done/dt/1e9:.2f} GB/s)"
                )
                next_decile += total // 10
    os.replace(tmp, dest)
    return dest


def snapshot_dir(model_id: str, revision: str = "main",
                 cache_dir: Optional[str] = None) -> str:
    repo_part = "models--" + model_id.replace("/", "--")
    return os.path.join(
        _cache_root(cache_dir), repo_part, "snapshots", revision
    )


def resolve_model(
    model_id: str,
    revision: str = "main",
    cache_dir: Optional[str] = None,
    token: Optional[str] = None,
    token_path: Optional[str] = None,
) -> str:
    """Download config + tokenizer artifacts + every ``*.safetensors``
    shard; returns the local snapshot directory (usable anywhere a
    ``--model-dir`` is)."""
    tok = _token(token, token_path)
    files = set(repo_files(model_id, revision, tok))
    if "config.json" not in files:
        raise FileNotFoundError(
            f"hub repo {model_id}@{revision} has no config.json"
        )
    local = snapshot_dir(model_id, revision, cache_dir)
    wanted = [f for f in AUX_FILES if f in files]
    wanted += sorted(f for f in files if f.endswith(".safetensors"))
    if not any(f.endswith(".safetensors") for f in wanted):
        raise FileNotFoundError(
            f"hub repo {model_id}@{revision} has no .safetensors weights; "
            "for GGUF repos pass the gguf filename (--f)"
        )
    for f in wanted:
        _fetch(model_id, revision, f, os.path.join(local, f), tok)
    return local


_SHARD_RE = re.compile(r"^(.+)-(\d{5})-of-(\d{5})\.gguf$")


def _is_mmproj(name: str) -> bool:
    return "mmproj" in os.path.basename(name).lower()


def discover_gguf_shards(filename: str, remote: List[str]) -> List[str]:
    """``-NNNNN-of-NNNNN`` shard-set discovery
    (reference: discover_remote_gguf_shards)."""
    m = _SHARD_RE.match(filename)
    if not m:
        return [filename]
    prefix, total = m.group(1), int(m.group(3))
    shards = [
        f"{prefix}-{i:05d}-of-{total:05d}.gguf" for i in range(1, total + 1)
    ]
    shards = [s for s in shards if s in set(remote)]
    if len(shards) != total:
        return [filename]
    return shards


def download_gguf(
    model_id: str,
    filename: str,
    revision: str = "main",
    cache_dir: Optional[str] = None,
    token: Optional[str] = None,
    token_path: Optional[str] = None,
) -> str:
    """Download a GGUF (all ``-of-`` shards + any mmproj tower next to
    it); returns the local path of the primary file
    (reference: download_gguf_model, pipeline.rs:612-702)."""
    tok = _token(token, token_path)
    remote = repo_files(model_id, revision, tok)
    if not filename.endswith(".gguf"):
        # subfolder form: pick the first gguf inside it
        prefix = filename.rstrip("/") + "/"
        inside = sorted(
            f for f in remote
            if f.startswith(prefix) and f.endswith(".gguf")
            and not _is_mmproj(f)
        )
        if not inside:
            raise FileNotFoundError(
                f"no GGUF files under {filename!r} in {model_id}"
            )
        filename = inside[0]
    local = snapshot_dir(model_id, revision, cache_dir)
    shards = discover_gguf_shards(filename, remote)
    got = [
        _fetch(model_id, revision, s, os.path.join(local, s), tok)
        for s in shards
        if s in set(remote) or s == filename
    ]
    # mmproj vision tower: prefer an exact mmproj-<mainname> match
    # (models/gguf.py find_mmproj applies the same ranking on disk)
    folder = os.path.dirname(filename)
    candidates = [
        f for f in remote
        if _is_mmproj(f) and os.path.dirname(f) == folder
        and f.endswith(".gguf")
    ]
    for f in candidates:
        _fetch(model_id, revision, f, os.path.join(local, f), tok)
    return got[0]
