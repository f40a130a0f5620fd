"""Built-in chat web UI, served at ``/ui``.

The reference delegates to an external crate (``rustchatui``, mounted on
port-1 from main.rs:888-909); ours is a single self-contained page served
by the same aiohttp app — no extra port, no build step.  It streams
tokens from ``/v1/chat/completions`` (SSE) and shows usage stats.
"""

from __future__ import annotations

from aiohttp import web

PAGE = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>candle-vllm-tpu chat</title>
<style>
:root { --bg:#101418; --panel:#1a2026; --text:#e6e9ec; --dim:#8a949e;
        --accent:#4f8cc9; --user:#243242; }
* { box-sizing:border-box; }
body { margin:0; background:var(--bg); color:var(--text);
       font:15px/1.5 system-ui, sans-serif; display:flex;
       flex-direction:column; height:100vh; }
header { padding:10px 16px; background:var(--panel);
         display:flex; gap:12px; align-items:center; }
header h1 { font-size:15px; margin:0; font-weight:600; }
header .meta { color:var(--dim); font-size:12px; margin-left:auto; }
#log { flex:1; overflow-y:auto; padding:16px; }
.msg { max-width:52em; margin:0 auto 12px; padding:10px 14px;
       border-radius:10px; white-space:pre-wrap; word-wrap:break-word; }
.msg.user { background:var(--user); }
.msg.assistant { background:var(--panel); }
.msg .role { font-size:11px; color:var(--dim); text-transform:uppercase;
             letter-spacing:.08em; margin-bottom:4px; }
form { display:flex; gap:8px; padding:12px 16px; background:var(--panel); }
textarea { flex:1; resize:none; border:1px solid #2a333c; outline:none;
           background:var(--bg); color:var(--text); border-radius:8px;
           padding:10px 12px; font:inherit; height:52px; }
button { background:var(--accent); color:#fff; border:0; border-radius:8px;
         padding:0 20px; font:inherit; cursor:pointer; }
button:disabled { opacity:.5; cursor:default; }
</style>
</head>
<body>
<header>
  <h1>candle-vllm-tpu</h1>
  <span id="model" class="meta"></span>
  <span id="stats" class="meta"></span>
</header>
<div id="log"></div>
<form id="f">
  <textarea id="in" placeholder="Message… (Enter to send, Shift+Enter for newline)"></textarea>
  <button id="send" type="submit">Send</button>
</form>
<script>
const log = document.getElementById('log'), input = document.getElementById('in');
const sendBtn = document.getElementById('send'), statsEl = document.getElementById('stats');
let model = '', messages = [];
fetch('/v1/models').then(r => r.json()).then(d => {
  model = d.data[0].id;
  document.getElementById('model').textContent = model;
});
function bubble(role) {
  const div = document.createElement('div');
  div.className = 'msg ' + role;
  div.innerHTML = '<div class="role">' + role + '</div><div class="body"></div>';
  log.appendChild(div);
  log.scrollTop = log.scrollHeight;
  return div.querySelector('.body');
}
async function send(text) {
  messages.push({role: 'user', content: text});
  bubble('user').textContent = text;
  const body = bubble('assistant');
  sendBtn.disabled = true;
  let acc = '';
  try {
    const resp = await fetch('/v1/chat/completions', {
      method: 'POST', headers: {'Content-Type': 'application/json'},
      body: JSON.stringify({model, messages, stream: true,
                            stream_options: {include_usage: true}}),
    });
    if (!resp.ok) { body.textContent = 'error: ' + await resp.text(); return; }
    const reader = resp.body.getReader(), dec = new TextDecoder();
    let buf = '';
    for (;;) {
      const {done, value} = await reader.read();
      if (done) break;
      buf += dec.decode(value, {stream: true});
      const lines = buf.split('\\n'); buf = lines.pop();
      for (const line of lines) {
        if (!line.startsWith('data: ')) continue;
        const payload = line.slice(6).trim();
        if (payload === '[DONE]') continue;
        const chunk = JSON.parse(payload);
        const delta = chunk.choices && chunk.choices[0] && chunk.choices[0].delta;
        if (delta && delta.content) {
          acc += delta.content; body.textContent = acc;
          log.scrollTop = log.scrollHeight;
        }
        if (chunk.usage) {
          const u = chunk.usage;
          statsEl.textContent = u.prompt_tokens + ' in / '
            + u.completion_tokens + ' out';
        }
      }
    }
  } finally {
    messages.push({role: 'assistant', content: acc});
    sendBtn.disabled = false; input.focus();
  }
}
document.getElementById('f').addEventListener('submit', e => {
  e.preventDefault();
  const t = input.value.trim();
  if (t) { input.value = ''; send(t); }
});
input.addEventListener('keydown', e => {
  if (e.key === 'Enter' && !e.shiftKey) {
    e.preventDefault(); document.getElementById('f').requestSubmit();
  }
});
</script>
</body>
</html>
"""


async def ui_page(request: web.Request) -> web.Response:
    return web.Response(text=PAGE, content_type="text/html")
