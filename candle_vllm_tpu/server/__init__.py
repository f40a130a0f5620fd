"""OpenAI-compatible serving layer.

Re-designs the reference's axum server
(``/root/reference/src/openai/openai_server.rs``) on aiohttp + asyncio:
``/v1/chat/completions`` (sync + SSE streaming), ``/v1/completions``,
``/v1/embeddings``, ``/v1/models``, chat templating, KV admission control,
and usage accounting with the reference's extension fields
(``prompt_time_costs`` / ``completion_time_costs`` / ``cached_tokens``).
"""
