"""Shared utilities (tokenizers, logging)."""
