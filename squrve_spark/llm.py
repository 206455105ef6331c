"""Swappable LLM client. Everything LLM-shaped in the engine goes through
this interface so the full pipeline is testable deterministically
(SURVEY §7.7).

Reference analog: the llama_index CustomLLM wrapper (/root/reference/core/
llm/QwenModel.py:12-60). Real backends are NOT bundled — any OpenAI-style
client can be adapted by subclassing ``LLMClient.complete``. Tests and the
driver harness use ``MockLLM`` / ``ScriptedLLM``.
"""

from __future__ import annotations

import re
from typing import Callable, Optional


class LLMClient:
    """Minimal completion interface; temperature/top_p defaults mirror the
    reference Router (temp 0.75, top_p 0.9, max_tokens 8000)."""

    def __init__(self, temperature: float = 0.75, top_p: float = 0.9, max_tokens: int = 8000):
        self.temperature = temperature
        self.top_p = top_p
        self.max_tokens = max_tokens

    def complete(self, prompt: str, **kwargs) -> str:  # pragma: no cover
        raise NotImplementedError("plug a real backend or use MockLLM")

    def reinit_client(self) -> None:
        """Parity hook (the reference re-creates clients across process
        boundaries); a no-op for stateless clients."""


class MockLLM(LLMClient):
    """Deterministic mock: answers via a rule list of (pattern, responder).

    ``responder`` is a string or fn(match, prompt)->str; first matching rule
    wins; ``default`` answers everything else.
    """

    def __init__(
        self,
        rules: Optional[list[tuple[str, str | Callable]]] = None,
        default: str = "",
    ):
        super().__init__(temperature=0.0)
        self.rules = rules or []
        self.default = default
        self.calls: list[str] = []

    def complete(self, prompt: str, **kwargs) -> str:
        self.calls.append(prompt)
        for pattern, responder in self.rules:
            m = re.search(pattern, prompt, re.DOTALL)
            if m:
                return responder(m, prompt) if callable(responder) else responder
        return self.default


class ScriptedLLM(LLMClient):
    """Returns a fixed sequence of responses (for multi-turn actor tests)."""

    def __init__(self, responses: list[str]):
        super().__init__(temperature=0.0)
        self.responses = list(responses)
        self.i = 0

    def complete(self, prompt: str, **kwargs) -> str:
        if self.i >= len(self.responses):
            return self.responses[-1] if self.responses else ""
        out = self.responses[self.i]
        self.i += 1
        return out


def extract_sql(text: str) -> str:
    """Pull the SQL out of an LLM response: fenced block first, else the
    first SELECT/WITH-rooted statement, else the raw text."""
    fence = re.search(r"```(?:sql)?\s*(.*?)```", text, re.DOTALL | re.IGNORECASE)
    if fence:
        return fence.group(1).strip().rstrip(";")
    stmt = re.search(r"(?is)\b(SELECT|WITH)\b.*", text)
    if stmt:
        return stmt.group(0).strip().rstrip(";")
    return text.strip().rstrip(";")
