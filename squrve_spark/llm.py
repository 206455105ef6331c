"""Swappable LLM client. Everything LLM-shaped in the engine goes through
this interface so the full pipeline is testable deterministically
(SURVEY §7.7).

Reference analog: the llama_index CustomLLM wrapper (/root/reference/core/
llm/QwenModel.py:12-60). Real backends are NOT bundled — any OpenAI-style
client can be adapted by subclassing ``LLMClient.complete``. Tests and the
driver harness use ``MockLLM`` / ``ScriptedLLM``.
"""

from __future__ import annotations

import json
import os
import re
import time
import urllib.error
import urllib.request
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


class HTTPLLMClient(LLMClient):
    """Generic OpenAI-compatible chat-completions adapter (stdlib only).

    Reference analog: the per-vendor wrappers in ``/root/reference/core/llm/``
    (``OpenaiModel.py:12-60`` et al.) all speak the same public
    ``POST {base_url}/chat/completions`` shape; one configurable client
    covers them. Nothing is bundled: ``base_url`` and ``model`` are required,
    the key comes from the caller or the standard ``OPENAI_API_KEY`` env var.

    Retries transient failures (HTTP 408/429/5xx, connection errors) with
    exponential backoff; deterministic surfaces (tests, driver runs) keep
    using MockLLM/ScriptedLLM — this class is the live-deployment hook.
    Subclasses extend ``RETRYABLE_CODES`` for vendor-specific transient
    statuses (r11 advice: Anthropic's documented 529 'overloaded').
    """

    RETRYABLE_CODES = (408, 429, 500, 502, 503, 504)

    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: str | None = None,
        temperature: float = 0.75,
        top_p: float = 0.9,
        max_tokens: int = 8000,
        timeout_s: float = 300.0,
        max_retries: int = 3,
        retry_base_s: float = 0.5,
    ):
        super().__init__(temperature=temperature, top_p=top_p, max_tokens=max_tokens)
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key if api_key is not None else os.environ.get("OPENAI_API_KEY", "")
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.retry_base_s = retry_base_s

    def _request(self, payload: dict) -> dict:
        req = urllib.request.Request(
            f"{self.base_url}/chat/completions",
            data=json.dumps(payload).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def complete(self, prompt: str, system: str | None = None, **kwargs) -> str:
        messages = ([{"role": "system", "content": system}] if system else []) + [
            {"role": "user", "content": prompt}
        ]
        payload = {
            "model": self.model,
            "messages": messages,
            "temperature": kwargs.get("temperature", self.temperature),
            "top_p": kwargs.get("top_p", self.top_p),
            "max_tokens": kwargs.get("max_tokens", self.max_tokens),
        }
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                body = self._request(payload)
                return body["choices"][0]["message"]["content"]
            except urllib.error.HTTPError as e:
                last_err = e
                if e.code not in self.RETRYABLE_CODES:
                    raise  # 4xx config errors: retrying can't help
            except (urllib.error.URLError, TimeoutError, json.JSONDecodeError, KeyError) as e:
                last_err = e
            if attempt < self.max_retries:
                time.sleep(self.retry_base_s * (2**attempt))
        raise RuntimeError(
            f"LLM request failed after {self.max_retries + 1} attempts: {last_err}"
        ) from last_err


class ClaudeLLMClient(HTTPLLMClient):
    """Anthropic Messages-API adapter (stdlib only) — the NATIVE wire
    protocol, not the OpenAI-compatible shim (r10 verdict task 5; the
    reference's adapter surface is ``core/llm/ClaudeModel.py``).

    Differences from chat-completions, handled here: endpoint is
    ``POST {base_url}/messages``; auth is ``x-api-key`` plus the required
    ``anthropic-version`` header (no Bearer token); the system prompt is a
    TOP-LEVEL ``system`` field, never a messages row; the reply text lives
    in ``content[*].text`` blocks. Internally the OpenAI-shaped payload
    built by ``complete`` is translated on the way out and the native
    response is translated back, so the retry/backoff loop and the public
    ``complete(prompt, system=...)`` surface are shared verbatim.
    Key resolution: explicit ``api_key`` else ``ANTHROPIC_API_KEY``.
    """

    ANTHROPIC_VERSION = "2023-06-01"
    # + 529: Anthropic's documented 'overloaded' status — transient by
    # definition, so it joins the shared backoff loop (r11 advice)
    RETRYABLE_CODES = HTTPLLMClient.RETRYABLE_CODES + (529,)

    def __init__(self, base_url: str = "https://api.anthropic.com/v1",
                 model: str = "claude-3-5-sonnet-latest",
                 api_key: str | None = None, **kwargs):
        if api_key is None:
            api_key = os.environ.get("ANTHROPIC_API_KEY", "")
        super().__init__(base_url, model, api_key=api_key, **kwargs)

    def _request(self, payload: dict) -> dict:
        system = [m["content"] for m in payload["messages"] if m["role"] == "system"]
        native = {
            "model": payload["model"],
            "max_tokens": payload["max_tokens"],
            "temperature": payload["temperature"],
            "top_p": payload["top_p"],
            "messages": [m for m in payload["messages"] if m["role"] != "system"],
        }
        if system:
            native["system"] = system[0]
        req = urllib.request.Request(
            f"{self.base_url}/messages",
            data=json.dumps(native).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "x-api-key": self.api_key,
                "anthropic-version": self.ANTHROPIC_VERSION,
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            body = json.loads(resp.read().decode("utf-8"))
        text = "".join(
            blk.get("text", "") for blk in body.get("content", [])
            if blk.get("type") == "text"
        )
        # normalize to the chat-completions shape the shared complete() reads
        return {"choices": [{"message": {"role": "assistant", "content": text}}]}


class GeminiLLMClient(HTTPLLMClient):
    """Google Gemini generateContent adapter (stdlib only) — the NATIVE
    wire protocol (reference surface: ``core/llm/GeminiModel.py``).

    Differences from chat-completions, handled here: the model is part of
    the URL (``POST {base}/models/{model}:generateContent``); auth is the
    ``x-goog-api-key`` header; messages become ``contents`` with
    ``parts=[{text}]`` and role ``model`` for assistant turns; the system
    prompt is ``systemInstruction``; sampling knobs nest under
    ``generationConfig`` (``topP``/``maxOutputTokens`` spellings); reply
    text is ``candidates[0].content.parts[*].text``. Retry/backoff and the
    ``complete`` surface are inherited. Key resolution: explicit
    ``api_key`` else ``GEMINI_API_KEY`` else ``GOOGLE_API_KEY``.
    """

    def __init__(self,
                 base_url: str = "https://generativelanguage.googleapis.com/v1beta",
                 model: str = "gemini-1.5-pro",
                 api_key: str | None = None, **kwargs):
        if api_key is None:
            api_key = os.environ.get("GEMINI_API_KEY") or os.environ.get(
                "GOOGLE_API_KEY", ""
            )
        super().__init__(base_url, model, api_key=api_key, **kwargs)

    def _request(self, payload: dict) -> dict:
        system = [m["content"] for m in payload["messages"] if m["role"] == "system"]
        contents = [
            {
                "role": "model" if m["role"] == "assistant" else "user",
                "parts": [{"text": m["content"]}],
            }
            for m in payload["messages"]
            if m["role"] != "system"
        ]
        native: dict = {
            "contents": contents,
            "generationConfig": {
                "temperature": payload["temperature"],
                "topP": payload["top_p"],
                "maxOutputTokens": payload["max_tokens"],
            },
        }
        if system:
            native["systemInstruction"] = {"parts": [{"text": system[0]}]}
        req = urllib.request.Request(
            f"{self.base_url}/models/{payload['model']}:generateContent",
            data=json.dumps(native).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "x-goog-api-key": self.api_key,
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            body = json.loads(resp.read().decode("utf-8"))
        cands = body.get("candidates") or [{}]
        parts = (cands[0].get("content") or {}).get("parts") or []
        text = "".join(p.get("text", "") for p in parts)
        if not parts:
            # a candidate with no content.parts is a BLOCKED or truncated
            # generation (SAFETY / RECITATION / MAX_TOKENS / prompt-level
            # block), not a valid empty completion — surface it instead of
            # letting "" propagate as a prediction (r11 advice). Raised as
            # RuntimeError so the shared retry loop does NOT retry what is
            # a content decision, not a transient fault.
            reason = cands[0].get("finishReason", "NO_CANDIDATES")
            block = (body.get("promptFeedback") or {}).get("blockReason")
            detail = f"finishReason={reason}" + (f", blockReason={block}" if block else "")
            raise RuntimeError(f"Gemini returned no content parts ({detail})")
        return {"choices": [{"message": {"role": "assistant", "content": text}}]}


# ---------------------------------------------------------------------------
# reference config compatibility: the `llm` section's provider spellings

# The reference ships seven thin vendor wrappers that all speak the same
# public OpenAI-compatible chat-completions protocol and differ only in
# default base_url + model_name (/root/reference/core/llm/*.py:13-16,
# dispatched on the config's `use` string in core/data_manage.py:630-652).
# One configurable HTTPLLMClient covers the protocol; this table carries the
# reference's exact provider-name spellings and their PUBLIC endpoint
# defaults so a reference config's `llm` section runs unmodified.
PROVIDERS: dict[str, tuple[str, str]] = {
    "openai": ("https://api.openai.com/v1", "gpt-4o-mini"),
    "deepseek": ("https://api.deepseek.com", "deepseek-chat"),
    "qwen": ("https://dashscope.aliyuncs.com/compatible-mode/v1", "qwen-plus"),
    "zhipu": ("https://open.bigmodel.cn/api/paas/v4", "glm-4-plus"),
    # claude/gemini dispatch to their NATIVE-protocol adapters (r11) —
    # these defaults are the native API roots, not the OpenAI-compat shims
    "claude": ("https://api.anthropic.com/v1", "claude-3-5-sonnet-latest"),
    "gemini": (
        "https://generativelanguage.googleapis.com/v1beta",
        "gemini-1.5-pro",
    ),
    "xiaojing": ("https://aigc.x-see.cn/v1", "gpt-4o-mini"),
    # our own generic spelling: base_url required in the section
    "http": (None, "gpt-4o-mini"),
}


def client_for_section(sec: dict) -> Optional[HTTPLLMClient]:
    """Build an ``HTTPLLMClient`` from a reference-shaped ``llm`` config
    section (`{"use": "qwen", "model_name": ..., "api_key": ...}`), mapping
    every provider spelling the reference's dispatcher accepts. Returns
    None when ``use`` is absent/unknown (caller falls back to MockLLM) or
    when a `"http"` section lacks its required base_url."""
    use = (sec.get("use") or "").lower()
    if use not in PROVIDERS:
        return None
    default_url, default_model = PROVIDERS[use]
    base_url = sec.get("base_url") or default_url
    if not base_url:
        return None
    # native-protocol providers get their dedicated adapters; everything
    # else speaks public OpenAI-compatible chat-completions
    cls = {"claude": ClaudeLLMClient, "gemini": GeminiLLMClient}.get(
        use, HTTPLLMClient
    )
    return cls(
        base_url=base_url,
        model=sec.get("model_name", default_model),
        api_key=sec.get("api_key"),
        temperature=float(sec.get("temperature", 0.75)),
        top_p=float(sec.get("top_p", 0.9)),
        max_tokens=int(sec.get("max_token", 8000)),
        timeout_s=float(sec.get("time_out", 300.0)),
    )


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
    fence = re.search(r"```([a-zA-Z]*)([ \t]*\n|[ \t]+|(?=```))(.*?)```", text, re.DOTALL)
    if fence:
        tag, sep, payload = fence.group(1), fence.group(2), fence.group(3)
        # Only treat the leading word as a language tag when it's a known tag
        # or sits on its own line; otherwise it's part of the SQL itself
        # ("```SELECT a FROM t```" must not lose its SELECT).
        known_tag = tag.lower() in ("", "sql", "sqlite", "json", "python", "text", "plaintext", "mysql", "postgresql")
        if not known_tag and "\n" not in sep:
            payload = tag + sep + payload
        text = payload.strip().rstrip(";")
        if not re.search(r"(?i)#sql:", text):
            return text
    # OpenSearch-style structured answers end with an explicit '#SQL:' line
    # (and earlier lines like '#reason'/' #SQL-like' may contain the word
    # SELECT) — prefer the marked final SQL when present
    marked = re.search(r"(?is)#SQL:\s*(.+)", text)
    if marked:
        return marked.group(1).strip().rstrip(";")
    stmt = re.search(r"(?is)\b(SELECT|WITH)\b.*", text)
    if stmt:
        return stmt.group(0).strip().rstrip(";")
    return text.strip().rstrip(";")


def normalize_sql(sql: str) -> str:
    """Whitespace-collapsed, semicolon-stripped canonical text form — THE
    normalizer for textual candidate equality (vote alignment, json-answer
    matching); one definition so equivalence semantics can't drift."""
    return re.sub(r"\s+", " ", sql).strip().rstrip(";").strip()
