"""LLM backends: abstract base + deterministic FakeLLM.

Reference parity: pandasai/llm/base.py:94-174 (``generate_code`` =
call + markdown code-block extraction) and pandasai/llm/fake.py:11-33.
A real OpenAI-compatible backend can be registered by subclassing
``LLM``; no network client is bundled here.
"""

from __future__ import annotations

import re
from abc import ABC, abstractmethod

_CODE_BLOCK_RE = re.compile(r"```(?:python)?\s*\n(.*?)```", re.DOTALL)


def extract_code(response: str) -> str:
    """Pull the first fenced code block; fall back to the raw text
    (llm/base.py:114-136 semantics)."""
    m = _CODE_BLOCK_RE.search(response)
    return (m.group(1) if m else response).strip()


class LLM(ABC):
    """Base class for all LLM backends (llm/base.py:146-159)."""

    @property
    def type(self) -> str:
        return "llm"

    @abstractmethod
    def call(self, prompt: str, context=None) -> str:
        ...

    def generate_code(self, prompt: str, context=None) -> str:
        return extract_code(self.call(prompt, context))


class OpenAICompatibleLLM(LLM):
    """Chat-completions backend for any OpenAI-compatible endpoint
    (reference: extensions/llms/openai/pandasai_openai/base.py surface).
    Import-gated — raises if the ``openai`` client isn't installed."""

    def __init__(self, model: str = "gpt-4.1-mini", api_key: str | None = None,
                 base_url: str | None = None, temperature: float = 0.0,
                 **client_kwargs):
        try:
            from openai import OpenAI  # noqa: F401
        except ImportError as exc:  # pragma: no cover — client not bundled
            raise ImportError(
                "OpenAICompatibleLLM requires the `openai` package") from exc
        self._client = OpenAI(api_key=api_key, base_url=base_url,
                              **client_kwargs)
        self.model = model
        self.temperature = temperature

    @property
    def type(self) -> str:
        return "openai"

    def call(self, prompt: str, context=None) -> str:  # pragma: no cover
        resp = self._client.chat.completions.create(
            model=self.model,
            temperature=self.temperature,
            messages=[{"role": "user", "content": prompt}],
        )
        return resp.choices[0].message.content or ""


class FakeLLM(LLM):
    """Deterministic test backend (llm/fake.py:11-33): replays a canned
    output (or a sequence of outputs, one per call) and records the last
    prompt for assertions."""

    def __init__(self, output: str | list[str] = 'result = {"type": "string", "value": "ok"}'):
        self._outputs = [output] if isinstance(output, str) else list(output)
        self._call_index = 0
        self.last_prompt: str | None = None
        self.call_count = 0

    @property
    def type(self) -> str:
        return "fake"

    def call(self, prompt: str, context=None) -> str:
        self.last_prompt = prompt
        self.call_count += 1
        out = self._outputs[min(self._call_index, len(self._outputs) - 1)]
        self._call_index += 1
        return out
