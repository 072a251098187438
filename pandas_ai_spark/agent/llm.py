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


class LLMAPIError(Exception):
    """Transport/endpoint failure, with the HTTP status when known."""

    def __init__(self, message: str, status: int | None = None):
        super().__init__(message)
        self.status = status


class APIKeyNotFoundError(LLMAPIError):
    """Missing/invalid credential (reference: pandasai/exceptions.py)."""


class UnsupportedModelError(Exception):
    pass


class HTTPTransport:
    """Default JSON-over-HTTPS transport (stdlib urllib — no client
    package dependency). Swap for a fake in tests: anything with
    ``post(url, headers, payload) -> dict``."""

    def __init__(self, timeout: float = 120.0):
        self.timeout = timeout

    def post(self, url: str, headers: dict, payload: dict) -> dict:
        import json
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json", **headers},
            method="POST")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read().decode())
        except urllib.error.HTTPError as exc:
            body = exc.read().decode(errors="replace")[:500]
            if exc.code in (401, 403):
                raise APIKeyNotFoundError(
                    f"auth failed ({exc.code}): {body}", exc.code) from exc
            raise LLMAPIError(
                f"HTTP {exc.code}: {body}", exc.code) from exc
        except urllib.error.URLError as exc:
            raise LLMAPIError(f"connection failed: {exc.reason}") from exc


class OpenAICompatibleLLM(LLM):
    """Backend for any OpenAI-compatible endpoint, covering all three API
    shapes the reference routes between (extensions/llms/openai/
    pandasai_openai/base.py:242-275, openai.py:88-108):

    - ``gpt-5*`` → Responses API (``/responses``): ``input`` messages,
      ``reasoning.effort`` + ``text.verbosity``, ``max_output_tokens``;
      sampling knobs (temperature/top_p/penalties) intentionally omitted
      — reasoning models reject them.
    - ``*-instruct`` → legacy Completions (``/completions``): ``prompt``
      string.
    - everything else → Chat Completions (``/chat/completions``):
      ``messages`` + classic sampling params.

    The transport is injectable, so request shaping and response parsing
    are unit-tested offline; the default transport is stdlib urllib (no
    ``openai`` package needed). Credentials come from ``api_key`` or
    ``$OPENAI_API_KEY``; endpoint from ``base_url`` or
    ``$OPENAI_API_BASE``.
    """

    DEFAULT_BASE = "https://api.openai.com/v1"

    def __init__(self, model: str = "gpt-5-mini",
                 api_key: str | None = None, base_url: str | None = None,
                 temperature: float = 0.0, max_tokens: int = 1000,
                 top_p: float = 1.0, frequency_penalty: float = 0.0,
                 presence_penalty: float = 0.6, n: int = 1,
                 stop: str | None = None, seed: int | None = None,
                 reasoning_effort: str | None = "medium",
                 verbosity: str | None = "low",
                 max_output_tokens: int | None = 5000,
                 transport=None):
        import os

        self.api_key = api_key or os.getenv("OPENAI_API_KEY")
        if not self.api_key:
            raise APIKeyNotFoundError("OpenAI API key is required")
        self.base_url = (base_url or os.getenv("OPENAI_API_BASE")
                         or self.DEFAULT_BASE).rstrip("/")
        self.model = model
        self.temperature = temperature
        self.max_tokens = max_tokens
        self.top_p = top_p
        self.frequency_penalty = frequency_penalty
        self.presence_penalty = presence_penalty
        self.n = n
        self.stop = stop
        self.seed = seed
        self.reasoning_effort = reasoning_effort
        self.verbosity = verbosity
        self.max_output_tokens = max_output_tokens
        self.transport = transport or HTTPTransport()
        self.last_prompt: str | None = None

    @property
    def type(self) -> str:
        return "openai"

    # -- routing (openai.py:88-108) ----------------------------------------

    @property
    def _api_shape(self) -> str:
        name = self.model.split(":")[1] if "ft:" in self.model else self.model
        if name.startswith("gpt-5"):
            return "responses"
        if name.endswith("-instruct"):
            return "completions"
        return "chat"

    # -- param shaping (base.py:96-158) ------------------------------------

    def _chat_params(self) -> dict:
        p = {
            "model": self.model,
            "temperature": self.temperature,
            "top_p": self.top_p,
            "frequency_penalty": self.frequency_penalty,
            "presence_penalty": self.presence_penalty,
            "n": self.n,
            "max_tokens": self.max_tokens,
        }
        if self.seed is not None:
            p["seed"] = self.seed
        if self.stop is not None:
            p["stop"] = [self.stop]
        return p

    def _responses_params(self) -> dict:
        p: dict = {"model": self.model}
        if self.reasoning_effort:
            p["reasoning"] = {"effort": self.reasoning_effort}
        if self.verbosity:
            p["text"] = {"verbosity": self.verbosity}
        if self.max_output_tokens is not None:
            p["max_output_tokens"] = self.max_output_tokens
        elif self.max_tokens is not None:
            p["max_output_tokens"] = self.max_tokens
        if self.stop is not None:
            p["stop"] = [self.stop]
        if self.seed is not None:
            p["seed"] = self.seed
        return p

    def _messages(self, prompt: str, context=None) -> list[dict]:
        memory = getattr(context, "memory", None)
        msgs = memory.to_openai_messages() if memory is not None else []
        msgs.append({"role": "user", "content": prompt})
        return msgs

    # -- response parsing ---------------------------------------------------

    @staticmethod
    def _parse_responses(data: dict) -> str:
        # Responses API: prefer the convenience field, else walk output
        # blocks for output_text content (the documented wire shape).
        if isinstance(data.get("output_text"), str):
            return data["output_text"]
        parts = []
        for block in data.get("output", []):
            for c in block.get("content", []):
                if c.get("type") == "output_text":
                    parts.append(c.get("text", ""))
        return "".join(parts)

    # -- endpoint shaping (overridden by the Azure variant) -----------------

    def _headers(self) -> dict:
        return {"Authorization": f"Bearer {self.api_key}"}

    def _url(self, shape: str) -> str:
        path = {"responses": "/responses",
                "completions": "/completions",
                "chat": "/chat/completions"}[shape]
        return f"{self.base_url}{path}"

    def call(self, prompt: str, context=None) -> str:
        self.last_prompt = prompt
        headers = self._headers()
        shape = self._api_shape
        if shape == "responses":
            payload = {**self._responses_params(),
                       "input": self._messages(prompt, context)}
            data = self.transport.post(
                self._url(shape), headers, payload)
            return self._parse_responses(data)
        if shape == "completions":
            payload = {**self._chat_params(), "prompt": prompt}
            data = self.transport.post(
                self._url(shape), headers, payload)
            return data["choices"][0].get("text", "")
        payload = {**self._chat_params(),
                   "messages": self._messages(prompt, context)}
        data = self.transport.post(
            self._url(shape), headers, payload)
        return data["choices"][0]["message"].get("content") or ""


class AzureOpenAILLM(OpenAICompatibleLLM):
    """Azure-hosted OpenAI deployments (reference: extensions/llms/
    openai/pandasai_openai/azure_openai.py:14-120). Azure differs from
    the vanilla endpoint in exactly three wire-level ways, all shaped
    here and unit-tested offline:

    - auth header is ``api-key: <key>`` (not a Bearer token);
    - chat/completions URLs are per-deployment
      (``/openai/deployments/<name>/...``); the Responses API is
      resource-level (``/openai/responses``) with the deployment as
      ``model`` in the body;
    - every call carries ``?api-version=``.

    Credentials resolve like the reference: ``api_key`` param, then
    ``$AZURE_OPENAI_API_KEY``, then ``$OPENAI_API_KEY``; endpoint from
    ``azure_endpoint`` / ``$AZURE_OPENAI_ENDPOINT``; version from
    ``api_version`` / ``$OPENAI_API_VERSION`` (required, like the
    reference's APIKeyNotFoundError contract). AAD-token auth is not
    implemented (needs the azure-identity package)."""

    def __init__(self, deployment_name: str,
                 azure_endpoint: str | None = None,
                 api_version: str | None = None,
                 api_key: str | None = None, **kwargs):
        import os

        key = (api_key or os.getenv("AZURE_OPENAI_API_KEY")
               or os.getenv("OPENAI_API_KEY"))
        if not key:
            raise APIKeyNotFoundError("Azure OpenAI key is required")
        endpoint = azure_endpoint or os.getenv("AZURE_OPENAI_ENDPOINT")
        if not endpoint:
            raise APIKeyNotFoundError("Azure endpoint is required")
        version = api_version or os.getenv("OPENAI_API_VERSION")
        if not version:
            raise APIKeyNotFoundError("Azure OpenAI api version is required")
        super().__init__(model=deployment_name, api_key=key,
                         base_url=endpoint, **kwargs)
        self.deployment_name = deployment_name
        self.api_version = version

    @property
    def type(self) -> str:
        return "azure-openai"

    def _headers(self) -> dict:
        return {"api-key": self.api_key}

    def _url(self, shape: str) -> str:
        if shape == "responses":
            path = "/openai/responses"
        else:
            suffix = ("/completions" if shape == "completions"
                      else "/chat/completions")
            path = f"/openai/deployments/{self.deployment_name}{suffix}"
        return f"{self.base_url}{path}?api-version={self.api_version}"


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


class LiteLLMBackend(LLM):
    """Multi-provider routing via the ``litellm`` package (reference:
    extensions/llms/litellm/pandasai_litellm/litellm.py:7-66 — a thin
    wrapper over ``litellm.completion`` with chat-message input and
    first-choice-content output). The package is not bundled in this
    environment, so construction is import-gated; ``completion_fn`` is
    injectable for offline tests of the request/response shaping."""

    def __init__(self, model: str, completion_fn=None, **params):
        if completion_fn is None:
            try:
                from litellm import completion as completion_fn
            except ImportError as e:
                raise ImportError(
                    "LiteLLMBackend requires the 'litellm' package "
                    "(pip install litellm), or pass completion_fn="
                ) from e
        self.model = model
        self.params = params
        self._completion = completion_fn
        self.last_prompt: str | None = None

    @property
    def type(self) -> str:
        return "litellm"

    def call(self, prompt: str, context=None) -> str:
        self.last_prompt = prompt
        memory = getattr(context, "memory", None)
        msgs = memory.to_openai_messages() if memory is not None else []
        msgs.append({"role": "user", "content": prompt})
        resp = self._completion(model=self.model, messages=msgs,
                                **self.params)
        return resp["choices"][0]["message"]["content"]
