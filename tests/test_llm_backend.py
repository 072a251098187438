"""Offline tests for the OpenAI-compatible backend: request shaping,
API-shape routing, response parsing, and error mapping — all through an
injected fake transport, never the network (the reference's extension
tests mock the client the same way; extensions/llms/openai)."""

import pytest

from pandas_ai_spark.agent import (
    Agent,
    APIKeyNotFoundError,
    LLMAPIError,
    Memory,
    OpenAICompatibleLLM,
)


class FakeTransport:
    def __init__(self, reply):
        self.reply = reply
        self.calls = []

    def post(self, url, headers, payload):
        self.calls.append({"url": url, "headers": headers,
                           "payload": payload})
        if isinstance(self.reply, Exception):
            raise self.reply
        return self.reply


CHAT_REPLY = {"choices": [{"message": {"content": "chat says hi"}}]}
COMPLETION_REPLY = {"choices": [{"text": "completion says hi"}]}
RESPONSES_REPLY = {"output_text": "responses says hi"}


def _llm(model, reply, **kw):
    t = FakeTransport(reply)
    llm = OpenAICompatibleLLM(model=model, api_key="sk-test",
                              transport=t, **kw)
    return llm, t


# -- routing ---------------------------------------------------------------

def test_gpt5_routes_to_responses_api():
    llm, t = _llm("gpt-5-mini", RESPONSES_REPLY)
    assert llm.call("hello") == "responses says hi"
    assert t.calls[0]["url"].endswith("/responses")


def test_gpt4_routes_to_chat_api():
    llm, t = _llm("gpt-4.1-mini", CHAT_REPLY)
    assert llm.call("hello") == "chat says hi"
    assert t.calls[0]["url"].endswith("/chat/completions")


def test_instruct_routes_to_completions_api():
    llm, t = _llm("gpt-3.5-turbo-instruct", COMPLETION_REPLY)
    assert llm.call("hello") == "completion says hi"
    assert t.calls[0]["url"].endswith("/completions")
    assert t.calls[0]["payload"]["prompt"] == "hello"


def test_finetuned_model_routes_by_base_name():
    llm, _ = _llm("ft:gpt-5-mini:org::id", RESPONSES_REPLY)
    assert llm._api_shape == "responses"


# -- payload shaping -------------------------------------------------------

def test_chat_payload_has_sampling_params():
    llm, t = _llm("gpt-4.1-mini", CHAT_REPLY, temperature=0.3,
                  stop="###", seed=7)
    llm.call("the prompt")
    p = t.calls[0]["payload"]
    assert p["model"] == "gpt-4.1-mini"
    assert p["temperature"] == 0.3
    assert p["presence_penalty"] == 0.6  # reference default
    assert p["stop"] == ["###"]  # wrapped in a list (base.py:151-156)
    assert p["seed"] == 7
    assert p["max_tokens"] == 1000
    assert p["messages"][-1] == {"role": "user", "content": "the prompt"}


def test_responses_payload_omits_sampling_params():
    """Reasoning models reject temperature/top_p — the responses shape
    must carry reasoning.effort + text.verbosity instead
    (base.py:117-145)."""
    llm, t = _llm("gpt-5", RESPONSES_REPLY, temperature=0.9,
                  reasoning_effort="high", verbosity="medium",
                  max_output_tokens=2048)
    llm.call("the prompt")
    p = t.calls[0]["payload"]
    assert "temperature" not in p and "top_p" not in p
    assert p["reasoning"] == {"effort": "high"}
    assert p["text"] == {"verbosity": "medium"}
    assert p["max_output_tokens"] == 2048
    assert p["input"][-1] == {"role": "user", "content": "the prompt"}


def test_responses_max_output_tokens_falls_back_to_max_tokens():
    llm, t = _llm("gpt-5", RESPONSES_REPLY, max_output_tokens=None,
                  max_tokens=333)
    llm.call("x")
    assert t.calls[0]["payload"]["max_output_tokens"] == 333


def test_auth_header_and_base_url_override():
    llm, t = _llm("gpt-4o", CHAT_REPLY, base_url="http://localhost:8000/v1/")
    llm.call("x")
    c = t.calls[0]
    assert c["headers"]["Authorization"] == "Bearer sk-test"
    assert c["url"] == "http://localhost:8000/v1/chat/completions"


def test_memory_rides_as_messages():
    mem = Memory(agent_description="you are a data analyst")
    mem.add("first question", is_user=True)
    mem.add("first answer", is_user=False)

    class Ctx:
        memory = mem

    llm, t = _llm("gpt-4o", CHAT_REPLY)
    llm.call("second question", context=Ctx())
    msgs = t.calls[0]["payload"]["messages"]
    assert msgs[0] == {"role": "system", "content": "you are a data analyst"}
    assert msgs[1]["role"] == "user" and msgs[2]["role"] == "assistant"
    assert msgs[-1] == {"role": "user", "content": "second question"}


# -- parsing ---------------------------------------------------------------

def test_responses_parse_walks_output_blocks():
    reply = {"output": [
        {"type": "reasoning", "content": []},
        {"type": "message", "content": [
            {"type": "output_text", "text": "part one "},
            {"type": "output_text", "text": "part two"},
        ]},
    ]}
    llm, _ = _llm("gpt-5-nano", reply)
    assert llm.call("x") == "part one part two"


def test_generate_code_strips_fences():
    llm, _ = _llm("gpt-4o", {"choices": [{"message": {
        "content": "```python\nresult = 1\n```"}}]})
    assert llm.generate_code("x") == "result = 1"


# -- errors ----------------------------------------------------------------

def test_missing_api_key_raises(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    with pytest.raises(APIKeyNotFoundError):
        OpenAICompatibleLLM(model="gpt-4o")


def test_transport_error_propagates():
    llm, _ = _llm("gpt-4o", LLMAPIError("HTTP 429: rate limited", 429))
    with pytest.raises(LLMAPIError, match="429"):
        llm.call("x")


def test_agent_end_to_end_with_fake_transport(spark):
    """The real backend drives the full agent loop — code extraction,
    guarded SQL, response parsing — with only the transport faked."""
    import pandas_ai_spark as pai

    from conftest import SF_SMOKE

    sdf = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    df = pai.DataFrame(sdf, schema=pai.DataFrame.get_default_schema(
        sdf, "orders"))
    reply = {"choices": [{"message": {"content":
        '```python\n'
        'out = execute_sql_query("SELECT count(*) AS n FROM orders")\n'
        'result = {"type": "number", "value": int(out["n"][0])}\n```'}}]}
    llm = OpenAICompatibleLLM(model="gpt-4o", api_key="sk-test",
                              transport=FakeTransport(reply))
    agent = Agent([df], llm=llm)
    resp = agent.chat("how many orders?")
    assert resp.value == 1500


# -- Azure variant ---------------------------------------------------------

def _azure(deployment, reply, **kw):
    from pandas_ai_spark.agent import AzureOpenAILLM

    t = FakeTransport(reply)
    llm = AzureOpenAILLM(
        deployment_name=deployment, api_key="az-test",
        azure_endpoint="https://res.openai.azure.com",
        api_version="2024-10-21", transport=t, **kw)
    return llm, t


def test_azure_chat_url_headers_and_payload():
    llm, t = _azure("my-gpt4o", CHAT_REPLY)
    out = llm.call("hi")
    assert out == "chat says hi"
    c = t.calls[0]
    assert c["url"] == ("https://res.openai.azure.com/openai/deployments/"
                        "my-gpt4o/chat/completions?api-version=2024-10-21")
    assert c["headers"] == {"api-key": "az-test"}
    assert "Authorization" not in c["headers"]
    assert c["payload"]["messages"][-1] == {"role": "user", "content": "hi"}


def test_azure_responses_url_is_resource_level():
    llm, t = _azure("gpt-5-mini", RESPONSES_REPLY)
    assert llm.call("hi") == "responses says hi"
    c = t.calls[0]
    assert c["url"] == ("https://res.openai.azure.com/openai/responses"
                        "?api-version=2024-10-21")
    assert c["payload"]["model"] == "gpt-5-mini"
    assert c["payload"]["reasoning"] == {"effort": "medium"}


def test_azure_completions_deployment_url():
    llm, t = _azure("gpt-35-instruct", COMPLETION_REPLY)
    assert llm.call("hi") == "completion says hi"
    assert t.calls[0]["url"].endswith(
        "/openai/deployments/gpt-35-instruct/completions"
        "?api-version=2024-10-21")
    assert t.calls[0]["payload"]["prompt"] == "hi"


def test_azure_missing_credentials_raise(monkeypatch):
    from pandas_ai_spark.agent import AzureOpenAILLM

    for var in ("AZURE_OPENAI_API_KEY", "OPENAI_API_KEY",
                "AZURE_OPENAI_ENDPOINT", "OPENAI_API_VERSION"):
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(APIKeyNotFoundError, match="key"):
        AzureOpenAILLM("dep")
    with pytest.raises(APIKeyNotFoundError, match="endpoint"):
        AzureOpenAILLM("dep", api_key="k")
    with pytest.raises(APIKeyNotFoundError, match="version"):
        AzureOpenAILLM("dep", api_key="k",
                       azure_endpoint="https://r.openai.azure.com")


def test_azure_env_credentials(monkeypatch):
    from pandas_ai_spark.agent import AzureOpenAILLM

    monkeypatch.setenv("AZURE_OPENAI_API_KEY", "envkey")
    monkeypatch.setenv("AZURE_OPENAI_ENDPOINT", "https://e.openai.azure.com/")
    monkeypatch.setenv("OPENAI_API_VERSION", "2024-06-01")
    llm = AzureOpenAILLM("dep", transport=FakeTransport(CHAT_REPLY))
    assert llm.call("x") == "chat says hi"
    assert llm.type == "azure-openai"


# -- LiteLLM routing shell -------------------------------------------------

def test_litellm_backend_shapes_and_parses():
    from pandas_ai_spark.agent import LiteLLMBackend, Memory

    calls = []

    def fake_completion(model, messages, **params):
        calls.append({"model": model, "messages": messages,
                      "params": params})
        return {"choices": [{"message": {"content": "routed reply"}}]}

    llm = LiteLLMBackend("anthropic/some-model",
                         completion_fn=fake_completion, temperature=0.2)

    class Ctx:
        memory = Memory()

    ctx = Ctx()
    ctx.memory.add("earlier question", is_user=True)
    assert llm.call("now answer", ctx) == "routed reply"
    c = calls[0]
    assert c["model"] == "anthropic/some-model"
    assert c["params"] == {"temperature": 0.2}
    assert c["messages"][-1] == {"role": "user", "content": "now answer"}
    assert len(c["messages"]) == 2  # memory replayed ahead of the prompt
    assert llm.type == "litellm"


def test_litellm_backend_import_gated():
    from pandas_ai_spark.agent import LiteLLMBackend

    with pytest.raises(ImportError, match="litellm"):
        LiteLLMBackend("gpt-x")
