"""Agent loop — conversational orchestration over the Spark engine.

Reference parity: pandasai/agent/base.py (chat / follow_up / retries /
execute_sql_query), pandasai/helpers/memory.py, pandasai/llm/,
pandasai/core/{prompts,code_generation,code_execution,response}.
The dataflow underneath is always one of the two engine surfaces:
the semantic-layer compiler or the guarded ``spark.sql`` executor.
"""

from .base import Agent
from .judge import CodeJudge, Evaluation, JudgeParseError
from .llm import (LLM, APIKeyNotFoundError, FakeLLM, HTTPTransport,
                  LLMAPIError, AzureOpenAILLM, LiteLLMBackend,
                  OpenAICompatibleLLM)
from .memory import Memory
from .response import (
    BaseResponse,
    ChartResponse,
    DataFrameResponse,
    ErrorResponse,
    NumberResponse,
    ResponseParser,
    StringResponse,
)
from .skills import Skill, skill, skills_registry

__all__ = [
    "Agent",
    "CodeJudge",
    "Evaluation",
    "JudgeParseError",
    "LLM",
    "FakeLLM",
    "OpenAICompatibleLLM",
    "AzureOpenAILLM",
    "LiteLLMBackend",
    "HTTPTransport",
    "LLMAPIError",
    "APIKeyNotFoundError",
    "Memory",
    "BaseResponse",
    "NumberResponse",
    "StringResponse",
    "DataFrameResponse",
    "ChartResponse",
    "ErrorResponse",
    "ResponseParser",
    "Skill",
    "skill",
    "skills_registry",
]
