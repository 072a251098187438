"""LLM-judge evaluation harness for agent-generated code.

Reference parity: the grishasen fork's defining addition —
tests/unit_tests/agent/test_agent_llm_judge.py:22-210. An LLM scores
each generated code snippet 1-10 against five criteria (correctness,
efficiency, clarity, robustness, best practices) given the question and
a serialized data context; every question must score >5 and the run
average must be >=5, with the average written to a summary file that the
pytest terminal hook reports and removes
(tests/unit_tests/conftest.py:204-217).

The judge here is backend-agnostic: any :class:`~.llm.LLM` works —
an OpenAI-compatible endpoint for real runs (gated on
``JUDGE_OPENAI_API_KEY``), :class:`~.llm.FakeLLM` for offline CI
coverage of the harness itself. Structured output is requested as a
strict JSON object and validated through pydantic, mirroring the
reference's ``client.beta.chat.completions.parse(response_format=
Evaluation)`` contract without requiring the ``openai`` package.
"""

from __future__ import annotations

import json
import re

from pydantic import BaseModel, field_validator

from .llm import LLM

# Same rubric as the reference prompt (test_agent_llm_judge.py:80-96),
# with the result-contract line matching THIS engine's output contract
# (same shape as the reference's: execute_sql_query + typed result dict).
EVALUATION_PROMPT = (
    "You are an AI evaluation expert tasked with assessing the quality "
    "of a code snippet provided as a response.\n"
    "The question was: {question}\n"
    "The AI provided the following code:\n"
    "{code}\n\n"
    "Here is the context summary of the data:\n"
    "{context}\n\n"
    "Evaluate the code based on the following criteria:\n"
    "- Correctness: Does the code achieve the intended goal or answer "
    "the question accurately?\n"
    "- Efficiency: Is the code optimized and avoids unnecessary "
    "computations or steps?\n"
    "- Clarity: Is the code written in a clear and understandable way?\n"
    "- Robustness: Does the code handle potential edge cases or errors "
    "gracefully?\n"
    "- Best Practices: Does the code follow standard coding practices "
    "and conventions?\n"
    "The code should only use the function "
    "execute_sql_query(sql_query: str) -> pd.DataFrame to connect to "
    "the database and get the data.\n"
    "The code should declare the result variable as a dictionary with "
    "the following structure:\n"
    "'type': 'string', 'value': f'The highest salary is 2.' or "
    "'type': 'number', 'value': 125 or "
    "'type': 'dataframe', 'value': pd.DataFrame() or "
    "'type': 'plot', 'value': 'temp_chart.png'\n\n"
    "Respond with ONLY a JSON object, no prose and no code fences: "
    '{{"score": <integer 1-10>, "justification": "<one or two '
    'sentences>"}}'
)


class Evaluation(BaseModel):
    """Judge verdict (reference test_agent_llm_judge.py:17-19)."""

    score: int
    justification: str

    @field_validator("score")
    @classmethod
    def _score_range(cls, v: int) -> int:
        if not 1 <= v <= 10:
            raise ValueError(f"score must be in [1, 10], got {v}")
        return v


class JudgeParseError(ValueError):
    """The judge reply could not be parsed into an Evaluation."""


def _extract_json(raw: str) -> dict:
    """Pull the first JSON object out of a possibly fenced/prefixed
    reply — models occasionally wrap the object despite instructions."""
    text = raw.strip()
    fence = re.search(r"```(?:json)?\s*(.*?)```", text, re.DOTALL)
    if fence:
        text = fence.group(1).strip()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        brace = re.search(r"\{.*\}", text, re.DOTALL)
        if brace:
            try:
                return json.loads(brace.group(0))
            except json.JSONDecodeError:
                pass
    raise JudgeParseError(f"judge reply is not a JSON object: {raw[:200]!r}")


class CodeJudge:
    """Scores generated code with an LLM backend.

    >>> judge = CodeJudge(OpenAICompatibleLLM(model="gpt-4.1-mini",
    ...                                       api_key=key, temperature=0))
    >>> ev = judge.evaluate(question, response.last_code_executed, ctx)
    >>> assert ev.score > 5, ev.justification
    """

    def __init__(self, llm: LLM, prompt_template: str = EVALUATION_PROMPT):
        self.llm = llm
        self.prompt_template = prompt_template
        self.scores: list[int] = []

    def evaluate(self, question: str, code: str, context: str) -> Evaluation:
        if not code:
            raise ValueError("no code to evaluate (agent produced none)")
        prompt = self.prompt_template.format(
            question=question, code=code, context=context)
        ev = Evaluation(**_extract_json(self.llm.call(prompt)))
        self.scores.append(ev.score)
        return ev

    @property
    def average_score(self) -> float | None:
        if not self.scores:
            return None
        return sum(self.scores) / len(self.scores)

    def write_summary(self, path) -> float | None:
        """Write the run-average score to ``path`` (the reference's
        ``test_agent_llm_judge.txt`` contract: bare number, one line —
        consumed and removed by the pytest terminal-summary hook)."""
        avg = self.average_score
        if avg is not None:
            with open(path, "w") as f:
                f.write(f"{avg}")
        return avg
