"""Sandboxed execution of generated code.

Reference parity: pandasai/sandbox/sandbox.py:4-89 (abstract
``Sandbox.execute(code, env)``) and the Docker implementation's design
(extensions/sandbox/docker/pandasai_docker/docker_sandbox.py:106-206):
SQL is pre-executed on the host — the sandbox never gets cluster
credentials — and only the *results* (serialized frames) cross into the
restricted environment, with ``execute_sql_query`` shimmed to read them.

``RestrictedSandbox`` is the bundled implementation: same
pre-execute-and-ship design, run in-process under a minimal builtins
environment (no imports beyond an allowlist, no file/network access
through provided globals). A container sandbox can subclass and override
``_run`` (docker isn't available in this environment — import-gated).
"""

from __future__ import annotations

import ast
from abc import ABC, abstractmethod
from typing import Any, Callable


class SandboxError(Exception):
    pass


class Sandbox(ABC):
    """Abstract sandbox (sandbox.py:4-89)."""

    def __init__(self):
        self._started = False

    def start(self) -> None:
        self._started = True

    def stop(self) -> None:
        self._started = False

    @abstractmethod
    def execute(self, code: str, env: dict[str, Any]) -> dict[str, Any]:
        """Run ``code``; return the resulting ``result`` dict."""


def extract_sql_from_code(code: str) -> list[str]:
    """Constant SQL literals passed to execute_sql_query — the host
    pre-executes these (docker_sandbox.py:136-160 design)."""
    tree = ast.parse(code)
    out = []
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
                and node.func.id == "execute_sql_query"):
            for a in node.args:
                if isinstance(a, ast.Constant) and isinstance(a.value, str):
                    out.append(a.value)
    return out


_SAFE_BUILTINS = {
    "abs", "all", "any", "bool", "dict", "enumerate", "filter", "float",
    "format", "frozenset", "int", "len", "list", "map", "max", "min",
    "range", "repr", "reversed", "round", "set", "sorted", "str", "sum",
    "tuple", "zip", "print", "isinstance", "Exception", "ValueError",
    "KeyError", "TypeError", "__build_class__", "__name__",
}


class RestrictedSandbox(Sandbox):
    """Pre-execute SQL host-side, then run the code with shimmed
    ``execute_sql_query`` and a reduced builtins set (no ``open``, no
    ``__import__`` beyond the provided pd/np)."""

    def execute(self, code: str, env: dict[str, Any]) -> dict[str, Any]:
        if not self._started:
            self.start()
        host_sql: Callable = env.get("execute_sql_query")
        if host_sql is None:
            raise SandboxError("env must provide execute_sql_query")
        results = {sql: host_sql(sql) for sql in extract_sql_from_code(code)}

        def shimmed(sql: str):
            if sql in results:
                return results[sql]
            # dynamic SQL still goes to the host function (which guards it)
            return host_sql(sql)

        import builtins as _b
        safe_builtins = {n: getattr(_b, n) for n in _SAFE_BUILTINS
                         if hasattr(_b, n)}
        sandbox_env = {k: v for k, v in env.items()
                       if k != "execute_sql_query"}
        sandbox_env["execute_sql_query"] = shimmed
        sandbox_env["__builtins__"] = safe_builtins
        try:
            exec(code, sandbox_env)  # noqa: S102
        except Exception as exc:
            raise SandboxError(f"{type(exc).__name__}: {exc}") from exc
        if "result" not in sandbox_env:
            raise SandboxError("code did not set `result`")
        return sandbox_env["result"]
