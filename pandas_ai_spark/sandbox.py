"""Sandboxed execution of generated code.

Reference parity: pandasai/sandbox/sandbox.py:4-89 (abstract
``Sandbox.execute(code, env)``) and the Docker implementation's design
(extensions/sandbox/docker/pandasai_docker/docker_sandbox.py:106-206):
SQL is pre-executed on the host — the sandbox never gets cluster
credentials — and only the *results* (serialized frames) cross into the
restricted environment, with ``execute_sql_query`` shimmed to read them.

Two implementations:

- ``RestrictedSandbox`` — in-process: AST-gated (imports allowlisted,
  dunder attribute access and introspection builtins rejected before
  exec) plus a reduced builtins dict. This is *convenience isolation*
  against accidental misuse, not a hard security boundary — CPython
  offers no in-process jail; anything security-critical should use
  ``SubprocessSandbox``.
- ``SubprocessSandbox`` — process isolation (the no-Docker analogue of
  the reference's container sandbox): same pre-execute-and-ship design,
  but the code runs in a ``python -I`` child with resource rlimits
  (address space / CPU / file descriptors), a scrubbed environment (no
  inherited env vars, so no credentials), sockets disabled, and the same
  AST gate applied inside the child. Results cross back over a pickle
  pipe read through a restricted unpickler (numpy/pandas/builtin types
  only).
"""

from __future__ import annotations

import ast
import datetime
import io
import os
import pickle
import subprocess
import sys
import tempfile
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


# Imports the generated code may perform (reference WHITELISTED_LIBRARIES
# notion: pandas/numpy/plotting plus pure-computation stdlib).
_ALLOWED_IMPORTS = {
    "math", "re", "json", "datetime", "statistics", "itertools",
    "functools", "collections", "random", "numpy", "pandas",
    "matplotlib", "matplotlib.pyplot",
}

# Builtins that defeat any in-process restriction if reachable.
_BANNED_CALLS = {
    "eval", "exec", "compile", "open", "input", "breakpoint", "globals",
    "locals", "vars", "getattr", "setattr", "delattr", "__import__",
    "memoryview", "exit", "quit", "help",
}

# Non-dunder introspection attributes that leak frames/builtins:
# generator/coroutine frames (`(x for x in ()).gi_frame.f_builtins` hands
# back the REAL builtins dict), frame globals, traceback frames.
_BANNED_ATTRS = {
    "gi_frame", "gi_code", "gi_yieldfrom", "cr_frame", "cr_code",
    "ag_frame", "ag_code", "f_builtins", "f_globals", "f_locals",
    "f_back", "f_code", "tb_frame", "tb_next", "func_globals",
    "func_code",
}


def assert_code_safe(code: str) -> None:
    """AST gate run *before* exec: rejects non-allowlisted imports, any
    dunder attribute access (``().__class__.__base__...`` escapes), and
    introspection builtins. Raises :class:`SandboxError`."""
    try:
        tree = ast.parse(code)
    except SyntaxError as exc:
        raise SandboxError(f"SyntaxError: {exc}") from exc
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name not in _ALLOWED_IMPORTS:
                    raise SandboxError(f"import of '{a.name}' not allowed")
        elif isinstance(node, ast.ImportFrom):
            mod = node.module or ""
            if mod not in _ALLOWED_IMPORTS and \
                    mod.split(".")[0] not in _ALLOWED_IMPORTS:
                raise SandboxError(f"import from '{mod}' not allowed")
        elif isinstance(node, ast.Attribute):
            if node.attr.startswith("__"):
                raise SandboxError(
                    f"dunder attribute access '{node.attr}' not allowed")
            if node.attr in _BANNED_ATTRS:
                raise SandboxError(
                    f"introspection attribute '{node.attr}' not allowed")
        elif isinstance(node, ast.Name):
            if node.id.startswith("__") and node.id != "__name__":
                raise SandboxError(f"dunder name '{node.id}' not allowed")
        elif isinstance(node, ast.Call):
            if isinstance(node.func, ast.Name) and \
                    node.func.id in _BANNED_CALLS:
                raise SandboxError(f"call to '{node.func.id}' not allowed")


_SAFE_BUILTINS = {
    "abs", "all", "any", "bool", "dict", "enumerate", "filter", "float",
    "format", "frozenset", "int", "len", "list", "map", "max", "min",
    "range", "repr", "reversed", "round", "set", "sorted", "str", "sum",
    "tuple", "zip", "print", "isinstance", "Exception", "ValueError",
    "KeyError", "TypeError", "__build_class__", "__name__",
}


class RestrictedSandbox(Sandbox):
    """Pre-execute SQL host-side, then run the code in-process behind the
    AST gate (:func:`assert_code_safe`) with a reduced builtins set.

    Convenience isolation only — same trust level as the reference's
    in-process default. For a real boundary use :class:`SubprocessSandbox`.
    """

    def execute(self, code: str, env: dict[str, Any]) -> dict[str, Any]:
        if not self._started:
            self.start()
        host_sql: Callable = env.get("execute_sql_query")
        if host_sql is None:
            raise SandboxError("env must provide execute_sql_query")
        assert_code_safe(code)
        results = {sql: host_sql(sql) for sql in extract_sql_from_code(code)}

        def shimmed(sql: str):
            if sql in results:
                return results[sql]
            # dynamic SQL still goes to the host function (which guards it)
            return host_sql(sql)

        import builtins as _b
        safe_builtins = {n: getattr(_b, n) for n in _SAFE_BUILTINS
                         if hasattr(_b, n)}
        # AST gate rejects `import` of anything outside _ALLOWED_IMPORTS;
        # the gated imports still need a working __import__ at runtime.
        safe_builtins["__import__"] = _b.__import__
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


# --------------------------------------------------------------------------
# Subprocess isolation
# --------------------------------------------------------------------------

# The child's reply is a data-only envelope: every value is reduced to
# pickle primitives (dict/list/str/bytes/int/float/bool/None) before
# pickling, with rich types carried as tagged dicts — DataFrames as Arrow
# IPC bytes, ndarrays as .npy bytes (allow_pickle=False both ways),
# timestamps as ISO strings. A pickle of pure primitives contains no
# GLOBAL opcodes, so the parent's unpickler rejects *every* global
# outright: no constructor — not even pandas.eval or numpy.load reached
# via an allowlisted module prefix — can run host-side during load.

_TAG = "__sbx__"  # marker key for tagged rich values


def _encode_result(obj: Any) -> Any:
    """Reduce obj to pickle primitives (child-side, shared module)."""
    import numpy as np
    import pandas as pd

    if obj is None or isinstance(obj, (bool, int, float, str, bytes)):
        return obj
    if isinstance(obj, np.generic):
        return _encode_result(obj.item())
    if isinstance(obj, pd.DataFrame):
        import pyarrow as pa
        table = pa.Table.from_pandas(obj, preserve_index=True)
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, table.schema) as writer:
            writer.write_table(table)
        return {_TAG: "df", "v": sink.getvalue()}
    if isinstance(obj, pd.Series):
        return {_TAG: "series", "name": _encode_result(obj.name),
                "v": _encode_result(obj.to_frame("__values__"))}
    if isinstance(obj, np.ndarray):
        try:
            sink = io.BytesIO()
            np.lib.format.write_array(sink, obj, allow_pickle=False)
            return {_TAG: "npy", "v": sink.getvalue()}
        except Exception:  # object dtype — degrade to a tagged list
            return {_TAG: "ndarray_list", "v": [_encode_result(x)
                                                for x in obj.tolist()]}
    if obj is pd.NaT:  # NaT subclasses datetime; isoformat() would be 'NaT'
        return {_TAG: "nat"}
    if isinstance(obj, pd.Timestamp):
        return {_TAG: "ts", "v": obj.isoformat()}
    if isinstance(obj, datetime.datetime):
        return {_TAG: "dt", "v": obj.isoformat()}
    if isinstance(obj, datetime.date):
        return {_TAG: "date", "v": obj.isoformat()}
    if isinstance(obj, tuple):
        return {_TAG: "tuple", "v": [_encode_result(x) for x in obj]}
    if isinstance(obj, (set, frozenset)):
        return {_TAG: "set", "frozen": isinstance(obj, frozenset),
                "v": [_encode_result(x) for x in obj]}
    if isinstance(obj, list):
        return [_encode_result(x) for x in obj]
    if isinstance(obj, dict):
        keys, vals = [], []
        for k, v in obj.items():
            # Non-primitive keys (tuple keys from multi-key groupbys) go
            # through the envelope too, so they decode back unchanged.
            keys.append(k if isinstance(k, (str, int, float, bool))
                        or k is None else _encode_result(k))
            vals.append(_encode_result(v))
        return {_TAG: "dict", "k": keys, "v": vals}
    # Last resort: a lossy but safe string form (charts return paths, the
    # response contract validates types downstream anyway).
    return {_TAG: "repr", "v": repr(obj)}


def _freeze(obj: Any) -> Any:
    """Make a decoded value hashable for use as a dict key / set member."""
    if isinstance(obj, list):
        return tuple(_freeze(x) for x in obj)
    return obj


def _decode_result(obj: Any) -> Any:
    """Rebuild rich values parent-side using trusted constructors only."""
    import numpy as np
    import pandas as pd

    if isinstance(obj, list):
        return [_decode_result(x) for x in obj]
    if not isinstance(obj, dict):
        return obj
    tag = obj.get(_TAG)
    if tag is None:  # plain dict pickled by an older/foreign producer
        return {k: _decode_result(v) for k, v in obj.items()}
    if tag == "dict":
        return {_freeze(_decode_result(k)): _decode_result(v)
                for k, v in zip(obj["k"], obj["v"])}
    if tag == "set":
        vals = [_freeze(_decode_result(x)) for x in obj["v"]]
        return frozenset(vals) if obj.get("frozen") else set(vals)
    if tag == "nat":
        return pd.NaT
    if tag == "df":
        import pyarrow as pa
        with pa.ipc.open_stream(io.BytesIO(obj["v"])) as reader:
            return reader.read_all().to_pandas()
    if tag == "series":
        frame = _decode_result(obj["v"])
        series = frame["__values__"]
        series.name = _decode_result(obj["name"])
        return series
    if tag == "npy":
        return np.lib.format.read_array(io.BytesIO(obj["v"]),
                                        allow_pickle=False)
    if tag == "ndarray_list":
        return np.array(_decode_result(obj["v"]), dtype=object)
    if tag == "ts":
        return pd.Timestamp(obj["v"])
    if tag == "dt":
        return datetime.datetime.fromisoformat(obj["v"])
    if tag == "date":
        return datetime.date.fromisoformat(obj["v"])
    if tag == "tuple":
        return tuple(_decode_result(x) for x in obj["v"])
    if tag == "repr":
        return obj["v"]
    raise pickle.UnpicklingError(f"unknown sandbox result tag {tag!r}")


class _SafeUnpickler(pickle.Unpickler):
    """Rejects ALL globals — the reply envelope is primitives-only."""

    def find_class(self, module: str, name: str):  # noqa: D102
        raise pickle.UnpicklingError(
            f"sandbox reply must be data-only; global {module}.{name} "
            "is not permitted")


def _safe_loads(data: bytes) -> Any:
    return _SafeUnpickler(io.BytesIO(data)).load()


# Harness executed as the child's __main__ under `python -I`. Receives a
# pickled {code, sql_results} payload on stdin; applies rlimits, disables
# sockets, AST-gates the code again (defense in depth), execs, and writes
# a pickled {ok, result | error} to stdout.
_CHILD_HARNESS = r"""
import io, pickle, sys

payload = pickle.load(sys.stdin.buffer)
# -I wipes sys.path of env influence; re-add only the package root.
sys.path.insert(0, payload["pkg_root"])
out = sys.stdout.buffer
sys.stdout = sys.stderr  # user print() goes to stderr, not the pipe

def _reply(obj):
    pickle.dump(obj, out, protocol=4)
    out.flush()

try:
    import resource
    mem = payload.get("mem_bytes")
    if mem:
        resource.setrlimit(resource.RLIMIT_AS, (mem, mem))
    cpu = payload.get("cpu_sec")
    if cpu:
        resource.setrlimit(resource.RLIMIT_CPU, (cpu, cpu))
    resource.setrlimit(resource.RLIMIT_NOFILE, (256, 256))
except Exception:
    pass

# Disable network: socket construction raises. Stays a class so ssl's
# `class SSLSocket(socket.socket)` still imports.
import socket as _socket
class _NoSocket(_socket.socket):
    def __init__(self, *a, **k):
        raise OSError("network access is disabled in the sandbox")
def _no_conn(*a, **k):
    raise OSError("network access is disabled in the sandbox")
_socket.socket = _NoSocket
_socket.create_connection = _no_conn
_socket.socketpair = _no_conn

from pandas_ai_spark.sandbox import (SandboxError, _SAFE_BUILTINS,
                                     _encode_result, assert_code_safe)

code = payload["code"]
sql_results = payload["sql_results"]

def execute_sql_query(sql):
    if sql not in sql_results:
        raise SandboxError(
            "dynamic SQL is not available inside SubprocessSandbox; "
            "pass SQL as a string literal so the host can pre-execute it")
    return sql_results[sql]

try:
    assert_code_safe(code)
    import builtins as _b
    safe_builtins = {n: getattr(_b, n) for n in _SAFE_BUILTINS
                     if hasattr(_b, n)}
    safe_builtins["__import__"] = _b.__import__
    env = {"execute_sql_query": execute_sql_query,
           "__builtins__": safe_builtins}
    import numpy as np
    import pandas as pd
    env["pd"] = pd
    env["np"] = np
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        env["plt"] = plt
    except ImportError:
        pass
    exec(code, env)
    if "result" not in env:
        raise SandboxError("code did not set `result`")
    _reply({"ok": True, "result": _encode_result(env["result"])})
except Exception as exc:
    _reply({"ok": False, "error": f"{type(exc).__name__}: {exc}"})
"""


class SubprocessSandbox(Sandbox):
    """Process-isolated sandbox — the no-Docker analogue of the
    reference's ``DockerSandbox`` (docker_sandbox.py:106-206).

    Same data-flow contract as the container design: SQL literals are
    pre-executed on the host (the child never sees a SparkSession or
    credentials); only serialized result frames are shipped in. The child
    runs ``python -I`` (isolated mode: no user site, no PYTHONPATH pickup
    beyond what we pass) with:

    - a scrubbed environment — no inherited env vars, so API keys in the
      parent's environment cannot be read or exfiltrated;
    - rlimits on address space (default 2 GiB), CPU time, and open fds;
    - socket creation disabled (plus the AST import gate, which already
      rejects ``import socket``);
    - the same :func:`assert_code_safe` AST gate, applied child-side too;
    - results returned through :class:`_SafeUnpickler` (numpy/pandas/
      builtin types only), so a compromised child can't execute code in
      the parent via the pickle channel.

    Dynamic (non-literal) SQL raises inside the child — by design there
    is no callback channel to the host, matching the container sandbox.
    Charts are written under the working directory (the designed output
    channel, as the container smuggles charts back via base64).
    """

    def __init__(self, timeout_sec: float = 60.0,
                 mem_bytes: int = 2 << 30, cpu_sec: int = 30):
        super().__init__()
        self.timeout_sec = timeout_sec
        self.mem_bytes = mem_bytes
        self.cpu_sec = cpu_sec

    def execute(self, code: str, env: dict[str, Any]) -> dict[str, Any]:
        if not self._started:
            self.start()
        host_sql: Callable = env.get("execute_sql_query")
        if host_sql is None:
            raise SandboxError("env must provide execute_sql_query")
        assert_code_safe(code)
        sql_results = {sql: host_sql(sql)
                       for sql in extract_sql_from_code(code)}
        # -I ignores PYTHONPATH; the harness needs the package importable
        # for the shared AST gate, so its root rides in the payload.
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        payload = pickle.dumps(
            {"code": code, "sql_results": sql_results,
             "mem_bytes": self.mem_bytes, "cpu_sec": self.cpu_sec,
             "pkg_root": pkg_root},
            protocol=4)
        child_env = {
            "HOME": tempfile.gettempdir(),
            "MPLCONFIGDIR": tempfile.gettempdir(),
        }
        try:
            proc = subprocess.run(
                [sys.executable, "-I", "-c", _CHILD_HARNESS],
                input=payload, capture_output=True,
                timeout=self.timeout_sec, env=child_env, cwd=os.getcwd(),
            )
        except subprocess.TimeoutExpired as exc:
            raise SandboxError(
                f"sandboxed code exceeded {self.timeout_sec}s") from exc
        if not proc.stdout:
            tail = proc.stderr.decode(errors="replace")[-500:]
            raise SandboxError(
                f"sandbox child died (rc={proc.returncode}): {tail}")
        try:
            reply = _safe_loads(proc.stdout)
        except Exception as exc:
            raise SandboxError(
                f"sandbox returned undecodable result: {exc}") from exc
        if not isinstance(reply, dict) or "ok" not in reply:
            raise SandboxError("malformed sandbox reply")
        if not reply.get("ok"):
            raise SandboxError(reply.get("error", "unknown sandbox error"))
        try:
            return _decode_result(reply.get("result"))
        except SandboxError:
            raise
        except Exception as exc:
            raise SandboxError(
                f"sandbox result failed to decode: {exc}") from exc
