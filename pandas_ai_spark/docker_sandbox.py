"""Container-isolated sandbox driven through the ``docker`` CLI.

Reference parity: extensions/sandbox/docker/pandasai_docker/
docker_sandbox.py:106-206 — the container runs with networking disabled,
SQL is pre-executed HOST-side (the container never holds cluster
credentials), query results ship in as CSV files, ``execute_sql_query``
is shimmed inside the container to read them back, and the result
returns as a serialized type/value envelope.

Differences from the reference implementation, by design:

- Driven via the ``docker`` binary through ``subprocess`` (no
  ``docker-py`` dependency); construction fails fast when the binary is
  absent unless a ``runner`` is injected.
- The program is copied in with ``docker cp`` and run with
  ``docker exec python /tmp/<file>.py`` — no shell-quoted ``-c`` string
  (the reference escapes quotes into a command line, which corrupts
  code containing escape sequences).
- The same AST gate used by the in-process sandboxes is applied before
  shipping (defense in depth; the container is the hard boundary).
- The reply envelope is JSON with DataFrames as CSV text — data-only,
  parsed with trusted constructors; nothing is unpickled.

``runner`` is injectable (``runner(argv, input=None) ->
(returncode, stdout, stderr)``) so the full protocol is contract-tested
without a Docker daemon; real runs are gated on the binary being
present.
"""

from __future__ import annotations

import io
import json
import os
import shutil
import subprocess
import tempfile
import uuid
from typing import Any, Callable, Optional

from .sandbox import (Sandbox, SandboxError, assert_code_safe,
                      extract_sql_from_code)

_CHILD_TEMPLATE = r'''
import io, json, os, sys
import pandas as pd

datasets_map = {datasets_map}

def execute_sql_query(sql_query):
    path = os.path.join("/tmp", datasets_map[sql_query])
    return pd.read_csv(path)

_env = {{"execute_sql_query": execute_sql_query}}
exec(compile({code!r}, "<sandboxed>", "exec"), _env)
if "result" not in _env:
    print(json.dumps({{"ok": False, "error": "code did not set `result`"}}))
    raise SystemExit(0)

def _encode(obj):
    if isinstance(obj, pd.DataFrame):
        return {{"__type__": "df", "csv": obj.to_csv(index=False)}}
    if isinstance(obj, dict):
        return {{str(k): _encode(v) for k, v in obj.items()}}
    if isinstance(obj, (list, tuple)):
        return [_encode(x) for x in obj]
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    return repr(obj)

print(json.dumps({{"ok": True, "result": _encode(_env["result"])}}))
'''


def _default_runner(argv: list[str], input: Optional[bytes] = None,
                    timeout: Optional[float] = None
                    ) -> tuple[int, bytes, bytes]:
    proc = subprocess.run(argv, input=input, capture_output=True,
                          timeout=timeout)
    return proc.returncode, proc.stdout, proc.stderr


class DockerSandbox(Sandbox):
    """Network-disabled container sandbox over the docker CLI.

    The container is resource-bounded at ``docker run`` time
    (``--memory``/``--memory-swap`` equal so there is no swap headroom,
    ``--pids-limit`` against fork bombs, ``--cpus``), and every exec is
    wall-clock bounded by ``timeout_sec`` — on expiry the container is
    force-removed so a runaway loop cannot pin the host.
    """

    def __init__(self, image: str = "python:3.11-slim",
                 docker_bin: Optional[str] = None,
                 timeout_sec: float = 60.0,
                 memory_mb: int = 1024,
                 pids_limit: int = 256,
                 cpus: float = 1.0,
                 runner: Optional[Callable] = None):
        super().__init__()
        self.image = image
        self.timeout_sec = timeout_sec
        self.memory_mb = memory_mb
        self.pids_limit = pids_limit
        self.cpus = cpus
        self._runner = runner or _default_runner
        self._runner_takes_timeout = self._accepts_timeout(self._runner)
        self._container: Optional[str] = None
        if runner is None:
            docker_bin = docker_bin or shutil.which("docker")
            if not docker_bin:
                raise SandboxError(
                    "DockerSandbox requires the 'docker' binary on PATH "
                    "(or an injected `runner` for testing); use "
                    "SubprocessSandbox for daemonless process isolation.")
        self.docker_bin = docker_bin or "docker"

    @staticmethod
    def _accepts_timeout(runner: Callable) -> bool:
        import inspect
        try:
            sig = inspect.signature(runner)
        except (TypeError, ValueError):
            return False
        params = sig.parameters.values()
        return any(p.name == "timeout" or p.kind == p.VAR_KEYWORD
                   for p in params)

    def _run(self, argv: list[str], input: Optional[bytes] = None,
             timeout: Optional[float] = None
             ) -> tuple[int, bytes, bytes]:
        """Invoke the runner; on timeout, force-remove the container."""
        try:
            if timeout is not None and self._runner_takes_timeout:
                return self._runner(argv, input=input, timeout=timeout)
            return self._runner(argv, input=input)
        except subprocess.TimeoutExpired:
            # the docker CLI client died, but the container-side process
            # is still running — tear the container down before raising
            self.stop()
            raise SandboxError(
                f"sandboxed code exceeded timeout_sec={self.timeout_sec}; "
                f"container removed") from None

    # -- lifecycle (docker_sandbox.py:69-92) -------------------------------

    def start(self) -> None:
        if self._started:
            return
        name = f"pandas-ai-spark-sbx-{uuid.uuid4().hex[:12]}"
        rc, out, err = self._run([
            self.docker_bin, "run", "-d", "--network=none",
            f"--memory={self.memory_mb}m",
            f"--memory-swap={self.memory_mb}m",
            f"--pids-limit={self.pids_limit}",
            f"--cpus={self.cpus}",
            "--name", name, self.image, "sleep", "infinity"],
            # first run may pull the image — allow a more generous bound
            timeout=max(self.timeout_sec, 300.0))
        if rc != 0:
            raise SandboxError(
                f"failed to start sandbox container: "
                f"{err.decode(errors='replace')[:300]}")
        self._container = name
        self._started = True

    def stop(self) -> None:
        if self._started and self._container:
            name, self._container = self._container, None
            self._started = False
            self._runner([self.docker_bin, "rm", "-f", name])

    def __del__(self):
        try:
            self.stop()
        except Exception:
            pass

    # -- file transfer (docker_sandbox.py:186-206) -------------------------

    def _copy_in(self, content: str, filename: str) -> None:
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, filename)
            with open(path, "w") as f:
                f.write(content)
            rc, _out, err = self._run([
                self.docker_bin, "cp", path,
                f"{self._container}:/tmp/{filename}"],
                timeout=self.timeout_sec)
            if rc != 0:
                raise SandboxError(
                    f"failed to copy {filename} into sandbox: "
                    f"{err.decode(errors='replace')[:300]}")

    # -- execution (docker_sandbox.py:106-184) -----------------------------

    def execute(self, code: str, env: dict[str, Any]) -> Any:
        if not self._started:
            self.start()
        host_sql = env.get("execute_sql_query")
        if host_sql is None:
            raise SandboxError("env must provide execute_sql_query")
        assert_code_safe(code)

        # host pre-executes every constant SQL literal; only CSV results
        # cross the boundary (the container never sees a SparkSession)
        datasets_map: dict[str, str] = {}
        for sql in extract_sql_from_code(code):
            filename = f"{uuid.uuid4().hex}.csv"
            frame = host_sql(sql)
            if hasattr(frame, "toPandas"):  # Spark DataFrame
                frame = frame.toPandas()
            self._copy_in(frame.to_csv(index=False), filename)
            datasets_map[sql] = filename

        program = _CHILD_TEMPLATE.format(
            datasets_map=repr(datasets_map), code=code)
        prog_name = f"prog_{uuid.uuid4().hex}.py"
        self._copy_in(program, prog_name)

        rc, out, err = self._run([
            self.docker_bin, "exec", self._container,
            "python", f"/tmp/{prog_name}"],
            timeout=self.timeout_sec)
        if rc != 0:
            raise SandboxError(
                f"sandboxed code failed (rc={rc}): "
                f"{err.decode(errors='replace')[-500:]}")
        try:
            reply = json.loads(out.decode())
        except Exception as exc:
            raise SandboxError(
                f"sandbox returned undecodable result: {exc}") from exc
        if not isinstance(reply, dict) or "ok" not in reply:
            raise SandboxError("malformed sandbox reply")
        if not reply.get("ok"):
            raise SandboxError(reply.get("error", "unknown sandbox error"))
        return _decode_json_result(reply.get("result"))


def _decode_json_result(obj: Any) -> Any:
    """Rebuild the JSON envelope with trusted constructors only."""
    import pandas as pd

    if isinstance(obj, dict):
        if obj.get("__type__") == "df":
            return pd.read_csv(io.StringIO(obj["csv"]))
        return {k: _decode_json_result(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_decode_json_result(x) for x in obj]
    return obj
