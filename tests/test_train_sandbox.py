"""Vectorstore train/retrieval + sandbox execution tests (reference:
tests for Agent.train and the docker sandbox design)."""

import pytest

import pandas_ai_spark as pai
from pandas_ai_spark.agent import Agent, FakeLLM
from pandas_ai_spark.sandbox import RestrictedSandbox, Sandbox, SandboxError
from pandas_ai_spark.vectorstore import LocalVectorStore, render_training_section

from conftest import SF_SMOKE


@pytest.fixture()
def orders(spark):
    sdf = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    return pai.DataFrame(sdf, schema=pai.DataFrame.get_default_schema(sdf, "orders"))


def test_vectorstore_qa_retrieval():
    vs = LocalVectorStore()
    vs.add_question_answer(
        ["how many orders are there", "top customers by revenue"],
        ["SELECT count(*) FROM orders", "SELECT ... revenue"])
    got = vs.get_relevant_question_answers("count of orders", k=1)
    assert got[0]["question"] == "how many orders are there"


def test_vectorstore_docs_retrieval():
    vs = LocalVectorStore()
    vs.add_docs(["orders table holds one row per order",
                 "customer table has demographics"])
    got = vs.get_relevant_docs("order rows", k=1)
    assert "orders" in got[0]


def test_vectorstore_delete():
    vs = LocalVectorStore()
    ids = vs.add_question_answer(["q"], ["c"])
    vs.delete_question_and_answers(ids)
    assert vs.get_relevant_question_answers("q") == []


def test_agent_train_injects_prompt(orders):
    llm = FakeLLM(
        '```python\n'
        'df = execute_sql_query("SELECT count(*) AS n FROM orders")\n'
        'result = {"type": "number", "value": int(df["n"][0])}\n```')
    agent = Agent([orders], llm=llm)
    agent.train(queries=["how many orders"],
                codes=['execute_sql_query("SELECT count(*) FROM orders")'],
                docs=["the orders table is one row per order"])
    agent.chat("how many orders are there?")
    assert "similar questions answered before" in llm.last_prompt
    assert "Relevant documentation" in llm.last_prompt


def test_agent_train_requires_pairs(orders):
    agent = Agent([orders])
    with pytest.raises(ValueError, match="Both queries and codes"):
        agent.train(queries=["only a query"])


def test_render_training_section_empty():
    assert render_training_section([], []) == ""


# -- parquet vectorstore ---------------------------------------------------

def test_parquet_vectorstore_persists_across_instances(spark, tmp_path):
    """train() state must survive a process restart — simulated by a
    fresh store instance over the same path."""
    from pandas_ai_spark.vectorstore import ParquetVectorStore

    p = str(tmp_path / "vs")
    vs = ParquetVectorStore(p, spark=spark)
    vs.add_question_answer(
        ["how many orders are there", "top customers by revenue"],
        ["SELECT count(*) FROM orders", "SELECT ... revenue"])
    vs.add_docs(["orders table holds one row per order",
                 "customer table has demographics"])

    fresh = ParquetVectorStore(p, spark=spark)
    qa = fresh.get_relevant_question_answers("count of orders", k=1)
    assert qa[0]["question"] == "how many orders are there"
    docs = fresh.get_relevant_docs("order rows", k=1)
    assert "orders" in docs[0]


def test_parquet_vectorstore_delete(spark, tmp_path):
    from pandas_ai_spark.vectorstore import ParquetVectorStore

    p = str(tmp_path / "vs")
    vs = ParquetVectorStore(p, spark=spark)
    ids = vs.add_question_answer(["q1", "q2"], ["c1", "c2"])
    vs.delete_question_and_answers([ids[0]])
    got = vs.get_relevant_question_answers("q1", k=5)
    assert [e["question"] for e in got] == ["q2"]
    vs.delete_question_and_answers([ids[1]])
    assert vs.get_relevant_question_answers("q", k=5) == []


def test_parquet_vectorstore_empty(spark, tmp_path):
    from pandas_ai_spark.vectorstore import ParquetVectorStore

    vs = ParquetVectorStore(str(tmp_path / "nope"), spark=spark)
    assert vs.get_relevant_question_answers("anything") == []
    assert vs.get_relevant_docs("anything") == []


def test_agent_train_with_parquet_store(orders, spark, tmp_path):
    from pandas_ai_spark.vectorstore import ParquetVectorStore

    llm = FakeLLM(
        '```python\n'
        'df = execute_sql_query("SELECT count(*) AS n FROM orders")\n'
        'result = {"type": "number", "value": int(df["n"][0])}\n```')
    store = ParquetVectorStore(str(tmp_path / "vs"), spark=spark)
    agent = Agent([orders], llm=llm, vectorstore=store)
    agent.train(queries=["how many orders"],
                codes=['execute_sql_query("SELECT count(*) FROM orders")'])
    agent.chat("how many orders are there?")
    assert "similar questions answered before" in llm.last_prompt


# -- sandbox ---------------------------------------------------------------

def test_sandbox_preexecutes_sql(orders, spark):
    from pandas_ai_spark.sql import SQLExecutor

    ex = SQLExecutor(spark)
    ex.register("orders", orders.df)
    calls = []

    def host_sql(sql):
        calls.append(sql)
        return ex.execute(sql).toPandas()

    sb = RestrictedSandbox()
    code = (
        'df = execute_sql_query("SELECT count(*) AS n FROM orders")\n'
        'result = {"type": "number", "value": int(df["n"][0])}\n'
    )
    result = sb.execute(code, {"execute_sql_query": host_sql})
    assert result["value"] == 1500
    assert calls == ["SELECT count(*) AS n FROM orders"]


def test_sandbox_blocks_open_and_import():
    sb = RestrictedSandbox()
    env = {"execute_sql_query": lambda sql: None}
    with pytest.raises(SandboxError, match="open"):
        sb.execute("execute_sql_query\nopen('/etc/passwd')\nresult={}", env)
    with pytest.raises(SandboxError, match="import"):
        sb.execute("execute_sql_query\nimport os\nresult={}", env)


def test_sandbox_blocks_dunder_escape():
    """The classic in-process jailbreak — ().__class__.__base__
    .__subclasses__() reaching subprocess.Popen — is rejected at the AST
    gate, before exec."""
    sb = RestrictedSandbox()
    env = {"execute_sql_query": lambda sql: None}
    escape = ("cls = ().__class__.__base__.__subclasses__()\n"
              "result = {}")
    with pytest.raises(SandboxError, match="dunder"):
        sb.execute(escape, env)
    with pytest.raises(SandboxError, match="getattr"):
        sb.execute("x = getattr(int, 'mro')\nresult = {}", env)
    with pytest.raises(SandboxError, match="dunder"):
        sb.execute("b = __builtins__\nresult = {}", env)


def test_sandbox_blocks_frame_introspection():
    """Non-dunder escape: a generator's gi_frame.f_builtins IS the real
    builtins dict — must be rejected at the AST gate."""
    sb = RestrictedSandbox()
    env = {"execute_sql_query": lambda sql: None}
    escape = ("g = (x for x in ())\n"
              "b = g.gi_frame.f_builtins\n"
              "result = {}")
    with pytest.raises(SandboxError, match="introspection"):
        sb.execute(escape, env)


def test_sandbox_allows_whitelisted_import():
    sb = RestrictedSandbox()
    res = sb.execute("import math\nresult = {'v': math.floor(2.7)}",
                     {"execute_sql_query": lambda sql: None})
    assert res["v"] == 2


def test_sandbox_requires_result():
    sb = RestrictedSandbox()
    with pytest.raises(SandboxError, match="result"):
        sb.execute("x = 1", {"execute_sql_query": lambda s: None})


def test_agent_with_sandbox_end_to_end(orders):
    llm = FakeLLM(
        '```python\n'
        'df = execute_sql_query("SELECT count(*) AS n FROM orders")\n'
        'result = {"type": "number", "value": int(df["n"][0])}\n```')
    agent = Agent([orders], llm=llm, sandbox=RestrictedSandbox())
    resp = agent.chat("count")
    assert resp.value == 1500


def test_sandbox_is_abstract():
    with pytest.raises(TypeError):
        Sandbox()


# -- subprocess sandbox ----------------------------------------------------

def _host_sql_factory(spark, orders):
    from pandas_ai_spark.sql import SQLExecutor

    ex = SQLExecutor(spark)
    ex.register("orders", orders.df)
    return lambda sql: ex.execute(sql).toPandas()


def test_subprocess_sandbox_end_to_end(orders, spark):
    from pandas_ai_spark.sandbox import SubprocessSandbox

    sb = SubprocessSandbox()
    code = (
        'df = execute_sql_query("SELECT count(*) AS n FROM orders")\n'
        'result = {"type": "number", "value": int(df["n"][0])}\n'
    )
    res = sb.execute(code, {"execute_sql_query":
                            _host_sql_factory(spark, orders)})
    assert res["value"] == 1500


def test_subprocess_sandbox_returns_dataframe(orders, spark):
    from pandas_ai_spark.sandbox import SubprocessSandbox

    sb = SubprocessSandbox()
    code = (
        'df = execute_sql_query('
        '"SELECT o_orderpriority, count(*) AS n FROM orders '
        'GROUP BY o_orderpriority")\n'
        'result = {"type": "dataframe", "value": df.sort_values("n")}\n'
    )
    res = sb.execute(code, {"execute_sql_query":
                            _host_sql_factory(spark, orders)})
    assert res["type"] == "dataframe"
    assert res["value"]["n"].sum() == 1500


def test_subprocess_sandbox_blocks_escapes():
    from pandas_ai_spark.sandbox import SubprocessSandbox

    sb = SubprocessSandbox()
    env = {"execute_sql_query": lambda sql: None}
    # file read
    with pytest.raises(SandboxError, match="open"):
        sb.execute("x = open('/etc/passwd').read()\nresult={}", env)
    # socket / os import
    with pytest.raises(SandboxError, match="import"):
        sb.execute("import socket\nresult={}", env)
    with pytest.raises(SandboxError, match="import"):
        sb.execute("import os\nresult={}", env)
    # dunder crawl
    with pytest.raises(SandboxError, match="dunder"):
        sb.execute("result = {'v': ().__class__.__base__}", env)


def test_subprocess_sandbox_no_dynamic_sql(orders, spark):
    """Non-literal SQL has no host callback channel (container design)."""
    from pandas_ai_spark.sandbox import SubprocessSandbox

    sb = SubprocessSandbox()
    code = ('q = "SELECT count(*) AS n FROM " + "orders"\n'
            'df = execute_sql_query(q)\nresult = {}')
    with pytest.raises(SandboxError, match="dynamic SQL"):
        sb.execute(code, {"execute_sql_query":
                          _host_sql_factory(spark, orders)})


def test_subprocess_sandbox_env_scrubbed(orders, spark, monkeypatch):
    """Parent env vars (credentials) are invisible to the child even via
    an allowlisted module that exposes environ indirectly."""
    import subprocess as sp
    import sys

    monkeypatch.setenv("FAKE_API_KEY", "sekret")
    # direct probe of the harness env: run the same scrubbed-env child and
    # confirm the var is absent
    from pandas_ai_spark import sandbox as sbmod

    sb = sbmod.SubprocessSandbox()
    captured = {}
    real_run = sp.run

    def spy_run(*a, **k):
        captured.update(k.get("env") or {})
        return real_run(*a, **k)

    monkeypatch.setattr(sp, "run", spy_run)
    sb.execute("result = {'v': 1}", {"execute_sql_query": lambda s: None})
    assert "FAKE_API_KEY" not in captured
    assert set(captured) == {"HOME", "MPLCONFIGDIR"}


def test_agent_with_subprocess_sandbox(orders):
    from pandas_ai_spark.sandbox import SubprocessSandbox

    llm = FakeLLM(
        '```python\n'
        'df = execute_sql_query("SELECT count(*) AS n FROM orders")\n'
        'result = {"type": "number", "value": int(df["n"][0])}\n```')
    agent = Agent([orders], llm=llm, sandbox=SubprocessSandbox())
    resp = agent.chat("count")
    assert resp.value == 1500


def test_safe_unpickler_rejects_dangerous_globals():
    import pickle

    from pandas_ai_spark.sandbox import _safe_loads

    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ("true",))

    with pytest.raises(Exception, match="data-only|not permitted"):
        _safe_loads(pickle.dumps(Evil()))


def test_safe_unpickler_rejects_allowlisted_module_gadgets():
    """The reply channel is data-only: even callables living under the
    trusted pandas/numpy namespaces (pandas.eval, numpy.load with
    allow_pickle) must never be reachable as pickle globals."""
    import pickle

    from pandas_ai_spark.sandbox import _safe_loads

    class Gadget:
        def __reduce__(self):
            import pandas
            return (pandas.eval, ("1+1",))

    with pytest.raises(Exception, match="data-only|not permitted"):
        _safe_loads(pickle.dumps(Gadget()))


def test_sandbox_envelope_roundtrips_rich_values():
    import datetime

    import numpy as np
    import pandas as pd

    from pandas_ai_spark.sandbox import _decode_result, _encode_result

    df = pd.DataFrame({"a": [1, 2], "b": ["x", None]})
    obj = {
        "frame": df,
        "arr": np.arange(4, dtype=np.float64),
        "ts": pd.Timestamp("2026-01-02T03:04:05"),
        "when": datetime.date(2026, 1, 2),
        "tup": (1, "two", 3.0),
        "n": np.int64(7),
    }
    back = _decode_result(_encode_result(obj))
    pd.testing.assert_frame_equal(back["frame"], df)
    assert back["arr"].tolist() == [0.0, 1.0, 2.0, 3.0]
    assert back["ts"] == obj["ts"]
    assert back["when"] == obj["when"]
    assert back["tup"] == (1, "two", 3.0)
    assert back["n"] == 7 and isinstance(back["n"], int)


def test_sandbox_envelope_nat_sets_and_tuple_keys():
    """Round-4 envelope fixes: pd.NaT (a datetime subclass whose isoformat
    is the unparsable 'NaT'), set/frozenset type preservation, and
    non-primitive dict keys (tuple keys from multi-key groupbys)."""
    import pandas as pd

    from pandas_ai_spark.sandbox import _decode_result, _encode_result

    nat = _decode_result(_encode_result(pd.NaT))
    assert nat is pd.NaT

    s = _decode_result(_encode_result({1, "a", 3.5}))
    assert s == {1, "a", 3.5} and isinstance(s, set)
    fs = _decode_result(_encode_result(frozenset({1, 2})))
    assert fs == frozenset({1, 2}) and isinstance(fs, frozenset)

    grouped = {("us", 2024): 10, ("eu", 2025): 20, "plain": 30}
    back = _decode_result(_encode_result(grouped))
    assert back == grouped
    assert all(isinstance(k, (tuple, str)) for k in back)

    # .max() on an all-null datetime series — the common NaT producer —
    # survives the envelope inside a container too.
    back2 = _decode_result(_encode_result({"m": pd.Series(
        [pd.NaT, pd.NaT], dtype="datetime64[ns]").max()}))
    assert back2["m"] is pd.NaT


class _FakeDockerRunner:
    """Simulates the docker CLI: containers are dicts of files; exec
    runs the program with the host python (the protocol under test is
    the CLI choreography + envelope, not containerization itself)."""

    def __init__(self):
        self.containers: dict[str, dict[str, str]] = {}
        self.calls: list[list[str]] = []

    def __call__(self, argv, input=None):
        self.calls.append(list(argv))
        cmd = argv[1]
        if cmd == "run":
            name = argv[argv.index("--name") + 1]
            self.containers[name] = {}
            return 0, b"containerid\n", b""
        if cmd == "cp":
            src, dst = argv[2], argv[3]
            name, path = dst.split(":", 1)
            self.containers[name][path] = open(src).read()
            return 0, b"", b""
        if cmd == "exec":
            import subprocess as sp
            import sys as _sys
            import tempfile as tf
            name, prog = argv[2], argv[4]
            with tf.TemporaryDirectory() as d:
                tmp = d + "/tmp"
                import os as _os
                _os.makedirs(tmp)
                for path, content in self.containers[name].items():
                    fn = tmp + "/" + path.split("/")[-1]
                    with open(fn, "w") as f:
                        f.write(content)
                body = self.containers[name][prog].replace("/tmp", tmp)
                p = sp.run([_sys.executable, "-c", body],
                           capture_output=True)
                return p.returncode, p.stdout, p.stderr
        if cmd == "rm":
            self.containers.pop(argv[-1], None)
            return 0, b"", b""
        return 1, b"", b"unknown command"


def test_docker_sandbox_contract():
    """DockerSandbox protocol against a mocked docker CLI: network
    disabled at run, SQL pre-executed HOST-side and shipped as CSV,
    program executed via cp+exec (no shell quoting), JSON data-only
    envelope with DataFrames as CSV, container removed on stop."""
    import pandas as pd

    import pandas_ai_spark as pai

    runner = _FakeDockerRunner()
    sb = pai.DockerSandbox(runner=runner)

    executed = []

    def host_sql(sql):
        executed.append(sql)
        return pd.DataFrame({"n": [42], "s": ["x"]})

    code = (
        'df = execute_sql_query("SELECT count(*) AS n, \'x\' AS s '
        'FROM orders")\n'
        'result = {"type": "dataframe", "value": df, "n": int(df["n"][0])}')
    out = sb.execute(code, {"execute_sql_query": host_sql})

    # SQL ran on the host, not in the container
    assert executed == ["SELECT count(*) AS n, 'x' AS s FROM orders"]
    # network disabled on the run command
    run_call = next(c for c in runner.calls if c[1] == "run")
    assert "--network=none" in run_call
    # two cp calls: the CSV result + the program file
    assert sum(1 for c in runner.calls if c[1] == "cp") == 2
    # envelope round-trip: df back as a real DataFrame, scalars intact
    assert out["n"] == 42
    pd.testing.assert_frame_equal(
        out["value"], pd.DataFrame({"n": [42], "s": ["x"]}))

    sb.stop()
    assert runner.containers == {}


def test_docker_sandbox_error_paths():
    import pandas as pd

    import pandas_ai_spark as pai
    from pandas_ai_spark.sandbox import SandboxError

    runner = _FakeDockerRunner()
    sb = pai.DockerSandbox(runner=runner)
    # child exceptions surface as SandboxError with the stderr tail
    with pytest.raises(SandboxError, match="boom|rc="):
        sb.execute('raise ValueError("boom")',
                   {"execute_sql_query": lambda s: pd.DataFrame()})
    # code that never sets `result`
    with pytest.raises(SandboxError, match="result"):
        sb.execute("x = 1", {"execute_sql_query": lambda s: pd.DataFrame()})
    # the AST gate still applies before anything ships
    with pytest.raises(Exception, match="[Ii]mport|not allowed"):
        sb.execute("import socket\nresult = 1",
                   {"execute_sql_query": lambda s: pd.DataFrame()})
    sb.stop()


def test_docker_sandbox_resource_limits():
    """docker run carries memory/pids/cpu caps (ADVICE: unbounded
    container could exhaust host memory)."""
    import pandas_ai_spark as pai

    runner = _FakeDockerRunner()
    sb = pai.DockerSandbox(runner=runner, memory_mb=512, pids_limit=64,
                           cpus=2.0)
    sb.start()
    run_call = next(c for c in runner.calls if c[1] == "run")
    assert "--memory=512m" in run_call
    assert "--memory-swap=512m" in run_call  # no swap headroom
    assert "--pids-limit=64" in run_call
    assert "--cpus=2.0" in run_call
    sb.stop()


def test_docker_sandbox_timeout_kills_container():
    """An exec that exceeds timeout_sec raises SandboxError and
    force-removes the container (ADVICE: infinite loop hung the host)."""
    import subprocess

    import pandas as pd

    import pandas_ai_spark as pai
    from pandas_ai_spark.sandbox import SandboxError

    class _TimingOutRunner(_FakeDockerRunner):
        def __call__(self, argv, input=None, timeout=None):
            if argv[1] == "exec":
                assert timeout is not None and timeout > 0
                raise subprocess.TimeoutExpired(argv, timeout)
            return super().__call__(argv, input=input)

    runner = _TimingOutRunner()
    sb = pai.DockerSandbox(runner=runner, timeout_sec=0.5)
    with pytest.raises(SandboxError, match="timeout"):
        sb.execute("while True:\n    pass\nresult = 1",
                   {"execute_sql_query": lambda s: pd.DataFrame()})
    # container torn down on expiry
    assert runner.containers == {}
    assert any(c[1] == "rm" for c in runner.calls)


class _FakeChromaCollection:
    """In-memory stand-in implementing the chromadb collection surface
    the adapter touches (add/update/delete/query/get)."""

    def __init__(self, name):
        self.name = name
        self.rows: dict[str, dict] = {}

    def add(self, documents, metadatas=None, ids=None):
        metadatas = metadatas or [None] * len(documents)
        for i, doc, meta in zip(ids, documents, metadatas):
            if i in self.rows:
                raise ValueError(f"duplicate id {i}")
            self.rows[i] = {"doc": doc, "meta": meta}

    def update(self, ids, documents, metadatas=None):
        metadatas = metadatas or [None] * len(documents)
        for i, doc, meta in zip(ids, documents, metadatas):
            self.rows[i].update({"doc": doc, "meta": meta})

    def delete(self, ids=None):
        for i in ids or list(self.rows):
            self.rows.pop(i, None)

    def query(self, query_texts, n_results, include):
        # deterministic "distance": 0.5 for substring hits, 99 otherwise
        scored = sorted(
            ((0.5 if str(query_texts).split()[-1].lower()
              in e["doc"].lower() else 99.0, i)
             for i, e in self.rows.items()),
            key=lambda t: t)
        top = scored[:n_results]
        return {
            "documents": [[self.rows[i]["doc"] for _, i in top]],
            "distances": [[d for d, _ in top]],
            "metadatas": [[self.rows[i]["meta"] for _, i in top]],
            "ids": [[i for _, i in top]],
        }

    def get(self, ids, include):
        hit = [i for i in ids if i in self.rows]
        return {"ids": hit,
                "documents": [self.rows[i]["doc"] for i in hit],
                "metadatas": [self.rows[i]["meta"] for i in hit]}


class _FakeChromaClient:
    def __init__(self):
        self.collections: dict[str, _FakeChromaCollection] = {}

    def get_or_create_collection(self, name, **kw):
        return self.collections.setdefault(name, _FakeChromaCollection(name))


def test_chromadb_store_contract():
    """ChromaDBStore against the mocked client: the reference adapter's
    behavior (extensions/ee/vectorstores/chromadb) behind this engine's
    VectorStore ABC — paired qa/docs collections, 'Q:/A:' documents,
    distance-threshold filtering, id update/delete."""
    import pandas_ai_spark as pai

    client = _FakeChromaClient()
    vs = pai.ChromaDBStore(collection_name="unit", client=client,
                           similarity_threshold=1.5)
    assert isinstance(vs, pai.VectorStore)
    assert set(client.collections) == {"unit-qa", "unit-docs"}

    ids = vs.add_question_answer(
        ["count orders", "total revenue"],
        ["result = q1()", "result = q2()"])
    assert len(ids) == 2 and all(i.endswith("-qa") for i in ids)
    stored = client.collections["unit-qa"].rows[ids[0]]
    assert stored["doc"] == "Q: count orders\n A: result = q1()"

    got = vs.get_relevant_question_answers("how do I count orders")
    assert got == [{"question": "count orders", "code": "result = q1()"}]
    # no hit under the distance threshold → empty, not a far match
    assert vs.get_relevant_question_answers("zebra") == []

    doc_ids = vs.add_docs(["orders table has o_orderkey"])
    assert vs.get_relevant_docs("where is o_orderkey") == \
        ["orders table has o_orderkey"]

    vs.update_question_answer([ids[0]], ["count orders v2"],
                              ["result = q1b()"])
    assert vs.get_relevant_question_answers_by_id([ids[0]])[
        "metadatas"][0]["code"] == "result = q1b()"
    with pytest.raises(ValueError, match="dimension"):
        vs.update_question_answer([ids[0]], ["only-query"], [])

    vs.delete_docs(doc_ids)
    assert vs.get_relevant_docs("where is o_orderkey") == []
    vs.delete_question_and_answers(ids)
    assert client.collections["unit-qa"].rows == {}


class _FakeQdrantPoint:
    def __init__(self, pid, payload):
        self.id = pid
        self.payload = payload


class _FakeQdrantHit:
    def __init__(self, pid, payload, score):
        self.id = pid
        self.metadata = payload
        self.document = payload.get("document", "")
        self.score = score


class _FakeQdrantClient:
    """Stand-in for qdrant_client's fastembed convenience surface
    (add/query/retrieve/delete/delete_collection)."""

    def __init__(self):
        self.collections: dict[str, dict] = {}

    def add(self, collection_name, documents, metadata=None, ids=None):
        coll = self.collections.setdefault(collection_name, {})
        for i, doc, meta in zip(ids, documents, metadata):
            coll[i] = dict(meta)

    def query(self, collection_name, query_text, limit,
              score_threshold=None):
        coll = self.collections.get(collection_name, {})
        scored = sorted(
            ((0.9 if query_text.split()[-1].lower()
              in e.get("document", "").lower() else 0.1, i)
             for i, e in coll.items()), key=lambda t: (-t[0], t[1]))
        hits = [_FakeQdrantHit(i, coll[i], s) for s, i in scored[:limit]]
        if score_threshold is not None:
            hits = [h for h in hits if h.score >= score_threshold]
        return hits

    def retrieve(self, collection_name, ids, **kw):
        coll = self.collections.get(collection_name, {})
        return [_FakeQdrantPoint(i, coll[i]) for i in ids if i in coll]

    def delete(self, collection_name, points_selector):
        coll = self.collections.get(collection_name, {})
        for i in points_selector:
            coll.pop(i, None)

    def delete_collection(self, collection_name):
        self.collections.pop(collection_name, None)


def test_qdrant_store_contract():
    """QdrantStore against the mocked client: UUID5 id conversion,
    payload shape {document, code, metadata}, score-threshold search,
    update-id validation, id/collection-wide delete — the reference
    extensions/ee/vectorstores/qdrant surface behind the ABC."""
    import uuid as _uuid

    import pandas_ai_spark as pai
    from pandas_ai_spark.qdrant_store import UUID_NAMESPACE

    client = _FakeQdrantClient()
    vs = pai.QdrantStore(collection_name="unit", client=client,
                         similarity_threshold=0.5)
    assert isinstance(vs, pai.VectorStore)

    ids = vs.add_question_answer(
        ["count orders", "total revenue"],
        ["result = q1()", "result = q2()"], ids=["alpha", "beta"])
    assert ids == ["alpha", "beta"]
    # non-UUID ids stored under their deterministic UUID5 mapping
    conv = str(_uuid.uuid5(UUID_NAMESPACE, "alpha"))
    stored = client.collections["unit-qa"][conv]
    assert stored == {"document": "count orders", "code": "result = q1()",
                      "metadata": {}}

    got = vs.get_relevant_question_answers("how do I count orders")
    assert got == [{"question": "count orders", "code": "result = q1()"}]
    assert vs.get_relevant_question_answers("zebra") == []  # threshold

    vs.add_docs(["orders table has o_orderkey"], ids=["d1"])
    assert vs.get_relevant_docs("where is o_orderkey") == \
        ["orders table has o_orderkey"]
    by_id = vs.get_relevant_docs_by_id(["d1"])
    assert by_id["documents"] == ["orders table has o_orderkey"]

    vs.update_question_answer(["alpha"], ["count orders v2"],
                              ["result = q1b()"])
    assert client.collections["unit-qa"][conv]["code"] == "result = q1b()"
    with pytest.raises(ValueError, match="IDs"):
        vs.update_question_answer(["ghost"], ["q"], ["c"])

    vs.delete_question_and_answers(["alpha"])
    assert conv not in client.collections["unit-qa"]
    vs.delete_docs()  # no ids → whole collection
    assert "unit-docs" not in client.collections


def test_chromadb_store_import_gate(monkeypatch):
    """Constructing without a client and without the chromadb package
    raises ImportError with install guidance."""
    import builtins

    import pandas_ai_spark as pai

    real_import = builtins.__import__

    def block_chromadb(name, *a, **k):
        if name.startswith("chromadb"):
            raise ImportError("No module named 'chromadb'")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", block_chromadb)
    with pytest.raises(ImportError, match="chromadb"):
        pai.ChromaDBStore()


def test_sandbox_malformed_reply_raises_sandbox_error(monkeypatch):
    """A child reply that unpickles to a non-dict must surface as
    SandboxError, not AttributeError."""
    import pickle
    import subprocess
    from types import SimpleNamespace

    from pandas_ai_spark.sandbox import SandboxError, SubprocessSandbox

    def fake_run(*a, **k):
        return SimpleNamespace(stdout=pickle.dumps(["not", "a", "dict"]),
                               stderr=b"", returncode=0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    with pytest.raises(SandboxError, match="malformed"):
        SubprocessSandbox().execute(
            "result = 1", {"execute_sql_query": lambda sql: None})


# -- milvus / pinecone / lancedb adapters (mocked clients) -------------------


def _cosine_np(a, b):
    import numpy as np

    a, b = np.asarray(a), np.asarray(b)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    return float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0


class _FakeMilvusClient:
    """pymilvus MilvusClient surface: has/create collection, dict-row
    insert, cosine search, id query, filter delete."""

    def __init__(self):
        self.collections: dict[str, dict[str, dict]] = {}

    def has_collection(self, collection_name):
        return collection_name in self.collections

    def create_collection(self, collection_name, **kw):
        self.collections[collection_name] = {}

    def insert(self, collection_name, data):
        for row in data:
            self.collections[collection_name][row["id"]] = row

    def search(self, collection_name, data, limit, output_fields=None):
        rows = list(self.collections.get(collection_name, {}).values())
        hits = sorted(
            ({"id": r["id"], "distance": _cosine_np(data[0], r["vector"]),
              "entity": {"document": r["document"],
                         "metadata": r.get("metadata")}}
             for r in rows), key=lambda h: -h["distance"])[:limit]
        return [hits]

    def query(self, collection_name, ids, output_fields=None):
        coll = self.collections.get(collection_name, {})
        return [coll[i] for i in ids if i in coll]

    def delete(self, collection_name, filter):
        import ast

        ids = ast.literal_eval(filter.split("id in ", 1)[1])
        for i in ids:
            self.collections.get(collection_name, {}).pop(i, None)


def test_milvus_store_contract():
    """MilvusStore against the mocked client: UUID5 id conversion,
    underscore collection names, row shape {id, vector, document,
    metadata}, update-id validation (missing → skip, []), id-filter
    delete — the reference extensions/ee/vectorstores/milvus surface."""
    import uuid as _uuid

    import pandas_ai_spark as pai
    from pandas_ai_spark.milvus_store import UUID_NAMESPACE

    client = _FakeMilvusClient()
    vs = pai.MilvusStore(collection_name="unit", client=client)
    assert isinstance(vs, pai.VectorStore)

    ids = vs.add_question_answer(
        ["count orders", "total revenue"],
        ["result = q1()", "result = q2()"], ids=["alpha", "beta"])
    conv = str(_uuid.uuid5(UUID_NAMESPACE, "alpha"))
    assert ids[0] == conv  # non-UUID id converted deterministically
    row = client.collections["unit_qa"][conv]
    assert row["document"].startswith("Q: count orders")
    assert row["metadata"] == {"question": "count orders",
                               "code": "result = q1()"}
    assert len(row["vector"]) == 256

    got = vs.get_relevant_question_answers("how do I count orders", k=1)
    assert got == [{"question": "count orders", "code": "result = q1()"}]

    vs.add_docs(["orders table has o_orderkey"], ids=[str(_uuid.uuid4())])
    assert vs.get_relevant_docs("where is o_orderkey") == \
        ["orders table has o_orderkey"]

    # update validates ids: ghost id → no-op returning []
    assert vs.update_question_answer(["ghost"], ["q"], ["c"]) == []
    assert vs.update_question_answer(
        ["alpha"], ["count orders v2"], ["result = q1b()"]) == [conv]
    assert client.collections["unit_qa"][conv]["metadata"]["code"] == \
        "result = q1b()"

    by_id = vs.get_relevant_question_answers_by_id(["alpha"])
    assert by_id["ids"] == [conv]

    vs.delete_question_and_answers(["alpha"])
    assert conv not in client.collections["unit_qa"]
    # querying a collection that never existed returns empty, not error
    empty = pai.MilvusStore(collection_name="nope", client=client)
    assert empty.get_relevant_docs("anything") == []


class _FakePineconeIndex:
    """pinecone Index surface: namespaced upsert/query/update/delete/
    fetch with {id, values, metadata} vectors and cosine scores."""

    def __init__(self):
        self.namespaces: dict[str, dict[str, dict]] = {}

    def upsert(self, vectors, namespace):
        ns = self.namespaces.setdefault(namespace, {})
        for v in vectors:
            ns[v["id"]] = v

    def query(self, vector, top_k, namespace, include_metadata=True,
              **kw):
        ns = self.namespaces.get(namespace, {})
        matches = sorted(
            ({"id": v["id"], "score": 1.0 - _cosine_np(vector, v["values"]),
              "metadata": v.get("metadata")}
             for v in ns.values()), key=lambda m: m["score"])[:top_k]
        return {"matches": matches}

    def update(self, id, values, set_metadata, namespace):
        ns = self.namespaces.setdefault(namespace, {})
        ns[id] = {"id": id, "values": values, "metadata": set_metadata}

    def delete(self, ids, namespace):
        ns = self.namespaces.get(namespace, {})
        for i in ids or list(ns):
            ns.pop(i, None)

    def fetch(self, ids, namespace):
        ns = self.namespaces.get(namespace, {})
        return {"vectors": {i: ns[i] for i in ids if i in ns}}


def test_pinecone_store_contract():
    """PineconeStore against the mocked index: qa/docs namespaces on ONE
    index, metadata['text'] carries the source text, score<threshold
    filter, per-id update, fetch by id — the reference
    extensions/ee/vectorstores/pinecone surface."""
    import pandas_ai_spark as pai

    idx = _FakePineconeIndex()
    vs = pai.PineconeStore(index_client=idx, similarity_threshold=0.9)
    assert isinstance(vs, pai.VectorStore)

    ids = vs.add_question_answer(["count orders"], ["result = q1()"],
                                 ids=["a1"])
    assert ids == ["a1"]
    stored = idx.namespaces["qa"]["a1"]
    assert stored["metadata"]["text"].startswith("Q: count orders")
    assert stored["metadata"]["code"] == "result = q1()"

    got = vs.get_relevant_question_answers("how do I count orders")
    assert got == [{"question": "count orders", "code": "result = q1()"}]

    vs.add_docs(["orders table has o_orderkey"], ids=["d1"])
    assert "docs" in idx.namespaces and "qa" in idx.namespaces
    assert vs.get_relevant_docs("where is o_orderkey") == \
        ["orders table has o_orderkey"]
    # dissimilar query → 1-cosine ≈ 1.0 ≥ threshold → filtered out
    assert vs.get_relevant_docs("zzz qqq xyzzy") == []

    vs.update_docs(["d1"], ["orders table has o_orderkey and o_custkey"])
    assert "o_custkey" in idx.namespaces["docs"]["d1"]["metadata"]["text"]

    fetched = vs.get_relevant_docs_by_id(["d1"])
    assert "d1" in fetched["vectors"]

    vs.delete_question_and_answers(["a1"])
    assert idx.namespaces["qa"] == {}


class _FakeLanceTable:
    """lancedb table surface: add(DataFrame), search().limit().to_list()
    with _distance, update(values, where), delete(where)."""

    def __init__(self, df):
        self.rows = df.to_dict("records")

    def add(self, df):
        self.rows.extend(df.to_dict("records"))

    def search(self, vector=None):
        table = self

        class _Q:
            def __init__(self):
                self._limit = len(table.rows)
                self._where = None

            def limit(self, k):
                self._limit = k
                return self

            def where(self, cond):
                self._where = cond.split("'")[1]
                return self

            def to_list(self):
                rows = table.rows
                if self._where is not None:
                    rows = [r for r in rows if r["id"] == self._where]
                if vector is not None:
                    rows = sorted(
                        ([{**r, "_distance": 1.0 - _cosine_np(
                            vector, r["vector"])} for r in rows]),
                        key=lambda r: r["_distance"])
                return list(rows)[:self._limit]

        return _Q()

    def update(self, values, where):
        target = where.split("'")[1]
        for r in self.rows:
            if r["id"] == target:
                r.update(values)

    def delete(self, where):
        target = where.split("'")[1]
        self.rows = [r for r in self.rows if r["id"] != target]


class _FakeLanceDB:
    def __init__(self):
        self.tables: dict[str, _FakeLanceTable] = {}

    def table_names(self):
        return list(self.tables)

    def create_table(self, name, data):
        self.tables[name] = _FakeLanceTable(data)
        return self.tables[name]

    def open_table(self, name):
        return self.tables[name]


def test_lancedb_store_contract():
    """LanceDBStore against the mocked connection: tables created
    lazily from first data, _distance<threshold filter, where-clause
    update/delete — the reference extensions/ee/vectorstores/lancedb
    surface."""
    import pandas_ai_spark as pai

    db = _FakeLanceDB()
    vs = pai.LanceDBStore(table_name="unit", db=db,
                          similarity_threshold=0.9)
    assert isinstance(vs, pai.VectorStore)

    # search before any table exists → empty, not error
    assert vs.get_relevant_docs("anything") == []

    vs.add_question_answer(["count orders"], ["result = q1()"], ids=["a1"])
    assert "unit-qa" in db.table_names()
    got = vs.get_relevant_question_answers("how do I count orders")
    assert got == [{"question": "count orders", "code": "result = q1()"}]

    vs.add_docs(["orders table has o_orderkey"], ids=["d1"])
    assert vs.get_relevant_docs("where is o_orderkey") == \
        ["orders table has o_orderkey"]
    assert vs.get_relevant_docs("zzz qqq xyzzy") == []  # threshold

    vs.update_question_answer(["a1"], ["count orders v2"],
                              ["result = q1b()"])
    got2 = vs.get_relevant_question_answers("count orders v2")
    assert got2 == [{"question": "count orders v2",
                     "code": "result = q1b()"}]
    by_id = vs.get_relevant_docs_by_id(["d1"])
    assert by_id["documents"] == ["orders table has o_orderkey"]

    vs.delete_docs(["d1"])
    assert vs.get_relevant_docs("where is o_orderkey") == []


@pytest.mark.parametrize("store_attr,pkg", [
    ("MilvusStore", "pymilvus"),
    ("PineconeStore", "pinecone"),
    ("LanceDBStore", "lancedb"),
])
def test_new_vector_store_import_gates(monkeypatch, store_attr, pkg):
    """Constructing without a client and without the backing package
    raises ImportError with install guidance."""
    import builtins

    import pandas_ai_spark as pai

    real_import = builtins.__import__

    def block(name, *a, **k):
        if name.startswith(pkg):
            raise ImportError(f"No module named '{pkg}'")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", block)
    with pytest.raises(ImportError, match=pkg):
        getattr(pai, store_attr)()
