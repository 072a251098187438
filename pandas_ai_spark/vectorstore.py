"""Vector store for agent training (Q→code pairs and docs).

Reference parity: pandasai/vectorstores/vectorstore.py:5-178 (abstract
add/update/delete/get for qa + docs) and Agent.train at
pandasai/agent/base.py:218-249; retrieved context is injected into the
code-generation prompt. The reference ships chromadb/qdrant/… extensions;
here the bundled implementation is dependency-free: a deterministic
hashing-bag-of-words embedder with cosine ranking (numpy, driver-side —
training corpora are conversation-scale, not data-scale). Swap in a real
embedding function via ``embed_fn`` for production.
"""

from __future__ import annotations

import hashlib
import uuid
from abc import ABC, abstractmethod
from typing import Callable, Iterable, Optional

import numpy as np


class VectorStore(ABC):
    """Abstract store (vectorstore.py:5-178 surface)."""

    @abstractmethod
    def add_question_answer(self, queries: Iterable[str],
                            codes: Iterable[str]) -> list[str]: ...

    @abstractmethod
    def add_docs(self, docs: Iterable[str]) -> list[str]: ...

    @abstractmethod
    def get_relevant_question_answers(self, question: str, k: int = 3) -> list[dict]: ...

    @abstractmethod
    def get_relevant_docs(self, question: str, k: int = 3) -> list[str]: ...

    def delete_question_and_answers(self, ids: list[str]) -> None:
        raise NotImplementedError

    def delete_docs(self, ids: list[str]) -> None:
        raise NotImplementedError


def _hash_embed(text: str, dim: int = 256) -> np.ndarray:
    """Deterministic hashing bag-of-words embedding (no model needed)."""
    v = np.zeros(dim, dtype=np.float64)
    for tok in text.lower().split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
        v[h % dim] += 1.0 if (h >> 63) else -1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


class LocalVectorStore(VectorStore):
    def __init__(self, dim: int = 256,
                 embed_fn: Optional[Callable[[str], np.ndarray]] = None):
        self._dim = dim
        self._embed = embed_fn or (lambda t: _hash_embed(t, dim))
        self._qa: dict[str, dict] = {}
        self._docs: dict[str, str] = {}

    def add_question_answer(self, queries, codes) -> list[str]:
        ids = []
        for q, c in zip(list(queries), list(codes)):
            i = uuid.uuid4().hex
            self._qa[i] = {"question": q, "code": c, "vec": self._embed(q)}
            ids.append(i)
        return ids

    def add_docs(self, docs) -> list[str]:
        ids = []
        for d in docs:
            i = uuid.uuid4().hex
            self._docs[i] = d
            ids.append(i)
        return ids

    def delete_question_and_answers(self, ids) -> None:
        for i in ids:
            self._qa.pop(i, None)

    def delete_docs(self, ids) -> None:
        for i in ids:
            self._docs.pop(i, None)

    def _rank(self, question: str, items: list[tuple[str, np.ndarray]],
              k: int) -> list[str]:
        if not items:
            return []
        qv = self._embed(question)
        sims = [(float(np.dot(qv, v)), key) for key, v in items]
        sims.sort(key=lambda t: (-t[0], t[1]))
        return [key for _, key in sims[:k]]

    def get_relevant_question_answers(self, question: str, k: int = 3) -> list[dict]:
        keys = self._rank(
            question, [(i, e["vec"]) for i, e in self._qa.items()], k)
        return [{"question": self._qa[i]["question"],
                 "code": self._qa[i]["code"]} for i in keys]

    def get_relevant_docs(self, question: str, k: int = 3) -> list[str]:
        keys = self._rank(
            question,
            [(i, self._embed(d)) for i, d in self._docs.items()], k)
        return [self._docs[i] for i in keys]


class ParquetVectorStore(VectorStore):
    """Persistent, parquet-backed store — ``Agent.train`` state survives
    process restart (reference parity with the EE persistent stores,
    extensions/ee/vectorstores/*, behind the same abstract surface at
    pandasai/vectorstores/vectorstore.py:5-178 — minus the external
    service).

    Layout: ``<path>/qa`` and ``<path>/docs`` parquet tables with
    ``(id string, rid long, text cols..., vec array<double>)``.
    Retrieval dogfoods :func:`similarity.ann_bruteforce` — the same
    broadcast-GEMM top-k that serves the 100 TB ANN path — so a store
    grown to millions of entries scans distributed, never collects.
    Appends are parquet appends; deletes rewrite the (conversation-scale)
    table. Writes from concurrent agents are last-writer-wins, like the
    reference's local chroma default.
    """

    def __init__(self, path: str, spark=None, dim: int = 256,
                 embed_fn: Optional[Callable[[str], np.ndarray]] = None):
        from .session import get_session

        self.path = str(path)
        self.spark = spark or get_session()
        self._dim = dim
        self._embed = embed_fn or (lambda t: _hash_embed(t, dim))

    # -- storage helpers ---------------------------------------------------

    def _table(self, sub: str):
        import os

        p = f"{self.path}/{sub}"
        if not os.path.isdir(p):
            return None
        try:
            df = self.spark.read.parquet(p)
            return df if df.head(1) else None
        except Exception:  # empty dir after a delete-all rewrite
            return None

    def _append(self, sub: str, rows: list[dict], schema: str) -> None:
        self.spark.createDataFrame(rows, schema) \
            .write.mode("append").parquet(f"{self.path}/{sub}")

    def _rewrite(self, sub: str, df) -> None:
        # parquet can't be overwritten while lazily read from — pin rows
        # driver-side first (delete path only; tables are training-scale)
        rows = df.collect()
        out = self.spark.createDataFrame(rows, df.schema)
        out.write.mode("overwrite").parquet(f"{self.path}/{sub}")

    @staticmethod
    def _rid(i: str) -> int:
        return int(i[:15], 16)  # 60-bit prefix of the uuid hex

    # -- VectorStore surface -----------------------------------------------

    def add_question_answer(self, queries, codes) -> list[str]:
        ids = []
        rows = []
        for q, c in zip(list(queries), list(codes)):
            i = uuid.uuid4().hex
            ids.append(i)
            rows.append({"id": i, "rid": self._rid(i), "question": q,
                         "code": c, "vec": self._embed(q).tolist()})
        if rows:
            self._append("qa", rows, "id string, rid long, question string,"
                                     " code string, vec array<double>")
        return ids

    def add_docs(self, docs) -> list[str]:
        ids = []
        rows = []
        for d in docs:
            i = uuid.uuid4().hex
            ids.append(i)
            rows.append({"id": i, "rid": self._rid(i), "doc": d,
                         "vec": self._embed(d).tolist()})
        if rows:
            self._append("docs", rows,
                         "id string, rid long, doc string,"
                         " vec array<double>")
        return ids

    def delete_question_and_answers(self, ids) -> None:
        t = self._table("qa")
        if t is not None:
            self._rewrite("qa", t.where(~t["id"].isin(list(ids))))

    def delete_docs(self, ids) -> None:
        t = self._table("docs")
        if t is not None:
            self._rewrite("docs", t.where(~t["id"].isin(list(ids))))

    def _topk(self, sub: str, question: str, k: int):
        from .functions.similarity import ann_bruteforce

        corpus = self._table(sub)
        if corpus is None:
            return None
        qdf = self.spark.createDataFrame(
            [{"query_id": -1, "vec": self._embed(question).tolist()}],
            "query_id long, vec array<double>")
        hits = ann_bruteforce(corpus, qdf, k=k, id_col="rid",
                              vec_col="vec", query_id_col="query_id")
        return (hits.join(corpus, "rid")
                .orderBy("rank")
                .drop("vec", "query_id", "cosine"))

    def get_relevant_question_answers(self, question: str, k: int = 3) -> list[dict]:
        got = self._topk("qa", question, k)
        if got is None:
            return []
        return [{"question": r["question"], "code": r["code"]}
                for r in got.collect()]

    def get_relevant_docs(self, question: str, k: int = 3) -> list[str]:
        got = self._topk("docs", question, k)
        if got is None:
            return []
        return [r["doc"] for r in got.collect()]


def render_training_section(qa: list[dict], docs: list[str]) -> str:
    """Prompt block for retrieved context (templates/shared/
    vectordb_docs.tmpl shape)."""
    parts = []
    if qa:
        parts.append("Here are similar questions answered before:")
        for e in qa:
            parts.append(f"### Q: {e['question']}\n```python\n{e['code']}\n```")
    if docs:
        parts.append("Relevant documentation:")
        parts.extend(f"- {d}" for d in docs)
    return "\n".join(parts)
