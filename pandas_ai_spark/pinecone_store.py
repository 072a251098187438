"""Pinecone-backed vector store adapter (import-gated).

Reference parity: extensions/ee/vectorstores/pinecone/pandasai_pinecone/
pinecone.py:10-256 — ONE Pinecone index holding both corpora, separated
by the ``qa`` / ``docs`` namespaces; vectors upserted as ``{id, values,
metadata}`` with the source text riding in ``metadata["text"]``;
retrieval via ``index.query(top_k, namespace, include_metadata=True)``
with hits at ``score >= threshold`` dropped (the reference keeps
``score < threshold``; kept for parity); per-id ``index.update`` for
updates and ``index.fetch`` for by-id reads. Re-expressed over this
engine's :class:`~.vectorstore.VectorStore` ABC so ``Agent.train`` /
RAG work against a Pinecone index when the ``pinecone`` package is
installed.

``index_client`` is injectable for offline contract tests (anything
with upsert/query/update/delete/fetch); construction without the
package raises ImportError with install guidance. The default
``embedding_function`` is the engine's deterministic hashing embedder
so the adapter works offline; inject a real model for production.
"""

from __future__ import annotations

import uuid
from typing import Callable, Iterable, List, Optional

from .vectorstore import VectorStore, _hash_embed

_METATEXT_KEY = "text"  # reference pinecone.py:36


class PineconeStore(VectorStore):
    """Pinecone-backed store behind the engine's ABC surface."""

    def __init__(
        self,
        api_key: Optional[str] = None,
        index: str = "pandas_ai_spark",
        embedding_function: Optional[Callable[[List[str]], List[List[float]]]] = None,
        dimensions: int = 256,
        metric: str = "cosine",
        max_samples: int = 3,
        similarity_threshold: float = 1.5,
        index_client=None,
    ) -> None:
        self._max_samples = max_samples
        self._similarity_threshold = similarity_threshold
        self._embed = embedding_function or (
            lambda texts: [_hash_embed(t, dimensions).tolist()
                           for t in texts])

        if index_client is None:
            try:
                import pinecone
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "PineconeStore requires the 'pinecone' package "
                    "(pip install pinecone), or pass a pre-built index "
                    "via the `index_client` argument.") from exc
            pc = pinecone.Pinecone(api_key=api_key)
            if index not in pc.list_indexes().names():
                pc.create_index(
                    name=index, dimension=dimensions, metric=metric,
                    spec=pinecone.ServerlessSpec(cloud="aws",
                                                 region="us-east-1"))
            index_client = pc.Index(name=index)
        self._index = index_client

    # -- write surface --------------------------------------------------------

    @staticmethod
    def _format_qa(query: str, code: str) -> str:
        return f"Q: {query}\n A: {code}"

    def _upsert(self, namespace: str, ids: List[str], texts: List[str],
                metadatas: Optional[List[dict]]) -> None:
        metas = metadatas or [{} for _ in ids]
        for m, t in zip(metas, texts):
            m[_METATEXT_KEY] = t
        self._index.upsert(
            vectors=[{"id": i, "values": v, "metadata": m}
                     for i, v, m in zip(ids, self._embed(texts), metas)],
            namespace=namespace)

    def add_question_answer(self, queries: Iterable[str],
                            codes: Iterable[str],
                            ids: Optional[Iterable[str]] = None,
                            metadatas: Optional[List[dict]] = None
                            ) -> list[str]:
        queries, codes = list(queries), list(codes)
        if len(queries) != len(codes):
            raise ValueError(
                f"Queries and codes dimension doesn't match "
                f"{len(queries)} != {len(codes)}")
        ids = list(ids) if ids is not None else [
            f"{uuid.uuid4()}-qa" for _ in queries]
        metas = metadatas or [{"question": q, "code": c}
                              for q, c in zip(queries, codes)]
        self._upsert("qa", ids,
                     [self._format_qa(q, c) for q, c in zip(queries, codes)],
                     metas)
        return ids

    def add_docs(self, docs: Iterable[str],
                 ids: Optional[Iterable[str]] = None,
                 metadatas: Optional[List[dict]] = None) -> list[str]:
        docs = list(docs)
        ids = list(ids) if ids is not None else [
            f"{uuid.uuid4()}-docs" for _ in docs]
        self._upsert("docs", ids, docs, metadatas)
        return ids

    def update_question_answer(self, ids: Iterable[str],
                               queries: Iterable[str],
                               codes: Iterable[str]) -> None:
        queries, codes = list(queries), list(codes)
        if len(queries) != len(codes):
            raise ValueError(
                f"Queries and codes dimension doesn't match "
                f"{len(queries)} != {len(codes)}")
        texts = [self._format_qa(q, c) for q, c in zip(queries, codes)]
        vecs = self._embed(texts)
        for i, q, c, t, v in zip(ids, queries, codes, texts, vecs):
            self._index.update(
                id=i, values=v,
                set_metadata={"question": q, "code": c, _METATEXT_KEY: t},
                namespace="qa")

    def update_docs(self, ids: Iterable[str],
                    docs: Iterable[str]) -> None:
        docs = list(docs)
        for i, d, v in zip(ids, docs, self._embed(docs)):
            self._index.update(id=i, values=v,
                               set_metadata={_METATEXT_KEY: d},
                               namespace="docs")

    def delete_question_and_answers(self,
                                    ids: Optional[List[str]] = None) -> None:
        self._index.delete(ids=ids, namespace="qa")

    def delete_docs(self, ids: Optional[List[str]] = None) -> None:
        self._index.delete(ids=ids, namespace="docs")

    # -- retrieval surface -----------------------------------------------------

    def _query(self, namespace: str, question: str, k: int) -> list[dict]:
        res = self._index.query(
            vector=self._embed([question])[0], top_k=k,
            namespace=namespace, include_metadata=True)
        matches = res.get("matches", []) if isinstance(res, dict) else \
            getattr(res, "matches", [])
        # reference pinecone.py:239-246: keep score < threshold
        return [m for m in matches
                if m.get("score", 0.0) < self._similarity_threshold]

    def get_relevant_question_answers(self, question: str,
                                      k: int | None = None) -> list[dict]:
        out = []
        for m in self._query("qa", question, k or self._max_samples):
            meta = m.get("metadata") or {}
            out.append({"question": meta.get("question",
                                             meta.get(_METATEXT_KEY, "")),
                        "code": meta.get("code", "")})
        return out

    def get_relevant_docs(self, question: str,
                          k: int | None = None) -> list[str]:
        return [(m.get("metadata") or {}).get(_METATEXT_KEY, "")
                for m in self._query("docs", question,
                                     k or self._max_samples)]

    def get_relevant_question_answers_by_id(self,
                                            ids: Iterable[str]) -> dict:
        return self._index.fetch(ids=list(ids), namespace="qa")

    def get_relevant_docs_by_id(self, ids: Iterable[str]) -> dict:
        return self._index.fetch(ids=list(ids), namespace="docs")
