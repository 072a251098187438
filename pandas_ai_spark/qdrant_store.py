"""Qdrant-backed vector store adapter (import-gated).

Reference parity: extensions/ee/vectorstores/qdrant/pandasai_qdrant/
qdrant.py:17-310 — one Qdrant client serving paired ``<name>-qa`` /
``<name>-docs`` collections; points upserted with a ``{document, code,
metadata}`` payload; non-UUID ids deterministically converted via UUID5
under a fixed namespace; retrieval through the client's embedded-model
``search`` with a score threshold; update ids validated against the
collection before upsert. Re-expressed over this engine's
:class:`~.vectorstore.VectorStore` ABC so ``Agent.train`` / RAG work
against a Qdrant deployment when ``qdrant_client`` is installed.

The client is injectable for offline contract tests; construction
without the package raises ImportError with install guidance.
"""

from __future__ import annotations

import uuid
from typing import Any, Iterable, List, Optional

from .vectorstore import VectorStore

# reference qdrant.py:14 — fixed namespace so string ids map stably
UUID_NAMESPACE = uuid.UUID("f55f1395-e097-4f35-8c20-90fdea7baa14")


class QdrantStore(VectorStore):
    """Qdrant-backed persistent store behind the engine's ABC surface."""

    def __init__(
        self,
        collection_name: str = "pandas_ai_spark",
        embedding_model: Optional[str] = None,
        location: Optional[str] = ":memory:",
        url: Optional[str] = None,
        api_key: Optional[str] = None,
        max_samples: int = 3,
        similarity_threshold: Optional[float] = None,
        client=None,
    ) -> None:
        self._max_samples = max_samples
        self._similarity_threshold = similarity_threshold

        if client is None:
            try:
                import qdrant_client
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "QdrantStore requires the 'qdrant-client' package "
                    "(pip install qdrant-client[fastembed]), or pass a "
                    "pre-built client via the `client` argument.") from exc
            if url:
                client = qdrant_client.QdrantClient(url=url, api_key=api_key)
            else:
                client = qdrant_client.QdrantClient(location=location)
            if embedding_model:
                client.set_model(embedding_model)
        self._client = client
        self._qa_collection_name = f"{collection_name}-qa"
        self._docs_collection_name = f"{collection_name}-docs"

    # -- id helpers (reference qdrant.py:276-310) --------------------------

    @staticmethod
    def _convert_id(i: str) -> str:
        """Qdrant point ids must be UUIDs (or ints): pass real UUIDs
        through, map anything else deterministically via UUID5."""
        try:
            return str(uuid.UUID(i))
        except ValueError:
            return str(uuid.uuid5(UUID_NAMESPACE, i))

    def _convert_ids(self, ids: Iterable[str]) -> list[str]:
        return [self._convert_id(i) for i in ids]

    def _validate_update_ids(self, collection_name: str,
                             ids: List[str]) -> list[str]:
        if not ids:
            return []
        converted = self._convert_ids(ids)
        response = self._client.retrieve(
            collection_name=collection_name, ids=converted)
        if not response:
            raise ValueError("No IDs found in the collection")
        found = {str(p.id) for p in response}
        missing = [i for i, c in zip(ids, converted) if c not in found]
        if missing:
            raise ValueError(f"IDs not found in collection: {missing}")
        return converted

    # -- write surface -----------------------------------------------------

    def _upsert(self, collection: str, ids: list[str],
                payloads: list[dict], documents: list[str]) -> None:
        self._client.add(
            collection_name=collection,
            documents=documents,
            metadata=payloads,
            ids=self._convert_ids(ids),
        )

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
            str(uuid.uuid4()) for _ in queries]
        metadatas = metadatas or [{} for _ in queries]
        self._upsert(
            self._qa_collection_name, ids,
            [{"document": q, "code": c, "metadata": m}
             for q, c, m in zip(queries, codes, metadatas)],
            queries)
        return ids

    def add_docs(self, docs: Iterable[str],
                 ids: Optional[Iterable[str]] = None,
                 metadatas: Optional[List[dict]] = None) -> list[str]:
        docs = list(docs)
        ids = list(ids) if ids is not None else [
            str(uuid.uuid4()) for _ in docs]
        metadatas = metadatas or [{} for _ in docs]
        self._upsert(
            self._docs_collection_name, ids,
            [{"document": d, "metadata": m}
             for d, m in zip(docs, metadatas)],
            docs)
        return ids

    def update_question_answer(self, ids: Iterable[str],
                               queries: Iterable[str],
                               codes: Iterable[str]) -> None:
        ids, queries, codes = list(ids), list(queries), list(codes)
        if len(queries) != len(codes):
            raise ValueError(
                f"Queries and codes dimension doesn't match "
                f"{len(queries)} != {len(codes)}")
        self._validate_update_ids(self._qa_collection_name, ids)
        self._upsert(
            self._qa_collection_name, ids,
            [{"document": q, "code": c, "metadata": {}}
             for q, c in zip(queries, codes)],
            queries)

    def update_docs(self, ids: Iterable[str],
                    docs: Iterable[str]) -> None:
        ids, docs = list(ids), list(docs)
        self._validate_update_ids(self._docs_collection_name, ids)
        self._upsert(
            self._docs_collection_name, ids,
            [{"document": d, "metadata": {}} for d in docs],
            docs)

    def delete_question_and_answers(self,
                                    ids: Optional[List[str]] = None) -> None:
        if ids is None:
            self._client.delete_collection(self._qa_collection_name)
        else:
            self._client.delete(
                collection_name=self._qa_collection_name,
                points_selector=self._convert_ids(ids))

    def delete_docs(self, ids: Optional[List[str]] = None) -> None:
        if ids is None:
            self._client.delete_collection(self._docs_collection_name)
        else:
            self._client.delete(
                collection_name=self._docs_collection_name,
                points_selector=self._convert_ids(ids))

    # -- retrieval surface -------------------------------------------------

    def _search(self, collection: str, question: str,
                k: Optional[int]) -> list[Any]:
        return self._client.query(
            collection_name=collection,
            query_text=question,
            limit=k or self._max_samples,
            score_threshold=self._similarity_threshold,
        )

    def get_relevant_question_answers(self, question: str,
                                      k: int | None = None) -> list[dict]:
        hits = self._search(self._qa_collection_name, question, k)
        return [{"question": h.metadata.get("document", ""),
                 "code": h.metadata.get("code", "")} for h in hits]

    def get_relevant_docs(self, question: str,
                          k: int | None = None) -> list[str]:
        hits = self._search(self._docs_collection_name, question, k)
        return [h.metadata.get("document", "") for h in hits]

    def get_relevant_docs_by_id(self, ids: Iterable[str]) -> dict:
        ids = list(ids)
        if not ids:
            return {"documents": [], "metadatas": [], "ids": []}
        points = self._client.retrieve(
            collection_name=self._docs_collection_name,
            ids=self._convert_ids(ids))
        return {
            "documents": [p.payload["document"] for p in points],
            "metadatas": [p.payload for p in points],
            "ids": [str(p.id) for p in points],
        }
