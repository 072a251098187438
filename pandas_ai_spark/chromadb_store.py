"""ChromaDB-backed vector store adapter (import-gated).

Reference parity: extensions/ee/vectorstores/chromadb/pandasai_chromadb/
chroma.py:16-213 — two collections per store (``<name>-qa`` holding
"Q: …\\n A: …" training pairs, ``<name>-docs`` holding documentation),
query results filtered by a distance threshold, id-based update/delete.
Re-expressed over this engine's :class:`~.vectorstore.VectorStore` ABC,
so ``Agent.train`` / RAG retrieval work unchanged against a real Chroma
deployment when the ``chromadb`` package is installed.

The client is injectable for offline contract tests; construction
without the package raises ImportError with install guidance (the
pattern used by the jar-gated warehouse connectors).
"""

from __future__ import annotations

import uuid
from typing import Callable, Iterable, List, Optional

from .vectorstore import VectorStore


class ChromaDBStore(VectorStore):
    """Chroma-backed persistent store behind the engine's ABC surface."""

    def __init__(
        self,
        collection_name: str = "pandas_ai_spark",
        persist_path: Optional[str] = None,
        embedding_function: Optional[Callable[[List[str]], List[float]]] = None,
        max_samples: int = 3,
        similarity_threshold: float = 1.5,
        client=None,
    ) -> None:
        self._max_samples = max_samples
        self._similarity_threshold = similarity_threshold

        if client is None:
            try:
                import chromadb
                from chromadb import config
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "ChromaDBStore requires the 'chromadb' package "
                    "(pip install chromadb), or pass a pre-built client "
                    "via the `client` argument.") from exc
            settings = config.Settings(
                is_persistent=persist_path is not None,
                anonymized_telemetry=False)
            if persist_path:
                settings.persist_directory = persist_path
            client = chromadb.Client(settings)
        self._client = client

        kw = {}
        if embedding_function is not None:
            kw["embedding_function"] = embedding_function
        self._qa_collection = client.get_or_create_collection(
            name=f"{collection_name}-qa", **kw)
        self._docs_collection = client.get_or_create_collection(
            name=f"{collection_name}-docs", **kw)

    # -- write surface -----------------------------------------------------

    @staticmethod
    def _format_qa(query: str, code: str) -> str:
        # reference vectorstore.py:178-179
        return f"Q: {query}\n A: {code}"

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
        # the code rides in metadata so retrieval can return the exact
        # code string, not a parse of the "Q:/A:" document
        metas = metadatas or [{"question": q, "code": c}
                              for q, c in zip(queries, codes)]
        self._qa_collection.add(
            documents=[self._format_qa(q, c)
                       for q, c in zip(queries, codes)],
            metadatas=metas, ids=ids)
        return ids

    def add_docs(self, docs: Iterable[str],
                 ids: Optional[Iterable[str]] = None,
                 metadatas: Optional[List[dict]] = None) -> list[str]:
        docs = list(docs)
        ids = list(ids) if ids is not None else [
            f"{uuid.uuid4()}-docs" for _ in docs]
        self._docs_collection.add(documents=docs, metadatas=metadatas,
                                  ids=ids)
        return ids

    def update_question_answer(self, ids: Iterable[str],
                               queries: Iterable[str],
                               codes: Iterable[str]) -> None:
        queries, codes = list(queries), list(codes)
        if len(queries) != len(codes):
            raise ValueError(
                f"Queries and codes dimension doesn't match "
                f"{len(queries)} != {len(codes)}")
        self._qa_collection.update(
            ids=list(ids),
            documents=[self._format_qa(q, c)
                       for q, c in zip(queries, codes)],
            metadatas=[{"question": q, "code": c}
                       for q, c in zip(queries, codes)])

    def update_docs(self, ids: Iterable[str],
                    docs: Iterable[str]) -> None:
        self._docs_collection.update(ids=list(ids), documents=list(docs))

    def delete_question_and_answers(self,
                                    ids: Optional[List[str]] = None) -> None:
        self._qa_collection.delete(ids=ids)

    def delete_docs(self, ids: Optional[List[str]] = None) -> None:
        self._docs_collection.delete(ids=ids)

    # -- retrieval surface -------------------------------------------------

    def _query_filtered(self, collection, question: str, k: int) -> dict:
        """Query + distance-threshold filter (reference chroma.py:196-213:
        hits at distance >= threshold are dropped)."""
        res = collection.query(
            query_texts=question, n_results=k,
            include=["metadatas", "documents", "distances"])
        docs = (res.get("documents") or [[]])[0]
        dists = (res.get("distances") or [[]])[0]
        metas = (res.get("metadatas") or [[]])[0]
        rids = (res.get("ids") or [[]])[0]
        keep = [i for i, d in enumerate(dists)
                if d < self._similarity_threshold]
        return {
            "documents": [docs[i] for i in keep],
            "distances": [dists[i] for i in keep],
            "metadatas": [metas[i] for i in keep],
            "ids": [rids[i] for i in keep],
        }

    def get_relevant_question_answers(self, question: str,
                                      k: int | None = None) -> list[dict]:
        got = self._query_filtered(
            self._qa_collection, question, k or self._max_samples)
        out = []
        for doc, meta in zip(got["documents"], got["metadatas"]):
            meta = meta or {}
            out.append({"question": meta.get("question", doc),
                        "code": meta.get("code", "")})
        return out

    def get_relevant_docs(self, question: str,
                          k: int | None = None) -> list[str]:
        got = self._query_filtered(
            self._docs_collection, question, k or self._max_samples)
        return list(got["documents"])

    def get_relevant_question_answers_by_id(self,
                                            ids: Iterable[str]) -> dict:
        return self._qa_collection.get(
            ids=list(ids), include=["metadatas", "documents"])

    def get_relevant_docs_by_id(self, ids: Iterable[str]) -> dict:
        return self._docs_collection.get(
            ids=list(ids), include=["metadatas", "documents"])
