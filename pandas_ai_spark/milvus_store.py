"""Milvus-backed vector store adapter (import-gated).

Reference parity: extensions/ee/vectorstores/milvus/pandasai_milvus/
milvus.py:19-385 — one MilvusClient serving paired ``<name>_qa`` /
``<name>_docs`` collections (underscore separators, unlike the
chroma/qdrant dash convention — kept for parity); rows inserted as
``{id, vector, document, metadata}`` dicts; non-UUID ids
deterministically converted via UUID5 under the reference's fixed
namespace; update ids validated against the collection before
re-insert (missing ids → skip, reference milvus.py:347-357); deletes
issued as ``id in [...]`` filter expressions. Re-expressed over this
engine's :class:`~.vectorstore.VectorStore` ABC so ``Agent.train`` /
RAG work against a Milvus deployment when ``pymilvus`` is installed.

Differences by design: embeddings come from an injectable
``embedding_function`` (default: the engine's deterministic hashing
embedder, so the adapter works offline) instead of pymilvus's bundled
model download, and collections are created through the client's
simple ``create_collection(name, dimension)`` surface rather than a
hand-built schema — the stored row shape is identical.

The client is injectable for offline contract tests; construction
without the package raises ImportError with install guidance.
"""

from __future__ import annotations

import uuid
from typing import Callable, Iterable, List, Optional

from .vectorstore import VectorStore, _hash_embed

# reference milvus.py:12 — fixed namespace so string ids map stably
UUID_NAMESPACE = uuid.UUID("f55f1395-e097-4f35-8c20-90fdea7baa14")


def _convert_ids(ids: Iterable[str]) -> List[str]:
    """Reference milvus.py:365-377: pass UUIDs through, map other
    strings deterministically via UUID5."""
    out = []
    for i in ids:
        try:
            uuid.UUID(str(i))
            out.append(str(i))
        except ValueError:
            out.append(str(uuid.uuid5(UUID_NAMESPACE, str(i))))
    return out


class MilvusStore(VectorStore):
    """Milvus-backed persistent store behind the engine's ABC surface."""

    def __init__(
        self,
        collection_name: str = "pandas_ai_spark",
        uri: str = "milvus_demo.db",
        embedding_function: Optional[Callable[[List[str]], List[List[float]]]] = None,
        dimensions: int = 256,
        max_samples: int = 3,
        similarity_threshold: Optional[float] = None,
        client=None,
    ) -> None:
        self._max_samples = max_samples
        self._similarity_threshold = similarity_threshold
        self._dim = dimensions
        self._embed = embedding_function or (
            lambda texts: [_hash_embed(t, dimensions).tolist()
                           for t in texts])

        if client is None:
            try:
                from pymilvus import MilvusClient
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "MilvusStore requires the 'pymilvus' package "
                    "(pip install pymilvus), or pass a pre-built client "
                    "via the `client` argument.") from exc
            client = MilvusClient(uri=uri)
        self._client = client
        # underscore separators per reference milvus.py:37-38
        self._qa_collection_name = f"{collection_name}_qa"
        self._docs_collection_name = f"{collection_name}_docs"

    # -- helpers -------------------------------------------------------------

    @staticmethod
    def _format_qa(query: str, code: str) -> str:
        return f"Q: {query}\n A: {code}"

    def _ensure_collection(self, name: str) -> None:
        if not self._client.has_collection(collection_name=name):
            self._client.create_collection(
                collection_name=name, dimension=self._dim,
                id_type="string", metric_type="COSINE",
                max_length=1000, auto_id=False)

    def _insert(self, collection: str, ids: List[str], docs: List[str],
                metadatas: Optional[List[dict]]) -> None:
        self._ensure_collection(collection)
        vectors = self._embed(docs)
        metas = metadatas or [{} for _ in ids]
        self._client.insert(
            collection_name=collection,
            data=[{"id": i, "vector": v, "document": d, "metadata": m}
                  for i, v, d, m in zip(ids, vectors, docs, metas)])

    def _validate_update_ids(self, collection: str, ids: List[str]) -> bool:
        """Reference milvus.py:347-357: every id must already exist."""
        got = self._client.query(collection_name=collection, ids=ids)
        present = {row["id"] for row in got}
        return not (set(ids) - present)

    # -- write surface --------------------------------------------------------

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
        milvus_ids = (_convert_ids(ids) if ids is not None
                      else [str(uuid.uuid4()) for _ in queries])
        metas = metadatas or [{"question": q, "code": c}
                              for q, c in zip(queries, codes)]
        self._insert(self._qa_collection_name, milvus_ids,
                     [self._format_qa(q, c) for q, c in zip(queries, codes)],
                     metas)
        return milvus_ids

    def add_docs(self, docs: Iterable[str],
                 ids: Optional[Iterable[str]] = None,
                 metadatas: Optional[List[dict]] = None) -> list[str]:
        docs = list(docs)
        milvus_ids = (_convert_ids(ids) if ids is not None
                      else [str(uuid.uuid4()) for _ in docs])
        self._insert(self._docs_collection_name, milvus_ids, docs, metadatas)
        return milvus_ids

    def update_question_answer(self, ids: Iterable[str],
                               queries: Iterable[str],
                               codes: Iterable[str]) -> list[str]:
        queries, codes = list(queries), list(codes)
        ids = list(ids)
        if not (len(ids) == len(queries) == len(codes)):
            raise ValueError(
                f"Queries, codes and ids length doesn't match "
                f"{len(queries)} != {len(codes)} != {len(ids)}")
        milvus_ids = _convert_ids(ids)
        if not self._validate_update_ids(self._qa_collection_name,
                                         milvus_ids):
            return []
        self._insert(self._qa_collection_name, milvus_ids,
                     [self._format_qa(q, c) for q, c in zip(queries, codes)],
                     [{"question": q, "code": c}
                      for q, c in zip(queries, codes)])
        return milvus_ids

    def update_docs(self, ids: Iterable[str],
                    docs: Iterable[str]) -> list[str]:
        docs, ids = list(docs), list(ids)
        if len(ids) != len(docs):
            raise ValueError(
                f"Ids and docs length doesn't match {len(ids)} != {len(docs)}")
        milvus_ids = _convert_ids(ids)
        if not self._validate_update_ids(self._docs_collection_name,
                                         milvus_ids):
            return []
        self._insert(self._docs_collection_name, milvus_ids, docs, None)
        return milvus_ids

    def delete_question_and_answers(self,
                                    ids: Optional[List[str]] = None) -> None:
        self._client.delete(
            collection_name=self._qa_collection_name,
            filter=f"id in {_convert_ids(ids or [])}")

    def delete_docs(self, ids: Optional[List[str]] = None) -> None:
        self._client.delete(
            collection_name=self._docs_collection_name,
            filter=f"id in {_convert_ids(ids or [])}")

    # -- retrieval surface -----------------------------------------------------

    def _search(self, collection: str, question: str, k: int) -> list[dict]:
        if not self._client.has_collection(collection_name=collection):
            return []
        res = self._client.search(
            collection_name=collection, data=self._embed([question]),
            limit=k, output_fields=["document", "metadata"])
        hits = res[0] if res else []
        if self._similarity_threshold is not None:
            # COSINE metric: higher score = closer; keep confident hits
            hits = [h for h in hits
                    if h.get("distance", 0.0) >= self._similarity_threshold]
        return hits

    def get_relevant_question_answers(self, question: str,
                                      k: int | None = None) -> list[dict]:
        out = []
        for h in self._search(self._qa_collection_name, question,
                              k or self._max_samples):
            meta = (h.get("entity") or {}).get("metadata") or {}
            doc = (h.get("entity") or {}).get("document", "")
            out.append({"question": meta.get("question", doc),
                        "code": meta.get("code", "")})
        return out

    def get_relevant_docs(self, question: str,
                          k: int | None = None) -> list[str]:
        return [(h.get("entity") or {}).get("document", "")
                for h in self._search(self._docs_collection_name, question,
                                      k or self._max_samples)]

    def get_relevant_question_answers_by_id(self,
                                            ids: Iterable[str]) -> dict:
        rows = self._client.query(
            collection_name=self._qa_collection_name,
            ids=_convert_ids(ids))
        return {"documents": [r.get("document", "") for r in rows],
                "metadatas": [r.get("metadata") for r in rows],
                "ids": [r["id"] for r in rows]}

    def get_relevant_docs_by_id(self, ids: Iterable[str]) -> dict:
        rows = self._client.query(
            collection_name=self._docs_collection_name,
            ids=_convert_ids(ids))
        return {"documents": [r.get("document", "") for r in rows],
                "metadatas": [r.get("metadata") for r in rows],
                "ids": [r["id"] for r in rows]}
