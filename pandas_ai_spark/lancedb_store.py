"""LanceDB-backed vector store adapter (import-gated).

Reference parity: extensions/ee/vectorstores/lancedb/pandasai_lancedb/
lancedb.py:63-322 — an embedded (file-backed) LanceDB connection with
paired ``<name>-qa`` / ``<name>-docs`` tables; rows are ``{id, qa|doc,
metadata, vector}`` added as pandas DataFrames; retrieval via
``table.search(vector).limit(k).to_list()`` with hits at
``_distance >= threshold`` dropped; updates via ``table.update(values,
where="id = ...")`` and deletes via ``table.delete(where)``.
Re-expressed over this engine's :class:`~.vectorstore.VectorStore` ABC
so ``Agent.train`` / RAG work against a LanceDB directory when the
``lancedb`` package is installed.

``db`` is injectable for offline contract tests (anything with
table_names/create_table/open_table); construction without the package
raises ImportError with install guidance. The default
``embedding_function`` is the engine's deterministic hashing embedder
(the reference downloads a sentence-transformers model); inject a real
model for production.
"""

from __future__ import annotations

import uuid
from typing import Callable, Iterable, List, Optional

from .vectorstore import VectorStore, _hash_embed


class LanceDBStore(VectorStore):
    """LanceDB-backed persistent store behind the engine's ABC surface."""

    def __init__(
        self,
        table_name: str = "pandas_ai_spark",
        persist_path: str = "/tmp/lancedb",
        embedding_function: Optional[Callable[[List[str]], List[List[float]]]] = None,
        dimensions: int = 256,
        max_samples: int = 3,
        similarity_threshold: float = 1.5,
        db=None,
    ) -> None:
        self._max_samples = max_samples
        self._similarity_threshold = similarity_threshold
        self._embed = embedding_function or (
            lambda texts: [_hash_embed(t, dimensions).tolist()
                           for t in texts])

        if db is None:
            try:
                import lancedb
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "LanceDBStore requires the 'lancedb' package "
                    "(pip install lancedb), or pass a pre-built "
                    "connection via the `db` argument.") from exc
            db = lancedb.connect(persist_path)
        self._db = db
        self._qa_table_name = f"{table_name}-qa"
        self._docs_table_name = f"{table_name}-docs"
        self._qa_table = None
        self._docs_table = None

    # -- helpers --------------------------------------------------------------

    @staticmethod
    def _format_qa(query: str, code: str) -> str:
        return f"Q: {query}\n A: {code}"

    def _table(self, name: str, rows: Optional[list] = None):
        """Open-or-create: LanceDB infers table schema from first data."""
        import pandas as pd

        attr = "_qa_table" if name == self._qa_table_name else "_docs_table"
        table = getattr(self, attr)
        if table is None:
            if name in self._db.table_names():
                table = self._db.open_table(name)
            elif rows is not None:
                table = self._db.create_table(name, data=pd.DataFrame(rows))
                setattr(self, attr, table)
                return None  # rows already written by create
            else:
                return None
            setattr(self, attr, table)
        return table

    def _add(self, name: str, ids: List[str], texts: List[str],
             metadatas: Optional[List[dict]]) -> None:
        import pandas as pd

        metas = ([str(m) for m in metadatas] if metadatas
                 else ["None" for _ in ids])  # reference lancedb.py:120-123
        rows = [{"id": i, "document": t, "metadata": m, "vector": v}
                for i, t, m, v in zip(ids, texts, metas, self._embed(texts))]
        table = self._table(name, rows)
        if table is not None:
            table.add(pd.DataFrame(rows))

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
        ids = list(ids) if ids is not None else [
            f"{uuid.uuid4()}-qa" for _ in queries]
        metas = metadatas or [{"question": q, "code": c}
                              for q, c in zip(queries, codes)]
        self._add(self._qa_table_name, ids,
                  [self._format_qa(q, c) for q, c in zip(queries, codes)],
                  metas)
        return ids

    def add_docs(self, docs: Iterable[str],
                 ids: Optional[Iterable[str]] = None,
                 metadatas: Optional[List[dict]] = None) -> list[str]:
        docs = list(docs)
        ids = list(ids) if ids is not None else [
            f"{uuid.uuid4()}-docs" for _ in docs]
        self._add(self._docs_table_name, ids, docs, metadatas)
        return ids

    def update_question_answer(self, ids: Iterable[str],
                               queries: Iterable[str],
                               codes: Iterable[str]) -> list[str]:
        queries, codes = list(queries), list(codes)
        ids = list(ids)
        if len(queries) != len(codes):
            raise ValueError(
                f"Queries and codes dimension doesn't match "
                f"{len(queries)} != {len(codes)}")
        table = self._table(self._qa_table_name)
        if table is None:
            return []
        texts = [self._format_qa(q, c) for q, c in zip(queries, codes)]
        for i, t, q, c, v in zip(ids, texts, queries, codes,
                                 self._embed(texts)):
            table.update(
                values={"document": t,
                        "metadata": str({"question": q, "code": c}),
                        "vector": v},
                where=f"id = '{i}'")
        return ids

    def update_docs(self, ids: Iterable[str],
                    docs: Iterable[str]) -> list[str]:
        docs, ids = list(docs), list(ids)
        table = self._table(self._docs_table_name)
        if table is None:
            return []
        for i, d, v in zip(ids, docs, self._embed(docs)):
            table.update(values={"document": d, "vector": v},
                         where=f"id = '{i}'")
        return ids

    def delete_question_and_answers(self,
                                    ids: Optional[List[str]] = None) -> None:
        table = self._table(self._qa_table_name)
        if table is not None:
            for i in ids or []:
                table.delete(f"id = '{i}'")

    def delete_docs(self, ids: Optional[List[str]] = None) -> None:
        table = self._table(self._docs_table_name)
        if table is not None:
            for i in ids or []:
                table.delete(f"id = '{i}'")

    # -- retrieval surface -----------------------------------------------------

    def _search(self, name: str, question: str, k: int) -> list[dict]:
        table = self._table(name)
        if table is None:
            return []
        hits = table.search(self._embed([question])[0]).limit(k).to_list()
        # reference lancedb.py:305-311: keep _distance < threshold
        return [h for h in hits
                if h.get("_distance", 0.0) < self._similarity_threshold]

    def get_relevant_question_answers(self, question: str,
                                      k: int | None = None) -> list[dict]:
        out = []
        for h in self._search(self._qa_table_name, question,
                              k or self._max_samples):
            meta = h.get("metadata") or "{}"
            try:
                import ast
                meta = ast.literal_eval(meta) if isinstance(meta, str) else meta
            except (ValueError, SyntaxError):
                meta = {}
            if not isinstance(meta, dict):
                meta = {}
            out.append({"question": meta.get("question",
                                             h.get("document", "")),
                        "code": meta.get("code", "")})
        return out

    def get_relevant_docs(self, question: str,
                          k: int | None = None) -> list[str]:
        return [h.get("document", "")
                for h in self._search(self._docs_table_name, question,
                                      k or self._max_samples)]

    def get_relevant_question_answers_by_id(self,
                                            ids: Iterable[str]) -> dict:
        table = self._table(self._qa_table_name)
        rows = []
        if table is not None:
            for i in ids:
                rows.extend(table.search().where(f"id = '{i}'").to_list())
        return {"documents": [r.get("document", "") for r in rows],
                "metadatas": [r.get("metadata") for r in rows],
                "ids": [r.get("id") for r in rows]}

    def get_relevant_docs_by_id(self, ids: Iterable[str]) -> dict:
        table = self._table(self._docs_table_name)
        rows = []
        if table is not None:
            for i in ids:
                rows.extend(table.search().where(f"id = '{i}'").to_list())
        return {"documents": [r.get("document", "") for r in rows],
                "metadatas": [r.get("metadata") for r in rows],
                "ids": [r.get("id") for r in rows]}
