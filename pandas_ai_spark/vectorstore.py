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
