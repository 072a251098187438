"""Global configuration singleton + API-key store + file backend.

Reference parity: ``pandasai/config.py:10-58`` (Config / ConfigManager /
APIKeyManager), ``pandasai/helpers/filemanager.py:7-74`` (FileManager /
DefaultFileManager) and ``pandasai/helpers/env.py:6-14`` (load_dotenv).
Differences are deliberate:

- ``Config`` is a plain dataclass (pydantic is not a dependency of this
  repo); ``from_dict`` rejects unknown keys with a ``TypeError`` like
  the pydantic model rejects extras.
- ``DefaultFileManager`` roots at :func:`datasets.datasets_root` (the
  ``PANDAS_AI_SPARK_DATA`` contract every loader here already honors)
  instead of the reference's project-root discovery.
- ``load_dotenv`` is a minimal stdlib parser (python-dotenv is not
  installed): KEY=VALUE lines, ``#`` comments, single/double quotes
  stripped, never overrides existing environment values.
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


class FileManager(ABC):
    """Pluggable file backend (reference filemanager.py:7-42): swap in
    a remote implementation to store datasets elsewhere."""

    @abstractmethod
    def load(self, file_path: str) -> str: ...

    @abstractmethod
    def load_binary(self, file_path: str) -> bytes: ...

    @abstractmethod
    def write(self, file_path: str, content: str) -> None: ...

    @abstractmethod
    def write_binary(self, file_path: str, content: bytes) -> None: ...

    @abstractmethod
    def exists(self, file_path: str) -> bool: ...

    @abstractmethod
    def mkdir(self, dir_path: str) -> None: ...

    @abstractmethod
    def abs_path(self, file_path: str) -> str: ...


class DefaultFileManager(FileManager):
    """Local filesystem backend rooted at the datasets root
    (reference filemanager.py:45-74)."""

    def __init__(self, base_path: str | None = None):
        if base_path is None:
            from .datasets import datasets_root
            base_path = datasets_root()
        self.base_path = base_path

    def load(self, file_path: str) -> str:
        with open(self.abs_path(file_path), "r", encoding="utf-8") as f:
            return f.read()

    def load_binary(self, file_path: str) -> bytes:
        with open(self.abs_path(file_path), "rb") as f:
            return f.read()

    def write(self, file_path: str, content: str) -> None:
        with open(self.abs_path(file_path), "w", encoding="utf-8") as f:
            f.write(content)

    def write_binary(self, file_path: str, content: bytes) -> None:
        with open(self.abs_path(file_path), "wb") as f:
            f.write(content)

    def exists(self, file_path: str) -> bool:
        return os.path.exists(self.abs_path(file_path))

    def mkdir(self, dir_path: str) -> None:
        os.makedirs(self.abs_path(dir_path), exist_ok=True)

    def abs_path(self, file_path: str) -> str:
        return os.path.join(self.base_path, file_path)


@dataclass
class Config:
    """Global defaults (reference config.py:10-20). ``llm`` and
    ``max_retries`` flow into :class:`~pandas_ai_spark.agent.Agent`
    when the caller doesn't pass them explicitly."""

    save_logs: bool = True
    verbose: bool = False
    max_retries: int = 3
    llm: Optional[Any] = None
    file_manager: FileManager = field(default_factory=DefaultFileManager)

    @classmethod
    def from_dict(cls, config: Dict[str, Any]) -> "Config":
        return cls(**config)  # unknown keys raise TypeError


class ConfigManager:
    """Singleton global-config store (reference config.py:23-46)."""

    _config: Config = Config()

    @classmethod
    def set(cls, config_dict: Dict[str, Any]) -> None:
        """Replace the global configuration."""
        cls._config = Config.from_dict(config_dict)

    @classmethod
    def get(cls) -> Config:
        if cls._config is None:
            cls._config = Config()
        return cls._config

    @classmethod
    def update(cls, config_dict: Dict[str, Any]) -> None:
        """Merge new values into the existing configuration."""
        from dataclasses import asdict, fields as dc_fields

        current = {f.name: getattr(cls._config, f.name)
                   for f in dc_fields(Config)}
        current.update(config_dict)
        cls._config = Config.from_dict(current)


class APIKeyManager:
    """PandaBI API-key store (reference config.py:49-58): mirrors the
    key into ``PANDABI_API_KEY`` so subprocesses see it too."""

    _api_key: Optional[str] = None

    @classmethod
    def set(cls, api_key: str) -> None:
        os.environ["PANDABI_API_KEY"] = api_key
        cls._api_key = api_key

    @classmethod
    def get(cls) -> Optional[str]:
        return cls._api_key


def find_closest(filename: str, start: str | None = None) -> str:
    """Walk upward from ``start`` (default cwd) to the filesystem root
    looking for ``filename`` (reference helpers/path.py contract).
    Raises ``ValueError`` when not found."""
    cur = os.path.abspath(start or os.getcwd())
    while True:
        cand = os.path.join(cur, filename)
        if os.path.exists(cand):
            return cand
        parent = os.path.dirname(cur)
        if parent == cur:
            raise ValueError(f"{filename} not found above {start or os.getcwd()}")
        cur = parent


def load_dotenv(start: str | None = None) -> None:
    """Load the nearest ``.env`` into ``os.environ`` without overriding
    existing values (reference helpers/env.py:6-14; stdlib parser since
    python-dotenv isn't a dependency). Silently a no-op when absent."""
    try:
        path = find_closest(".env", start)
    except ValueError:
        return
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, _, val = line.partition("=")
            key = key.strip()
            val = val.strip().strip("'\"")
            if key and key not in os.environ:
                os.environ[key] = val
