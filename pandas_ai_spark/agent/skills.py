"""Skills — user Python functions injected into the prompt + exec env.

Reference parity: pandasai/ee/skills/__init__.py:7-138 (decorator requiring
a docstring, global registry, ``<function>`` prompt block) and
ee/skills/manager.py. Spark addition: a skill whose signature is
column-shaped can also be registered as a Spark SQL UDF so LLM-generated
SQL can call it.
"""

from __future__ import annotations

import inspect
from typing import Callable


class Skill:
    def __init__(self, func: Callable, name: str | None = None):
        if not func.__doc__:
            raise ValueError(
                f"Skill '{func.__name__}' requires a docstring")
        self.func = func
        self.name = name or func.__name__

    def __call__(self, *args, **kwargs):
        return self.func(*args, **kwargs)

    @property
    def signature(self) -> str:
        return f"def {self.name}{inspect.signature(self.func)}"

    def prompt_block(self) -> str:
        doc = inspect.cleandoc(self.func.__doc__ or "")
        return f"<function>\n{self.signature}\n\"\"\"{doc}\"\"\"\n</function>"

    def __repr__(self) -> str:
        return f"<Skill {self.name}>"


class SkillsRegistry:
    def __init__(self):
        self._skills: dict[str, Skill] = {}

    def add(self, s: Skill) -> None:
        self._skills[s.name] = s

    def get(self, name: str) -> Skill | None:
        return self._skills.get(name)

    def all(self) -> list[Skill]:
        return list(self._skills.values())

    def clear(self) -> None:
        self._skills.clear()

    def prompt_section(self) -> str:
        if not self._skills:
            return ""
        blocks = "\n".join(s.prompt_block() for s in self.all())
        return (
            "You can call the following user-defined functions:\n" + blocks)

    def exec_env(self) -> dict[str, Callable]:
        return {s.name: s.func for s in self.all()}


skills_registry = SkillsRegistry()


def skill(func: Callable) -> Skill:
    """Decorator: register ``func`` as a skill (docstring mandatory)."""
    s = Skill(func)
    skills_registry.add(s)
    return s
