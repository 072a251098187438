"""Bounded conversation memory.

Reference parity: pandasai/helpers/memory.py:5-105 — message list with
user/assistant flags, optional size bound (last N exchanges rendered),
assistant answers truncated to 100 chars in conversation replays.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Message:
    message: str
    is_user: bool


@dataclass
class Memory:
    memory_size: int = 10
    agent_description: str | None = None
    _messages: list[Message] = field(default_factory=list)

    def add(self, message: str, is_user: bool) -> None:
        self._messages.append(Message(message, is_user))

    @property
    def count(self) -> int:
        return len(self._messages)

    def all(self) -> list[Message]:
        return list(self._messages)

    def last(self) -> Message | None:
        return self._messages[-1] if self._messages else None

    def clear(self) -> None:
        self._messages.clear()

    def _truncate(self, msg: Message) -> str:
        # assistant replies are replayed truncated (memory.py:47-58)
        if msg.is_user or len(msg.message) <= 100:
            return msg.message
        return msg.message[:100] + " ..."

    def get_conversation(self, limit: int | None = None) -> str:
        limit = self.memory_size if limit is None else limit
        window = self._messages[-limit * 2:] if limit else self._messages
        lines = []
        for m in window:
            role = "Q" if m.is_user else "A"
            lines.append(f"### {role}: {self._truncate(m)}")
        return "\n".join(lines)

    def get_last_message(self) -> str:
        last = self.last()
        return last.message if last else ""

    def to_openai_messages(self) -> list[dict]:
        """Chat-format message list (memory.py to_openai_messages shape):
        optional system message from the agent description, then the
        bounded conversation window as user/assistant turns."""
        out = []
        if self.agent_description:
            out.append({"role": "system", "content": self.agent_description})
        window = (self._messages[-self.memory_size * 2:]
                  if self.memory_size else self._messages)
        for m in window:
            out.append({"role": "user" if m.is_user else "assistant",
                        "content": m.message})
        return out
