"""S3: validated environment/config (SURVEY.md §2.1).

Mirrors the reference's TypeBox ``Environment`` schema (task.ts:7-23):
``RSS_URL`` required; ``Headers`` an optional key/value list; ``Timeout``
defaulting to 30 000 ms; ``Retries`` defaulting to 2. ``schema()`` returns
the JSON-Schema document the reference would serve (task.ts:583-596) so
hosting platforms can render a config UI; ``from_env`` validates a mapping
(e.g. ``os.environ``) with the same defaulting behaviour.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Environment:
    rss_url: str
    headers: dict[str, str] = field(default_factory=dict)
    timeout_ms: int = 30000  # task.ts:16
    retries: int = 2  # task.ts:20

    @staticmethod
    def schema() -> dict:
        """JSON Schema for the config surface (task.ts:7-23, 583-596)."""
        return {
            "type": "object",
            "required": ["RSS_URL"],
            "properties": {
                "RSS_URL": {
                    "type": "string",
                    "description": "CAP-NZ RSS or Atom feed URL",
                },
                "Headers": {
                    "type": "array",
                    "items": {
                        "type": "object",
                        "required": ["key", "value"],
                        "properties": {
                            "key": {"type": "string"},
                            "value": {"type": "string"},
                        },
                    },
                },
                "Timeout": {
                    "type": "number",
                    "default": 30000,
                    "description": "Request timeout in milliseconds",
                },
                "Retries": {
                    "type": "number",
                    "default": 2,
                    "description": "Number of retry attempts on failure",
                },
            },
        }

    @classmethod
    def from_env(cls, env: dict) -> "Environment":
        if not env.get("RSS_URL"):
            raise ValueError("RSS_URL is required")
        headers: dict[str, str] = {}
        for h in env.get("Headers") or []:
            headers[h["key"]] = h["value"]  # task.ts:601-604
        return cls(
            rss_url=env["RSS_URL"],
            headers=headers,
            timeout_ms=int(env.get("Timeout", 30000)),
            retries=int(env.get("Retries", 2)),
        )
