"""Query result shapes mirroring the reference's tagged union
(src/gql/query_interface.rs:12-26): Node / Relationship / Info rows plus
the outcome envelope with affected counts and the mutated flag."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ResultRow:
    kind: str  # 'node' | 'rel' | 'info'
    id: str | None = None
    src: str | None = None
    dst: str | None = None
    label: str | None = None
    properties: dict[str, str] | None = None
    info: str | None = None

    @classmethod
    def node(cls, id: str, label: str, properties: dict[str, str]) -> "ResultRow":
        return cls("node", id=id, label=label, properties=dict(properties or {}))

    @classmethod
    def rel(cls, id: str, src: str, dst: str, label: str, properties: dict[str, str]) -> "ResultRow":
        return cls("rel", id=id, src=src, dst=dst, label=label, properties=dict(properties or {}))

    @classmethod
    def info_row(cls, value: str) -> "ResultRow":
        return cls("info", info=value)

    @property
    def is_node(self) -> bool:
        return self.kind == "node"

    @property
    def is_rel(self) -> bool:
        return self.kind == "rel"

    @property
    def is_info(self) -> bool:
        return self.kind == "info"

    def to_dict(self) -> dict:
        """JSON shape of the serve layer's OutcomeDto rows (server.rs:69-127)."""
        if self.is_node:
            return {"kind": "node", "id": self.id, "label": self.label, "metadata": self.properties}
        if self.is_rel:
            return {
                "kind": "relationship",
                "id": self.id,
                "from": self.src,
                "to": self.dst,
                "label": self.label,
                "metadata": self.properties,
            }
        # The reference DTO always carries an id field; info rows get ""
        # (server.rs map_outcome: `id: String::new()`).
        return {"kind": "info", "id": "", "info": self.info}


@dataclass
class QueryOutcome:
    rows: list[ResultRow] = field(default_factory=list)
    affected_nodes: int = 0
    affected_relationships: int = 0
    mutated: bool = False

    def to_dict(self) -> dict:
        return {
            "rows": [r.to_dict() for r in self.rows],
            "affected_nodes": self.affected_nodes,
            "affected_relationships": self.affected_relationships,
            "mutated": self.mutated,
        }
