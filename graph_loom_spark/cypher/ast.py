"""Clause IR for the Cypher subset.

Mirrors the reference IR shapes (src/gql/cypher_spec.rs:15-59): the parser
produces a flat clause list; there is no deeper AST. Property values are
kept as raw strings ($param markers included) — resolution point differs
per clause and is the compiler's concern.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# ---------------------------------------------------------------- expressions
@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Prop:
    var: str
    key: str


@dataclass(frozen=True)
class FuncId:
    var: str


@dataclass(frozen=True)
class StrLit:
    value: str


Expr = Var | Prop | FuncId | StrLit


# ------------------------------------------------------------------- patterns
@dataclass
class NodePattern:
    var: str | None = None
    label: str | None = None
    props: dict[str, str] = field(default_factory=dict)


@dataclass
class RelPattern:
    var: str | None = None
    typ: str | None = None
    right: bool = True  # True for ->, False for undirected -[]- (no <- support)
    props: dict[str, str] = field(default_factory=dict)
    min_len: int | None = None
    max_len: int | None = None

    @property
    def is_var_length(self) -> bool:
        return self.min_len is not None or self.max_len is not None


@dataclass
class NodeOnly:
    node: NodePattern


@dataclass
class PathPattern:
    left: NodePattern
    rel: RelPattern
    right: NodePattern


Pattern = NodeOnly | PathPattern


# -------------------------------------------------------------------- clauses
@dataclass
class Match:
    optional: bool
    patterns: list[Pattern]


@dataclass
class Where:
    raw: str  # conjunct splitting happens at compile time (quote-aware)


@dataclass
class Return:
    items: list[Expr]
    distinct: bool = False
    order_by: list[tuple[Expr, bool]] = field(default_factory=list)  # (expr, asc)
    skip: int | None = None
    limit: int | None = None


@dataclass
class With:
    items: list[Expr]
    distinct: bool = False  # parsed but ignored by the executor (reference :1146)
    order_by: list[tuple[Expr, bool]] = field(default_factory=list)
    skip: int | None = None
    limit: int | None = None


@dataclass
class Create:
    patterns: list[Pattern]


@dataclass
class Merge:
    pattern: Pattern


@dataclass
class Delete:
    vars: list[str]
    detach: bool


@dataclass
class SetClause:
    items: list[str]  # raw item strings, parsed at execution (reference :1251-1297)


@dataclass
class RemoveClause:
    items: list[str]


Clause = Match | Where | Return | With | Create | Merge | Delete | SetClause | RemoveClause


class CypherError(ValueError):
    """Parse/execution error, mirroring the reference's anyhow errors."""
