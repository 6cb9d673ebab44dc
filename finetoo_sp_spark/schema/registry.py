"""Schema registry with per-property operational metadata.

Re-expresses the reference's schema-driven operator discovery
(reference: proto/graph.proto:29-38 PropertyMetadata flags
unique/comparable/indexed/aggregable; src/schema/schema_analyzer.cc:103-184
Find{Matchable,Filterable,Comparable,Aggregable}Properties /
FindTraversableEdges): the schema *declares* what each property supports,
and the analyzer *derives* which operators are legal — nothing about
operator legality is hardcoded per type.

Our primitives (operators/primitives.py) consult this registry before
building a plan; an illegal (op, type, property) combination raises
``CapabilityError`` — the Spark analogue of the reference refusing to
emit an operator the schema doesn't license.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class CapabilityError(ValueError):
    """Operator not licensed by the schema for this type/property."""


@dataclass(frozen=True)
class PropertyMeta:
    """Operational metadata for one property.

    - ``unique``: licenses MATCH (point lookup, first-match semantics)
    - ``indexed``: licenses FILTER predicates
    - ``comparable``: licenses COMPARE (incl. numeric tolerance)
    - ``aggregable``: licenses AGGREGATE / GROUP_BY aggregation targets
    """

    name: str
    dtype: str = "string"  # string|int64|double|bool|bytes|timestamp
    unique: bool = False
    indexed: bool = False
    comparable: bool = False
    aggregable: bool = False

    @property
    def numeric(self) -> bool:
        return self.dtype in ("int64", "double")


@dataclass
class NodeTypeDef:
    name: str
    properties: dict[str, PropertyMeta] = field(default_factory=dict)

    def prop(self, name: str) -> PropertyMeta:
        if name not in self.properties:
            raise CapabilityError(f"node type {self.name!r} has no property {name!r}")
        return self.properties[name]


@dataclass
class EdgeTypeDef:
    name: str
    source_type: str
    target_type: str
    properties: dict[str, PropertyMeta] = field(default_factory=dict)


@dataclass
class Schema:
    """A format schema: node/edge type definitions + discovery queries."""

    name: str
    node_types: dict[str, NodeTypeDef] = field(default_factory=dict)
    edge_types: dict[str, EdgeTypeDef] = field(default_factory=dict)

    # -- registration -----------------------------------------------------
    def add_node_type(self, name: str, props: list[PropertyMeta]) -> NodeTypeDef:
        nt = NodeTypeDef(name, {p.name: p for p in props})
        self.node_types[name] = nt
        return nt

    def add_edge_type(
        self, name: str, source: str, target: str, props: list[PropertyMeta] | None = None
    ) -> EdgeTypeDef:
        et = EdgeTypeDef(name, source, target, {p.name: p for p in (props or [])})
        self.edge_types[name] = et
        return et

    # -- discovery (the schema_analyzer surface) --------------------------
    def node_type(self, name: str) -> NodeTypeDef:
        if name not in self.node_types:
            raise CapabilityError(f"schema {self.name!r} has no node type {name!r}")
        return self.node_types[name]

    def matchable_properties(self, node_type: str) -> list[str]:
        return [p.name for p in self.node_type(node_type).properties.values() if p.unique]

    def filterable_properties(self, node_type: str) -> list[str]:
        return [p.name for p in self.node_type(node_type).properties.values() if p.indexed]

    def comparable_properties(self, node_type: str) -> list[str]:
        return [p.name for p in self.node_type(node_type).properties.values() if p.comparable]

    def aggregable_properties(self, node_type: str) -> list[str]:
        return [p.name for p in self.node_type(node_type).properties.values() if p.aggregable]

    def traversable_edges(self, from_type: str | None = None) -> list[str]:
        return [
            e.name
            for e in self.edge_types.values()
            if from_type is None or e.source_type == from_type
        ]

    # -- gating ------------------------------------------------------------
    def require(self, op: str, node_type: str, prop: str) -> PropertyMeta:
        pm = self.node_type(node_type).prop(prop)
        need = {
            "MATCH": pm.unique,
            "FILTER": pm.indexed,
            "COMPARE": pm.comparable,
            "AGGREGATE": pm.aggregable,
            "GROUP_BY": pm.indexed or pm.aggregable,
            "PROJECT": True,
        }
        if op not in need:
            raise CapabilityError(f"unknown operation {op!r}")
        if not need[op]:
            raise CapabilityError(
                f"{op} not licensed for {node_type}.{prop} "
                f"(unique={pm.unique} indexed={pm.indexed} "
                f"comparable={pm.comparable} aggregable={pm.aggregable})"
            )
        return pm

    def validate(self) -> list[str]:
        """Schema sanity report (reference: ValidateSchema): edge endpoints
        must name declared node types; empty type defs are flagged."""
        problems = []
        for e in self.edge_types.values():
            for t in (e.source_type, e.target_type):
                if t not in self.node_types:
                    problems.append(f"edge {e.name}: unknown endpoint type {t}")
        for nt in self.node_types.values():
            if not nt.properties:
                problems.append(f"node type {nt.name}: no properties")
        return problems


def web_graph_schema() -> Schema:
    """The engine's built-in schema for the web-page extraction graph —
    the analogue of the reference's hand-declared CreateDXFSchema
    (reference: src/schema/schema_analyzer.cc:14-101).

    Node types: page (one per url), block (one per classified DOM region).
    Edge types: CONTAINS (page->block), LINKS_TO (page->page via hrefs).
    """
    s = Schema("web_graph")
    s.add_node_type(
        "page",
        [
            PropertyMeta("url", "string", unique=True, indexed=True),
            PropertyMeta("title", "string", indexed=True, comparable=True),
            PropertyMeta("h1", "string", indexed=True, comparable=True),
            PropertyMeta("lang_attr", "string", indexed=True),
            PropertyMeta("n_blocks", "int64", comparable=True, aggregable=True),
            PropertyMeta("n_content_blocks", "int64", comparable=True, aggregable=True),
            PropertyMeta("content_chars", "int64", comparable=True, aggregable=True),
            PropertyMeta("content_hash", "string", indexed=True, comparable=True),
        ],
    )
    s.add_node_type(
        "block",
        [
            PropertyMeta("block_key", "string", unique=True, indexed=True),
            PropertyMeta("url", "string", indexed=True),
            PropertyMeta("tag", "string", indexed=True),
            PropertyMeta("text", "string", indexed=True, comparable=True),
            PropertyMeta("n_words", "int64", indexed=True, comparable=True, aggregable=True),
            PropertyMeta("n_chars", "int64", comparable=True, aggregable=True),
            PropertyMeta("link_density", "double", comparable=True, aggregable=True),
            PropertyMeta("is_content", "bool", indexed=True),
            PropertyMeta("content_hash", "string", indexed=True, comparable=True),
        ],
    )
    s.add_edge_type("CONTAINS", "page", "block")
    s.add_edge_type("LINKS_TO", "page", "page")
    assert not s.validate()
    return s
