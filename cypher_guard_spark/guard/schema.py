"""DbSchema — Neo4j GraphRAG-format graph schema (rust/cypher_guard/src/schema.rs).

Frozen-ish plain-Python objects designed to be ``sparkContext.broadcast``-ed:
built once on the driver, pickled to each executor, then only read.
Lookup predicates are dict/set probes (schema.rs:419-461).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Optional

from . import errors as E

# Property type universe — exactly these seven, with aliases
# (schema.rs:10-18, :35-52). No DATE, no DURATION, no MAP.
PROPERTY_TYPES = ("STRING", "INTEGER", "FLOAT", "BOOLEAN", "POINT", "DATE_TIME", "LIST")

_ALIASES = {
    "STRING": "STRING",
    "STR": "STRING",
    "INTEGER": "INTEGER",
    "INT": "INTEGER",
    "FLOAT": "FLOAT",
    "BOOLEAN": "BOOLEAN",
    "BOOL": "BOOLEAN",
    "POINT": "POINT",
    "DATE_TIME": "DATE_TIME",
    "LIST": "LIST",
}


def property_type_from_string(s: str) -> str:
    """schema.rs:35-52 — uppercased alias resolution, error on anything else."""
    if not isinstance(s, str):
        raise E.InvalidSchemaPropertyType(f"Invalid property type: {s}")
    t = _ALIASES.get(s.upper())
    if t is None:
        raise E.InvalidSchemaPropertyType(f"Invalid property type: {s}")
    return t


@dataclass
class DbSchemaProperty:
    """schema.rs:56-71."""

    name: str
    neo4j_type: str
    enum_values: Optional[list] = None
    min_value: Optional[float] = None
    max_value: Optional[float] = None
    distinct_value_count: Optional[int] = None
    example_values: Optional[list] = None

    def __post_init__(self):
        self.neo4j_type = property_type_from_string(self.neo4j_type)

    @classmethod
    def from_dict(cls, d: dict) -> "DbSchemaProperty":
        if "name" not in d or "neo4j_type" not in d:
            raise E.MissingSchemaField(
                "Missing required field: name/neo4j_type"
            )
        return cls(
            name=d["name"],
            neo4j_type=d["neo4j_type"],
            enum_values=d.get("enum_values"),
            min_value=d.get("min_value"),
            max_value=d.get("max_value"),
            distinct_value_count=d.get("distinct_value_count"),
            example_values=d.get("example_values"),
        )

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "neo4j_type": self.neo4j_type,
            "enum_values": self.enum_values,
            "min_value": self.min_value,
            "max_value": self.max_value,
            "distinct_value_count": self.distinct_value_count,
            "example_values": self.example_values,
        }

    def __repr__(self) -> str:
        return (
            f"DbSchemaProperty(name={self.name}, neo4j_type={self.neo4j_type}, "
            f"enum_values={self.enum_values}, min_value={self.min_value}, "
            f"max_value={self.max_value}, distinct_value_count={self.distinct_value_count}, "
            f"example_values={self.example_values})"
        )


@dataclass
class DbSchemaRelationshipPattern:
    """schema.rs:152-159."""

    start: str
    end: str
    rel_type: str

    def __post_init__(self):
        for v in (self.start, self.end, self.rel_type):
            if not isinstance(v, str):
                raise E.InvalidSchemaRelationshipPattern(
                    f"Invalid relationship pattern: {v!r}"
                )

    @classmethod
    def from_dict(cls, d: dict) -> "DbSchemaRelationshipPattern":
        for k in ("start", "end", "rel_type"):
            if k not in d:
                raise E.MissingSchemaField(f"Missing required field: {k}")
        return cls(start=d["start"], end=d["end"], rel_type=d["rel_type"])

    def to_dict(self) -> dict:
        return {"start": self.start, "end": self.end, "rel_type": self.rel_type}

    def __repr__(self) -> str:
        return (
            f"DbSchemaRelationshipPattern(start={self.start}, end={self.end}, "
            f"rel_type={self.rel_type})"
        )


@dataclass
class DbSchemaConstraint:
    """schema.rs:171-196 (shape only; not used by validation)."""

    id: int
    name: str
    constraint_type: str
    entity_type: str
    labels: list = field(default_factory=list)
    properties: list = field(default_factory=list)


@dataclass
class DbSchemaIndex:
    """schema.rs:211-222."""

    label: str
    properties: list = field(default_factory=list)
    size: int = 0
    index_type: str = "BTREE"


@dataclass
class DbSchemaMetadata:
    """schema.rs:235-240."""

    constraint: list = field(default_factory=list)
    index: list = field(default_factory=list)


class DbSchema:
    """schema.rs:260-269 — node_props / rel_props / relationships / metadata."""

    def __init__(self):
        self.node_props: dict = {}  # label -> list[DbSchemaProperty]
        self.rel_props: dict = {}  # rel_type -> list[DbSchemaProperty]
        self.relationships: list = []  # list[DbSchemaRelationshipPattern]
        self.metadata = DbSchemaMetadata()
        # derived lookup caches (built lazily, rebuilt on mutation)
        self._node_prop_names: Optional[dict] = None
        self._rel_prop_names: Optional[dict] = None
        self._all_prop_names: Optional[set] = None
        self._rel_first_pattern: Optional[dict] = None

    # -- construction -------------------------------------------------------

    @classmethod
    def from_dict(cls, d: dict) -> "DbSchema":
        """Parity with DbSchema::from_map (schema.rs:323-330)."""
        try:
            schema = cls()
            for label, props in d.get("node_props", {}).items():
                schema.node_props[label] = [
                    DbSchemaProperty.from_dict(p) for p in props
                ]
            for rel_type, props in d.get("rel_props", {}).items():
                schema.rel_props[rel_type] = [
                    DbSchemaProperty.from_dict(p) for p in props
                ]
            schema.relationships = [
                DbSchemaRelationshipPattern.from_dict(r)
                for r in d.get("relationships", [])
            ]
            md = d.get("metadata", {}) or {}
            schema.metadata = DbSchemaMetadata(
                constraint=list(md.get("constraint", [])),
                index=list(md.get("index", [])),
            )
            return schema
        except E.CypherSchemaError:
            raise
        except Exception as exc:  # serde parity: structural errors -> InvalidJson
            raise E.InvalidSchemaJson(f"Failed to parse schema from map: {exc}")

    from_map = from_dict

    @classmethod
    def from_json_string(cls, json_str: str) -> "DbSchema":
        """schema.rs:333-340."""
        try:
            data = json.loads(json_str)
        except Exception as exc:
            raise E.InvalidSchemaJson(f"Failed to parse schema JSON: {exc}")
        return cls.from_dict(data)

    def to_dict(self) -> dict:
        return {
            "node_props": {
                label: [p.to_dict() for p in props]
                for label, props in self.node_props.items()
            },
            "rel_props": {
                rt: [p.to_dict() for p in props]
                for rt, props in self.rel_props.items()
            },
            "relationships": [r.to_dict() for r in self.relationships],
            "metadata": {
                "constraint": list(self.metadata.constraint),
                "index": list(self.metadata.index),
            },
        }

    def to_json_string(self) -> str:
        """schema.rs:343-353."""
        return json.dumps(self.to_dict(), indent=2)

    # -- mutation (invalidates caches) --------------------------------------

    def _dirty(self):
        self._node_prop_names = None
        self._rel_prop_names = None
        self._all_prop_names = None
        self._rel_first_pattern = None

    def add_label(self, label: str):
        if self.has_label(label):
            raise E.DuplicateSchemaLabel(
                f"Duplicate label: Label '{label}' already exists"
            )
        self.node_props[label] = []
        self._dirty()

    def add_node_property(self, label: str, prop: DbSchemaProperty):
        props = self.node_props.setdefault(label, [])
        if any(p.name == prop.name for p in props):
            raise E.DuplicateSchemaProperty(
                f"Duplicate property: Property '{prop.name}' already exists "
                f"for label '{label}'"
            )
        props.append(prop)
        self._dirty()

    def add_relationship_property(self, rel_type: str, prop: DbSchemaProperty):
        """schema.rs:463-481."""
        props = self.rel_props.setdefault(rel_type, [])
        if any(p.name == prop.name for p in props):
            raise E.DuplicateSchemaProperty(
                f"Duplicate property: Property '{prop.name}' already exists "
                f"for relationship '{rel_type}'"
            )
        props.append(prop)
        self._dirty()

    def remove_relationship_property(self, rel_type: str, property_name: str):
        """schema.rs:484-515."""
        props = self.rel_props.get(rel_type)
        if props is None:
            raise E.SchemaRelationshipNotFound(
                f"Relationship not found: Relationship type '{rel_type}' not found"
            )
        remaining = [p for p in props if p.name != property_name]
        if len(remaining) == len(props):
            raise E.SchemaPropertyNotFound(
                f"Property not found: Property '{property_name}' not found "
                f"for relationship '{rel_type}'"
            )
        if remaining:
            self.rel_props[rel_type] = remaining
        else:
            del self.rel_props[rel_type]
        self._dirty()

    def add_relationship_pattern(self, pattern: DbSchemaRelationshipPattern):
        """schema.rs:518-534."""
        for p in self.relationships:
            if (
                p.start == pattern.start
                and p.end == pattern.end
                and p.rel_type == pattern.rel_type
            ):
                raise E.DuplicateSchemaRelationship(
                    f"Duplicate relationship: Relationship pattern "
                    f"'({pattern.start})--[{pattern.rel_type}]--->({pattern.end})' "
                    f"already exists"
                )
        self.relationships.append(pattern)
        self._dirty()

    # -- predicates (schema.rs:419-461) --------------------------------------

    def has_label(self, label: str) -> bool:
        return label in self.node_props

    def has_node_property(self, label: str, property_name: str) -> bool:
        if self._node_prop_names is None:
            self._build_caches()
        names = self._node_prop_names.get(label)
        return names is not None and property_name in names

    def get_node_properties(self, label: str):
        return self.node_props.get(label)

    def get_node_property(self, label: str, property_name: str):
        props = self.node_props.get(label)
        if props is None:
            return None
        for p in props:
            if p.name == property_name:
                return p
        return None

    def has_property_in_nodes(self, property_name: str) -> bool:
        if self._node_prop_names is None:
            self._build_caches()
        return any(property_name in names for names in self._node_prop_names.values())

    def has_relationship_type(self, rel_type: str) -> bool:
        return rel_type in self.rel_props or any(
            r.rel_type == rel_type for r in self.relationships
        )

    def has_relationship_property(self, rel_type: str, property_name: str) -> bool:
        if self._rel_prop_names is None:
            self._build_caches()
        names = self._rel_prop_names.get(rel_type)
        return names is not None and property_name in names

    def has_property_anywhere(self, property_name: str) -> bool:
        """Global existence probe used by validation check ⑦ (validation.rs:706-724)."""
        if self._all_prop_names is None:
            self._build_caches()
        return property_name in self._all_prop_names

    def first_relationship_pattern(self, rel_type: str):
        """First schema pattern with the type — validation.rs:613-618 parity."""
        if self._rel_first_pattern is None:
            self._build_caches()
        return self._rel_first_pattern.get(rel_type)

    def _build_caches(self):
        self._node_prop_names = {
            label: {p.name for p in props} for label, props in self.node_props.items()
        }
        self._rel_prop_names = {
            rt: {p.name for p in props} for rt, props in self.rel_props.items()
        }
        self._all_prop_names = set()
        for names in self._node_prop_names.values():
            self._all_prop_names |= names
        for names in self._rel_prop_names.values():
            self._all_prop_names |= names
        self._rel_first_pattern = {}
        for r in self.relationships:
            self._rel_first_pattern.setdefault(r.rel_type, r)

    # -- consistency ---------------------------------------------------------

    def validate(self):
        """schema.rs:538-561 — every pattern's start/end label must exist."""
        for pattern in self.relationships:
            if not self.has_label(pattern.start):
                raise E.SchemaLabelNotFound(
                    f"Label not found: Start label '{pattern.start}' in "
                    f"relationship pattern not found"
                )
            if not self.has_label(pattern.end):
                raise E.SchemaLabelNotFound(
                    f"Label not found: End label '{pattern.end}' in "
                    f"relationship pattern not found"
                )

    def __getstate__(self):
        # Broadcast-friendly: ship only the data, rebuild caches per executor.
        return self.to_dict()

    def __setstate__(self, state):
        fresh = DbSchema.from_dict(state)
        self.__dict__.update(fresh.__dict__)
