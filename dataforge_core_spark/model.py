"""Project data model.

In-memory equivalent of the reference's PostgreSQL metadata schema
(``/root/reference/database/schema``): ``meta.source`` (3 sourceTable.sql),
``meta.enrichment`` (12 enrichmentTable.sql), ``meta.source_relation``
(19 sourceRelation.sql), ``meta.output`` / ``meta.output_source`` /
``meta.output_source_column`` (8/12/14 *.sql).  The reference uses Postgres
purely as a compiler heap; here the model is plain dataclasses compiled per
run — no database in the loop.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


# Canonical type table: user-facing "hive_type" -> Spark DDL type.
# Mirrors database/schema/"1 createAttributeTypeTable.sql":10-21.
# All decimals are normalized to decimal(38,12)
# (u_enr_query_add_enrichment.sql:128-133).
HIVE_TO_SPARK_DDL: dict[str, str] = {
    "string": "string",
    "decimal": "decimal(38,12)",
    "timestamp": "timestamp",
    "boolean": "boolean",
    "int": "int",
    "integer": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "date": "date",
    "binary": "binary",  # extension: multimodal payload columns
    # struct/array are declared via full Spark JSON schemas, not bare names
}

# Attribute/rule-name rule: svc_parse_enrichment.sql:66-69,
# impc_execute.sql:94-102.
NAME_RE = re.compile(r"^[a-z_]+[a-z0-9_]*$")

# Relation-name / cardinality decode regexes:
# imp-import/imp_decode_relation.sql:13,34.
RELATION_NAME_RE = re.compile(r"^\[([^\]]+)]-(.+)-\[([^\]]+)]$")
CARDINALITY_RE = re.compile(r"^(M|1)-(M|1)$")


class ProjectError(ValueError):
    """Validation error in a project definition (import-time error class)."""


@dataclass
class RawAttribute:
    """Typed column of a source — schema/"14 rawAttribute.sql":2-21.

    Declared either as a ``"name type"`` string or as a ``{name, schema}``
    object carrying a full Spark DataType JSON
    (impc_parse_raw_attribute.sql:13-40).
    """

    name: str
    hive_type: str | None = None  # scalar domain key of HIVE_TO_SPARK_DDL
    schema_json: dict | None = None  # full Spark DataType JSON for complex

    @property
    def spark_ddl(self) -> str:
        if self.hive_type is not None:
            return HIVE_TO_SPARK_DDL[self.hive_type]
        # complex type: build DDL through StructType round-trip at use site
        raise ProjectError(f"attribute {self.name} has no scalar type")


@dataclass
class ExplicitParam:
    """Rule ``parameters:`` entry pinning a relation path for one source.

    Mirrors the sample syntax in tpch_lineitem.yaml:38-43.
    """

    source_name: str
    relations: list[str] = field(default_factory=list)


@dataclass
class Rule:
    """Enrichment — single-column SQL expression over [This]/[Source] tokens.

    schema/"12 enrichmentTable.sql":2-39.  rule_type 'E' (enrichment) or
    'V' (validation, boolean, with action F(ail)/W(arn)).
    """

    name: str
    expression: str
    rule_type: str = "E"  # CHECK in ("E","V") — 12 enrichmentTable.sql:34
    validation_action: str = "F"  # 'F' fail / 'W' warn
    unique: bool = False  # unique_flag — 12 enrichmentTable.sql:21
    keep_current: bool = False  # recalc mode; auto-set for window rules
    cast_datatype: str | None = None  # explicit target hive_type
    parameters: list[ExplicitParam] = field(default_factory=list)


@dataclass
class Relation:
    """Named, cardinality-annotated join predicate between two sources.

    schema/"19 sourceRelation.sql":1-22.  Name format
    ``[left]- label -[right]``; cardinality ``{M|1}-{M|1}``.
    """

    name: str
    expression: str  # boolean expr over [This]./[Related]. tokens
    cardinality: str  # e.g. "M-1"
    primary: bool = False  # path-search tiebreak priority

    def decode(self) -> tuple[str, str, str]:
        """-> (left_source, label, right_source); imp_decode_relation.sql:13."""
        m = RELATION_NAME_RE.match(self.name.replace(" ", ""))
        if not m:
            raise ProjectError(
                f"Invalid relation name format: {self.name!r} "
                "(expected '[left]- name -[right]')"
            )
        return m.group(1), m.group(2), m.group(3)

    @property
    def left(self) -> str:
        return self.decode()[0]

    @property
    def right(self) -> str:
        return self.decode()[2]

    def card_sides(self) -> tuple[str, str]:
        m = CARDINALITY_RE.match(self.cardinality.strip())
        if not m:
            raise ProjectError(
                f"Invalid cardinality {self.cardinality!r} for relation "
                f"{self.name!r} (expected M-1, 1-M, 1-1 or M-M)"
            )
        return m.group(1), m.group(2)


@dataclass
class Source:
    """Logical input table + its enriched "hub" target.

    schema/"3 sourceTable.sql":1-42; sample sources/tpch_lineitem.yaml.
    ``source_table`` may be a catalog table name or a parquet/csv/json path
    (the reference reads catalog tables only; paths are our extension via
    dataforge_core_spark.sources).
    """

    source_name: str
    source_table: str
    target_table: str
    raw_attributes: list[RawAttribute] = field(default_factory=list)
    rules: list[Rule] = field(default_factory=list)
    # extension point — reference guards but never sets processing_type
    # ('stream' — svc_parse_enrichment.sql:105-112); see streaming/.
    processing_type: str = "batch"
    # sub-source (SURVEY §2.11): this source's rows are the elements of
    # the parent's array<struct> attribute; its rules run per element and
    # the enriched array becomes an enrichment column on the parent hub,
    # named by this source_name (source.sub_source_enrichment_id —
    # "3 sourceTable.sql":36; generation mode 'sub-source'
    # u_enr_query_generate_query.sql:20-23,52).  The reference's own 'S'
    # path is unreachable (undefined function) — implemented natively
    # here with transform()/named_struct.
    sub_source_parent: str | None = None  # parent source name
    sub_source_attribute: str | None = None  # parent array<struct> attr

    def raw_by_name(self) -> dict[str, RawAttribute]:
        return {a.name: a for a in self.raw_attributes}

    def rule_by_name(self) -> dict[str, Rule]:
        return {r.name: r for r in self.rules}


@dataclass
class OutputColumn:
    """Ordered typed column of an output — schema/"9 outputColumnTable.sql"."""

    name: str
    hive_type: str
    # partition/zorder hints exist in the reference schema (:18-19) unused
    # by core; honored by our writer as partitionBy ordering and
    # sortWithinPartitions clustering respectively.
    partition_ordinal: int | None = None
    zorder_ordinal: int | None = None


@dataclass
class Mapping:
    """attribute -> column map of a channel; optional aggregate + struct keys.

    schema/"14 outputSourceColumnTable.sql":15,20,21;
    parse regexes impc_parse_mapping.sql:19-43 (supports
    ``attr col``, ``attr.key1.key2 col``, ``agg(attr) col``,
    ``agg(DISTINCT attr) col``).
    """

    attribute: str  # source attribute (raw or rule) name
    column: str  # output column name
    aggregate: str | None = None
    distinct: bool = False
    keys: list[str] = field(default_factory=list)  # struct key path


@dataclass
class Channel:
    """Mapping of one source into an output (``output_source``).

    schema/"12 outputSourceTable.sql":1-32.  Multiple channels UNION ALL
    into one output (u_output_generate_query.sql:154).
    """

    source_name: str
    mappings: list[Mapping] = field(default_factory=list)
    filter: str | None = None
    operation_type: str | None = None  # None | "Aggregate"
    # O3 extension (absent in the reference's generator, SURVEY §2.6):
    # how this channel combines with the channels before it — UNION ALL
    # (default), INTERSECT or EXCEPT (both DISTINCT, standard SQL).
    # Ignored on the first channel.
    set_operation: str | None = None  # None | "intersect" | "except"
    # validation-status routing — 12 outputSourceTable.sql:17-19
    include_pass: bool = True
    include_warn: bool = False
    include_fail: bool = False
    # declared but rejected by the reference ("Unpivot not supported
    # yet!" — u_output_generate_query.sql:101; unpivot_list column
    # 12 outputSourceTable.sql:8); kept for error parity
    unpivot: list[str] | None = None


@dataclass
class Output:
    """Target table with ordered typed columns — schema/"8 outputTable.sql"."""

    output_name: str
    columns: list[OutputColumn] = field(default_factory=list)
    channels: list[Channel] = field(default_factory=list)
    output_type: str = "table"  # table | virtual | file (u_validate_output.sql)
    file_format: str | None = None  # parquet|avro|text (+csv|json ext.) for output_type=file

    def partition_columns(self) -> list[str]:
        """Column names with a partition_ordinal, in ordinal order — the
        writer's partitionBy spec (the reference schema declares the
        hint, "9 outputColumnTable.sql":18, but its core never reads it;
        honoring it is the natural Spark mapping)."""
        hinted = [c for c in self.columns if c.partition_ordinal is not None]
        return [c.name for c in sorted(hinted, key=lambda c: c.partition_ordinal)]

    def zorder_columns(self) -> list[str]:
        """Column names with a zorder_ordinal, in ordinal order — the
        writer's sortWithinPartitions spec ("9 outputColumnTable.sql":19;
        the reference core never reads the hint).  Lexicographic
        within-file clustering is the parquet-native approximation of
        Z-ordering: it tightens per-file min/max column statistics on
        the hinted keys so predicate scans skip files (true bit
        interleaving only pays with a table format's OPTIMIZE)."""
        hinted = [c for c in self.columns if c.zorder_ordinal is not None]
        return [c.name for c in sorted(hinted, key=lambda c: c.zorder_ordinal)]


@dataclass
class Project:
    """One compiled namespace of sources/relations/outputs."""

    sources: list[Source] = field(default_factory=list)
    relations: list[Relation] = field(default_factory=list)
    outputs: list[Output] = field(default_factory=list)
    name: str = "project"

    def source_by_name(self) -> dict[str, Source]:
        return {s.source_name: s for s in self.sources}

    def validate_names(self) -> None:
        seen: set[str] = set()
        for s in self.sources:
            if s.source_name in seen:
                raise ProjectError(f"Duplicate source name {s.source_name!r}")
            seen.add(s.source_name)
            for a in s.raw_attributes:
                if not NAME_RE.match(a.name):
                    raise ProjectError(
                        f"Invalid attribute name {a.name!r} in source "
                        f"{s.source_name!r}: must match ^[a-z_]+[a-z0-9_]*$"
                    )
            rule_names = set()
            for r in s.rules:
                if not NAME_RE.match(r.name):
                    raise ProjectError(
                        f"Invalid rule name {r.name!r} in source "
                        f"{s.source_name!r}: must match ^[a-z_]+[a-z0-9_]*$"
                    )
                if r.name in rule_names or r.name in s.raw_by_name():
                    raise ProjectError(
                        f"Duplicate attribute name {r.name!r} in source "
                        f"{s.source_name!r}"
                    )
                rule_names.add(r.name)
