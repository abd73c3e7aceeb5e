"""YAML project loader: project dir -> model dataclasses.

Replaces the reference's import pipeline (cli/dataforge/importProject.py:25-79
file walk + svc_import_load_object routing + impc_* upserts) with a direct
in-memory load.  Same project layout:

    project/
      meta.yaml           # must declare format: core1.0
      relations.yaml      # optional
      sources/*.yaml
      outputs/*.yaml      # optional

Validation parity:
- meta format check (imp_check_format.sql:13-26 — only "core1.0")
- sources/ dir required (importProject.py:25-40)
- attribute name rules + duplicate checks (impc_execute.sql:94-102)
- mapping parse ``attr[.key…] col`` / ``agg([DISTINCT ]attr) col``
  (impc_parse_mapping.sql:19-43)
"""

from __future__ import annotations

import os
import re

import yaml

from dataforge_core_spark.model import (
    Channel,
    ExplicitParam,
    HIVE_TO_SPARK_DDL,
    Mapping,
    Output,
    OutputColumn,
    Project,
    ProjectError,
    RawAttribute,
    Relation,
    Rule,
    Source,
)

# "attr col" | "attr.key1.key2 col" — impc_parse_mapping.sql:25,39
_MAP_PLAIN_RE = re.compile(
    r"^\s*([a-z_][a-z0-9_]*)((?:\.[a-z_][a-z0-9_]*)*)\s+([a-z_][a-z0-9_]*)\s*$"
)
# "agg(attr) col" | "agg(DISTINCT attr.k) col" — impc_parse_mapping.sql:25,34
_MAP_AGG_RE = re.compile(
    r"^\s*([a-z_][a-z0-9_]*)\s*\(\s*(distinct\s+)?([a-z_][a-z0-9_]*)"
    r"((?:\.[a-z_][a-z0-9_]*)*)\s*\)\s+([a-z_][a-z0-9_]*)\s*$",
    re.IGNORECASE,
)
# "name type" raw attribute / output column declaration
_ATTR_RE = re.compile(r"^\s*([a-z_][a-z0-9_]*)\s+([a-zA-Z_()0-9,]+)\s*$")


def _parse_raw_attribute(item) -> RawAttribute:
    """impc_parse_raw_attribute.sql:13-40 — string or {name, schema} form."""
    if isinstance(item, str):
        m = _ATTR_RE.match(item)
        if not m:
            raise ProjectError(f"Cannot parse raw attribute {item!r}")
        name, t = m.group(1), m.group(2).lower()
        if t not in HIVE_TO_SPARK_DDL:
            raise ProjectError(f"Unknown type {t!r} for attribute {name!r}")
        return RawAttribute(name=name, hive_type=t)
    if isinstance(item, dict) and "name" in item and "schema" in item:
        return RawAttribute(name=item["name"], schema_json=item["schema"])
    raise ProjectError(f"Cannot parse raw attribute {item!r}")


def _parse_rule(item: dict) -> Rule:
    params = [
        ExplicitParam(
            source_name=p["source_name"], relations=list(p.get("relations", []))
        )
        for p in item.get("parameters", []) or []
    ]
    rtype = item.get("rule_type", "E")
    if rtype not in ("E", "V"):
        # CHECK constraint "12 enrichmentTable.sql":34
        raise ProjectError(f"rule_type must be E or V, got {rtype!r}")
    expression = str(item["expression"])
    # W2: window rules auto-set keep_current
    # (impc_upsert_enrichments.sql:21 — COALESCE(keep_current_flag,
    #  expression ~* 'over\s*\(.*\)'))
    import re as _re

    keep_current = bool(
        item.get(
            "keep_current",
            bool(_re.search(r"(?i)over\s*\(", expression)),
        )
    )
    return Rule(
        name=item["name"],
        expression=expression,
        rule_type=rtype,
        validation_action=item.get("validation_action", "F"),
        unique=bool(item.get("unique", False)),
        keep_current=keep_current,
        cast_datatype=item.get("cast_datatype"),
        parameters=params,
    )


def _parse_mapping(text: str) -> Mapping:
    m = _MAP_AGG_RE.match(text)
    if m:
        keys = [k for k in m.group(4).split(".") if k] if m.group(4) else []
        return Mapping(
            attribute=m.group(3),
            column=m.group(5),
            aggregate=m.group(1).lower(),
            distinct=bool(m.group(2)),
            keys=keys,
        )
    m = _MAP_PLAIN_RE.match(text)
    if m:
        keys = [k for k in m.group(2).split(".") if k] if m.group(2) else []
        return Mapping(attribute=m.group(1), column=m.group(3), keys=keys)
    raise ProjectError(f"Cannot parse output mapping {text!r}")


def parse_source_dict(d: dict) -> Source:
    sub = d.get("sub_source") or {}
    return Source(
        source_name=d["source_name"],
        source_table=d.get("source_table", ""),
        target_table=d.get("target_table", d["source_name"]),
        raw_attributes=[_parse_raw_attribute(a) for a in d.get("raw_attributes", [])],
        rules=[_parse_rule(r) for r in d.get("rules", []) or []],
        processing_type=d.get("processing_type", "batch"),
        sub_source_parent=sub.get("parent"),
        sub_source_attribute=sub.get("attribute"),
    )


def parse_output_dict(d: dict) -> Output:
    cols = []
    for i, c in enumerate(d.get("columns", [])):
        # dict form carries writer hints the string form cannot:
        # {"name":…, "type":…, "partition_ordinal": N} — the reference
        # schema's partition hint ("9 outputColumnTable.sql":18)
        part_ord = z_ord = None
        if isinstance(c, dict):
            part_ord = c.get("partition_ordinal")
            z_ord = c.get("zorder_ordinal")
            c = f"{c['name']} {c['type']}"
        m = _ATTR_RE.match(c)
        if not m:
            raise ProjectError(f"Cannot parse output column {c!r}")
        t = m.group(2).lower()
        if t not in HIVE_TO_SPARK_DDL:
            raise ProjectError(f"Unknown type {t!r} for output column {c!r}")
        cols.append(
            OutputColumn(
                name=m.group(1),
                hive_type=t,
                partition_ordinal=part_ord,
                zorder_ordinal=z_ord,
            )
        )
    channels = []
    for ch in d.get("channels", []) or []:
        set_op = ch.get("set_operation")
        if set_op is not None:
            set_op = str(set_op).lower()
            if set_op == "union":
                set_op = None
            elif set_op not in ("intersect", "except"):
                raise ProjectError(
                    f"Unknown set_operation {ch['set_operation']!r} "
                    "(expected union, intersect or except)"
                )
        channels.append(
            Channel(
                source_name=ch["source_name"],
                mappings=[_parse_mapping(mp) for mp in ch.get("mappings", [])],
                filter=ch.get("filter"),
                operation_type=ch.get("operation_type"),
                include_pass=bool(ch.get("include_pass", True)),
                include_warn=bool(ch.get("include_warn", False)),
                include_fail=bool(ch.get("include_fail", False)),
                unpivot=ch.get("unpivot"),
                set_operation=set_op,
            )
        )
    return Output(
        output_name=d["output_name"],
        columns=cols,
        channels=channels,
        output_type=d.get("output_type", "table"),
        file_format=d.get("file_format"),
    )


def parse_relations_list(items: list) -> list[Relation]:
    rels = []
    for item in items or []:
        rel = Relation(
            name=item["name"],
            expression=str(item["expression"]),
            cardinality=item["cardinality"],
            primary=bool(item.get("primary", False)),
        )
        rel.decode()  # validate name format eagerly
        rel.card_sides()
        rels.append(rel)
    return rels


def load_project(project_dir: str) -> Project:
    meta_path = os.path.join(project_dir, "meta.yaml")
    sources_dir = os.path.join(project_dir, "sources")
    if not os.path.isfile(meta_path) or not os.path.isdir(sources_dir):
        # importProject.py:25-40
        raise ProjectError(
            f"{project_dir!r} is not a project: requires meta.yaml and sources/"
        )
    with open(meta_path) as f:
        meta = yaml.safe_load(f) or {}
    if str(meta.get("format", "")) != "core1.0":
        # imp_check_format.sql:13-26
        raise ProjectError(
            f"Unsupported project format {meta.get('format')!r}; expected core1.0"
        )

    sources = []
    for fn in sorted(os.listdir(sources_dir)):
        if not fn.endswith((".yaml", ".yml")):
            continue
        with open(os.path.join(sources_dir, fn)) as f:
            sources.append(parse_source_dict(yaml.safe_load(f)))

    relations: list[Relation] = []
    rel_path = os.path.join(project_dir, "relations.yaml")
    if os.path.isfile(rel_path):
        with open(rel_path) as f:
            relations = parse_relations_list(yaml.safe_load(f))

    outputs = []
    outputs_dir = os.path.join(project_dir, "outputs")
    if os.path.isdir(outputs_dir):
        for fn in sorted(os.listdir(outputs_dir)):
            if not fn.endswith((".yaml", ".yml")):
                continue
            with open(os.path.join(outputs_dir, fn)) as f:
                outputs.append(parse_output_dict(yaml.safe_load(f)))

    project = Project(
        sources=sources,
        relations=relations,
        outputs=outputs,
        name=str(meta.get("name", os.path.basename(os.path.abspath(project_dir)))),
    )
    project.validate_names()
    _validate_references(project)
    return project


def _validate_references(project: Project) -> None:
    by_name = project.source_by_name()
    for s in project.sources:
        if s.sub_source_parent:
            parent = by_name.get(s.sub_source_parent)
            if parent is None:
                raise ProjectError(
                    f"Sub-source {s.source_name!r} references unknown "
                    f"parent {s.sub_source_parent!r}"
                )
            if not s.sub_source_attribute or (
                s.sub_source_attribute not in parent.raw_by_name()
                and s.sub_source_attribute not in parent.rule_by_name()
            ):
                raise ProjectError(
                    f"Sub-source {s.source_name!r}: parent attribute "
                    f"{s.sub_source_attribute!r} not found on "
                    f"{s.sub_source_parent!r}"
                )
            # chains must terminate at a non-sub top-most parent (the
            # reference walks the chain recursively and would loop
            # forever on a cycle —
            # u_enr_query_get_top_most_parent_source_id.sql:19-21)
            seen = {s.source_name}
            cur = parent
            while cur is not None and cur.sub_source_parent:
                if cur.source_name in seen:
                    raise ProjectError(
                        f"Sub-source {s.source_name!r}: circular "
                        "sub-source parent chain"
                    )
                seen.add(cur.source_name)
                cur = by_name.get(cur.sub_source_parent)
    for rel in project.relations:
        left, _, right = rel.decode()
        for s in (left, right):
            if s not in by_name:
                raise ProjectError(
                    f"Relation {rel.name!r} references unknown source {s!r}"
                )
    for out in project.outputs:
        col_names = {c.name for c in out.columns}
        for ch in out.channels:
            if ch.source_name not in by_name:
                raise ProjectError(
                    f"Output {out.output_name!r} channel references unknown "
                    f"source {ch.source_name!r}"
                )
            for mp in ch.mappings:
                if mp.column not in col_names:
                    raise ProjectError(
                        f"Output {out.output_name!r}: mapping targets unknown "
                        f"column {mp.column!r}"
                    )
