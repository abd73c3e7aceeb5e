"""Source planner: rules + relations -> a stratified element DAG.

Python equivalent of the reference's ``meta.query_element`` machinery
(schema/"18 createQueryElementTable.sql":3-16;
u_enr_query_generate_elements.sql; u_enr_query_update_cte.sql:19-125):
every raw attribute, rule, lookup join and aggregate ("many-join") becomes
an element with parent ids, and elements are assigned to the lowest stage
where all parents are available.  In DataFrame terms a "CTE level" is just
a batch of ``withColumn``s/joins — Catalyst collapses adjacent projections
(CollapseProject), so stages exist only to order joins vs. the rules that
need them.

Join/aggregate elements are deduplicated by relation-path id, replicating
the reference's compile-time reuse (u_enr_query_add_join.sql:33-41;
u_enr_query_add_many_join.sql:24-32) — Catalyst does not dedup separate
``.join()`` calls on its own, so this compile-time sharing matters for the
physical plan (one shuffle per path instead of one per referencing rule).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from dataforge_core_spark.functions.aggregates import AGGREGATE_WHITELIST
from dataforge_core_spark.model import Project, ProjectError, Rule, Source
from dataforge_core_spark.parser import (
    AggCall,
    ParsedExpression,
    parse_expression,
    parse_relation_expression,
)
from dataforge_core_spark.paths import Path, RelationGraph


def _sanitize(s: str) -> str:
    return re.sub(r"[^a-zA-Z0-9_]", "_", s)


@dataclass
class AggSpec:
    """One aggregate call bound to a join element.

    inner_sql tokens are rewritten to:
      `attr`                 — column of the M-target hub
      `__TR__<src>__<attr>`  — transit from a third source (cardinality-1
                               path from the target; SURVEY §7.3 /
                               u_enr_query_add_many_join_attribute)
      `__THIS__<attr>`       — transit of a [This] value into the
                               aggregate (forces row-key decorrelation)
    """

    call: AggCall
    out_col: str
    inner_sql: str
    transits: dict[str, "Path"] = field(default_factory=dict)  # src -> path
    this_attrs: set[str] = field(default_factory=set)


@dataclass
class JoinElement:
    """One (deduplicated) relation path materialized as a join.

    kind='lookup'    -> cardinality-1 path: LEFT JOIN of the target hub
                        chain (J1/J2/J3 in SURVEY §2.3)
    kind='aggregate' -> M-cardinality path: groupBy+join decorrelation of
                        the reference's LEFT JOIN LATERAL (J5)
    """

    path: Path
    pathid: str
    kind: str  # 'lookup' | 'aggregate'
    # attrs needed from the path target: attr -> output column name
    needed: dict[str, str] = field(default_factory=dict)
    aggs: list[AggSpec] = field(default_factory=list)
    # [This]-side attribute names used by the first-hop predicate
    deps: set[str] = field(default_factory=set)
    level: int = 0

    @property
    def needs_row_fallback(self) -> bool:
        return any(a.this_attrs for a in self.aggs)

    @property
    def is_self(self) -> bool:
        h = self.path.hops[0]
        return h.relation.left == h.relation.right


@dataclass
class RuleElement:
    rule: Rule
    parsed: ParsedExpression
    # final Spark SQL text with all tokens replaced by column references
    compiled_sql: str = ""
    deps: set[str] = field(default_factory=set)  # [This] attr names
    join_deps: set[str] = field(default_factory=set)  # pathids
    level: int = 0


@dataclass
class SourcePlan:
    source: Source
    rules: dict[str, RuleElement] = field(default_factory=dict)
    joins: dict[str, JoinElement] = field(default_factory=dict)
    # rule names in execution order, grouped into levels
    levels: list[list[str]] = field(default_factory=list)
    # source names whose hubs this plan reads (build-order dependencies)
    hub_deps: set[str] = field(default_factory=set)


def _target_attr_col(pathid: str, attr: str) -> str:
    return f"__{pathid}__{attr}"


def _agg_out_col(pathid: str, idx: int) -> str:
    return f"__{pathid}__a{idx}"


def plan_source(
    project: Project, graph: RelationGraph, source: Source
) -> SourcePlan:
    """Parse + resolve + stratify all rules of one source."""
    plan = SourcePlan(source=source)
    by_name = project.source_by_name()
    raw = source.raw_by_name()
    rule_map = source.rule_by_name()

    def attr_exists(src: Source, attr: str) -> bool:
        return attr in src.raw_by_name() or attr in src.rule_by_name()

    # -- parse every rule, resolve paths, build elements ------------------
    for rule in source.rules:
        parsed = parse_expression(rule.expression)
        el = RuleElement(rule=rule, parsed=parsed)
        explicit = {p.source_name: p.relations for p in rule.parameters}

        spans: list[tuple[int, int, str]] = []
        for tok in parsed.tokens:
            if tok.source == "This":
                if tok.attr == rule.name:
                    # self-reference ban — svc_parse_enrichment.sql:229-241
                    raise ProjectError(
                        f"Rule {rule.name!r} in source "
                        f"{source.source_name!r} references itself"
                    )
                if tok.attr not in raw and tok.attr not in rule_map:
                    raise ProjectError(
                        f"Rule {rule.name!r}: unknown [This] attribute "
                        f"{tok.attr!r} in source {source.source_name!r}"
                    )
                el.deps.add(tok.attr)
                spans.append((tok.start, tok.end, f"`{tok.attr}`"))
                continue
            # cross-source token -> lookup join
            if tok.source not in by_name:
                raise ProjectError(
                    f"Rule {rule.name!r} references unknown source "
                    f"[{tok.source}]"
                )
            if not attr_exists(by_name[tok.source], tok.attr):
                raise ProjectError(
                    f"Rule {rule.name!r}: source [{tok.source}] has no "
                    f"attribute {tok.attr!r}"
                )
            # cardinality '1' wanted: a discovery finding only M paths
            # raises the reference's "You must use aggregation without
            # OVER clause" verbatim (u_get_next_relation_path.sql:82-83)
            path = graph.resolve(
                source.source_name,
                tok.source,
                explicit.get(tok.source),
                context=f"(rule {rule.name!r})",
                cardinality="1",
            )
            if path.is_aggregate:
                # explicit path pinned to an M chain without aggregation
                raise ProjectError(
                    "You must use aggregation without OVER clause. "
                    f"Target source `{tok.source}`"
                )
            join = _get_join(plan, path, kind="lookup")
            col = join.needed.setdefault(
                tok.attr, _target_attr_col(join.pathid, tok.attr)
            )
            el.join_deps.add(join.pathid)
            spans.append((tok.start, tok.end, f"`{col}`"))

        for call in parsed.aggs:
            if call.func not in AGGREGATE_WHITELIST:
                raise ProjectError(
                    f"Rule {rule.name!r}: function {call.func!r} is not an "
                    "allowed aggregate"
                )
            srcs = {t.source for t in call.tokens}
            for s in srcs - {"This"}:
                if s not in by_name:
                    raise ProjectError(
                        f"Rule {rule.name!r} references unknown source [{s}]"
                    )
            for t in call.tokens:
                owner = source if t.source == "This" else by_name[t.source]
                if not attr_exists(owner, t.attr):
                    raise ProjectError(
                        f"Rule {rule.name!r}: source [{t.source}] has no "
                        f"attribute {t.attr!r}"
                    )
            # the aggregation target is the (single) source reached via an
            # M-cardinality path; other sources are transits (resolved
            # from the target, so they may be unreachable from [This])
            m_candidates: list[tuple[str, Path]] = []
            other_sources: list[str] = []
            first_err: ProjectError | None = None
            for s in sorted(srcs - {"This"}):
                try:
                    # cardinality 'M' wanted: 1-only sources raise the
                    # reference's "Remove aggregation or add OVER clause"
                    # (u_get_next_relation_path.sql:84-85) and become
                    # transit candidates instead
                    p = graph.resolve(
                        source.source_name,
                        s,
                        explicit.get(s),
                        context=f"(rule {rule.name!r})",
                        cardinality="M",
                    )
                except ProjectError as e:
                    first_err = first_err or e
                    other_sources.append(s)
                    continue
                if p.is_aggregate:
                    m_candidates.append((s, p))
                else:
                    other_sources.append(s)
            if not m_candidates:
                # surface the first per-parameter path error verbatim,
                # as the reference's parameter loop does
                # (svc_parse_enrichment.sql:295-303)
                raise first_err or ProjectError(
                    f"Rule {rule.name!r}: aggregation path has cardinality "
                    "1 — remove aggregation or add OVER clause"
                )
            if len(m_candidates) > 1:
                raise ProjectError(
                    f"Rule {rule.name!r}: aggregate references multiple "
                    f"M-cardinality sources "
                    f"{sorted(s for s, _ in m_candidates)}"
                )
            agg_src, path = m_candidates[0]
            # transit sources must be reachable from the TARGET with a
            # cardinality-1 path (they are pre-joined onto the
            # aggregation side — SURVEY §7.3)
            transits: dict[str, Path] = {}
            for s in other_sources:
                # cardinality-1 from the target (pre-joined onto the
                # aggregation side); BFS raises the reference messages
                # when only M paths (or none) exist
                transits[s] = graph.discover(
                    agg_src,
                    s,
                    context=f"(transit in rule {rule.name!r})",
                    cardinality="1",
                )

            join = _get_join(plan, path, kind="aggregate")
            inner_spans = []
            this_attrs: set[str] = set()
            for t in call.tokens:
                if t.source == agg_src:
                    repl = f"`{t.attr}`"
                elif t.source == "This":
                    repl = f"`__THIS__{t.attr}`"
                    this_attrs.add(t.attr)
                    el.deps.add(t.attr)
                else:
                    repl = f"`__TR__{t.source}__{t.attr}`"
                inner_spans.append(
                    (
                        t.start - call.inner_offset,
                        t.end - call.inner_offset,
                        repl,
                    )
                )
            inner_sql = _rewrite(call.inner, inner_spans)
            out_col = _agg_out_col(join.pathid, len(join.aggs))
            existing = next(
                (
                    a.out_col
                    for a in join.aggs
                    if a.inner_sql == inner_sql
                    and a.call.func == call.func
                    and a.call.distinct == call.distinct
                ),
                None,
            )
            if existing is None:
                join.aggs.append(
                    AggSpec(
                        call=call,
                        out_col=out_col,
                        inner_sql=inner_sql,
                        transits=transits,
                        this_attrs=this_attrs,
                    )
                )
            else:
                out_col = existing
            el.join_deps.add(join.pathid)
            spans.append((call.start, call.end, f"`{out_col}`"))

        el.compiled_sql = _rewrite(rule.expression, spans)
        plan.rules[rule.name] = el

    # -- join deps: [This]-side attrs of first-hop predicates -------------
    for join in plan.joins.values():
        join.deps = _first_hop_this_deps(join, source)
        # [This]-transits into aggregates are also pipeline deps
        for a in join.aggs:
            join.deps |= a.this_attrs
        # intermediate + target + transit hubs are build deps
        for hop in join.path.hops:
            plan.hub_deps.add(hop.dst)
        for a in join.aggs:
            for tpath in a.transits.values():
                for hop in tpath.hops:
                    plan.hub_deps.add(hop.dst)
    plan.hub_deps.discard(source.source_name)

    _check_cycles(plan)
    _assign_levels(plan)
    return plan


def _rewrite(expr: str, spans: list[tuple[int, int, str]]) -> str:
    out = expr
    for start, end, repl in sorted(spans, key=lambda x: -x[0]):
        out = out[:start] + repl + out[end:]
    return out


def _get_join(plan: SourcePlan, path: Path, kind: str) -> JoinElement:
    pathid = _sanitize(("agg_" if kind == "aggregate" else "j_") + path.id())
    el = plan.joins.get(pathid)
    if el is None:
        el = JoinElement(path=path, pathid=pathid, kind=kind)
        plan.joins[pathid] = el
    return el


def _first_hop_this_deps(join: JoinElement, source: Source) -> set[str]:
    """[This]-side attribute names used by the first hop's predicate."""
    hop = join.path.hops[0]
    parsed = parse_relation_expression(hop.relation.expression)
    deps = set()
    for t in parsed.tokens:
        # relation expr roles: This = relation.left, Related = relation.right.
        # Our source is the hop's src: forward traversal -> This tokens are
        # ours; reverse traversal -> Related tokens are ours.
        if (t.source == "This") == hop.forward:
            deps.add(t.attr)
        elif join.is_self:
            deps.add(t.attr)  # self-join needs both sides computed
    return deps


def _check_cycles(plan: SourcePlan) -> None:
    """DFS cycle detection over [This]-rule edges + join key edges.

    Mirrors u_check_enrichment_loop.sql:23-72 (includes rules used inside
    relation predicates via join deps).
    """
    color: dict[str, int] = {}

    def neighbors(rule_name: str) -> set[str]:
        el = plan.rules[rule_name]
        out = {d for d in el.deps if d in plan.rules}
        for pid in el.join_deps:
            out |= {d for d in plan.joins[pid].deps if d in plan.rules}
        return out

    def dfs(n: str, trail: list[str]) -> None:
        color[n] = 1
        for m in neighbors(n):
            if color.get(m) == 1:
                raise ProjectError(
                    "Circular dependency between rules: "
                    + " -> ".join(trail + [m])
                )
            if color.get(m, 0) == 0:
                dfs(m, trail + [m])
        color[n] = 2

    for name in plan.rules:
        if color.get(name, 0) == 0:
            dfs(name, [name])


def _assign_levels(plan: SourcePlan) -> None:
    """Longest-path stratification (fixpoint identical in effect to
    u_enr_query_update_cte.sql:19-125's lowest-available-CTE loop)."""
    memo: dict[str, int] = {}

    def rule_level(name: str) -> int:
        if name in memo:
            return memo[name]
        el = plan.rules[name]
        lvl = 0
        for d in el.deps:
            if d in plan.rules:
                lvl = max(lvl, rule_level(d))
        for pid in el.join_deps:
            lvl = max(lvl, join_level(plan.joins[pid]))
        memo[name] = lvl + 1
        return lvl + 1

    def join_level(join: JoinElement) -> int:
        lvl = 0
        for d in join.deps:
            if d in plan.rules:
                lvl = max(lvl, rule_level(d))
        join.level = lvl
        return lvl

    max_lvl = 0
    for name in plan.rules:
        lvl = rule_level(name)
        plan.rules[name].level = lvl
        max_lvl = max(max_lvl, lvl)
    for join in plan.joins.values():
        join_level(join)

    plan.levels = [[] for _ in range(max_lvl)]
    for name, el in plan.rules.items():
        if el.level > 0:
            plan.levels[el.level - 1].append(name)

    # preserve declaration order within a level
    order = {r.name: i for i, r in enumerate(plan.source.rules)}
    for lv in plan.levels:
        lv.sort(key=lambda n: order[n])
