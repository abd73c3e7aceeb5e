"""Unit tests: relation graph path discovery (C3) + planner stratification
(C4) + loader validations (C8/C9 behaviors)."""

import pytest

from dataforge_core_spark.loader import (
    parse_relations_list,
    parse_source_dict,
    _parse_mapping,
)
from dataforge_core_spark.model import Project, ProjectError, Relation
from dataforge_core_spark.paths import RelationGraph
from dataforge_core_spark.plans.planner import plan_source


def _rel(name, expr, card, primary=False):
    return Relation(name=name, expression=expr, cardinality=card, primary=primary)


def _graph():
    return RelationGraph(
        [
            _rel("[a]- r1 -[b]", "[This].x = [Related].y", "M-1"),
            _rel("[b]- r2 -[c]", "[This].u = [Related].v", "M-1"),
            _rel("[c]- r3 -[d]", "[This].p = [Related].q", "1-M"),
            _rel("[a]- r4 -[e]", "[This].x = [Related].z", "M-1"),
        ]
    )


def test_bfs_shortest_path():
    g = _graph()
    p = g.discover("a", "c")
    assert [h.relation.name for h in p.hops] == ["[a]- r1 -[b]", "[b]- r2 -[c]"]
    assert not p.is_aggregate


def test_direct_lookup():
    g = _graph()
    p = g.discover("a", "e")
    assert [h.relation.name for h in p.hops] == ["[a]- r4 -[e]"]


def test_reverse_traversal_cardinality():
    g = _graph()
    # d -> c reverse over 1-M relation: dst side cardinality is 1 -> lookup
    p = g.discover("d", "c")
    assert not p.hops[0].forward
    assert not p.is_aggregate
    # b -> a reverse over M-1: dst cardinality M -> aggregate path
    p2 = g.discover("b", "a")
    assert p2.is_aggregate


def test_m_hop_cannot_be_intermediate():
    g = RelationGraph(
        [
            _rel("[a]- r1 -[b]", "[This].x = [Related].y", "1-M"),
            _rel("[b]- r2 -[c]", "[This].u = [Related].v", "M-1"),
        ]
    )
    with pytest.raises(ProjectError, match="No relation path"):
        g.discover("a", "c")


def test_ambiguity_error():
    g = RelationGraph(
        [
            _rel("[a]- p1 -[b]", "[This].x = [Related].y", "M-1"),
            _rel("[a]- p2 -[b]", "[This].x2 = [Related].y2", "M-1"),
        ]
    )
    with pytest.raises(ProjectError, match="Multiple relation paths"):
        g.discover("a", "b")


def test_primary_tiebreak():
    g = RelationGraph(
        [
            _rel("[a]- p1 -[b]", "[This].x = [Related].y", "M-1", primary=True),
            _rel("[a]- p2 -[b]", "[This].x2 = [Related].y2", "M-1"),
        ]
    )
    p = g.discover("a", "b")
    assert p.hops[0].relation.name == "[a]- p1 -[b]"


def test_explicit_chain_validation():
    g = _graph()
    p = g.explicit_path("a", ["[a]- r1 -[b]", "[b]- r2 -[c]"], "c")
    assert p.target == "c"
    with pytest.raises(ProjectError, match="does not connect"):
        g.explicit_path("a", ["[b]- r2 -[c]"], "c")
    with pytest.raises(ProjectError, match="ends at"):
        g.explicit_path("a", ["[a]- r1 -[b]"], "c")


def _project():
    src_a = parse_source_dict(
        {
            "source_name": "a",
            "source_table": "ta",
            "target_table": "ha",
            "raw_attributes": ["x long", "w long"],
            "rules": [
                {"name": "r_look", "expression": "[b].bcol"},
                {"name": "r_two", "expression": "[This].r_look || '!'"},
                {"name": "r_agg", "expression": "SUM([c].n)"},
            ],
        }
    )
    src_b = parse_source_dict(
        {
            "source_name": "b",
            "source_table": "tb",
            "target_table": "hb",
            "raw_attributes": ["y long", "bcol string"],
        }
    )
    src_c = parse_source_dict(
        {
            "source_name": "c",
            "source_table": "tc",
            "target_table": "hc",
            "raw_attributes": ["z long", "n long"],
        }
    )
    rels = parse_relations_list(
        [
            {
                "name": "[a]- r1 -[b]",
                "expression": "[This].x = [Related].y",
                "cardinality": "M-1",
            },
            {
                "name": "[a]- rc -[c]",
                "expression": "[This].x = [Related].z",
                "cardinality": "1-M",
            },
        ]
    )
    return Project(sources=[src_a, src_b, src_c], relations=rels)


def test_planner_levels_and_dedup():
    project = _project()
    g = RelationGraph(project.relations)
    plan = plan_source(project, g, project.sources[0])
    assert plan.rules["r_look"].level == 1
    assert plan.rules["r_two"].level == 2
    # one lookup join + one aggregate join
    kinds = sorted(j.kind for j in plan.joins.values())
    assert kinds == ["aggregate", "lookup"]
    assert plan.hub_deps == {"b", "c"}


def test_planner_join_dedup_across_rules():
    project = _project()
    project.sources[0].rules.append(
        parse_source_dict(
            {
                "source_name": "tmp",
                "source_table": "t",
                "target_table": "h",
                "rules": [{"name": "r_look2", "expression": "[b].y"}],
            }
        ).rules[0]
    )
    g = RelationGraph(project.relations)
    plan = plan_source(project, g, project.sources[0])
    lookups = [j for j in plan.joins.values() if j.kind == "lookup"]
    assert len(lookups) == 1  # same path reused (u_enr_query_add_join.sql:33-41)
    assert set(lookups[0].needed) == {"bcol", "y"}


def test_aggregate_direction_errors():
    project = _project()
    # non-aggregated token over an M path
    project.sources[0].rules.append(
        parse_source_dict(
            {
                "source_name": "tmp",
                "source_table": "t",
                "target_table": "h",
                "rules": [{"name": "bad", "expression": "[c].n"}],
            }
        ).rules[0]
    )
    g = RelationGraph(project.relations)
    with pytest.raises(ProjectError, match="must use aggregation"):
        plan_source(project, g, project.sources[0])


def test_aggregate_over_one_path_error():
    project = _project()
    project.sources[0].rules.append(
        parse_source_dict(
            {
                "source_name": "tmp",
                "source_table": "t",
                "target_table": "h",
                "rules": [{"name": "bad", "expression": "SUM([b].y)"}],
            }
        ).rules[0]
    )
    g = RelationGraph(project.relations)
    with pytest.raises(
        ProjectError, match="Remove aggregation or add OVER clause"
    ):
        plan_source(project, g, project.sources[0])


def test_rule_cycle_detection():
    src = parse_source_dict(
        {
            "source_name": "a",
            "source_table": "t",
            "target_table": "h",
            "raw_attributes": ["x long"],
            "rules": [
                {"name": "p", "expression": "[This].q + 1"},
                {"name": "q", "expression": "[This].p + 1"},
            ],
        }
    )
    with pytest.raises(ProjectError, match="Circular"):
        plan_source(Project(sources=[src]), RelationGraph([]), src)


def test_self_reference_banned():
    src = parse_source_dict(
        {
            "source_name": "a",
            "source_table": "t",
            "target_table": "h",
            "raw_attributes": ["x long"],
            "rules": [{"name": "p", "expression": "[This].p + 1"}],
        }
    )
    with pytest.raises(ProjectError, match="references itself"):
        plan_source(Project(sources=[src]), RelationGraph([]), src)


def test_mapping_parse():
    m = _parse_mapping("attr col")
    assert (m.attribute, m.column, m.aggregate) == ("attr", "col", None)
    m = _parse_mapping("sum(net_price) total")
    assert (m.attribute, m.column, m.aggregate, m.distinct) == (
        "net_price",
        "total",
        "sum",
        False,
    )
    m = _parse_mapping("count(DISTINCT order_id) n")
    assert m.distinct and m.aggregate == "count"
    m = _parse_mapping("payload.meta.width width")
    assert m.attribute == "payload" and m.keys == ["meta", "width"]
    with pytest.raises(ProjectError):
        _parse_mapping("SELECT 1; drop col")


def test_relation_name_and_cardinality_decode():
    r = Relation(
        name="[src_a]- label -[src_b]", expression="x", cardinality="M-1"
    )
    assert r.left == "src_a" and r.right == "src_b"
    assert r.card_sides() == ("M", "1")
    with pytest.raises(ProjectError, match="Invalid relation name"):
        Relation(name="bad", expression="x", cardinality="M-1").decode()
    with pytest.raises(ProjectError, match="Invalid cardinality"):
        Relation(
            name="[a]- x -[b]", expression="x", cardinality="M-2"
        ).card_sides()
