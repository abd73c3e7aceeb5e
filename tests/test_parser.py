"""Unit tests: expression parser (SURVEY §2.12 C1/C2 behaviors)."""

import pytest

from dataforge_core_spark.parser import (
    ExpressionError,
    equi_conjuncts,
    parse_expression,
    parse_relation_expression,
)


def test_this_tokens_and_spans():
    p = parse_expression("([This].a - [This].b) * 100")
    assert [(t.source, t.attr) for t in p.tokens] == [
        ("This", "a"),
        ("This", "b"),
    ]
    assert not p.window and not p.aggs


def test_cross_source_token():
    p = parse_expression("[other_src].col_x + [This].y")
    assert p.sources() == ["other_src"]


def test_quoted_literal_not_tokenized():
    p = parse_expression("concat([This].a, '[not].a_token', 'it''s [x].y')")
    assert [(t.source, t.attr) for t in p.tokens] == [("This", "a")]


def test_numeric_bracket_is_subscript():
    # [0] is an array subscript, not a source ref
    # (svc_parse_enrichment.sql:187-190)
    p = parse_expression("split([This].s, ',')[0]")
    assert [(t.source, t.attr) for t in p.tokens] == [("This", "s")]


def test_comments_banned():
    with pytest.raises(ExpressionError, match="Comments"):
        parse_expression("1 /* sneaky */ + 2")


def test_window_detection():
    p = parse_expression(
        "ROW_NUMBER() OVER (PARTITION BY [This].k ORDER BY [This].t)"
    )
    assert p.window


def test_aggregate_extraction():
    p = parse_expression("SUM([orders].total) + 1")
    assert len(p.aggs) == 1
    assert p.aggs[0].func == "sum"
    assert [(t.source, t.attr) for t in p.aggs[0].tokens] == [
        ("orders", "total")
    ]


def test_distinct_aggregate():
    p = parse_expression("count(DISTINCT [orders].id)")
    assert p.aggs[0].distinct


def test_nested_aggregates_banned():
    with pytest.raises(ExpressionError, match="Nested aggregate"):
        parse_expression("SUM(MAX([orders].total))")


def test_window_plus_aggregate_banned():
    # u_parse_enrichment_aggregates.sql:75-78
    with pytest.raises(ExpressionError, match="cannot be combined"):
        parse_expression(
            "SUM([orders].x) + ROW_NUMBER() OVER (ORDER BY [This].a)"
        )


def test_aggregate_as_window_function_ok():
    # sum(...) OVER (...) is a window function, not a lookup aggregate
    p = parse_expression(
        "SUM([This].x) OVER (PARTITION BY [This].k)"
    )
    assert p.window and not p.aggs


def test_aggregate_over_this_banned():
    # svc_parse_enrichment.sql:248-250
    with pytest.raises(ExpressionError, match="not \\[This\\]"):
        parse_expression("SUM([This].x)")


def test_relation_expression_requires_both_sides():
    with pytest.raises(ExpressionError, match="both"):
        parse_relation_expression("[This].a = 1")
    p = parse_relation_expression("[This].a = [Related].b")
    assert {t.source for t in p.tokens} == {"This", "Related"}


def test_equi_conjuncts_simple():
    assert equi_conjuncts("[This].a = [Related].b") == [
        ("[This].a", "[Related].b")
    ]


def test_equi_conjuncts_multi_and_exprs():
    out = equi_conjuncts(
        "CONCAT([This].a, '|', [This].b) = [Related].k AND [This].c = [Related].d"
    )
    assert out == [
        ("CONCAT([This].a, '|', [This].b)", "[Related].k"),
        ("[This].c", "[Related].d"),
    ]


def test_equi_conjuncts_rejects_non_equi():
    assert equi_conjuncts("[This].a < [Related].b") is None
    assert equi_conjuncts("[This].a = [Related].b OR [This].c = [Related].d") is None
    assert equi_conjuncts("[This].a + [Related].b = 1") is None


def test_bare_bracket_requires_attribute():
    with pytest.raises(ExpressionError, match="must be followed"):
        parse_expression("[src] + 1")
