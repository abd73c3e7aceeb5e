"""Property-based tests for the expression front-end (hypothesis)."""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from dataforge_core_spark.parser import (
    _quote_mask,
    parse_expression,
    rewrite,
)

_ident = st.text(
    alphabet=string.ascii_lowercase + "_", min_size=1, max_size=8
).filter(lambda s: s[0] in string.ascii_lowercase + "_")

_literal = st.text(
    alphabet=string.ascii_letters + string.digits + " []().'",
    max_size=12,
).map(lambda s: "'" + s.replace("'", "''") + "'")


@st.composite
def _expressions(draw):
    parts = draw(
        st.lists(
            st.one_of(
                st.builds(lambda s, a: f"[{s}].{a}", _ident, _ident),
                st.builds(lambda a: f"[This].{a}", _ident),
                _literal,
                st.sampled_from(["1", "2.5", "col_x", "(", ")"]),
            ),
            min_size=1,
            max_size=8,
        )
    )
    # balance parens to keep expressions structurally sane
    depth = 0
    out = []
    for p in parts:
        if p == ")":
            if depth == 0:
                continue
            depth -= 1
        elif p == "(":
            depth += 1
        out.append(p)
    out.extend(")" * depth)
    return " + ".join(x for x in out if x not in "()") or "1"


@given(_expressions())
@settings(max_examples=200, deadline=None)
def test_tokens_never_inside_literals(expr):
    parsed = parse_expression(expr)
    mask = _quote_mask(expr)
    for t in parsed.tokens:
        assert not mask[t.start], (expr, t)
        # span text actually is a [source].attr reference
        assert expr[t.start] == "["


@given(_expressions())
@settings(max_examples=200, deadline=None)
def test_rewrite_identity(expr):
    """Rewriting every token span with its own text is the identity."""
    parsed = parse_expression(expr)
    spans = [
        (t.start, t.end, expr[t.start : t.end]) for t in parsed.all_tokens()
    ]
    assert rewrite(expr, spans) == expr


@given(st.text(alphabet="'ab", max_size=20))
@settings(max_examples=200, deadline=None)
def test_quote_mask_pairing(s):
    """Characters outside literals are never masked when quotes balance."""
    mask = _quote_mask(s)
    assert len(mask) == len(s)
    # every masked maximal run either starts with a quote char or the
    # string has unbalanced quotes (trailing open literal)
    if s.count("'") % 2 == 0:
        i = 0
        while i < len(s):
            if mask[i]:
                assert s[i] == "'" or mask[i - 1], (s, i)
            i += 1
