"""Expression front-end: tokenizer + aggregate extractor + window detection.

Pure-Python reimplementation of the reference's compile-time parsing:

- token scan with quote handling and ``[bracket]`` spans:
  svc_parse_enrichment.sql:151-433 (char-by-char scan; ``[0]`` numeric
  indexes are array subscripts, not source refs :187-190; comments banned
  :60-63; self-reference banned :229-241)
- aggregate extraction with whitelist + paren tracking:
  u_parse_enrichment_aggregates.sql:27-145 (nesting ban :68-73,
  window-mixing ban :75-78)
- window detection regex ``over\\s*\\(``: svc_parse_enrichment.sql:94

The parsed form here keeps character spans instead of the reference's
``P<n>``/``A<n>`` positional pointers — spans let us rewrite the original
text directly into Spark SQL (`F.expr`-ready) with resolved column names.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from dataforge_core_spark.functions.aggregates import AGGREGATE_WHITELIST
from dataforge_core_spark.model import NAME_RE, ProjectError


WINDOW_RE = re.compile(r"over\s*\(", re.IGNORECASE)
# [Name].attr — name inside brackets, attribute after the dot
TOKEN_RE = re.compile(r"\[([^\]]+)\]\s*\.\s*([a-z_][a-z0-9_]*)")
_AGG_CALL_RE = None  # built lazily from the whitelist


class ExpressionError(ProjectError):
    """Parse/validation error inside one rule/relation/filter expression."""


@dataclass
class Token:
    """One ``[Source].attr`` reference with its character span."""

    source: str  # "This", "Related", or a source name
    attr: str
    start: int
    end: int


@dataclass
class AggCall:
    """One whitelisted aggregate call ``agg([Src].x + ...)`` with span."""

    func: str  # lowercase whitelist name
    inner: str  # argument text between the parens
    start: int  # span of the whole call in the expression
    end: int
    distinct: bool = False
    tokens: list[Token] = field(default_factory=list)  # tokens inside inner
    inner_offset: int = 0  # offset of `inner` within the expression


@dataclass
class ParsedExpression:
    expression: str
    tokens: list[Token] = field(default_factory=list)  # outside aggregates
    aggs: list[AggCall] = field(default_factory=list)
    window: bool = False

    def all_tokens(self) -> list[Token]:
        out = list(self.tokens)
        for a in self.aggs:
            out.extend(a.tokens)
        return out

    def sources(self) -> list[str]:
        """Distinct non-This source names, in first-appearance order."""
        seen: list[str] = []
        for t in self.all_tokens():
            if t.source not in ("This",) and t.source not in seen:
                seen.append(t.source)
        return seen


def _quote_mask(expr: str) -> list[bool]:
    """mask[i] is True when expr[i] is inside a single-quoted literal.

    Handles ``''`` escaping the same way the reference scanner does
    (svc_parse_enrichment.sql:151-433 tracks quote state char-by-char).
    """
    mask = [False] * len(expr)
    in_q = False
    i = 0
    while i < len(expr):
        c = expr[i]
        if c == "'":
            if in_q and i + 1 < len(expr) and expr[i + 1] == "'":
                mask[i] = True
                mask[i + 1] = True
                i += 2
                continue
            in_q = not in_q
            mask[i] = True
        else:
            mask[i] = in_q
        i += 1
    return mask


def _find_tokens(expr: str, mask: list[bool]) -> list[Token]:
    tokens = []
    for m in TOKEN_RE.finditer(expr):
        if mask[m.start()]:
            continue  # inside a string literal
        name = m.group(1)
        if name.isdigit():
            continue  # [0] = array subscript (svc_parse_enrichment.sql:187-190)
        tokens.append(Token(name, m.group(2), m.start(), m.end()))
    # bare [Name] without .attr (outside literals, non-numeric) is an error
    for m in re.finditer(r"\[([^\]]+)\]", expr):
        if mask[m.start()] or m.group(1).isdigit():
            continue
        after = expr[m.end():].lstrip()
        if not after.startswith("."):
            raise ExpressionError(
                f"Source reference [{m.group(1)}] must be followed by "
                f".attribute in expression: {expr!r}"
            )
    return tokens


def _agg_call_re() -> re.Pattern:
    global _AGG_CALL_RE
    if _AGG_CALL_RE is None:
        names = "|".join(sorted(AGGREGATE_WHITELIST, key=len, reverse=True))
        # whitelist regex mirrors u_parse_enrichment_aggregates.sql:29,69,95
        _AGG_CALL_RE = re.compile(rf"(?<![a-z0-9_])({names})\s*\(", re.IGNORECASE)
    return _AGG_CALL_RE


def _matching_paren(expr: str, open_idx: int, mask: list[bool]) -> int:
    depth = 0
    for i in range(open_idx, len(expr)):
        if mask[i]:
            continue
        if expr[i] == "(":
            depth += 1
        elif expr[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ExpressionError(f"Unbalanced parentheses in expression: {expr!r}")


def parse_expression(expr: str, *, allow_this_agg: bool = False) -> ParsedExpression:
    """Parse one rule/relation/filter expression.

    Validations replicated from the reference (same error conditions):
    - comments banned (svc_parse_enrichment.sql:60-63)
    - window + aggregate cannot mix (u_parse_enrichment_aggregates.sql:75-78)
    - nested aggregates banned (u_parse_enrichment_aggregates.sql:68-73)
    - aggregates must target another source, not [This]
      (svc_parse_enrichment.sql:248-250) unless allow_this_agg
    """
    if "/*" in expr or "*/" in expr:
        raise ExpressionError(f"Comments are not allowed in expressions: {expr!r}")
    mask = _quote_mask(expr)

    window = any(not mask[m.start()] for m in WINDOW_RE.finditer(expr))

    aggs: list[AggCall] = []
    claimed: list[tuple[int, int]] = []
    for m in _agg_call_re().finditer(expr):
        if mask[m.start()]:
            continue
        if any(s <= m.start() < e for s, e in claimed):
            raise ExpressionError(
                f"Nested aggregate functions are not allowed: {expr!r}"
            )
        open_idx = m.end() - 1
        close_idx = _matching_paren(expr, open_idx, mask)
        inner = expr[open_idx + 1 : close_idx]
        # nested whitelisted call inside the argument -> banned
        inner_mask = _quote_mask(inner)
        for n in _agg_call_re().finditer(inner):
            if not inner_mask[n.start()]:
                raise ExpressionError(
                    f"Nested aggregate functions are not allowed: {expr!r}"
                )
        distinct = False
        stripped = inner.lstrip()
        if re.match(r"(?i)^distinct\s", stripped):
            distinct = True
        inner_offset = open_idx + 1
        inner_tokens = [
            Token(t.source, t.attr, t.start + inner_offset, t.end + inner_offset)
            for t in _find_tokens(inner, inner_mask)
        ]
        if inner_tokens and not window:
            # only token-bearing calls are rule-level lookup aggregates;
            # plain agg over literals stays inline (still validated below)
            pass
        aggs.append(
            AggCall(
                func=m.group(1).lower(),
                inner=inner,
                start=m.start(),
                end=close_idx + 1,
                distinct=distinct,
                tokens=inner_tokens,
                inner_offset=inner_offset,
            )
        )
        claimed.append((m.start(), close_idx + 1))

    # an aggregate is a *lookup* aggregate only when it references a source;
    # aggregates inside OVER() windows are window functions, not lookups
    lookup_aggs = [a for a in aggs if a.tokens and not window]
    if window and any(a.tokens for a in aggs):
        # reference bans mixing window + aggregate in one rule
        # (u_parse_enrichment_aggregates.sql:75-78) — but aggregate
        # functions *as* window functions (sum(...) OVER ...) are fine.
        over_spans = [
            (m.start(), _matching_paren(expr, expr.index("(", m.start()), mask))
            for m in WINDOW_RE.finditer(expr)
            if not mask[m.start()]
        ]
        for a in aggs:
            if not a.tokens:
                continue
            followed_by_over = re.match(r"\s*over\s*\(", expr[a.end:], re.I)
            if not followed_by_over:
                raise ExpressionError(
                    "Window functions cannot be combined with aggregate "
                    f"functions in one rule: {expr!r}"
                )
        lookup_aggs = []

    tokens_all = _find_tokens(expr, mask)
    agg_spans = [(a.start, a.end) for a in lookup_aggs]
    outside = [
        t
        for t in tokens_all
        if not any(s <= t.start < e for s, e in agg_spans)
    ]
    for a in lookup_aggs:
        srcs = {t.source for t in a.tokens}
        if srcs == {"This"} and not allow_this_agg:
            # aggregation purely over [This] is banned
            # (svc_parse_enrichment.sql:248-250); [This] values *inside*
            # an aggregate over another source are transits
            # (u_enr_query_add_many_join_attribute)
            raise ExpressionError(
                "You must use aggregation over a related source, not [This]: "
                f"{expr!r}"
            )

    for t in tokens_all:
        if not NAME_RE.match(t.attr):
            raise ExpressionError(
                f"Invalid attribute name {t.attr!r} in expression {expr!r}"
            )

    return ParsedExpression(
        expression=expr, tokens=outside, aggs=lookup_aggs, window=window
    )


def rewrite(expr: str, spans: list[tuple[int, int, str]]) -> str:
    """Replace [start,end) spans with replacement text, right-to-left."""
    out = expr
    for start, end, repl in sorted(spans, key=lambda x: -x[0]):
        out = out[:start] + repl + out[end:]
    return out


def parse_relation_expression(expr: str) -> ParsedExpression:
    """Parse a relation predicate; must reference both [This] and [Related].

    Mirrors impc_parse_relation.sql:27-71.
    """
    parsed = parse_expression(expr)
    srcs = {t.source for t in parsed.tokens}
    if "This" not in srcs or "Related" not in srcs:
        raise ExpressionError(
            "Relation expression must reference both [This] and [Related]: "
            f"{expr!r}"
        )
    if parsed.aggs or parsed.window:
        raise ExpressionError(
            f"Relation expression cannot contain aggregates or windows: {expr!r}"
        )
    return parsed


def equi_conjuncts(
    expr: str, parsed: ParsedExpression | None = None
) -> list[tuple[str, str]] | None:
    """Split a relation predicate into top-level AND-ed equality conjuncts.

    Returns [(this_side_text, related_side_text), ...] when the predicate is
    a pure conjunction of ``<expr over This> = <expr over Related>`` pairs,
    else None (caller falls back to a non-equi join).  Used to turn the
    reference's correlated LEFT JOIN LATERAL aggregate
    (u_enr_query_generate_many_joins.sql:15-39) into the scalable
    groupBy+join rewrite its own dead code documents
    (u_enr_query_generate_distinct_many_join_query.sql:16-51).
    """
    mask = _quote_mask(expr)
    # split on top-level AND
    parts: list[str] = []
    depth = 0
    start = 0
    i = 0
    up = expr.upper()
    while i < len(expr):
        if mask[i]:
            i += 1
            continue
        c = expr[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and up.startswith("AND", i):
            before = expr[i - 1] if i > 0 else " "
            after = expr[i + 3] if i + 3 < len(expr) else " "
            if not before.isalnum() and before != "_" and not after.isalnum():
                parts.append(expr[start:i])
                start = i + 3
                i += 3
                continue
        i += 1
    parts.append(expr[start:])

    out: list[tuple[str, str]] = []
    for part in parts:
        p = part.strip()
        while p.startswith("(") and p.endswith(")"):
            # only strip if the parens actually match each other
            inner = p[1:-1]
            try:
                if _matching_paren(p, 0, _quote_mask(p)) == len(p) - 1:
                    p = inner.strip()
                else:
                    break
            except ExpressionError:
                break
        pmask = _quote_mask(p)
        eq_positions = [
            j
            for j, ch in enumerate(p)
            if ch == "="
            and not pmask[j]
            and (j == 0 or p[j - 1] not in "<>!=")
            and (j + 1 >= len(p) or p[j + 1] != "=")
        ]
        # must be a single top-level '='
        depth2 = 0
        top_eq = []
        for j in eq_positions:
            d = 0
            for k in range(j):
                if pmask[k]:
                    continue
                if p[k] == "(":
                    d += 1
                elif p[k] == ")":
                    d -= 1
            if d == 0:
                top_eq.append(j)
        if len(top_eq) != 1:
            return None
        lhs, rhs = p[: top_eq[0]].strip(), p[top_eq[0] + 1 :].strip()
        sides = {}
        for text in (lhs, rhs):
            toks = _find_tokens(text, _quote_mask(text))
            srcs = {t.source for t in toks}
            if srcs == {"This"}:
                sides["This"] = text
            elif srcs == {"Related"}:
                sides["Related"] = text
            else:
                return None
        if set(sides) != {"This", "Related"}:
            return None
        out.append((sides["This"], sides["Related"]))
    return out
