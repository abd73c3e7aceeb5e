"""Relation graph + join-path auto-discovery.

Python BFS replacing the reference's recursive-CTE path search
(u-utility/u_get_next_relation_path.sql:47-128):

- max 4 hops by default (:30-36)
- every hop *before* the last must have cardinality 1 in the traversal
  direction (only cardinality-1 chains may be plain lookups)
- the *last* hop's cardinality decides lookup (1) vs aggregate-required (M)
  — direction errors verbatim: "You must use aggregation" /
  "Remove aggregation or add OVER clause" (:82-86)
- tie-breaking: primary relations first, then shortest, else ambiguity
  error when multiple candidates remain (svc_parse_enrichment.sql:306-315)

Relations are traversable in both directions; traversing ``[A]-x-[B]`` with
cardinality ``cA-cB`` toward B is a hop of cardinality ``cB``; the reverse
hop toward A has cardinality ``cA``.
"""

from __future__ import annotations

from dataclasses import dataclass

from dataforge_core_spark.model import ProjectError, Relation


MAX_HOPS_DEFAULT = 4


@dataclass(frozen=True)
class Hop:
    relation: Relation
    forward: bool  # True: left->right of the relation name

    @property
    def src(self) -> str:
        return self.relation.left if self.forward else self.relation.right

    @property
    def dst(self) -> str:
        return self.relation.right if self.forward else self.relation.left

    @property
    def dst_cardinality(self) -> str:
        ca, cb = self.relation.card_sides()
        return cb if self.forward else ca

    def key(self) -> tuple[str, bool]:
        return (self.relation.name, self.forward)


@dataclass
class Path:
    hops: list[Hop]

    @property
    def target(self) -> str:
        return self.hops[-1].dst

    @property
    def is_aggregate(self) -> bool:
        """True when the path ends in an M hop -> aggregation required."""
        return self.hops[-1].dst_cardinality == "M"

    @property
    def all_primary(self) -> bool:
        return all(h.relation.primary for h in self.hops)

    def id(self) -> str:
        return "__".join(
            f"{h.relation.name}{'' if h.forward else '~'}" for h in self.hops
        )


class RelationGraph:
    def __init__(self, relations: list[Relation]):
        self.relations = relations
        self.by_name: dict[str, Relation] = {}
        self.adj: dict[str, list[Hop]] = {}
        for rel in relations:
            norm = rel.name.replace(" ", "")
            if norm in self.by_name:
                raise ProjectError(f"Duplicate relation name {rel.name!r}")
            self.by_name[norm] = rel
            left, _, right = rel.decode()
            self.adj.setdefault(left, []).append(Hop(rel, True))
            self.adj.setdefault(right, []).append(Hop(rel, False))

    def explicit_path(
        self, start: str, relation_names: list[str], target: str
    ) -> Path:
        """Resolve a rule's explicit ``relations:`` chain (sample
        tpch_lineitem.yaml:38-43) into an oriented Path."""
        hops: list[Hop] = []
        cur = start
        for name in relation_names:
            rel = self.by_name.get(name.replace(" ", ""))
            if rel is None:
                raise ProjectError(f"Unknown relation {name!r} in explicit path")
            left, _, right = rel.decode()
            if left == cur:
                hop = Hop(rel, True)
            elif right == cur:
                hop = Hop(rel, False)
            else:
                raise ProjectError(
                    f"Relation chain broken: {name!r} does not connect to "
                    f"{cur!r}"
                )
            hops.append(hop)
            cur = hop.dst
        if cur != target:
            raise ProjectError(
                f"Relation chain ends at {cur!r}, expected {target!r}"
            )
        path = Path(hops)
        self._check_intermediate_cardinality(path)
        return path

    def discover(
        self,
        start: str,
        target: str,
        *,
        max_hops: int = MAX_HOPS_DEFAULT,
        context: str = "",
        cardinality: str | None = None,
        start_path: str = "",
    ) -> Path:
        """BFS all valid paths start->target, apply tie-breaks.

        Valid = every non-final hop has cardinality 1 (toward its dst).
        When ``cardinality`` ('1' or 'M') is given, only paths whose last
        hop matches count as found — the reference filters its _paths
        table the same way and reports which *kind* of mismatch occurred,
        byte-exact (u_get_next_relation_path.sql:77-86; the empty
        ``start_path`` mirrors format()'s NULL -> '' for auto-discovered
        paths).
        """
        if start == target:
            raise ProjectError(
                f"Path from {start!r} to itself requires an explicit "
                f"self-relation {context}"
            )
        frontier: list[list[Hop]] = [[]]
        found: list[Path] = []
        found_other: list[Path] = []  # other-cardinality paths, any depth
        for _depth in range(max_hops):
            nxt: list[list[Hop]] = []
            for prefix in frontier:
                cur = prefix[-1].dst if prefix else start
                used = {h.relation.name for h in prefix}
                for hop in self.adj.get(cur, []):
                    if hop.relation.name in used:
                        continue  # no relation reuse within a path
                    new = prefix + [hop]
                    if hop.dst == target:
                        p = Path(new)
                        if cardinality is None or (
                            (cardinality == "M") == p.is_aggregate
                        ):
                            found.append(p)
                        else:
                            found_other.append(p)
                    elif hop.dst_cardinality == "1":
                        # only cardinality-1 hops may be intermediate
                        nxt.append(new)
            if found:
                break  # BFS: shortest length wins before tie-breaking
            frontier = nxt
        if not found:
            if cardinality is not None:
                # u_get_next_relation_path.sql:80-86, verbatim
                if not found_other:
                    raise ProjectError(
                        f"No active relation paths exist from source "
                        f"`{start}` to source `{target}` with cardinality "
                        f"{cardinality} using start path {start_path}"
                    )
                if cardinality == "1":
                    raise ProjectError(
                        "You must use aggregation without OVER clause. "
                        f"Target source `{target}`"
                    )
                raise ProjectError(
                    "Remove aggregation or add OVER clause. "
                    f"Target source `{target}`"
                )
            raise ProjectError(
                f"No relation path found from {start!r} to {target!r} "
                f"within {max_hops} hops {context}"
            )
        primary = [p for p in found if p.all_primary]
        pool = primary if primary else found
        if len(pool) > 1:
            # svc_parse_enrichment.sql:306-315, verbatim
            raise ProjectError(
                f"Multiple relation paths exist for source {target}. "
                "Specify desired path in rule parameters."
            )
        return pool[0]

    def _check_intermediate_cardinality(self, path: Path) -> None:
        for hop in path.hops[:-1]:
            if hop.dst_cardinality != "1":
                raise ProjectError(
                    "All intermediate hops of a relation path must have "
                    f"cardinality 1; hop {hop.relation.name!r} toward "
                    f"{hop.dst!r} is M"
                )

    def resolve(
        self,
        start: str,
        target: str,
        explicit: list[str] | None,
        *,
        context: str = "",
        cardinality: str | None = None,
    ) -> Path:
        if explicit:
            return self.explicit_path(start, explicit, target)
        return self.discover(
            start, target, context=context, cardinality=cardinality
        )


# ---------------------------------------------------------------------------
# bucket-key derivation (shared by the runner's bucketed materialization
# and the SQL emitter's CLUSTERED BY DDL)
# ---------------------------------------------------------------------------

_SIMPLE_SIDE_RE_STR = r"^\[(This|Related)\]\.([a-z_][a-z0-9_]*)$"


def derive_bucket_keys(relations: list[Relation]) -> dict[str, list[str]]:
    """Per-source bucket-key candidates from the relation graph.

    A hub that is the cardinality-1 endpoint of relations is repeatedly
    joined on its side of the predicate (J1/J2 lookups); the M endpoint
    is the groupBy side of every decorrelated aggregate (J5).  When the
    predicate is a pure equi-conjunction of bare columns, bucketing the
    hub on that column tuple lets sort-merge joins and aggregate groupBys
    reuse the write-time partitioning instead of shuffling.  The
    most-voted key tuple per source wins; 1-endpoints count double
    (lookups outnumber builds).
    """
    import re
    from collections import Counter

    from dataforge_core_spark.parser import equi_conjuncts

    side_re = re.compile(_SIMPLE_SIDE_RE_STR, re.I)
    votes: dict[str, Counter] = {}
    for rel in relations:
        try:
            conj = equi_conjuncts(rel.expression)
        except Exception:
            conj = None
        if not conj:
            continue
        this_cols: list[str] = []
        rel_cols: list[str] = []
        for this_text, rel_text in conj:
            mt = side_re.match(this_text.strip())
            mr = side_re.match(rel_text.strip())
            if not (mt and mr):
                break
            this_cols.append(mt.group(2))
            rel_cols.append(mr.group(2))
        else:
            lc, rc = rel.card_sides()
            votes.setdefault(rel.left, Counter())[tuple(this_cols)] += (
                2 if lc == "1" else 1
            )
            votes.setdefault(rel.right, Counter())[tuple(rel_cols)] += (
                2 if rc == "1" else 1
            )
    return {name: list(c.most_common(1)[0][0]) for name, c in votes.items()}
