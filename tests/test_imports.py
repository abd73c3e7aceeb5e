"""Import/diff engine (C8): upsert-by-name, delete-missing, cascade
deletes, verbatim validation errors — reference impc_execute.sql:1-221 +
u_delete_cascade.sql:1-116, re-expressed over the JSON metadata store.
No Spark session needed (pure metadata)."""

from __future__ import annotations

import copy

import pytest

from dataforge_core_spark.imports import MetaStore, import_project
from dataforge_core_spark.loader import (
    load_project,
    parse_output_dict,
    parse_relations_list,
    parse_source_dict,
)
from dataforge_core_spark.model import Project


def _mini_project() -> Project:
    region = parse_source_dict(
        {
            "source_name": "region",
            "source_table": "r.parquet",
            "target_table": "hub_region",
            "raw_attributes": ["r_regionkey long", "r_name string"],
        }
    )
    nation = parse_source_dict(
        {
            "source_name": "nation",
            "source_table": "n.parquet",
            "target_table": "hub_nation",
            "raw_attributes": [
                "n_nationkey long",
                "n_name string",
                "n_regionkey long",
            ],
            "rules": [
                {"name": "region_name", "expression": "[region].r_name"},
                {
                    "name": "name_upper",
                    "expression": "UPPER([This].n_name)",
                },
            ],
        }
    )
    rels = parse_relations_list(
        [
            {
                "name": "[nation]- region -[region]",
                "expression": "[This].n_regionkey = [Related].r_regionkey",
                "cardinality": "M-1",
            }
        ]
    )
    output = parse_output_dict(
        {
            "output_name": "nations_out",
            "columns": ["nation string", "region string"],
            "channels": [
                {
                    "source_name": "nation",
                    "mappings": ["n_name nation", "region_name region"],
                }
            ],
        }
    )
    return Project(
        sources=[region, nation], relations=rels, outputs=[output]
    )


def test_fresh_import_and_roundtrip(tmp_path):
    store = MetaStore(str(tmp_path))
    rep = import_project(store, _mini_project())
    assert "error" not in rep
    assert rep["sources_added"] == 2
    # round-trip: stored state reconstructs an equivalent project
    p2 = store.to_project()
    assert {s.source_name for s in p2.sources} == {"region", "nation"}
    assert [r.name for r in p2.relations] == ["[nation]- region -[region]"]
    assert p2.outputs[0].channels[0].mappings[1].attribute == "region_name"
    # re-import of the identical project: no adds, no deletes
    rep2 = import_project(MetaStore(str(tmp_path)), _mini_project())
    assert rep2["sources_added"] == 0
    assert rep2["sources_updated"] == 0
    assert rep2["rules_deleted"] == 0


def test_upsert_preserves_ids(tmp_path):
    store = MetaStore(str(tmp_path))
    import_project(store, _mini_project())
    id_nation = store.state["sources"]["nation"]["id"]
    id_rule = store.state["sources"]["nation"]["rules"]["name_upper"]["id"]

    p = _mini_project()
    nation = p.source_by_name()["nation"]
    nation.rule_by_name()["name_upper"].expression = "LOWER([This].n_name)"
    store2 = MetaStore(str(tmp_path))
    rep = import_project(store2, p)
    assert "error" not in rep and rep["sources_updated"] == 1
    assert store2.state["sources"]["nation"]["id"] == id_nation
    rrec = store2.state["sources"]["nation"]["rules"]["name_upper"]
    assert rrec["id"] == id_rule  # identity survives the update
    assert "LOWER" in rrec["body"]["expression"]


def test_delete_missing_rule(tmp_path):
    store = MetaStore(str(tmp_path))
    import_project(store, _mini_project())
    p = _mini_project()
    nation = p.source_by_name()["nation"]
    nation.rules = [r for r in nation.rules if r.name != "name_upper"]
    store2 = MetaStore(str(tmp_path))
    rep = import_project(store2, p)
    assert rep["rules_deleted"] == 1
    assert "name_upper" not in store2.state["sources"]["nation"]["rules"]


def test_cascade_delete_source(tmp_path):
    """Dropping `region` from the import cascades: the relation touching
    it, the dependent rule region_name (which used the relation), and
    region_name's output mapping all go (u_delete_cascade 'source')."""
    store = MetaStore(str(tmp_path))
    import_project(store, _mini_project())
    p = _mini_project()
    p.sources = [s for s in p.sources if s.source_name != "region"]
    p.relations = []  # import file no longer mentions the relation
    nation = p.source_by_name()["nation"]
    nation.rules = [r for r in nation.rules if r.name != "region_name"]
    out = p.outputs[0]
    out.channels[0].mappings = [
        m for m in out.channels[0].mappings if m.attribute != "region_name"
    ]
    store2 = MetaStore(str(tmp_path))
    rep = import_project(store2, p)
    assert "error" not in rep
    assert rep["sources_deleted"] == 1
    s = store2.state
    assert "region" not in s["sources"]
    assert s["relations"] == {}
    assert "region_name" not in s["sources"]["nation"]["rules"]
    maps = s["outputs"]["nations_out"]["body"]["channels"][0]["mappings"]
    assert maps == ["n_name nation"]
    # and the surviving state still compiles into a Project
    p2 = store2.to_project()
    assert [s_.source_name for s_ in p2.sources] == ["nation"]


def test_cascade_without_explicit_cleanup(tmp_path):
    """Same drop, but the NEW import still contains the dependent rule:
    the reference cascade-deletes missing sources BEFORE validating
    imported enrichments (impc_execute.sql:163-199, validation joins
    against surviving meta.enrichment rows), so the dependent rule is
    silently cascaded away rather than erroring — ours matches."""
    store = MetaStore(str(tmp_path))
    import_project(store, _mini_project())
    p = _mini_project()
    p.sources = [s for s in p.sources if s.source_name != "region"]
    p.relations = []
    store2 = MetaStore(str(tmp_path))
    rep = import_project(store2, p)
    assert "error" not in rep
    assert "region_name" not in store2.state["sources"]["nation"]["rules"]
    # the mapping that used the cascaded rule is gone too
    maps = store2.state["outputs"]["nations_out"]["body"]["channels"][0][
        "mappings"
    ]
    assert maps == ["n_name nation"]


def test_rule_validation_error_is_transactional(tmp_path):
    """A rule referencing an attribute that never existed fails the
    post-import validation with the reference's payload shape and the
    store keeps its previous state."""
    store = MetaStore(str(tmp_path))
    import_project(store, _mini_project())
    before = copy.deepcopy(store.state)
    p = _mini_project()
    p.source_by_name()["nation"].rule_by_name()[
        "name_upper"
    ].expression = "UPPER([This].no_such_attr)"
    store2 = MetaStore(str(tmp_path))
    rep = import_project(store2, p)
    assert rep["error"] == "Rule validation errors"
    assert any(
        d["attribute_name"] == "name_upper" for d in rep["error_detail"]
    )
    assert store2.state == before


@pytest.mark.parametrize(
    "mutate,err",
    [
        (
            lambda p: p.source_by_name()["nation"].rules.append(
                p.source_by_name()["nation"].rules[0]
            ),
            "Duplicate rules",
        ),
        (
            lambda p: setattr(
                p.source_by_name()["nation"].rules[0], "name", "BadName"
            ),
            "Invalid rule name(s). Name has to start with lowercase "
            "letter or _ It may contain lowercase letters, numbers and _",
        ),
        (
            lambda p: p.relations.append(p.relations[0]),
            "Duplicate relations",
        ),
    ],
)
def test_validation_errors_verbatim(tmp_path, mutate, err):
    store = MetaStore(str(tmp_path))
    p = _mini_project()
    mutate(p)
    rep = import_project(store, p)
    assert rep["error"] == err
    assert store.state == {
        "seq": 0,
        "sources": {},
        "relations": {},
        "outputs": {},
    }


def test_demo_project_imports_and_recompiles(tmp_path):
    """The full tpch_demo project imports cleanly and the store
    round-trips to a Project with identical object inventory."""
    project = load_project("projects/tpch_demo")
    store = MetaStore(str(tmp_path))
    rep = import_project(store, project)
    assert "error" not in rep, rep
    p2 = store.to_project()
    assert {s.source_name for s in p2.sources} == {
        s.source_name for s in project.sources
    }
    assert {r.name for r in p2.relations} == {
        r.name for r in project.relations
    }
    assert {o.output_name for o in p2.outputs} == {
        o.output_name for o in project.outputs
    }
    for s_new, s_old in zip(
        sorted(p2.sources, key=lambda s: s.source_name),
        sorted(project.sources, key=lambda s: s.source_name),
    ):
        assert [r.name for r in s_new.rules] == [
            r.name for r in s_old.rules
        ]
        assert [r.expression for r in s_new.rules] == [
            r.expression for r in s_old.rules
        ]


def test_build_from_imported_state_matches_yaml_build(tmp_path):
    """--import then --build --from-state produces the same run.sql as
    building straight from the YAML project (the reference's import ->
    compile-from-metadata flow)."""
    from dataforge_core_spark.cli import main

    state = tmp_path / "state"
    t_yaml = tmp_path / "t_yaml"
    t_state = tmp_path / "t_state"
    assert main(["--import", "projects/tpch_demo", "--state", str(state)]) == 0
    assert main(["--build", "projects/tpch_demo", "--target", str(t_yaml)]) == 0
    assert (
        main(
            [
                "--build",
                str(state),
                "--from-state",
                "--target",
                str(t_state),
            ]
        )
        == 0
    )
    a = (t_yaml / "run.sql").read_text()
    b = (t_state / "run.sql").read_text()
    assert a == b


def test_set_operation_roundtrips_through_state(tmp_path):
    """The O3 set_operation channel field must survive the MetaStore
    body serialization and reconstruct identically via to_project()."""
    from dataforge_core_spark.imports import MetaStore, import_project
    from dataforge_core_spark.operators.engine_rows import _set_ops_project

    project = _set_ops_project("/root/testdata/sf0.001")
    store = MetaStore(str(tmp_path / "state"))
    report = import_project(store, project)
    assert "error" not in report
    rebuilt = MetaStore(str(tmp_path / "state")).to_project()
    ops = [
        ch.set_operation for ch in rebuilt.outputs[0].channels
    ]
    assert ops == [None, "intersect", "except"]
