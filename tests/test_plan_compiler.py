"""Plan compiler unit tests (≙ SyntaxValidator + SortTransformationMappings)."""

from __future__ import annotations

import pytest

from tensei_agent_spark.plans import (
    ColumnRef,
    Field,
    Mapping,
    Pipeline,
    PlanError,
    Recipe,
    SourceSpec,
    TargetSpec,
    compile_plan,
)
from tensei_agent_spark.plans.plan import sort_recipes_by_foreign_keys, validate


def _src(name="s", cols=("a", "b")):
    return SourceSpec(name, "csv", f"/tmp/{name}.csv", tuple(Field(c) for c in cols))


def _recipe(name, target, source="s", col="a"):
    return Recipe(name, target, mappings=(
        Mapping((ColumnRef(source, col),), ("out",)),
    ))


def test_validate_collects_every_error():
    p = Pipeline(
        "bad",
        sources=(_src(),),
        targets=(TargetSpec("t", "csv", "/tmp/t.csv"),),
        recipes=(
            Recipe("r1", "missing_target", mappings=(
                Mapping((ColumnRef("nope", "a"),), ("x",)),
            )),
            Recipe("r2", "t", mappings=(
                Mapping((ColumnRef("s", "zz"),), ("y",),
                        transformers=(("not_a_transformer", {}),)),
            )),
            Recipe("r3", "t", mappings=()),
        ),
    )
    errors = validate(p)
    joined = "\n".join(errors)
    assert "unknown target 'missing_target'" in joined
    assert "unknown source 'nope'" in joined
    assert "no column 'zz'" in joined
    assert "unknown transformer 'not_a_transformer'" in joined
    assert "no mappings" in joined
    with pytest.raises(PlanError):
        compile_plan(p)


def test_one_to_one_arity_checked():
    p = Pipeline(
        "arity",
        sources=(_src(),),
        targets=(TargetSpec("t", "csv", "/tmp/t.csv"),),
        recipes=(
            Recipe("r", "t", mappings=(
                Mapping((ColumnRef("s", "a"), ColumnRef("s", "b")), ("x",)),
            )),
        ),
    )
    assert any("one_to_one" in e for e in validate(p))


def test_fk_topological_sort_diamond():
    """grandparent ← parent ← child plus an independent recipe: FK order
    must put ancestors first and keep independents in original order."""
    targets = (
        TargetSpec("gp", "parquet", "/tmp/gp"),
        TargetSpec("par", "parquet", "/tmp/par", foreign_keys={"gp_fk": ("gp", "pk")}),
        TargetSpec("ch", "parquet", "/tmp/ch", foreign_keys={"par_fk": ("par", "pk")}),
        TargetSpec("solo", "parquet", "/tmp/solo"),
    )
    p = Pipeline(
        "fk",
        sources=(_src(),),
        targets=targets,
        recipes=(
            _recipe("write_child", "ch"),
            _recipe("write_solo", "solo"),
            _recipe("write_parent", "par"),
            _recipe("write_gp", "gp"),
        ),
    )
    order = [r.name for r in sort_recipes_by_foreign_keys(p)]
    assert order.index("write_gp") < order.index("write_parent") < order.index("write_child")
    # solo has no deps: stays at its original relative position among depth-0
    assert order.index("write_solo") < order.index("write_parent")


def test_fk_cycle_rejected():
    targets = (
        TargetSpec("a", "parquet", "/tmp/a", foreign_keys={"b_fk": ("b", "pk")}),
        TargetSpec("b", "parquet", "/tmp/b", foreign_keys={"a_fk": ("a", "pk")}),
    )
    p = Pipeline(
        "cycle",
        sources=(_src(),),
        targets=targets,
        recipes=(_recipe("ra", "a"), _recipe("rb", "b")),
    )
    with pytest.raises(PlanError, match="cycle"):
        sort_recipes_by_foreign_keys(p)


def test_mapping_key_must_exist_in_sources():
    p = Pipeline(
        "mk",
        sources=(_src("s1"), _src("s2", cols=("a", "c"))),
        targets=(TargetSpec("t", "csv", "/tmp/t.csv"),),
        recipes=(
            Recipe("r", "t", mapping_key="b", mappings=(
                Mapping((ColumnRef("s1", "a"),), ("x",)),
                Mapping((ColumnRef("s2", "c"),), ("y",)),
            )),
        ),
    )
    assert any("mapping key 'b' missing from source 's2'" in e for e in validate(p))


def test_duplicate_recipe_names_rejected():
    """Recipe names key the FK topo-sort graph; duplicates would
    silently drop a recipe."""
    from tensei_agent_spark.plans import (
        ColumnRef, Field, Mapping, Pipeline, Recipe, SourceSpec, TargetSpec,
    )
    from tensei_agent_spark.plans.plan import validate

    p = Pipeline(
        name="dup",
        sources=(SourceSpec("s", "csv", "/tmp/x.csv", (Field("id", "long"),)),),
        targets=(
            TargetSpec("t1", "csv", "/tmp/a.csv", fields=(Field("id", "long"),)),
            TargetSpec("t2", "csv", "/tmp/b.csv", fields=(Field("id", "long"),)),
        ),
        recipes=(
            Recipe("load", "t1", mappings=(Mapping((ColumnRef("s", "id"),), ("id",)),)),
            Recipe("load", "t2", mappings=(Mapping((ColumnRef("s", "id"),), ("id",)),)),
        ),
    )
    assert any("duplicate recipe names" in e for e in validate(p))
