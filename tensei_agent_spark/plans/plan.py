"""Plan compiler: validate the spec, order recipes, derive schemas.

Reference parity:

- validation ≙ ``SyntaxValidator.scala:43-68`` (upfront, fail-fast,
  every error reported);
- recipe/mapping ordering ≙ ``SortTransformationMappings.scala:62-107``
  (target document order) and ``:109-158`` (FK topological sort: a
  recipe writing a table referenced by another recipe's FK runs first);
- the compiled plan is pure data — execution lives in executor.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from graphlib import CycleError, TopologicalSorter

from ..functions.transformers import TRANSFORMERS
from .spec import Pipeline, Recipe


def _frame_transformers() -> dict:
    """Frame-level transformer registry (imported lazily: executor
    imports this module)."""
    from .executor import FRAME_TRANSFORMERS

    return FRAME_TRANSFORMERS


class PlanError(ValueError):
    """Spec failed validation (collects every error, like SyntaxValidator)."""

    def __init__(self, errors: list[str]):
        self.errors = errors
        super().__init__("; ".join(errors))


@dataclass(frozen=True)
class CompiledPlan:
    pipeline: Pipeline
    ordered_recipes: tuple[Recipe, ...]  # FK-topologically sorted


def validate(p: Pipeline) -> list[str]:
    errors: list[str] = []
    source_names = {s.name for s in p.sources}
    target_names = {t.name for t in p.targets}
    if len(source_names) != len(p.sources):
        errors.append("duplicate source names")
    if len(target_names) != len(p.targets):
        errors.append("duplicate target names")
    # Recipe names key the FK topological sort's graph dicts — a
    # duplicate would silently drop all but one recipe there.
    if len({r.name for r in p.recipes}) != len(p.recipes):
        errors.append("duplicate recipe names")

    source_cols = {
        s.name: {f.name for f in s.fields} if s.fields is not None else None
        for s in p.sources
    }
    for t in p.targets:
        for col, (parent, parent_col) in t.foreign_keys.items():
            if parent not in target_names:
                errors.append(
                    f"target {t.name!r}: FK {col!r} references unknown target {parent!r}"
                )

    for r in p.recipes:
        if r.target not in target_names:
            errors.append(f"recipe {r.name!r}: unknown target {r.target!r}")
        if not r.mappings:
            errors.append(f"recipe {r.name!r}: no mappings")
        seen_targets: set[str] = set()
        for m in r.mappings:
            if m.mode not in ("one_to_one", "all_to_all"):
                errors.append(f"recipe {r.name!r}: bad mapping mode {m.mode!r}")
            if m.mode == "one_to_one" and len(m.sources) != len(m.targets):
                errors.append(
                    f"recipe {r.name!r}: one_to_one needs len(sources)=="
                    f"len(targets), got {len(m.sources)}/{len(m.targets)}"
                )
            for ref in m.sources:
                if ref.source not in source_names:
                    errors.append(
                        f"recipe {r.name!r}: unknown source {ref.source!r}"
                    )
                elif source_cols[ref.source] is not None and (
                    ref.column not in source_cols[ref.source]
                ):
                    errors.append(
                        f"recipe {r.name!r}: source {ref.source!r} has no "
                        f"column {ref.column!r}"
                    )
            for tgt in m.targets:
                if tgt in seen_targets:
                    errors.append(
                        f"recipe {r.name!r}: target column {tgt!r} mapped twice"
                    )
                seen_targets.add(tgt)
            for chain in (m.atomic, m.transformers):
                for name, _params in chain:
                    if name not in TRANSFORMERS and name not in _frame_transformers():
                        errors.append(
                            f"recipe {r.name!r}: unknown transformer {name!r}"
                        )
        if r.mapping_key is not None:
            recipe_sources = {ref.source for m in r.mappings for ref in m.sources}
            for s in recipe_sources:
                cols = source_cols.get(s)
                if cols is not None and r.mapping_key not in cols:
                    errors.append(
                        f"recipe {r.name!r}: mapping key {r.mapping_key!r} "
                        f"missing from source {s!r}"
                    )
    return errors


def sort_recipes_by_foreign_keys(p: Pipeline) -> tuple[Recipe, ...]:
    """Topological order: parents before FK-referencing children, stable
    within ties (reference ``sortRecipesByForeignKeys``)."""
    by_target: dict[str, list[str]] = {}
    for r in p.recipes:
        by_target.setdefault(r.target, []).append(r.name)

    graph: dict[str, set[str]] = {r.name: set() for r in p.recipes}
    for r in p.recipes:
        t = p.target(r.target)
        for _col, (parent_target, _pcol) in t.foreign_keys.items():
            for parent_recipe in by_target.get(parent_target, ()):
                if parent_recipe != r.name:
                    graph[r.name].add(parent_recipe)

    try:
        ts = TopologicalSorter(graph)
        order = list(ts.static_order())
    except CycleError as e:
        raise PlanError([f"foreign-key cycle among recipes: {e.args[1]}"]) from e

    # static_order is a valid topo order; make it stable w.r.t. the
    # original recipe order among independent recipes.
    original = {r.name: i for i, r in enumerate(p.recipes)}
    rank = {name: i for i, name in enumerate(order)}
    # Kahn-style stable sort: sort by (longest-path depth, original index)
    depth: dict[str, int] = {}
    for name in order:
        deps = graph[name]
        depth[name] = 1 + max((depth[d] for d in deps), default=-1)
    ordered_names = sorted(graph, key=lambda n: (depth[n], original[n]))
    by_name = {r.name: r for r in p.recipes}
    return tuple(by_name[n] for n in ordered_names)


def compile_plan(p: Pipeline) -> CompiledPlan:
    errors = validate(p)
    if errors:
        raise PlanError(errors)
    return CompiledPlan(pipeline=p, ordered_recipes=sort_recipes_by_foreign_keys(p))
