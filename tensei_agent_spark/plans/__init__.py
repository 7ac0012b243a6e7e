"""Pipeline spec + plan compiler + executor.

The reference engine's unit of work is a *Cookbook*: N source connections,
one target connection, and an ordered list of recipes whose mappings move
(and transform) values from source elements to target elements
(``TenseiAgent.scala:317-345``). This package re-expresses that as a
declarative pipeline compiled to DataFrame operations:

- :mod:`spec`   — the Cookbook-equivalent data model (pure Python).
- :mod:`plan`   — validation + recipe ordering (FK topological sort).
- :mod:`executor` — compile each recipe to a DataFrame expression
  pipeline and drive the sinks.
"""

from .spec import (  # noqa: F401
    ColumnRef,
    Field,
    Mapping,
    Pipeline,
    Recipe,
    SourceSpec,
    TargetSpec,
)
from .plan import compile_plan, PlanError  # noqa: F401
from .executor import run_pipeline, build_recipe_frame  # noqa: F401
