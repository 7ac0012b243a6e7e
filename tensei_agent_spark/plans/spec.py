"""Pipeline specification — the Cookbook-equivalent data model.

Reference mapping (SURVEY.md §1.1):

- ``SourceSpec``  ≙ one source ``ConnectionInformation`` + its DFASDL
  (schema + read options).  A DFASDL ``seq`` is a row-set; here a source
  IS a row-set (one DataFrame per source).
- ``TargetSpec``  ≙ the target connection + target DFASDL sequence.
- ``Recipe`` / ``Mapping`` ≙ ``Recipe`` / ``MappingTransformation`` from
  the reference API (construction example:
  ``src/it/scala/usecases/merge/MergeTwoCSV.scala:168-216``).
- ``Field.default`` ≙ ``default-str`` / ``default-num`` attributes
  (``helpers/ProcessorHelpers.scala:124-139``).
- ``Field.unique`` ≙ ``unique="true"`` driving the write-side dedup
  filter (``writers/BaseWriterFilterWorker.scala:231-280``).
- ``Recipe.mapping_key`` ≙ ``MappingKeyFieldDefinition`` — value-join
  instead of positional row alignment
  (``MappingOneToOneWorker.scala:232-287``).
- ``TargetSpec.foreign_keys`` ≙ the DFASDL FK attributes that drive
  recipe topological ordering
  (``SortTransformationMappings.scala:109-158``) and auto-increment key
  remapping (``transformers/FetchForeignKeyValue.scala``).

Everything is a plain frozen dataclass: specs are serializable,
hashable, and engine-independent (no Spark imports here).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class Field:
    """One typed element of a source/target schema (≙ DFASDL data element).

    ``type`` is a Spark DDL type string (``string``, ``long``,
    ``decimal(12,2)``, ``date``, ``timestamp``, ``binary`` — the closed
    type universe of SURVEY.md §1.2).
    """

    name: str
    type: str = "string"
    nullable: bool = True
    default: str | int | float | None = None  # default-str / default-num
    unique: bool = False  # unique="true" → write-side dedup
    format: str | None = None  # formattime/formatnum pattern
    auto_increment: bool = False  # DB identity column
    # DFASDL ``length`` / ``max-length`` hints: fixed-width vs bounded
    # strings steer the per-dialect column type (CHAR(n) / VARCHAR(n) /
    # unbounded text — ``helpers/DatabaseHelpers.scala:252-690``).
    length: int | None = None
    max_length: int | None = None
    # DFASDL ``ref`` element: this field consumes NO input — its value
    # is a copy of another element of the same row (``source_id`` attr;
    # ``BaseParser.scala:285-312`` SaveReferenceData). Applied as a
    # post-read projection alias in sources/__init__.read_source.
    ref: str | None = None
    # DFASDL ``start-sign``: regex the value must BEGIN with — choice
    # branches use it to reject rows (a branch whose first element
    # carries start-sign="\\w" never matches an empty line,
    # FileParsers/CSV/complex-02-with-seq.xml).
    start_sign: str | None = None


@dataclass(frozen=True)
class SourceSpec:
    """One source connection + schema.

    ``format`` ∈ {csv, text, json, xml, jdbc, parquet, orc, binary,
    excel}; ``uri`` is a
    path / URL / JDBC URL (network URLs are staged locally first, see
    sources/net.py). ``fields=None`` → infer the schema (SchemaExtractor
    parity, infer.py).
    """

    name: str
    format: str
    uri: str
    fields: tuple[Field, ...] | None = None
    options: dict = field(default_factory=dict, hash=False)


@dataclass(frozen=True)
class TargetSpec:
    """Target connection + write semantics.

    ``mode`` ∈ {overwrite, append, upsert} — upsert is JDBC-only and
    reproduces the reference's per-row Insert/Update decision
    (``DatabaseWriterActor.scala:269-348``) set-wise via MERGE.
    ``foreign_keys`` maps a column of THIS target to
    ``(parent_target_name, parent_key_column)``; it drives recipe
    ordering and FK value remapping.
    """

    name: str
    format: str
    uri: str
    fields: tuple[Field, ...] = ()
    options: dict = field(default_factory=dict, hash=False)
    mode: str = "overwrite"
    foreign_keys: dict = field(default_factory=dict, hash=False)


@dataclass(frozen=True)
class ColumnRef:
    """A source element reference (≙ ``ElementReference(dfasdlId, elementId)``)."""

    source: str  # SourceSpec.name
    column: str


@dataclass(frozen=True)
class Mapping:
    """One MappingTransformation: source refs → target columns + chains.

    - mode ``one_to_one``: sources and targets zip positionally; the
      transformer chain applies per column
      (``MappingOneToOneWorker.scala:199-216``).
    - mode ``all_to_all``: ALL source values feed the chain once per
      target column (e.g. Concat of N fields into one)
      (``MappingAllToAllWorker.scala:282-354``).

    ``transformers`` / ``atomic`` are chains of ``(name, params)`` pairs
    resolved against functions.transformers.TRANSFORMERS — atomic chains
    run first, per source element at fetch time
    (``FetcherWorker.scala:205-235``), then the mapping chain
    (``TransformationWorker.scala:186-237``).
    """

    sources: tuple[ColumnRef, ...]
    targets: tuple[str, ...]
    mode: str = "one_to_one"
    transformers: tuple = ()  # ((name, {params}), ...)
    atomic: tuple = ()


@dataclass(frozen=True)
class Recipe:
    """Ordered unit of work writing one target (≙ reference Recipe).

    ``mapping_key``: column name present in ≥2 sources → value join
    (first source is the driving side, lookups are left joins).
    Without it, multi-source recipes row-align positionally; each
    source's ``order_by`` gives the explicit total order the reference
    gets implicitly from sequential parse order.
    ``limit`` ≙ target ``seq max`` / ``fixseq count``.
    """

    name: str
    target: str  # TargetSpec.name
    mappings: tuple[Mapping, ...]
    mapping_key: str | None = None
    limit: int | None = None
    order_by: dict = field(default_factory=dict, hash=False)  # source → [cols]


@dataclass(frozen=True)
class Pipeline:
    """The full job (≙ AgentStartTransformationMessage + Cookbook)."""

    name: str
    sources: tuple[SourceSpec, ...]
    targets: tuple[TargetSpec, ...]
    recipes: tuple[Recipe, ...]

    def source(self, name: str) -> SourceSpec:
        for s in self.sources:
            if s.name == name:
                return s
        raise KeyError(f"unknown source {name!r}")

    def target(self, name: str) -> TargetSpec:
        for t in self.targets:
            if t.name == name:
                return t
        raise KeyError(f"unknown target {name!r}")

    # -- serialization (≙ the Cookbook's JSON wire format) ------------------

    def to_dict(self) -> dict:
        return asdict(self)

    def to_json(self, **kw) -> str:
        return json.dumps(self.to_dict(), **kw)

    @staticmethod
    def from_dict(d: dict) -> "Pipeline":
        def fields(fs):
            return None if fs is None else tuple(Field(**f) for f in fs)

        sources = tuple(
            SourceSpec(
                s["name"], s["format"], s["uri"], fields(s.get("fields")),
                dict(s.get("options") or {}),
            )
            for s in d["sources"]
        )
        targets = tuple(
            TargetSpec(
                t["name"], t["format"], t["uri"], fields(t.get("fields")) or (),
                dict(t.get("options") or {}), t.get("mode", "overwrite"),
                {k: tuple(v) for k, v in (t.get("foreign_keys") or {}).items()},
            )
            for t in d["targets"]
        )
        recipes = tuple(
            Recipe(
                r["name"],
                r["target"],
                tuple(
                    Mapping(
                        tuple(ColumnRef(**c) for c in m["sources"]),
                        tuple(m["targets"]),
                        m.get("mode", "one_to_one"),
                        tuple((n, dict(p)) for n, p in (m.get("transformers") or ())),
                        tuple((n, dict(p)) for n, p in (m.get("atomic") or ())),
                    )
                    for m in r["mappings"]
                ),
                r.get("mapping_key"),
                r.get("limit"),
                dict(r.get("order_by") or {}),
            )
            for r in d["recipes"]
        )
        return Pipeline(d["name"], sources, targets, recipes)

    @staticmethod
    def from_json(s: str) -> "Pipeline":
        return Pipeline.from_dict(json.loads(s))
