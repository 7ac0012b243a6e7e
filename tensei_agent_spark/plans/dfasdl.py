"""DFASDL XML → spec compiler.

The reference's user-facing schema artifact is a DFASDL document (XML,
namespace ``http://www.dfasdl.org/DFASDL``): ``seq``/``fixseq`` row
sets wrapping an ``elem`` of typed data elements, annotated with parse
hints (``stop-sign``, ``format``, ``encoding``), write hints
(``db-column-name``, ``db-primary-key``, ``db-foreign-key``,
``db-auto-inc``, ``max-length``), defaults (``defaultstr`` /
``defaultnum``) and semantics (``unique``). A user migrating from the
reference brings these files; this module compiles them into the
engine's :class:`~.spec.SourceSpec` / :class:`~.spec.TargetSpec` so
existing DFASDLs drive Spark reads and writes directly.

Element/attribute vocabulary follows the reference's usage (dfasdl-core
/ dfasdl-utils, exercised across
``/root/reference/src/test/resources/**/*.xml`` and consumed in
``helpers/DatabaseSchemaExtractor.scala``,
``parsers/FileParser.scala``, ``writers/DatabaseWriterActor.scala``).
Supported subset — the vocabulary that actually appears in the
reference's own tests and use cases:

===========  ==========================================================
tag          mapping
===========  ==========================================================
seq/fixseq   one row set (→ one SourceSpec/TargetSpec); ``max`` /
             ``count`` → read limit; ``db-primary-key``
elem         row wrapper; nested elem/celem flatten in document order
choice       alternative row layouts (first-parse-wins; layouts beyond
             the first land in options["alt_layouts"])
str          string (+ length / max-length)
num          long; with ``precision`` → decimal(max-digits, precision)
formatnum    regex-parsed number: ``precision``/``decimal-separator``
             → double, else long; pattern kept in Field.format
formatstr    regex-validated string (pattern in Field.format)
date         date
time         string (Spark has no TIME type; values keep HH:mm:ss form)
datetime     timestamp
formattime   timestamp, Java pattern in Field.format
bin          binary
ref          no input consumed — copy of element ``sid`` (projection
             alias, sources/__init__.read_source)
===========  ==========================================================
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections import Counter
from dataclasses import dataclass, field as dc_field

from .spec import Field, SourceSpec, TargetSpec

_DATA_TAGS = {
    "str", "num", "formatstr", "formatnum", "formattime",
    "date", "time", "datetime", "bin", "ref",
}
_WRAPPER_TAGS = {"elem", "celem"}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _type_of(tag: str, a: dict) -> str:
    if tag == "str" or tag == "formatstr" or tag == "time":
        return "string"
    if tag == "num":
        if a.get("precision"):
            digits = int(a.get("max-digits", 18))
            return f"decimal({digits},{int(a['precision'])})"
        return "long"
    if tag == "formatnum":
        # regex-parsed numbers: locale decimals parse to double at read
        # time (sources handle decimal-separator), integral → long. A
        # pattern that captures a decimal mark implies a decimal even
        # without the attribute — the reference's extractor infers the
        # separator from the matched lexeme
        # (DatabaseParsers/simple-01-expected-data.xml gains
        # decimal-separator="," from format "…\,\d{2}").
        fmt = _mark_scan_text(a.get("format", ""))
        return (
            "double"
            if a.get("precision")
            or a.get("decimal-separator")
            or ("," in fmt or "." in fmt)
            else "long"
        )


    if tag == "date":
        return "date"
    if tag == "formattime":
        # A date-only pattern (no clock tokens) parses to a LocalDate in
        # the reference — rendered "2000-12-24" into string targets
        # (copy/target-02.csv), not "2000-12-24 00:00:00".
        pat = re.sub(r"'[^']*'", "", a.get("format", ""))
        return "timestamp" if re.search(r"[HhmsSaK]", pat) else "date"
    if tag == "datetime":
        return "timestamp"
    if tag == "bin":
        return "binary"
    return "string"


_QUANT_RE = re.compile(r"\{\d+(?:,\d*)?\}")
_CLASS_RE = re.compile(r"\[(?:\\.|[^\]\\])*\]")


def _mark_scan_text(fmt: str) -> str:
    """A formatnum pattern reduced to the characters that can actually
    MATCH a literal decimal mark in the lexeme.

    The raw pattern text lies about marks two ways (ADVICE r8):
    quantifier commas — ``(-?\\d{1,17})``, the reference
    DatabaseSchemaExtractor's BIGINT idiom, would type integral columns
    double (precision loss above 2^53) and inject a spurious seq-wide
    decimalSeparator — and character-class syntax, where ``[0-9]``
    contributes nothing but ``[.,]`` really is a mark alternation. So:
    classes collapse to exactly the marks they positively contain
    (negated classes to nothing), then ``{m,n}`` quantifiers are
    stripped. Relative ','/'.' order is preserved for the last-mark
    rule in :func:`_inferred_dec_sep`.
    """

    def _cls(m: re.Match) -> str:
        inner = m.group(0)
        if inner.startswith("[^"):
            return ""
        return "".join(ch for ch in inner[1:-1] if ch in ",.")

    return _QUANT_RE.sub("", _CLASS_RE.sub(_cls, fmt))


def _inferred_dec_sep(fmt: str) -> str | None:
    """The decimal mark a formatnum pattern implies: the LAST of ','/'.'
    in the pattern (grouping marks come before the decimal one).
    Quantifier/class syntax is excluded first (``_mark_scan_text``)."""
    fmt = _mark_scan_text(fmt)
    c, d = fmt.rfind(","), fmt.rfind(".")
    if c < 0 and d < 0:
        return None
    return "," if c > d else "."


def _uniquify(fields: tuple) -> tuple:
    """Resolve missing/duplicate field names positionally — the vCard
    grammar's label elements carry only ``class="label"``, no id
    (FileParsers/vCard/complex-01.xml), so several fields would
    otherwise collide."""
    from dataclasses import replace

    seen: dict[str, int] = {}
    out = []
    for i, f in enumerate(fields):
        name = f.name or f"_f{i}"
        if name in seen:
            seen[name] += 1
            name = f"{name}__{seen[name]}"
        else:
            seen[name] = 0
        out.append(replace(f, name=name) if name != f.name else f)
    return tuple(out)


def _field_of(node: ET.Element, prefix: str) -> Field:
    tag = _local(node.tag)
    a = node.attrib
    name = (
        a.get("db-column-name")
        or a.get("json-attribute-name")
        or a.get("xml-element-name")
        or a.get("id")
        or a.get("class")
        or ""
    )
    if prefix:
        name = f"{prefix}.{name}"
    default: str | int | float | None = None
    if "defaultnum" in a:
        raw = a["defaultnum"]
        # locale decimals ("0,0") appear on formatnum defaults — Python
        # float() only takes '.'
        default = (
            float(raw.replace(",", "."))
            if ("." in raw or "," in raw)
            else int(raw)
        )
    elif "defaultstr" in a:
        default = a["defaultstr"]
    return Field(
        name=name,
        type=_type_of(tag, a),
        default=default,
        unique=a.get("unique") == "true",
        format=a.get("format"),
        auto_increment=a.get("db-auto-inc") == "true",
        length=int(a["length"]) if "length" in a else None,
        max_length=int(a["max-length"]) if "max-length" in a else None,
        ref=a.get("sid") if tag == "ref" else None,
        start_sign=a.get("start-sign"),
    )


def _collect_leaves(node: ET.Element, prefix: str = "") -> list[ET.Element]:
    """Data elements in document order; nested elem/celem flatten (their
    ids join the column path with '.')."""
    out: list[tuple[ET.Element, str]] = []

    def walk(n: ET.Element, pfx: str) -> None:
        for child in n:
            tag = _local(child.tag)
            if tag in _DATA_TAGS:
                out.append((child, pfx))
            elif tag in _WRAPPER_TAGS:
                # a NESTED wrapper is a structural container: its name
                # joins the column path (celem always; an inner elem
                # too — the XML grammar's <elem id="name"> holding
                # firstname/lastname, simple-xml-stacked-dfasdl.xml;
                # the ROW wrapper itself is the walk root and never
                # prefixes). The path label follows the field name chain.
                a = child.attrib
                label = (
                    a.get("json-attribute-name")
                    or a.get("xml-element-name")
                    or a.get("id", "")
                )
                # An anonymous wrapper (no id/xml-element-name/
                # json-attribute-name) is structural only — joining its
                # empty label would leave 'parent.'/'parent..child'
                # artifacts (lstrip only removes LEADING dots).
                walk(child, f"{pfx}.{label}".lstrip(".") if label else pfx)
    walk(node, prefix)
    return out


def _collect_tokens(node: ET.Element) -> list[list[tuple[ET.Element, str]]]:
    """Like :func:`_collect_leaves`, but each entry is one consumed
    TOKEN with its alternative elements: a plain data element is a
    singleton, a FIELD-LEVEL ``choice`` (choice below the row wrapper —
    FileParsers/CSV/choice-01.xml, each column independently num-or-str)
    contributes ALL its alternatives for one token."""
    out: list[list[tuple[ET.Element, str]]] = []

    def walk(n: ET.Element, pfx: str) -> None:
        for child in n:
            tag = _local(child.tag)
            if tag in _DATA_TAGS:
                out.append([(child, pfx)])
            elif tag == "choice":
                alts: list[tuple[ET.Element, str]] = []
                for alt in child:
                    if _local(alt.tag) in _WRAPPER_TAGS:
                        alts.extend(_collect_leaves(alt, pfx))
                if alts:
                    out.append(alts)
            elif tag in _WRAPPER_TAGS:
                a = child.attrib
                label = (
                    a.get("json-attribute-name")
                    or a.get("xml-element-name")
                    or a.get("id", "")
                )
                # An anonymous wrapper (no id/xml-element-name/
                # json-attribute-name) is structural only — joining its
                # empty label would leave 'parent.'/'parent..child'
                # artifacts (lstrip only removes LEADING dots).
                walk(child, f"{pfx}.{label}".lstrip(".") if label else pfx)

    walk(node, "")
    return out


@dataclass(frozen=True)
class SeqSchema:
    """One parsed row set."""

    seq_id: str
    fields: tuple[Field, ...]
    options: dict = dc_field(default_factory=dict, hash=False)
    # column name -> referenced DFASDL element id (resolve against the
    # full document via resolve_foreign_keys)
    foreign_keys: dict = dc_field(default_factory=dict, hash=False)


def _unescape_sign(s: str) -> str:
    """``\\t`` is the only escape the reference's stop-sign WRITER
    decodes (FileWriterActor.scala:231-251); on the READ side stop-signs
    are regex fragments, so a single regex-escaped char (``\\|``) means
    that literal char for the line-based reader."""
    s = s.replace("\\t", "\t")
    if len(s) == 2 and s[0] == "\\" and not s[1].isalnum():
        return s[1]
    return s


def _layout_opts(leaves: list, opts: dict) -> None:
    """Derive the flat-file read/write options of one row layout: the
    modal separator, per-field stop-signs (stream grammar), per-gap
    separators when they differ (raw writer), per-element trims."""
    signs = [
        n.attrib["stop-sign"]
        for n, _ in leaves[:-1]
        if "stop-sign" in n.attrib
    ]
    if signs and "sep" not in opts:
        opts["sep"] = _unescape_sign(Counter(signs).most_common(1)[0][0])
        # Per-field stop-signs, for the stream-grammar reader and the
        # raw writer. `seps` (one per column gap) only when they
        # actually differ — a layout like copy/target-01.xml (" : "
        # then ",") can't be written with a single separator.
        opts["stop_signs"] = tuple(
            (n.attrib.get("stop-sign") or "").replace("\\t", "\t") or None
            for n, _ in leaves
        )
        if len(set(signs)) > 1:
            opts["seps"] = tuple(
                _unescape_sign(n.attrib.get("stop-sign") or opts["sep"])
                for n, _ in leaves[:-1]
            )
    if any("trim" in n.attrib for n, _ in leaves):
        # per-element trim attribute (both|left|right) — the
        # stream-grammar reader applies it; Spark's CSV reader already
        # trims via ignore*WhiteSpace.
        opts.setdefault(
            "trims", tuple(n.attrib.get("trim") for n, _ in leaves)
        )


def parse_dfasdl(xml_str: str) -> list[SeqSchema]:
    root = ET.fromstring(xml_str)
    if _local(root.tag) != "dfasdl":
        raise ValueError(f"not a DFASDL document (root <{_local(root.tag)}>)")
    encoding = root.attrib.get("default-encoding")
    seqs: list[SeqSchema] = []
    leading = 0
    # Row sets: top-level seq/fixseq, plus seqs NESTED inside wrapper
    # elems — a JSON document's arrays live at a path
    # (FileParsers/JSON/example-dfasdl.xml: root > persons(json
    # "persons") > persons-seq), recorded as the seq's explodePath. The
    # discovery walk does NOT enter seqs: a seq inside a row (awards,
    # other) belongs to that row's layout, not the document's row sets.
    candidates: list[tuple[ET.Element, str]] = []
    leading_by_seq: dict[int, int] = {}

    def _descend(n: ET.Element, path: str) -> None:
        for child in n:
            ctag = _local(child.tag)
            if ctag in ("seq", "fixseq"):
                candidates.append((child, path))
            elif ctag in _WRAPPER_TAGS:
                a = child.attrib
                label = (
                    a.get("json-attribute-name")
                    or a.get("xml-element-name")
                    or a.get("id", "")
                )
                _descend(child, f"{path}.{label}".lstrip("."))

    has_top_seq = any(_local(c.tag) in ("seq", "fixseq") for c in root)
    for child in root:
        tag = _local(child.tag)
        if tag in _DATA_TAGS:
            # A top-level data element before a seq consumes one line of
            # the flat file (the reference's header idiom:
            # ``<str id="header"/>`` ahead of the row set, e.g.
            # usecases/emptyTargetColumns/source-dfasdl.xml).
            leading += 1
        elif tag in ("seq", "fixseq"):
            candidates.append((child, ""))
            if leading:
                leading_by_seq[id(child)] = leading
                leading = 0
        elif tag in _WRAPPER_TAGS and not has_top_seq:
            # nested row sets only matter when the document has no
            # top-level ones (single-record wrapper docs keep their
            # synthesized layout; see below). The TOP wrapper maps to
            # the document root itself and contributes no path segment.
            _descend(child, "")

    for seq, json_path in candidates:
        tag = _local(seq.tag)
        opts: dict = {}
        if id(seq) in leading_by_seq:
            opts["leading_lines"] = leading_by_seq[id(seq)]
        if json_path:
            opts["explodePath"] = json_path
        if encoding:
            opts["encoding"] = encoding
        if "max" in seq.attrib:
            opts["limit"] = int(seq.attrib["max"])
        # DatabaseParser row selection (DatabaseParser.scala:379-416):
        # ``filter`` → pushed-down predicate, ``db-select`` → raw SQL
        # override (sources/jdbc.py consumes both).
        if "filter" in seq.attrib:
            opts["filter"] = seq.attrib["filter"]
        if "db-select" in seq.attrib:
            opts["query"] = seq.attrib["db-select"]
        if tag == "fixseq":
            opts["limit"] = int(seq.attrib["count"])
        if "db-primary-key" in seq.attrib:
            opts["primary_key"] = tuple(
                k.strip() for k in seq.attrib["db-primary-key"].split(",")
            )
        # row layouts: the seq's <elem> child, or a <choice> of them
        layouts: list[list[ET.Element]] = []
        for child in seq:
            ctag = _local(child.tag)
            if ctag == "choice":
                layouts.extend(
                    [alt] for alt in child if _local(alt.tag) in _WRAPPER_TAGS
                )
            elif ctag in _WRAPPER_TAGS:
                layouts.append([child])
        fields_per_layout: list[tuple[Field, ...]] = []
        fks: dict = {}
        for layout in layouts:
            tokens: list[list[tuple[ET.Element, str]]] = []
            for wrapper in layout:
                tokens.extend(_collect_tokens(wrapper))
            leaves = [alt for tok in tokens for alt in tok]
            fields = _uniquify(tuple(_field_of(n, pfx) for n, pfx in leaves))
            if not fields_per_layout and any(len(t) > 1 for t in tokens):
                # field-level choice: record which fields compete for
                # each token, and the per-TOKEN stop-signs/trims the
                # grammar reader consumes (first alternative speaks for
                # the token — the fixtures share attrs across branches)
                fi = iter(fields)
                opts["token_fields"] = tuple(
                    tuple(next(fi).name for _ in tok) for tok in tokens
                )
                reps = [tok[0] for tok in tokens]
                _layout_opts(reps, opts)
            if not fields_per_layout:
                # element ids ride along for document-wide FK resolution
                # (field names may be db-column-name overrides; id-less
                # elements fall back to the synthesized field name)
                opts["_element_ids"] = tuple(
                    n.attrib.get("id") or f.name
                    for (n, _), f in zip(leaves, fields)
                )
            fields_per_layout.append(fields)
            for (n, pfx), f in zip(leaves, fields):
                if "db-foreign-key" in n.attrib:
                    fks[f.name] = n.attrib["db-foreign-key"]
            # flat-file separator: the modal stop-sign of the layout's
            # non-terminal elements (the last element's stop-sign — the
            # row terminator, typically \n — is the line split)
            _layout_opts(leaves, opts)
            # element-level parse attributes that Spark's reader takes
            # globally: formatnum locale separators and the formattime
            # pattern (Java DateTimeFormatter syntax on both sides)
            for n, _ in leaves:
                a, tag = n.attrib, _local(n.tag)
                if tag == "formatnum" and "decimal-separator" in a:
                    opts.setdefault("decimalSeparator", a["decimal-separator"])
                elif tag == "formatnum" and "format" in a:
                    inferred = _inferred_dec_sep(a["format"])
                    if inferred:
                        opts.setdefault("decimalSeparator", inferred)
                if tag == "formatnum" and "grouping-separator" in a:
                    opts.setdefault("groupingSeparator", a["grouping-separator"])
                if tag == "formattime" and "format" in a:
                    # date-typed patterns drive Spark's dateFormat, clock
                    # patterns its timestampFormat (see _type_of)
                    key = (
                        "dateFormat"
                        if _type_of("formattime", a) == "date"
                        else "timestampFormat"
                    )
                    opts.setdefault(key, a["format"])
        if not fields_per_layout:
            raise ValueError(f"seq {seq.attrib.get('id')!r} has no <elem> row")
        if len(fields_per_layout) > 1:
            opts["alt_layouts"] = tuple(fields_per_layout[1:])
        seqs.append(
            SeqSchema(
                seq_id=seq.attrib["id"],
                fields=fields_per_layout[0],
                options=opts,
                foreign_keys=fks,
            )
        )
    if not seqs:
        # A document whose row container is a bare top-level <elem> —
        # or nothing but top-level data elements — describes a SINGLE
        # record (the reference's EmailToCSV target email-target-01.xml;
        # the FileParsers/CSV/simple-01.xml conformance family). The
        # writer DOES terminate that record (the golden
        # email-target-01-expected-data.csv ends with a newline, unlike
        # seq outputs), hence trailing_newline.
        for wrapper in root:
            if _local(wrapper.tag) not in _WRAPPER_TAGS:
                continue
            tokens = _collect_tokens(wrapper)
            leaves = [alt for tok in tokens for alt in tok]
            if not leaves:
                continue
            fields = _uniquify(tuple(_field_of(n, pfx) for n, pfx in leaves))
            opts = {"limit": 1, "trailing_newline": True}
            if encoding:
                opts["encoding"] = encoding
            if any(len(t) > 1 for t in tokens):
                fi = iter(fields)
                opts["token_fields"] = tuple(
                    tuple(next(fi).name for _ in tok) for tok in tokens
                )
                _layout_opts([tok[0] for tok in tokens], opts)
            _layout_opts(leaves, opts)
            opts["_element_ids"] = tuple(
                n.attrib.get("id") or f.name
                for (n, _), f in zip(leaves, fields)
            )
            seqs.append(
                SeqSchema(
                    seq_id=wrapper.attrib["id"], fields=fields, options=opts
                )
            )
    if not seqs:
        bare = [(n, "") for n in root if _local(n.tag) in _DATA_TAGS]
        if bare:
            fields = _uniquify(tuple(_field_of(n, pfx) for n, pfx in bare))
            opts = {"limit": 1, "trailing_newline": True}
            if encoding:
                opts["encoding"] = encoding
            _layout_opts(bare, opts)
            opts["_element_ids"] = tuple(
                n.attrib.get("id") or f.name
                for (n, _), f in zip(bare, fields)
            )
            seqs.append(SeqSchema(seq_id="record", fields=fields, options=opts))
    if not seqs:
        raise ValueError("DFASDL document contains no seq/fixseq")
    return seqs


def resolve_foreign_keys(seqs: list[SeqSchema]) -> dict:
    """db-foreign-key targets are ELEMENT ids; resolve each to
    (parent seq id, parent column name) across the whole document —
    the resolution ``SortTransformationMappings.scala:109-158`` does on
    the DFASDL tree to order recipes parent-first."""
    elem_index: dict[str, tuple[str, str]] = {}
    for s in seqs:
        for f, eid in zip(s.fields, _element_ids(s)):
            elem_index[eid] = (s.seq_id, f.name)
    out: dict[str, dict[str, tuple[str, str]]] = {}
    for s in seqs:
        resolved = {}
        for col, target_eid in s.foreign_keys.items():
            if target_eid not in elem_index:
                raise ValueError(
                    f"db-foreign-key {target_eid!r} (seq {s.seq_id!r}, column"
                    f" {col!r}) references no element in this document"
                )
            resolved[col] = elem_index[target_eid]
        if resolved:
            out[s.seq_id] = resolved
    return out


def _element_ids(s: SeqSchema) -> list[str]:
    # Field names may be db-column-name overrides; keep original element
    # ids alongside for FK resolution.
    return list(s.options.get("_element_ids", ())) or [f.name for f in s.fields]


def source_spec(
    xml_str: str,
    name: str,
    uri: str,
    fmt: str = "csv",
    seq_id: str | None = None,
) -> SourceSpec:
    """Compile one DFASDL row set into a readable SourceSpec."""
    schema = _pick(parse_dfasdl(xml_str), seq_id)
    opts = {k: v for k, v in schema.options.items() if not k.startswith("_")}
    return SourceSpec(name=name, format=fmt, uri=uri,
                      fields=schema.fields, options=opts)


def target_spec(
    xml_str: str,
    name: str,
    uri: str,
    fmt: str = "jdbc",
    seq_id: str | None = None,
    mode: str = "overwrite",
) -> TargetSpec:
    """Compile one DFASDL row set into a TargetSpec, resolving
    db-foreign-key references document-wide (FK columns drive recipe
    topological order + auto-increment key remapping)."""
    seqs = parse_dfasdl(xml_str)
    schema = _pick(seqs, seq_id)
    fks = resolve_foreign_keys(seqs).get(schema.seq_id, {})
    opts = {k: v for k, v in schema.options.items() if not k.startswith("_")}
    return TargetSpec(
        name=name, format=fmt, uri=uri, fields=schema.fields,
        options=opts, mode=mode, foreign_keys=fks,
    )


def _pick(seqs: list[SeqSchema], seq_id: str | None) -> SeqSchema:
    if seq_id is None:
        if len(seqs) > 1:
            raise ValueError(
                f"document defines {len(seqs)} row sets "
                f"({[s.seq_id for s in seqs]}); pass seq_id"
            )
        return seqs[0]
    for s in seqs:
        if s.seq_id == seq_id:
            return s
    raise KeyError(f"no seq {seq_id!r} in document")
