"""Pre-flight validation (≙ the Parser FSM's validation states).

The reference validates everything before a single row is read
(``Parser.scala:164-270``): DFASDL syntax (SyntaxValidator), source and
target accessibility (``AccessValidator.scala:147-230``), and optional
SHA-256 checksums (``ChecksumValidator.scala:95-113``). Spec syntax
validation lives in ``plans.plan.validate``; this module covers the
other two as driver-side checks that run before the Spark job —
failing a 2-hour cluster run on a typo'd path is the worst outcome.
"""

from __future__ import annotations

import hashlib
import os
import urllib.parse
from dataclasses import dataclass

from .plans.spec import Pipeline, SourceSpec, TargetSpec


@dataclass(frozen=True)
class AccessResult:
    name: str
    kind: str  # source | target
    ok: bool
    detail: str = ""


def sha256_of(path: str, chunk: int = 1 << 20) -> str:
    """Streamed SHA-256 (≙ ChecksumValidator; constant memory)."""
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        while data := fh.read(chunk):
            h.update(data)
    return h.hexdigest()


def validate_checksum(spec: SourceSpec) -> bool:
    """True when the spec carries no ``sha256`` option or it matches."""
    expected = spec.options.get("sha256")
    if not expected:
        return True
    return sha256_of(spec.uri).lower() == str(expected).lower()


def _check_source(s: SourceSpec) -> AccessResult:
    scheme = urllib.parse.urlparse(s.uri).scheme.lower()
    if s.format == "jdbc" or scheme.startswith("jdbc"):
        # Connectivity is verified lazily by the reader; here we only
        # require a connect hook or URL shape.
        ok = bool(s.uri)
        return AccessResult(s.name, "source", ok, "jdbc url present")
    if scheme in ("http", "https", "ftp", "sftp", "ftps"):
        return AccessResult(s.name, "source", True, "remote (staged at read)")
    path = s.uri
    if not os.path.exists(path):
        return AccessResult(s.name, "source", False, f"missing: {path}")
    if not os.access(path, os.R_OK):
        return AccessResult(s.name, "source", False, f"unreadable: {path}")
    if not validate_checksum(s):
        return AccessResult(s.name, "source", False, "sha256 mismatch")
    return AccessResult(s.name, "source", True)


def _check_target(t: TargetSpec) -> AccessResult:
    if t.format == "jdbc":
        return AccessResult(t.name, "target", bool(t.uri), "jdbc url present")
    parent = os.path.dirname(t.uri.rstrip("/")) or "."
    if os.path.exists(parent) and not os.access(parent, os.W_OK):
        return AccessResult(t.name, "target", False, f"unwritable dir: {parent}")
    return AccessResult(t.name, "target", True)


def check_access(p: Pipeline) -> list[AccessResult]:
    """Every connection checked, every failure reported (the reference
    collects all results before aborting — same here)."""
    return [_check_source(s) for s in p.sources] + [
        _check_target(t) for t in p.targets
    ]


def assert_preflight(p: Pipeline) -> None:
    failures = [r for r in check_access(p) if not r.ok]
    if failures:
        msgs = "; ".join(f"{r.kind} {r.name!r}: {r.detail}" for r in failures)
        raise ValueError(f"preflight failed: {msgs}")
