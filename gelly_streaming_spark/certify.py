"""Change-aware certification-window ordering (VERDICT r9 item 1).

The driver's correctness harness records rows for the FIRST 50 entries
of ``queries()``. Round 9 curated that window with a static tier list,
but the tiers assumed *evidence* stability: five queries whose
implementations changed in r9 (q22/q31/q36/q37/q50) sat in the
"long-stable" tier, so their only driver rows certify pre-change code.

This module makes staleness MECHANICAL. Each query gets a fingerprint:

    sha256( function source ‖ oracle SQL ‖ contents of every owner file )

where the owner files are derived automatically — the modules a query
imports in its function body (queries.py convention: each query imports
its operators locally), closed transitively over the package's internal
import graph, plus the shared base modules referenced through
queries.py's top-level imports. A committed manifest
(``cert_manifest.json``) records the fingerprint each query had when it
last sat inside the driver window. Any query whose current fingerprint
differs — or which has no manifest entry at all (new query) — is STALE
and is promoted to the head of the export order, ahead of every
long-stable row, so the next driver run re-certifies it.

queries.py module-level helpers (r10 verdict item 2, closed in r11):
the ``self`` hash also folds in the source of every queries.py
module-level function/class the query's fn body references, closed
transitively over helper-to-helper references, plus the repr of every
referenced module-level data constant with a deterministic repr
(``_Qxx_SQL`` strings, ``_VIEW_SQL``, schemas). A helper edit that
changes runtime behaviour therefore SELF-stales exactly the queries
that reference it. Residual boundary: a constant whose repr is
address-dependent is skipped (none exist today — functions and plain
data cover the module), and dynamic dispatch through ``getattr`` would
escape the name scan; the per-round judge diff review remains the
backstop for those.

Round workflow:

    # ROUND START, before any code edits — stamp what the driver just
    # certified (current fingerprints == fingerprints of the certified
    # code, because the driver ran on the previous round's final commit):
    python -m gelly_streaming_spark.certify stamp CORRECTNESS_r10.json
    # any time — list what would re-certify:
    python -m gelly_streaming_spark.certify status
    # ROUND END: nothing. Commit as-is; the export order already leads
    # with the stale band, and the driver certifies exactly that order.

Stamping at ship time would be unsound: the driver certifies the first
50 of the POST-stamp export order, and stamping changes that order, so
the stamped set and the certified set would diverge (no fixpoint once
the registry outgrows the window). Queries outside the driver window
keep their old entries and stay visibly stale until a later round
rotates them in.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import re
from functools import lru_cache
from pathlib import Path

PKG_ROOT = Path(__file__).resolve().parent
MANIFEST_PATH = PKG_ROOT / "cert_manifest.json"
# Driver certification window size — an OBSERVED constant (every
# CORRECTNESS_r08+ file records exactly the first 50 export entries),
# not a driver contract. If the driver ever widens or narrows its
# window the triage bands still order correctly; the only failure mode
# is benign under-rotation (fewer stale rows re-certified per round).
WINDOW = 50

# Names imported at queries.py top level, mapped to the module that owns
# them — fn-body source references to these names pull the module into
# the query's owner set (word-boundary match, see _owner_modules).
_TOP_LEVEL_NAME_OWNERS: dict[str, str] = {
    "GraphStream": "operators/graphstream.py",
    "asof_join": "operators/joins.py",
    "top_k": "operators/joins.py",
    "E.": "sources/edges.py",
    "load_table": "sources/tables.py",
}

_IMPORT_RE = re.compile(
    r"from\s+gelly_streaming_spark(?:\.([\w.]+))?\s+import\s+([^\n(]+|\([^)]*\))"
)

# Execution-infrastructure modules excluded from owner sets: they tune
# HOW a plan runs (session confs, BLAS pinning, tmpfs staging, plan-shape
# probes/assertions), never WHAT a query returns. Including them would
# stale all 62 queries on any infra tweak and overflow the 50-row
# window. A module that starts influencing results must leave this set.
_INFRA_EXCLUDE: frozenset[str] = frozenset({
    "session.py", "blas.py",
    "plans/memory.py", "plans/checks.py", "plans/probe.py",
    "plans/__init__.py", "__init__.py",
})


def _module_file(dotted: str) -> Path | None:
    """Resolve 'ext.dedup' → <pkg>/ext/dedup.py (or package __init__)."""
    p = PKG_ROOT / Path(*dotted.split("."))
    if p.with_suffix(".py").is_file():
        return p.with_suffix(".py")
    if (p / "__init__.py").is_file():
        return p / "__init__.py"
    return None


@lru_cache(maxsize=1)
def _import_graph() -> dict[Path, frozenset[Path]]:
    """Internal import graph over every .py file in the package."""
    graph: dict[Path, frozenset[Path]] = {}
    for f in PKG_ROOT.rglob("*.py"):
        deps: set[Path] = set()
        for m in _IMPORT_RE.finditer(f.read_text()):
            base, names = m.group(1), m.group(2)
            if base:
                mf = _module_file(base)
                if mf is not None:
                    deps.add(mf)
                # `from gelly_streaming_spark.ext import dedup, text`
                for n in re.findall(r"[\w]+", names):
                    sub = _module_file(f"{base}.{n}")
                    if sub is not None:
                        deps.add(sub)
            else:
                for n in re.findall(r"[\w]+", names):
                    sub = _module_file(n)
                    if sub is not None:
                        deps.add(sub)
        graph[f] = frozenset(deps)
    return graph


def _closure(seeds: set[Path]) -> set[Path]:
    graph = _import_graph()
    out: set[Path] = set()
    stack = list(seeds)
    while stack:
        f = stack.pop()
        if f in out or str(f.relative_to(PKG_ROOT)) in _INFRA_EXCLUDE:
            continue
        out.add(f)
        stack.extend(graph.get(f, ()))
    return out


def _owner_modules(fn_source: str) -> set[Path]:
    seeds: set[Path] = set()
    for m in _IMPORT_RE.finditer(fn_source):
        base, names = m.group(1), m.group(2)
        if base:
            mf = _module_file(base)
            if mf is not None:
                seeds.add(mf)
            for n in re.findall(r"[\w]+", names):
                sub = _module_file(f"{base}.{n}")
                if sub is not None:
                    seeds.add(sub)
    for name, rel in _TOP_LEVEL_NAME_OWNERS.items():
        if name.endswith("."):
            # dot-suffixed names ("E.") need a LEFT boundary that also
            # rejects attribute chains: bare "E\." matched "NOTE." in a
            # comment and "x.E" in a chain (r11 review finding)
            pat = rf"(?<![\w.]){re.escape(name)}"
        else:
            pat = rf"\b{re.escape(name)}\b"
        if re.search(pat, fn_source):
            seeds.add(PKG_ROOT / rel)
    return _closure(seeds)


def _code_names(source: str) -> set[str]:
    """Identifiers a code block actually REFERENCES — ast.Name nodes
    only, so names inside string literals/docstrings/comments do not
    count (a doc line saying "see q15" must not pull q15's code into
    the fingerprint). Falls back to a word scan (over-capture, never
    under-capture) if the snippet doesn't parse standalone."""
    import ast
    import textwrap

    try:
        tree = ast.parse(textwrap.dedent(source))
    except SyntaxError:
        return set(re.findall(r"\b[A-Za-z_]\w*\b", source))
    return {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}


@lru_cache(maxsize=1)
def _helper_sources() -> dict[str, tuple[str, str]]:
    """queries.py module-level name → ("src"|"repr", hashable text).

    Functions/classes DEFINED in queries.py hash by source (kind
    "src"; these expand transitively — their code can reference further
    helpers); plain-data constants (SQL strings, view maps, schemas)
    hash by repr (kind "repr"; leaves — data doesn't call helpers),
    but only when the repr is deterministic (no memory addresses) — an
    address-bearing repr (e.g. the Query REGISTRY holding function
    objects) would make fingerprints differ between processes, so those
    are skipped. Imported modules/objects from other files are owner
    territory, not helper territory, and are excluded here.
    """
    import inspect as _inspect

    from gelly_streaming_spark import queries as Q

    out: dict[str, tuple[str, str]] = {}
    for name, obj in vars(Q).items():
        if name.startswith("__"):
            continue
        if _inspect.isfunction(obj) or _inspect.isclass(obj):
            if getattr(obj, "__module__", None) == Q.__name__:
                try:
                    out[name] = ("src", _inspect.getsource(obj))
                except (OSError, TypeError):
                    pass
        elif isinstance(obj, (set, frozenset)):
            # raw set repr order follows PYTHONHASHSEED-randomized
            # string hashing — it would change every process start and
            # permanently self-stale every caller; canonicalize instead.
            # The address guard still applies: a set of OBJECTS would
            # re-smuggle per-process addresses through the sorted repr.
            rep = repr(sorted(obj, key=repr))
            if " at 0x" not in rep and "object at" not in rep:
                out[name] = ("repr", rep)
        elif not _inspect.ismodule(obj):
            rep = repr(obj)
            if " at 0x" not in rep and "object at" not in rep:
                out[name] = ("repr", rep)
    return out


def _referenced_helpers(
    fn_source: str, fn_name: str
) -> list[tuple[str, str, str]]:
    """``(name, kind, text)`` for every helper the fn body references,
    closed transitively over code-helper→helper references, sorted by
    name for stable hashing. ``kind`` is "src" (function/class source —
    eligible for owner-module scanning) or "repr" (data constant —
    hashed but never scanned for owners: regex-matching import patterns
    inside SQL/doc DATA would add spurious owner modules)."""
    helpers = _helper_sources()
    found: dict[str, tuple[str, str]] = {}
    frontier = [fn_source]
    while frontier:
        src = frontier.pop()
        for name in _code_names(src):
            if name == fn_name or name in found or name not in helpers:
                continue
            kind, text = helpers[name]
            found[name] = (kind, text)
            if kind == "src":
                frontier.append(text)
    return sorted((n, k, t) for n, (k, t) in found.items())


@lru_cache(maxsize=1)
def fingerprints() -> dict[str, dict[str, str]]:
    """Current fingerprints for every registered query (cached per
    process). Two hashes per query:

    - ``self`` — the query's OWN code: fn source + oracle SQL. A self
      mismatch means the query itself was edited since certification.
    - ``full`` — self plus every owner-module file's contents. A full
      mismatch with a matching self means only shared operator code
      changed underneath the query.

    The split exists for WINDOW TRIAGE: a change to a widely-shared
    module (e.g. sources/tables.py, an owner of every query) stales all
    62 rows at once — more than the 50-slot window holds — and without
    the split the flat sort could push a query whose own body changed
    out of the window in favor of collaterally-stale rows. Self-stale
    ranks strictly ahead of owner-stale; owner-stale rows that miss the
    window keep their old manifest entries and rotate in next round.
    """
    from gelly_streaming_spark import queries as Q

    out: dict[str, dict[str, str]] = {}
    for name, q in Q.REGISTRY.items():
        # unwrap the plan-memo decorator (r14): fingerprinting the
        # wrapper would collapse every memoized query onto ONE shared
        # source — edits to the real fn body would never stale, a
        # certification hole
        fn = inspect.unwrap(q.fn)
        # The SELF hash covers the query's semantic content: fn BODY +
        # oracle SQL + referenced helpers. The @_q decorator line is
        # STRIPPED first (r14): it carries only the name (the manifest
        # key), the SQL (hashed directly from q.sql — a _VIEW_SQL or
        # _QNN_SQL edit still flips the hash through the generated
        # string), the doc (cosmetic), and the memo_plan flag
        # (registration plumbing). Hashing the decorator staled the
        # ENTIRE registry on any registration-mechanics change — 77 >
        # the 50-slot window, defeating the triage this split exists
        # for (observed r14: adding the memo_plan flag). It also pulled
        # _q/Query/_memo_plan into every query's helper graph, with the
        # same whole-registry blast radius.
        src = inspect.getsource(fn)
        body_lines = src.splitlines(keepends=True)
        first_def = next(
            (i for i, ln in enumerate(body_lines) if ln.lstrip().startswith("def ")),
            0,
        )
        src = "".join(body_lines[first_def:])
        helpers = _referenced_helpers(src, fn.__name__)
        hs = hashlib.sha256()
        hs.update(src.encode())
        hs.update((q.sql or "").encode())
        for hname, _kind, htext in helpers:
            hs.update(hname.encode())
            hs.update(htext.encode())
        self_fp = hs.hexdigest()
        hf = hashlib.sha256(self_fp.encode())
        # memo_plan flips change execution plumbing without touching
        # the body — record the wrapper marker (and, for memoized
        # queries, the wrapper's own source) in the FULL hash so a flag
        # flip or a _memo_plan logic edit makes the query owner-stale
        # (band 1), never invisible.
        if hasattr(q.fn, "__wrapped__"):
            hf.update(b"memo")
            hf.update(inspect.getsource(Q._memo_plan).encode())
        else:
            hf.update(b"raw")
        # owner derivation scans the fn source AND every referenced
        # CODE helper's source: a helper like _q15_edges builds the
        # query's input from sources/edges.py, so a module referenced
        # only inside a helper body is an owner too (r11 review finding
        # — an edges.py edit previously staled nothing for q15b/q15c).
        # Data constants (kind "repr") are hashed above but excluded
        # here: import-looking text inside SQL/doc DATA must not add
        # spurious owners.
        owner_scan = "\n".join(
            [src, *(t for _, k, t in helpers if k == "src")]
        )
        for f in sorted(_owner_modules(owner_scan)):
            hf.update(str(f.relative_to(PKG_ROOT)).encode())
            hf.update(f.read_bytes())
        out[name] = {"self": self_fp, "full": hf.hexdigest()}
    return out


def load_manifest() -> dict[str, dict[str, str]]:
    if MANIFEST_PATH.is_file():
        raw = json.loads(MANIFEST_PATH.read_text())
        # v1 compatibility: a bare string is a full hash with unknown self
        return {
            n: ({"full": v, "self": ""} if isinstance(v, str) else v)
            for n, v in raw.items()
        }
    return {}


def stale_queries() -> set[str]:
    """Queries whose shipped code differs from what their last driver
    row certified (full-fingerprint mismatch) or which were never
    certified (no manifest entry)."""
    manifest = load_manifest()
    return {
        n
        for n, fp in fingerprints().items()
        if manifest.get(n, {}).get("full") != fp["full"]
    }


def self_stale_queries() -> set[str]:
    """The urgent subset of :func:`stale_queries`: the query's OWN fn
    source or oracle SQL changed (or it was never certified at all) —
    not merely a shared owner module underneath it."""
    manifest = load_manifest()
    return {
        n
        for n, fp in fingerprints().items()
        if manifest.get(n, {}).get("self") != fp["self"]
    }


def certified_rounds() -> dict[str, int]:
    """Round number each query's manifest entry was stamped from (the
    ``_rN`` in the CORRECTNESS filename). Entries stamped before the
    field existed read as 0 — maximally old, first in line for a
    re-certification slot. Used by queries._export_order to rotate the
    FRESH band by evidence age: with more registered queries than
    window slots, the rows whose green evidence is oldest re-certify
    first, so no query's evidence trails by more than one skipped
    round (VERDICT r11 item 3's 'fully-fresh base' made mechanical
    instead of relying on static-tier luck)."""
    return {n: int(e.get("round", 0)) for n, e in load_manifest().items()}


def stamp_from_correctness(correctness_path: str) -> list[str]:
    """Stamp current fingerprints for every query the given driver
    CORRECTNESS_r*.json certified triple-green. Returns the stamped
    names.

    MUST run at ROUND START, before any code edits: the driver ran on
    the previous round's final commit, so the current fingerprints are
    exactly the fingerprints of the certified code. (Stamping at ship
    time instead is unsound — the driver certifies the first 50 of the
    POST-stamp export order, and stamping changes that order, so the
    stamped set and the certified set would diverge; there is no
    fixpoint once the registry outgrows the window.) Red or missing
    rows are never stamped.

    ``hash_match`` must be literally True: every registered query ships
    an oracle SQL string, so the driver always performs full value-hash
    verification — a row with a missing/None hash_match means the
    verification did not run and is NOT certification evidence (a
    rows-only row would previously have been stamped as if fully
    certified)."""
    rows = json.loads(Path(correctness_path).read_text())
    green = {
        n
        for n, r in rows.items()
        if isinstance(r, dict)
        and r.get("rows_match") and r.get("schema_match")
        and r.get("hash_match") is True
        and not r.get("err")
    }
    # evidence age for fresh-band rotation: parse the round from the
    # driver filename (CORRECTNESS_r11.json -> 11); an unrecognized
    # name stamps round 0 (sorts maximally old — safe direction)
    m = re.search(r"_r(\d+)", Path(correctness_path).name)
    rnd = int(m.group(1)) if m else 0
    manifest = load_manifest()
    fps = fingerprints()
    stamped = sorted(green & set(fps))
    for name in stamped:
        manifest[name] = {**fps[name], "round": rnd}
    MANIFEST_PATH.write_text(
        json.dumps(dict(sorted(manifest.items())), indent=1) + "\n"
    )
    return stamped


def _reset_cache() -> None:
    """Test hook: drop memoized state after manifest/file edits."""
    fingerprints.cache_clear()
    _import_graph.cache_clear()
    _helper_sources.cache_clear()


if __name__ == "__main__":
    import sys

    cmd = sys.argv[1] if len(sys.argv) > 1 else "status"
    if cmd == "status":
        urgent = self_stale_queries()
        for n in sorted(stale_queries() | urgent):
            print(f"  {n}  {'SELF' if n in urgent else 'owner'}")
    elif cmd == "stamp":
        if len(sys.argv) < 3:
            raise SystemExit("usage: certify stamp CORRECTNESS_rN.json")
        stamped = stamp_from_correctness(sys.argv[2])
        print(f"stamped {len(stamped)} certified entries -> {MANIFEST_PATH}")
    else:
        raise SystemExit(f"unknown command {cmd!r} (status|stamp)")
