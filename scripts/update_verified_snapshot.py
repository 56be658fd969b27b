"""Regenerate duckdb_data_eng_proj_spark/queries/verified_snapshot.json.

The snapshot maps query id -> impl hash (function source + oracle text)
as of the code the driver verified green. ``__spark_entry__.queries()``
treats a green CORRECTNESS row as STALE when the id's current hash
differs from (or is missing in) the snapshot, so the id re-enqueues
ahead of already-verified work on the next driver run.

Run this at ROUND START, before editing any operator, so the recorded
hashes describe exactly the code the previous driver run executed:

    python scripts/update_verified_snapshot.py [--drop QID ...]

``--drop`` excludes ids whose green rows are known-stale despite the
current tree (e.g. an operator rewritten after its last green row but
before this script ever ran — VERDICT r3 flagged ext_dedup_exact and
sim_ann_ivf_search exactly so).

``--rebless-context-only`` is the SAFE alternative to ``--force``
(ADVICE r7): alongside the full snapshot the script records each id's
CORE hash (fn source + oracle text only, no module context / dep
digest). In this mode an id is re-blessed iff its current core hash
equals the recorded one — i.e. the edits since the last driver run
provably did not touch that id's own implementation or oracle — and
every id whose core DID change is left un-blessed and reported, with
no hand-curated --drop list to get wrong.
"""

from __future__ import annotations

import argparse
import hashlib
import inspect
import json
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

import __spark_entry__ as entrymod  # noqa: E402
from duckdb_data_eng_proj_spark.queries import REGISTRY  # noqa: E402


_CORE_SNAPSHOT_PATH = entrymod._SNAPSHOT_PATH.replace(
    "verified_snapshot.json", "verified_snapshot_core.json"
)


# Bumped whenever the core-hash definition changes: a recorded core
# snapshot from an older definition CANNOT be compared against hashes
# from a newer one, so --rebless-context-only refuses until the file
# is reseeded at a clean round start (ADVICE r8: v2 folds transitive
# repo-helper sources into the core, closing the wrapper-fn loophole;
# ADVICE r9: v3 adds list/dict/set module constants — sets via sorted
# repr, raw set repr follows hash randomization — and dotted
# ``mod.helper`` references whose base is a repo-package module;
# round 11: v4 makes constant folding DETERMINISTIC — v3 folded
# containers via raw repr(), and REGISTRY (reached through
# register()'s own source) holds QuerySpec objects whose default
# reprs embed 0x memory addresses, so every id's v3 hash was
# process-random and --rebless-context-only refused the whole
# registry every time it was actually tried. v4 folds literal-leaved
# containers by canonical repr, callable leaves by qualified name
# PLUS transitive source (dispatch-dict routing and implementation
# changes both still invalidate), and object-leaved state like
# REGISTRY as an opaque type token only — decoration-populated
# registries are state, not behavior config, and folding their
# contents made every unrelated id's hash change whenever any op
# was registered).
_CORE_VERSION = 4
_PKG = "duckdb_data_eng_proj_spark"


def _referenced_objects(fn):
    """(name, object) pairs a function's source references: module
    globals reached by bare Name, in-body ``from pkg.mod import x``
    targets (wrapper fns import their real implementation this way),
    and dotted ``mod.helper`` chains whose base resolves to a
    repo-package module (ADVICE r9: attribute-style references were
    invisible to the core hash, so behavior routed through them was
    still re-blessable)."""
    import ast
    import importlib
    import textwrap
    import types

    try:
        src = textwrap.dedent(inspect.getsource(fn))
        tree = ast.parse(src)
    except (OSError, TypeError, SyntaxError):
        return []
    mod = sys.modules.get(fn.__module__)
    names: set = set()
    chains: set = set()
    imports: dict = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute):
            attrs = []
            cur = node
            while isinstance(cur, ast.Attribute):
                attrs.append(cur.attr)
                cur = cur.value
            if isinstance(cur, ast.Name):
                chains.add((cur.id, tuple(reversed(attrs))))
        elif isinstance(node, ast.ImportFrom) and node.module:
            for alias in node.names:
                imports[alias.asname or alias.name] = (node.module, alias.name)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                imports[alias.asname or alias.name] = (alias.name, None)
                if alias.asname is None and "." in alias.name:
                    # ``import pkg.sub.mod`` binds ``pkg``, not the
                    # dotted path — key the binding name too, else
                    # attribute chains rooted at ``pkg`` bypass the
                    # imports table and the referenced object can stay
                    # out of the core hash (ADVICE r10: the same
                    # loophole class v3 closed for dotted references).
                    base = alias.name.split(".")[0]
                    imports.setdefault(base, (base, None))

    def _resolve_base(name):
        if name in imports:
            m, attr = imports[name]
            if m == _PKG or m.startswith(_PKG + "."):
                try:
                    imported = importlib.import_module(m)
                except ImportError:
                    return None
                return imported if attr is None else getattr(imported, attr, None)
            return None
        if mod is not None and hasattr(mod, name):
            return getattr(mod, name)
        return None

    objs = []
    for name in sorted(names):
        obj = _resolve_base(name)
        if obj is not None:
            objs.append((name, obj))
    for base, attrs in sorted(chains):
        obj = _resolve_base(base)
        if not isinstance(obj, types.ModuleType):
            continue
        modname = getattr(obj, "__name__", "") or ""
        if modname != _PKG and not modname.startswith(_PKG + "."):
            continue
        for attr in attrs:
            obj = getattr(obj, attr, None)
            if obj is None:
                break
        if obj is not None:
            objs.append((".".join((base,) + attrs), obj))
    return objs


_PLAIN_SCALARS = (int, float, str, bytes, bool, type(None))


def _const_fold(obj, out_callables: list) -> str:
    """Canonical, process-stable token for a module-level constant.

    Literal scalars/containers fold by value (sets sorted — raw set
    repr follows hash randomization). Function/class leaves fold by
    qualified name and are APPENDED to ``out_callables`` so the caller
    folds their transitive source too: both re-routing a dispatch dict
    to a different callable and editing the routed callable's body
    invalidate the hash. Any other object (class instances — e.g. the
    QuerySpec values inside REGISTRY) marks the WHOLE container
    non-literal: it folds as a bare type token with no contents or
    length, because decoration-populated registries are mutable state
    whose default reprs embed 0x addresses (process-random) and whose
    contents grow with unrelated registrations — folding either way
    made --rebless-context-only refuse every id (round-11 v4 fix)."""
    if isinstance(obj, _PLAIN_SCALARS):
        return repr(obj)
    if inspect.isfunction(obj) or inspect.isclass(obj):
        out_callables.append(obj)
        return "<%s.%s>" % (
            getattr(obj, "__module__", "?"),
            getattr(obj, "__qualname__", "?"),
        )
    if isinstance(obj, (set, frozenset)):
        # Fold each element with its OWN callable list, sort by token,
        # then extend out_callables in that sorted order — appending
        # during raw set iteration would leave callable traversal
        # order process-random for sets containing repo callables
        # (ADVICE r11), the exact instability class v4 exists to fix.
        folded = []
        for x in obj:
            elem_callables: list = []
            folded.append((_const_fold(x, elem_callables), elem_callables))
        folded.sort(key=lambda t: t[0])
        for _token, elem_callables in folded:
            out_callables.extend(elem_callables)
        return "{" + ", ".join(t for t, _ in folded) + "}"
    if isinstance(obj, dict):
        return "{" + ", ".join(
            _const_fold(k, out_callables) + ": " + _const_fold(v, out_callables)
            for k, v in obj.items()
        ) + "}"
    if isinstance(obj, (list, tuple)):
        inner = ", ".join(_const_fold(x, out_callables) for x in obj)
        if isinstance(obj, list):
            return "[" + inner + "]"
        return "(" + inner + ("," if len(obj) == 1 else "") + ")"
    raise _NonLiteralConstant(type(obj).__name__)


class _NonLiteralConstant(Exception):
    """Raised by _const_fold on a non-literal leaf (class instance)."""


def _core_sources(fn, seen: set) -> list:
    """fn's source plus, transitively, the source of every repo-package
    function/class it references and the repr of every plain-value
    constant it references — the full behavior surface of the id
    (ADVICE r8: ts_ewma's recursion lives in _ewma_pdf, stream ids are
    3-line wrappers over streaming/ingest.py; fn-body-only hashing
    re-blessed ids whose actual implementation had changed)."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return [getattr(fn, "__qualname__", repr(fn))]
    parts = [src]
    for name, obj in _referenced_objects(fn):
        if inspect.isfunction(obj) or inspect.isclass(obj):
            modname = getattr(obj, "__module__", "") or ""
            if modname != _PKG and not modname.startswith(_PKG + "."):
                continue
            key = (modname, getattr(obj, "__qualname__", name))
            if key in seen:
                continue
            seen.add(key)
            parts.extend(_core_sources(obj, seen))
        elif isinstance(obj, (int, float, str, bytes, tuple, frozenset,
                              list, dict, set, bool, type(None))):
            # list/dict/set folded too (ADVICE r9), but via the v4
            # canonical fold: literal leaves by value, callable leaves
            # by qualified name + transitive source, object-leaved
            # state (REGISTRY) as an opaque type token.
            leaf_callables: list = []
            try:
                token = _const_fold(obj, leaf_callables)
            except _NonLiteralConstant:
                token = f"<non-literal {type(obj).__name__}>"
                leaf_callables = []
            parts.append(f"{name}={token}")
            for cal in leaf_callables:
                modname = getattr(cal, "__module__", "") or ""
                if modname != _PKG and not modname.startswith(_PKG + "."):
                    continue
                key = (modname, getattr(cal, "__qualname__", ""))
                if key in seen:
                    continue
                seen.add(key)
                parts.extend(_core_sources(cal, seen))
    return parts


def _core_hash(spec) -> str:
    """Hash of the id's full behavior surface — its own source, the
    transitive repo helpers it calls, the constants it reads, and the
    oracle text — the components ``--rebless-context-only`` may not
    change."""
    seen = {(spec.fn.__module__, getattr(spec.fn, "__qualname__", ""))}
    parts = _core_sources(spec.fn, seen)
    return hashlib.sha256(
        "\x00".join(parts + [spec.oracle or ""]).encode()
    ).hexdigest()


def _edited_since_last_driver_run() -> list:
    """Query-module files modified after the newest CORRECTNESS_r*.json.

    A green row only describes the code the driver actually ran. If a
    query module changed since that run, re-blessing its ids here would
    hide the change from the driver's re-verify queue (VERDICT r5 #2:
    six sink/warehouse ids escaped re-enqueue exactly this way).
    """
    import glob

    correctness = glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))
    if not correctness:
        return []
    last_run = max(os.path.getmtime(p) for p in correctness)
    pkg = os.path.join(_HERE, "duckdb_data_eng_proj_spark")
    edited = []
    for root, _dirs, files in os.walk(pkg):
        for name in files:
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            if os.path.getmtime(path) > last_run:
                edited.append(os.path.relpath(path, _HERE))
    return sorted(edited)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--drop", nargs="*", default=[], metavar="QID",
                    help="ids whose green rows predate the current code")
    ap.add_argument("--force", action="store_true",
                    help="regenerate even though query modules changed "
                         "since the last driver run (you must --drop every "
                         "id whose implementation those edits touched; "
                         "prefer --rebless-context-only, which needs no "
                         "drop list)")
    ap.add_argument("--rebless-context-only", action="store_true",
                    help="re-bless only ids whose fn-source+oracle core "
                         "hash matches the recorded core snapshot — safe "
                         "after context/helper-only edits; changed-core "
                         "ids stay un-blessed and are reported")
    args = ap.parse_args()

    edited = _edited_since_last_driver_run()
    if edited and not (args.force or args.rebless_context_only):
        print("REFUSING: these modules changed after the last driver run:",
              file=sys.stderr)
        for path in edited:
            print(f"  {path}", file=sys.stderr)
        print("Run at round start before editing, pass "
              "--rebless-context-only for a core-verified re-bless, or "
              "--force with --drop for every id those edits touched.",
              file=sys.stderr)
        sys.exit(1)

    green = entrymod._green_rows() - set(args.drop)

    refused: list = []
    if args.rebless_context_only:
        try:
            with open(_CORE_SNAPSHOT_PATH) as fh:
                recorded_core = json.load(fh)
        except (OSError, ValueError):
            print("REFUSING --rebless-context-only: no recorded core "
                  f"snapshot at {_CORE_SNAPSHOT_PATH} (run the script once "
                  "in normal mode at a clean round start to seed it).",
                  file=sys.stderr)
            sys.exit(1)
        if recorded_core.pop("__version__", 1) != _CORE_VERSION:
            print("REFUSING --rebless-context-only: the recorded core "
                  f"snapshot predates core-hash v{_CORE_VERSION} — its "
                  "hashes are not comparable. Reseed by running the "
                  "script in normal mode at a clean round start.",
                  file=sys.stderr)
            sys.exit(1)
        keep = set()
        for qid in green:
            if qid not in REGISTRY:
                continue
            if recorded_core.get(qid) == _core_hash(REGISTRY[qid]):
                keep.add(qid)
            else:
                refused.append(qid)
        green = keep

    snapshot = {
        qid: entrymod._impl_hash(REGISTRY[qid])
        for qid in sorted(green)
        if qid in REGISTRY
    }
    with open(entrymod._SNAPSHOT_PATH, "w") as fh:
        json.dump(snapshot, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # Record the matching core hashes so the next --rebless-context-only
    # can verify against exactly what was blessed here.
    core = {qid: _core_hash(REGISTRY[qid]) for qid in snapshot}
    core["__version__"] = _CORE_VERSION
    with open(_CORE_SNAPSHOT_PATH, "w") as fh:
        json.dump(core, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {len(snapshot)} entries -> {entrymod._SNAPSHOT_PATH}")
    dropped = sorted(set(args.drop))
    if dropped:
        print(f"dropped (forced re-verify): {', '.join(dropped)}")
    if refused:
        print("core changed, NOT re-blessed (will re-enqueue): "
              + ", ".join(sorted(refused)))


if __name__ == "__main__":
    main()
