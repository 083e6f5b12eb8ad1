#!/usr/bin/env python
"""Function-level registry change tracking (r13 VERDICT item 2).

Every registry entry maps to a content hash of its IMPLEMENTATION:
the entry function's source, the source of every repo-internal
function/class it transitively references (module globals, in-body
``from .x import y`` imports, and ``module.attr`` calls), the repr of
module-level constants those bodies read, and the entry's oracle SQL.
The hash changes exactly when something that can change the entry's
answer changes — module-level tracking (what the r13 verdict had to
fall back on) flagged 115 entries as stale when most changed only in
sibling functions.

The universal loader layer (``gomysql2pg_spark.catalog`` +
``session``) sits in EVERY entry's closure, so including it would
re-stale all 202 entries on any catalog touch and make the 50-slot
driver window meaningless (exactly what module-level tracking did to
r13). It is excluded from per-entry closures and tracked as ONE
separate ``__infra__`` pseudo-entry instead: an infra change still
fails the pytest gate until explicitly refreshed, and its correctness
is covered every round by the full local oracle sweep (all 202
entries) plus the dedicated loader tests — not by window slots.

The checked-in ``REGISTRY_HASHES.json`` records, per entry, the hash
its implementation had when it was last scheduled for driver
verification plus a status:

  fresh     hash unchanged since the entry's last driver-green round —
            FROZEN: re-verifying it would waste a window slot
            (r13 VERDICT item 7)
  planned   in the upcoming driver window (``__spark_entry__._PRIORITY``)
  queued    implementation changed but the 50-slot window is full —
            must lead the next round's window, oldest green row first
  rows_only no SQL oracle by design — never takes a window slot; gated
            by a driver-green deterministic twin (tests/
            test_oracle_parity.py mechanizes the twin invariant)

``tests/test_registry_hashes.py`` recomputes the hashes and FAILS when
an entry's implementation changed without a re-verify plan.

Modes:
  --dump             print {entry: hash} for the current tree; run with
                     PYTHONPATH=<historical worktree> to hash a round
                     snapshot (used by --stale-report)
  --stale-report     compare each entry's current hash against the
                     snapshot commit of its last driver-green round
                     (git worktree per round) and print what changed
  --derive-window N  print the ordered _PRIORITY list for round N:
                     stale entries oldest-green-row-first, then (if
                     slots remain) fresh entries with the oldest rows
  --update N         rewrite REGISTRY_HASHES.json for round N from the
                     current tree + current _PRIORITY + the
                     CORRECTNESS_r*.json history
"""

from __future__ import annotations

import ast
import glob
import hashlib
import importlib
import inspect
import json
import os
import re
import subprocess
import sys
import textwrap
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HASH_FILE = os.path.join(REPO, "REGISTRY_HASHES.json")
WINDOW = 50  # driver evaluates the first 50 _PRIORITY entries


# ---------------------------------------------------------------------------
# hashing
# ---------------------------------------------------------------------------


#: modules in EVERY entry's closure — hashed once as `__infra__`,
#: excluded from per-entry closures (see module docstring)
INFRA_MODULES = ("gomysql2pg_spark.catalog", "gomysql2pg_spark.session")


def _is_repo_obj(obj) -> bool:
    mod = getattr(obj, "__module__", "") or ""
    return mod.startswith("gomysql2pg_spark") or mod == "__spark_entry__"


def _is_infra(obj) -> bool:
    return getattr(obj, "__module__", "") in INFRA_MODULES


def _collect(fn, parts: dict[str, str]) -> None:
    """Transitively collect source/constant parts reachable from fn."""
    if not isinstance(fn, (types.FunctionType, type)):
        return
    key = f"{getattr(fn, '__module__', '?')}.{getattr(fn, '__qualname__', getattr(fn, '__name__', '?'))}"
    if key in parts:
        return
    try:
        src = textwrap.dedent(inspect.getsource(fn))
    except (TypeError, OSError):
        return
    parts[key] = src
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return
    g = getattr(fn, "__globals__", None)
    if g is None and isinstance(fn, type):
        g = vars(sys.modules.get(fn.__module__, None)) if fn.__module__ in sys.modules else {}
    g = g or {}
    mod_of_fn = getattr(fn, "__module__", "")

    def _take(name: str, obj, owner_mod: str) -> None:
        if isinstance(obj, (types.FunctionType, type)) and _is_repo_obj(obj):
            if _is_infra(obj):
                # referenced, but hashed under __infra__: the marker
                # keeps "entry stopped/started using an infra fn"
                # visible without pulling infra source into the hash
                parts.setdefault(
                    f"infraref:{obj.__module__}.{obj.__qualname__}", "<infra>"
                )
            else:
                _collect(obj, parts)
        elif isinstance(obj, (int, float, str, bytes, tuple, frozenset)):
            parts.setdefault(f"const:{owner_mod}.{name}", repr(obj))
        elif isinstance(obj, (list, dict, set)):
            # mutable module constants (STOPWORDS, SWEEP_MILLI,
            # BM25_QUERIES, ...) were silently dropped from the hash —
            # an entry could change answers via one of these without
            # ever going stale (r15 review finding). Only PLAIN-DATA
            # content is serialized: a runtime cache like
            # `_ID_FRAME_CACHE` holds live objects whose reprs carry
            # memory addresses and mutate mid-process (the pytest
            # suite populates it before the gate runs), so stateful
            # containers contribute a content-free marker instead —
            # "entry started/stopped referencing it" stays visible.
            # list/dict repr is deterministic (insertion order ==
            # source order); sets serialize sorted.
            def _plain(v):
                if isinstance(v, (int, float, str, bytes, bool,
                                  type(None))):
                    return True
                if isinstance(v, (list, tuple, set, frozenset)):
                    return all(_plain(x) for x in v)
                if isinstance(v, dict):
                    return all(
                        _plain(k) and _plain(x) for k, x in v.items()
                    )
                return False

            if name.startswith("_") or not _plain(obj):
                # leading underscore = private runtime state by repo
                # convention (_ID_FRAME_CACHE starts empty and is
                # populated mid-process, so even a plain-data check
                # can't make its content hash stable); every public
                # container constant (STOPWORDS, SWEEP_MILLI, ...) is
                # hashed by content
                ser = f"<stateful:{type(obj).__name__}>"
            elif isinstance(obj, set):
                ser = "{" + ", ".join(sorted(map(repr, obj))) + "}"
            else:
                ser = repr(obj)
            parts.setdefault(f"const:{owner_mod}.{name}", ser)

    names = sorted(
        {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}
    )
    for nm in names:
        if nm in g:
            _take(nm, g[nm], mod_of_fn)
    # module.attr references (e.g. `catalog.load_table`, `DD.q_...`)
    for node in ast.walk(tree):
        if isinstance(node, ast.Attribute) and isinstance(
            node.value, ast.Name
        ):
            base = g.get(node.value.id)
            if isinstance(base, types.ModuleType) and _is_repo_obj(base):
                _take(
                    node.attr,
                    getattr(base, node.attr, None),
                    base.__name__,
                )
    # in-body imports (`from .text import q_quality_score`)
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            modname = node.module or ""
            if node.level:
                pkg = mod_of_fn.rsplit(".", node.level)[0]
                modname = f"{pkg}.{modname}" if modname else pkg
            if not modname.startswith("gomysql2pg_spark"):
                continue
            try:
                m = importlib.import_module(modname)
            except ImportError:
                continue
            for alias in node.names:
                _take(alias.name, getattr(m, alias.name, None), modname)


_CURRENT_HASHES_CACHE: dict[str, str] | None = None


def current_hashes() -> dict[str, str]:
    # pure function of the on-disk tree, which does not change within
    # one invocation — memoized because --derive-window/--update used
    # to recompute it (plus the snapshot worktree dumps below) two to
    # three times per run (r15 review)
    global _CURRENT_HASHES_CACHE
    if _CURRENT_HASHES_CACHE is not None:
        return dict(_CURRENT_HASHES_CACHE)
    sys.path.insert(0, os.environ.get("REGISTRY_ROOT", REPO))
    import __spark_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    out = {}
    for name, fn in qs.items():
        parts: dict[str, str] = {}
        _collect(fn, parts)
        parts["oracle:" + name] = osql.get(name, "<rows-only>")
        blob = json.dumps(sorted(parts.items()), ensure_ascii=True)
        out[name] = hashlib.sha256(blob.encode()).hexdigest()[:16]
    # the loader layer, hashed once (full module sources incl. their
    # constants); a change here fails the pytest gate until --update
    # acknowledges it, and is verified by the full local sweep rather
    # than window slots
    infra_src = []
    for modname in INFRA_MODULES:
        try:
            m = importlib.import_module(modname)
            infra_src.append(inspect.getsource(m))
        except (ImportError, OSError):
            infra_src.append(f"<missing:{modname}>")
    out["__infra__"] = hashlib.sha256(
        "\n".join(infra_src).encode()
    ).hexdigest()[:16]
    _CURRENT_HASHES_CACHE = dict(out)
    return out


def rows_only_entries() -> set[str]:
    sys.path.insert(0, os.environ.get("REGISTRY_ROOT", REPO))
    import __spark_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    return {n for n in qs if n not in osql}


# ---------------------------------------------------------------------------
# driver-history + snapshot plumbing
# ---------------------------------------------------------------------------


def green_rounds() -> dict[str, int]:
    """entry -> latest round with an all-green driver row."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (OSError, ValueError):
            continue
        for name, v in data.items():
            if not isinstance(v, dict) or v.get("err"):
                continue
            if v.get("rows_match") and v.get("schema_match", True) and v.get(
                "hash_match", True
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def round_commit(rnd: int) -> str | None:
    out = subprocess.run(
        ["git", "log", "--format=%H %s", "--all"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if subject.startswith(f"round {rnd}: verdict"):
            return sha
    # equivalent evidence when the driver commit uses another subject:
    # the commit that ADDED the round's correctness record carries the
    # verified tree
    out = subprocess.run(
        [
            "git",
            "log",
            "--diff-filter=A",
            "--format=%H",
            "--all",
            "--",
            f"CORRECTNESS_r{rnd:02d}.json",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.strip()
    return out.splitlines()[-1] if out else None


_SNAPSHOT_DUMP_CACHE: dict[str, dict[str, str] | None] = {}


def snapshot_hashes(rnd: int, ref: str | None = None) -> dict[str, str] | None:
    """Hashes of the tree the round-`rnd` driver verified, via a
    detached worktree + a subprocess running THIS script's --dump.
    `ref` overrides the commit lookup (the HEAD fallback below).
    Dumps are memoized by commit sha: the dump is a pure function of
    the commit, and --derive-window/--update resolved the same round
    twice per run (r15 review)."""
    sha = ref or round_commit(rnd)
    if sha is None:
        return None
    if sha in _SNAPSHOT_DUMP_CACHE:
        return _SNAPSHOT_DUMP_CACHE[sha]
    wt = f"/tmp/registry_snap_{sha[:12]}"
    if not os.path.isdir(wt):
        r = subprocess.run(
            ["git", "worktree", "add", "--detach", wt, sha],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        if r.returncode != 0:
            print(f"# worktree r{rnd} failed: {r.stderr}", file=sys.stderr)
            return None
    env = dict(os.environ, REGISTRY_ROOT=wt, PYTHONPATH=wt)
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--dump"],
        cwd=wt,
        env=env,
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        print(f"# dump r{rnd} failed: {r.stderr[-500:]}", file=sys.stderr)
        return None
    out = json.loads(r.stdout)
    _SNAPSHOT_DUMP_CACHE[sha] = out
    return out


def resolve_snapshot(
    rnd: int, latest_rnd: int
) -> tuple[dict[str, str] | None, str]:
    """The tree the round-``rnd`` driver verified, resolved in order:
    (1) the commit that carries the round's results (the driver's
    'round N: verdict' snapshot commit, or failing that the commit
    that ADDED CORRECTNESS_r{N}.json); (2) for the LATEST correctness
    round ONLY, the HEAD tree — the driver verifies a committed tree,
    so between its run and its snapshot commit HEAD is the verified
    state, and builder edits made since (the working tree's diff from
    HEAD) are correctly reported STALE rather than compared against
    themselves (a raw working-tree fallback would make every
    post-verify edit invisible — the r12 post-window-gap failure
    mode); (3) None → conservatively stale. Returns
    (hashes | None, source_label)."""
    snap = snapshot_hashes(rnd)
    if snap is not None:
        return snap, f"r{rnd} snapshot commit"
    if rnd == latest_rnd:
        # anchor to the last commit at or before the driver wrote the
        # round's correctness record, NOT bare HEAD: the driver
        # verified the tree as of its run, and builder commits made
        # AFTER the run would otherwise be self-compared and reported
        # fresh without a driver row (r15 review finding — the
        # committed-edit variant of the r12 post-window gap). mtimes
        # reset on clone/checkout, where the anchor degrades to HEAD
        # (every commit predates the clone) — today's behavior.
        # Anchor resolution (r16 ADVICE): the first resolution is
        # PINNED to a sidecar (.anchors/rNN.sha) and preferred ever
        # after, so the anchor cannot drift as later commits land
        # with non-monotone commit dates (rebases, cherry-picks,
        # clock skew). The initial pick is a POSITIONAL first-parent
        # scan — the newest-position commit whose committer time is
        # at or before the record's mtime — rather than
        # `rev-list --before` date filtering, so an older-dated
        # commit deeper in history can never shadow a newer one.
        # Residual limit (documented, not fixable from this side):
        # a post-verify commit deliberately stamped with an old
        # committer date is indistinguishable by dates alone; only
        # the driver recording the verified sha inside the record
        # itself would close that, and this sidecar pins the best
        # available answer at first observation. Fresh clones are
        # unaffected: a cloned record always has an ADDING commit,
        # so resolution path (1) wins before this heuristic runs.
        ref = "HEAD"
        cpath = os.path.join(REPO, f"CORRECTNESS_r{rnd:02d}.json")
        if os.path.exists(cpath):
            spath = os.path.join(REPO, ".anchors", f"r{rnd:02d}.sha")
            mtime = int(os.stat(cpath).st_mtime)
            anchored = ""
            if os.path.exists(spath):
                # sidecar line: "<sha> <record-mtime-at-pin-time>".
                # The pin is only valid for the record it was derived
                # from — a driver RE-verification of the same round
                # rewrites CORRECTNESS_r{N}.json with a newer mtime,
                # and serving the stale pin would hash-compare the
                # newly verified entries against the old tree and
                # report them stale (r16 review). A bare legacy sha
                # (no mtime field) is treated as stale for the same
                # reason: its provenance is unknown.
                with open(spath) as fh:
                    parts = fh.read().strip().split()
                if (
                    len(parts) == 2
                    and parts[1].isdigit()
                    and int(parts[1]) >= mtime
                ):
                    anchored = parts[0]
            if not anchored:
                log = subprocess.run(
                    [
                        "git",
                        "log",
                        "--first-parent",
                        "--format=%H %ct",
                        "HEAD",
                    ],
                    cwd=REPO,
                    capture_output=True,
                    text=True,
                ).stdout
                for line in log.splitlines():
                    sha, _, ct = line.partition(" ")
                    if ct.strip().isdigit() and int(ct) <= mtime:
                        anchored = sha
                        break
                if anchored:
                    try:
                        os.makedirs(
                            os.path.join(REPO, ".anchors"), exist_ok=True
                        )
                        with open(spath, "w") as fh:
                            fh.write(f"{anchored} {mtime}\n")
                    except OSError:
                        pass  # read-only tree: resolve, don't pin
            if anchored:
                ref = anchored
        head = subprocess.run(
            ["git", "rev-parse", ref],
            cwd=REPO,
            capture_output=True,
            text=True,
        ).stdout.strip()
        if head:
            snap = snapshot_hashes(rnd, ref=head)
            if snap is not None:
                return snap, (
                    f"HEAD-lineage tree at the r{rnd} correctness-record "
                    f"time (r{rnd} snapshot not yet committed)"
                )
    return None, f"r{rnd} snapshot unavailable"


def stale_report() -> dict[str, dict]:
    """entry -> {round, stale, reason} against each entry's own last
    driver-green snapshot."""
    cur = current_hashes()
    rounds = green_rounds()
    latest_rnd = max(rounds.values(), default=0)
    rows_only = rows_only_entries()
    snaps: dict[int, tuple[dict[str, str] | None, str]] = {}
    report: dict[str, dict] = {}
    for name in sorted(cur):
        if name == "__infra__":
            continue
        if name in rows_only:
            report[name] = {
                "round": rounds.get(name, 0),
                "stale": False,
                "rows_only": True,
                "reason": "rows-only by design (twin-gated, no slot)",
            }
            continue
        rnd = rounds.get(name, 0)
        if rnd == 0:
            report[name] = {
                "round": 0,
                "stale": True,
                "reason": "never driver-verified",
            }
            continue
        if rnd not in snaps:
            snaps[rnd] = resolve_snapshot(rnd, latest_rnd)
        snap, src = snaps[rnd]
        if snap is None:
            report[name] = {
                "round": rnd,
                "stale": True,
                "reason": src,
            }
        elif name not in snap:
            report[name] = {
                "round": rnd,
                "stale": True,
                "reason": f"entry missing from r{rnd} snapshot",
            }
        else:
            stale = snap[name] != cur[name]
            report[name] = {
                "round": rnd,
                "stale": stale,
                "reason": "implementation changed since green row"
                if stale
                else "unchanged since green row",
            }
    return report


def derive_window(report: dict[str, dict]) -> list[str]:
    """Ordered driver window: (1) entries changed in THIS build —
    stale even against the latest round snapshot — lead, so the next
    driver row covers the newest code and the r12 post-window-gap
    failure mode can't recur; (2) remaining stale oracled entries,
    oldest green row first; (3) only if slots remain, fresh entries
    with the oldest rows. Rows-only entries never take a slot (the
    freeze rule, r13 VERDICT item 7)."""
    cur = current_hashes()
    latest_round = max(
        (v["round"] for v in report.values() if v["round"]), default=0
    )
    latest_snap = resolve_snapshot(latest_round, latest_round)[0] or {}
    slotted = {
        n: v for n, v in report.items() if not v.get("rows_only")
    }

    def changed_this_build(n: str) -> bool:
        return n in latest_snap and latest_snap[n] != cur.get(n)

    stale = sorted(
        (n for n, v in slotted.items() if v["stale"]),
        key=lambda n: (not changed_this_build(n), report[n]["round"], n),
    )
    fresh = sorted(
        (n for n, v in slotted.items() if not v["stale"]),
        key=lambda n: (report[n]["round"], n),
    )
    return (stale + fresh)[:WINDOW]


def main() -> int:
    argv = sys.argv[1:]
    if "--dump" in argv:
        print(json.dumps(current_hashes(), indent=0, sort_keys=True))
        return 0
    if "--stale-report" in argv:
        rep = stale_report()
        for n, v in sorted(rep.items(), key=lambda kv: (kv[1]["round"], kv[0])):
            flag = "STALE" if v["stale"] else "fresh"
            print(f"{flag}  r{v['round']:02d}  {n}  ({v['reason']})")
        n_stale = sum(v["stale"] for v in rep.values())
        print(f"# {n_stale} stale / {len(rep)} entries")
        return 0
    if "--derive-window" in argv:
        rep = stale_report()
        win = derive_window(rep)
        print(json.dumps(win, indent=1))
        return 0
    if "--update" in argv:
        rnd = int(argv[argv.index("--update") + 1])
        cur = current_hashes()
        rounds = green_rounds()
        import __spark_entry__ as entry

        planned = set(entry._PRIORITY[:WINDOW])
        rep = stale_report()
        out = {"generated_for_round": rnd, "entries": {}}
        for name in sorted(cur):
            if name == "__infra__":
                out["entries"][name] = {"hash": cur[name], "status": "infra"}
                continue
            if rep[name].get("rows_only"):
                status = "rows_only"
            elif name in planned:
                status = "planned"
            elif rep[name]["stale"]:
                status = "queued"
            else:
                status = "fresh"
            out["entries"][name] = {
                "hash": cur[name],
                "verified_round": rounds.get(name, 0),
                "status": status,
            }
        with open(HASH_FILE, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
            fh.write("\n")
        n_q = sum(
            1 for v in out["entries"].values() if v["status"] == "queued"
        )
        print(
            f"wrote {HASH_FILE}: {len(cur)} entries, "
            f"{len(planned)} planned, {n_q} queued"
        )
        return 0
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
