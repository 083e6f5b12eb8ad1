"""Gate: registry code may not change without a re-verify plan.

`REGISTRY_HASHES.json` (written by `scripts/registry_hashes.py
--update N`) records the function-level implementation hash every
registry entry had when it was last scheduled for driver
verification. This test recomputes the hashes from the live tree and
FAILS when an entry's implementation (its function, the repo helpers
it transitively calls, the constants it reads, or its oracle SQL)
drifted from the recorded state — the mechanization the r13 VERDICT
asked for after hand-curated `_PRIORITY` lists let the r08 rotation
slip. The fix for a legitimate change is one command:

    python scripts/registry_hashes.py --update <round>

which re-stamps the hashes and re-derives the planned/queued split.
"""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HASH_FILE = os.path.join(REPO, "REGISTRY_HASHES.json")


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "registry_hashes",
        os.path.join(REPO, "scripts", "registry_hashes.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def state():
    assert os.path.exists(HASH_FILE), (
        "REGISTRY_HASHES.json missing — run "
        "scripts/registry_hashes.py --update <round>"
    )
    stored = json.load(open(HASH_FILE))["entries"]
    mod = _load_script()
    current = mod.current_hashes()
    import __spark_entry__ as entry

    return stored, current, entry


def test_every_registry_entry_is_tracked(state):
    stored, current, _ = state
    assert set(stored) == set(current), (
        "registry/hash-file drift — re-run --update: "
        f"missing={sorted(set(current) - set(stored))} "
        f"orphaned={sorted(set(stored) - set(current))}"
    )


def test_no_entry_changed_without_a_reverify_plan(state):
    stored, current, _ = state
    drifted = [
        n
        for n, v in stored.items()
        if v["hash"] != current.get(n)
    ]
    assert not drifted, (
        "implementation changed since REGISTRY_HASHES.json was "
        f"stamped, with no re-verify plan: {sorted(drifted)} — run "
        "scripts/registry_hashes.py --update <round> and make sure "
        "changed entries are in __spark_entry__._PRIORITY"
    )


def test_planned_set_matches_the_driver_window(state):
    stored, _, entry = state
    window = entry._PRIORITY[: _load_script().WINDOW]
    assert len(set(entry._PRIORITY)) == len(entry._PRIORITY), "dup names"
    planned = {n for n, v in stored.items() if v["status"] == "planned"}
    assert planned == set(window), (
        f"_PRIORITY window and 'planned' statuses disagree: "
        f"only-planned={sorted(planned - set(window))} "
        f"only-window={sorted(set(window) - planned)}"
    )


def test_rows_only_entries_never_take_window_slots(state):
    stored, _, entry = state
    mod = _load_script()
    rows_only = mod.rows_only_entries()
    assert rows_only == {
        n for n, v in stored.items() if v["status"] == "rows_only"
    }
    assert not rows_only & set(entry._PRIORITY), (
        "rows-only entries are twin-gated and must not burn driver "
        "window slots"
    )


def test_statuses_are_known(state):
    stored, _, _ = state
    allowed = {"fresh", "planned", "queued", "rows_only", "infra"}
    bad = {n: v["status"] for n, v in stored.items()
           if v["status"] not in allowed}
    assert not bad, bad


def test_snapshot_resolution_order():
    """resolve_snapshot's documented order: (1) the round's snapshot
    commit when it exists; (2) for the latest correctness round only
    (mid-round, right after a driver run and before the driver's
    snapshot commit — the r14 'snapshot unavailable' noise), the
    HEAD-LINEAGE commit anchored at the correctness record's mtime —
    not the working tree, and not bare HEAD, so post-verify edits are
    reported stale whether uncommitted OR committed (r15 review)
    instead of compared against themselves; (3) None for an older
    round with no commit."""
    mod = _load_script()
    cur = {"some_entry": "abc123"}

    real = mod.snapshot_hashes
    try:
        # (1) a commit exists → the worktree dump wins regardless of
        # round; no ref is passed
        def snap_commit(rnd, ref=None):
            assert ref is None
            return {"some_entry": "fromsnap"}

        mod.snapshot_hashes = snap_commit
        snap, src = mod.resolve_snapshot(7, 9)
        assert snap == {"some_entry": "fromsnap"} and "commit" in src

        # (2) no commit + latest round → the HEAD tree via an explicit
        # ref (NEVER the raw current hashes — self-comparison would
        # hide every post-verify edit)
        calls = []

        def snap_head(rnd, ref=None):
            calls.append(ref)
            return None if ref is None else {"some_entry": "fromhead"}

        mod.snapshot_hashes = snap_head
        snap, src = mod.resolve_snapshot(9, 9)
        assert snap == {"some_entry": "fromhead"} and "HEAD" in src
        assert snap != cur and any(r for r in calls if r)

        # (3) no commit + older round → unavailable (conservative)
        mod.snapshot_hashes = lambda rnd, ref=None: None
        snap, src = mod.resolve_snapshot(7, 9)
        assert snap is None and "unavailable" in src
    finally:
        mod.snapshot_hashes = real


def test_constant_hashing_covers_containers_not_runtime_state():
    """r15 review closure: (a) a PUBLIC container constant
    (STOPWORDS-class list/dict/set) is part of the entry hashes — an
    edit must drift them; (b) PRIVATE runtime state (_ID_FRAME_CACHE,
    populated mid-process by the ANN tests that run before this gate)
    must NOT drift any hash, or this very gate false-fails whenever
    the suite ordering warms a cache."""
    mod = _load_script()
    mod._CURRENT_HASHES_CACHE = None
    before = mod.current_hashes()

    import gomysql2pg_spark.operators.similarity as SIM

    SIM._ID_FRAME_CACHE["__gate_probe__"] = ("x", object())
    try:
        mod._CURRENT_HASHES_CACHE = None
        after = mod.current_hashes()
    finally:
        SIM._ID_FRAME_CACHE.pop("__gate_probe__", None)
    assert before == after, [
        k for k in before if before[k] != after.get(k)
    ]

    import gomysql2pg_spark.operators.text as T

    T.STOPWORDS.append("__gate_probe__")
    try:
        mod._CURRENT_HASHES_CACHE = None
        mutated = mod.current_hashes()
    finally:
        T.STOPWORDS.remove("__gate_probe__")
        mod._CURRENT_HASHES_CACHE = None
    drifted = [k for k in before if before[k] != mutated.get(k)]
    assert drifted, "a STOPWORDS edit must mark its readers stale"
