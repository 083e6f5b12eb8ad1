"""Round-17 operator tests: t-closeness release audit (batch 1)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as entry

    return entry.queries()


# ---------------------------------------------- t_closeness_report


def _py_t_milli_per_class(events):
    """Plain-Python recount of the per-class milli-TVD under the
    (day, value-bucket) QI with event_type sensitive — the exact
    cross-multiplied integer arithmetic the operator publishes."""
    from gomysql2pg_spark.operators.events import (
        K_ANON_DAY_US,
        K_ANON_VALUE_CENTS,
    )

    cells: dict = {}
    glob: dict = {}
    for ts_us, value, etype in events:
        day = ts_us // K_ANON_DAY_US
        vb = round(value * 100) // K_ANON_VALUE_CENTS
        cells[(day, vb, etype)] = cells.get((day, vb, etype), 0) + 1
        glob[etype] = glob.get(etype, 0) + 1
    n_tot = sum(glob.values())
    classes: dict = {}
    for (day, vb, etype), n in cells.items():
        classes.setdefault((day, vb), {})[etype] = n
    out = {}
    for qi, dist in classes.items():
        n_c = sum(dist.values())
        present = sum(
            abs(n * n_tot - glob[e] * n_c) for e, n in dist.items()
        )
        absent = n_c * (n_tot - sum(glob[e] for e in dist))
        out[qi] = (1000 * (present + absent)) // (2 * n_c * n_tot)
    return out, n_tot


def test_t_closeness_bands_partition_event_log(spark, sf_dir, queries, duck):
    """Band record counts must partition the event log; t is bounded
    [0, 1000]; shares are the exact truncating milli-division."""
    rows = queries["t_closeness_report"](spark, sf_dir).collect()
    assert rows
    n_events = duck.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert sum(r["n_records"] for r in rows) == n_events
    for r in rows:
        assert 0 <= r["t_lo"] <= r["t_hi"] <= 1000
        assert r["records_milli"] == r["n_records"] * 1000 // n_events


def test_t_closeness_matches_python_model(spark, sf_dir, queries, duck):
    """Every band's class count and record mass must equal a plain-
    Python recount of the TVD formula over the fixture."""
    from gomysql2pg_spark.operators.events import T_CLOSE_BANDS

    events = duck.execute(
        "SELECT epoch_us(ts), value, event_type FROM events"
    ).fetchall()
    t_by_class, _ = _py_t_milli_per_class(events)
    cells: dict = {}
    for ts_us, value, etype in events:
        from gomysql2pg_spark.operators.events import (
            K_ANON_DAY_US,
            K_ANON_VALUE_CENTS,
        )

        day = ts_us // K_ANON_DAY_US
        vb = round(value * 100) // K_ANON_VALUE_CENTS
        cells[(day, vb)] = cells.get((day, vb), 0) + 1
    want: dict = {}
    for qi, t in t_by_class.items():
        band = next(
            (lo, hi) for lo, hi in T_CLOSE_BANDS if lo <= t <= hi
        )
        n_cls, n_rec = want.get(band, (0, 0))
        want[band] = (n_cls + 1, n_rec + cells[qi])
    got = {
        (r["t_lo"], r["t_hi"]): (r["n_classes"], r["n_records"])
        for r in queries["t_closeness_report"](spark, sf_dir).collect()
    }
    assert got == want
    assert want, "fixture produced no QI classes — vacuous test"
