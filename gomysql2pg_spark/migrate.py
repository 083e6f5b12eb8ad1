"""Migration orchestration (reference A17-A22, `cmd/root.go:60-213`).

The reference hand-builds: a semaphore-bounded goroutine pool, a failure
channel, per-category logs, and an ASCII summary. Spark's scheduler
replaces the per-page concurrency entirely (numPartitions caps source
connections); what remains is per-TABLE orchestration — a thread pool
submitting independent Spark jobs (FAIR-scheduler friendly), failure
accounting, and job-group based cancellation (A19).

No source/target database exists in the test environment; the pipeline
is exercised in tests with parquet-in → transform → parquet-out, which
runs the identical orchestration code path.
"""

from __future__ import annotations

import threading
import time
import traceback
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .functions.patterns import excluded_tables
from .validate import TableCompareResult, compare_tables


@dataclass
class MigrationConfig:
    """The example.yml surface (`example.yml:1-26`, viper load at
    `cmd/app.go:21-34`)."""

    page_size: int = 100_000
    max_parallel: int = 20  # table-level concurrency (root.go:107-109)
    exclude: list[str] = field(default_factory=list)
    tables: dict[str, str] = field(default_factory=dict)  # custom SQL map
    char_in_length: bool = False
    use_nvarchar2: bool = False
    distributed: bool = False


@dataclass
class TableResult:
    table: str
    rows: int = 0
    ok: bool = False
    error: str = ""
    seconds: float = 0.0


@dataclass
class MigrationReport:
    """Per-category (begin, end, failed, elapsed) summary
    (`root.go:166-209`, readme.md:116-135)."""

    results: list[TableResult] = field(default_factory=list)
    started: float = field(default_factory=time.time)
    finished: float = 0.0

    @property
    def failed(self) -> list[str]:
        return [r.table for r in self.results if not r.ok]

    def summary(self) -> dict:
        return {
            "tables_total": len(self.results),
            "tables_failed": len(self.failed),
            "failed": self.failed,
            "rows_total": sum(r.rows for r in self.results),
            "elapsed_sec": round(
                (self.finished or time.time()) - self.started, 3
            ),
            "per_table": {
                r.table: {
                    "rows": r.rows,
                    "ok": r.ok,
                    "sec": round(r.seconds, 3),
                    **({"error": r.error} if r.error else {}),
                }
                for r in self.results
            },
        }


class Migrator:
    """Bounded-parallel per-table pipeline driver.

    transform_fn: DataFrame -> DataFrame (the cell-transform layer)
    sink_fn: (DataFrame, table) -> None   (JDBC/COPY/parquet writer)
    """

    def __init__(
        self,
        spark: SparkSession,
        config: MigrationConfig,
        source_fn,
        sink_fn,
        transform_fn=None,
    ):
        self.spark = spark
        self.config = config
        self.source_fn = source_fn
        self.sink_fn = sink_fn
        self.transform_fn = transform_fn or (lambda df: df)
        self._cancel = threading.Event()

    def cancel(self):
        """A19: SIGINT-style cancellation — cancel the job group instead
        of killing source sessions (`cmd/app.go:186-216`)."""
        self._cancel.set()
        self.spark.sparkContext.cancelJobGroup("gomysql2pg-migrate")

    def _run_table(self, table: str) -> TableResult:
        t0 = time.time()
        res = TableResult(table=table)
        if self._cancel.is_set():
            res.error = "cancelled"
            return res
        try:
            self.spark.sparkContext.setJobGroup(
                "gomysql2pg-migrate", f"migrate {table}", True
            )
            df: DataFrame = self.source_fn(table)
            df = self.transform_fn(df)
            self.sink_fn(df, table)
            res.rows = df.count()
            res.ok = True
        except Exception as exc:  # failure accounting (A18/A21)
            res.error = f"{exc}\n{traceback.format_exc(limit=3)}"
        res.seconds = time.time() - t0
        return res

    def run(self, tables: list[str]) -> MigrationReport:
        report = MigrationReport()
        todo = excluded_tables(tables, self.config.exclude)
        with ThreadPoolExecutor(
            max_workers=self.config.max_parallel
        ) as pool:
            futures = {pool.submit(self._run_table, t): t for t in todo}
            for fut in as_completed(futures):
                report.results.append(fut.result())
        report.finished = time.time()
        report.results.sort(key=lambda r: r.table)
        return report

    def validate(
        self, tables: list[str], dst_fn
    ) -> list[TableCompareResult]:
        """compareDb phase (`cmd/compare.go:23-100`), fanned out on the
        same bounded pool, with content-hash upgrade."""
        def one(t: str) -> TableCompareResult:
            return compare_tables(self.source_fn(t), dst_fn(t), t)

        with ThreadPoolExecutor(
            max_workers=self.config.max_parallel
        ) as pool:
            return sorted(
                pool.map(one, excluded_tables(tables, self.config.exclude)),
                key=lambda r: r.table,
            )
