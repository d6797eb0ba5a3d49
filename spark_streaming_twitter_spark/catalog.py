"""Batch catalog over the driver fixture tables (TESTDATA.md).

``spark.read.parquet`` gives columnar scans with predicate pushdown and
column pruning for free — the reference's row-oriented POJO path
(Tweet.java:10-21 + Jackson parse) defeats both (SURVEY.md §4).
"""

from __future__ import annotations

import hashlib
import tempfile
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Session-scoped RELATION cache (r15, guide §6 file-listing costs): each
# spark.read.parquet call re-lists the path and re-reads the footer schema
# (~100 ms of driver time), and most queries open the same fixture table
# 1-3 times; with 70+ bench entries x 3 runs that is pure replanning
# overhead. The cache holds the lazy DataFrame RELATION only — no rows, no
# persist, nothing computed — so every action still reads the parquet
# bytes fresh; the key carries the session identity (id(spark), not just
# applicationId: sibling sessions from spark.newSession() share an appId
# but must not share relations bound to another session — ADVICE r15)
# plus the file's (size, mtime_ns), so a regenerated fixture or a new
# session gets a new relation (the _STAGED_CACHE keying convention
# applied to scans).
_RELATION_CACHE: dict[tuple, DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # Set the nanos conf BEFORE the cache lookup (ADVICE r15): a
        # session that gets a cache hit must still carry the conf in its
        # own scope, or a later uncached read in that session would
        # reject the TIMESTAMP(NANOS) column.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        st = Path(path).stat()
        key = (
            spark.sparkContext.applicationId,
            id(spark),
            path,
            st.st_size,
            st.st_mtime_ns,
        )
    except OSError:
        key = None
    if key is not None:
        hit = _RELATION_CACHE.get(key)
        if hit is not None:
            return hit
    if name == "events":
        # The driver fixture's events.ts is parquet TIMESTAMP(NANOS), which
        # Spark's vectorized reader rejects. Read nanos as INT64 (runtime
        # conf, set above), then convert to a proper TimestampType with
        # integer division (ts DIV 1000 → micros; float division would lose
        # precision above 2^53 ns). Re-written copies (tools/scale_probe.py)
        # carry a real TIMESTAMP already — convert only when ts reads back
        # as a long.
        raw = spark.read.parquet(path)
        if dict(raw.dtypes)["ts"] == "bigint":
            raw = raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    else:
        raw = spark.read.parquet(path)
    if key is not None:
        if len(_RELATION_CACHE) >= 64:  # bound growth across sessions
            _RELATION_CACHE.pop(next(iter(_RELATION_CACHE)))
        _RELATION_CACHE[key] = raw
    return raw


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def widen(df: DataFrame, spark: SparkSession, *cols: str) -> DataFrame:
    """Repartition a narrow scan up to cluster parallelism, adaptively.

    The fixture tables are single parquet files with one row group, so a
    scan is ONE task and any compute-heavy pipeline above it (shingle
    explode, regex tokenize, vector math) runs on one core. When the
    scan's actual SPLIT count (physical partitions — row-group splits
    included, so a few huge multi-row-group files still count as wide)
    is below the session's parallelism, insert a repartition so the heavy
    stage runs wide; when the input already has enough splits (any
    production-scale table), this is a no-op — no gratuitous shuffle of
    100 TB of text. File COUNT would be the wrong proxy: 32 multi-TB
    files on a 1000-core cluster are already hundreds of splits.

    Pass key ``cols`` to hash-partition instead of round-robin: a
    downstream groupBy on those keys then reuses the partitioning (no
    second shuffle — measured 1.4x on the simhash wide agg). Same no-op
    guard, so at scale the aggregate's own shuffle (which moves only
    partial-agg rows, not text) remains the plan.

    r15: the split-count probe (``df.rdd.getNumPartitions()``) costs
    ~55 ms of driver-side physical planning per call and returns the
    same answer for the same analyzed plan in the same session, so it
    is memoized on (applicationId, semanticHash). A hash collision
    could only skip/add a repartition — a performance choice, never a
    correctness one.
    """
    target = spark.sparkContext.defaultParallelism
    key = (spark.sparkContext.applicationId, df.semanticHash())
    n = _SPLITS_CACHE.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        if len(_SPLITS_CACHE) >= 512:
            _SPLITS_CACHE.pop(next(iter(_SPLITS_CACHE)))
        _SPLITS_CACHE[key] = n
    if n >= target:
        return df
    if cols:
        return df.repartition(target, *[F.col(c) for c in cols])
    return df.repartition(target)


_SPLITS_CACHE: dict[tuple, int] = {}


# Scoped STAGING persists (VERDICT r15 #3). Intra-query staging tables —
# prepared ANN vectors, tokenized arrays, candidate shingles — persist so
# ONE query evaluation computes them once instead of once per consumer.
# But Spark's CacheManager keys cached relations by canonical plan and
# holds them until an explicit unpersist or session stop (the
# ContextCleaner does NOT free them when the returned plan dies), so a
# bare .persist() with no unpersist lets the SAME entry serve bench
# reruns and sibling queries — the bench would then price warm staging,
# not the query. Every staging persist registers here, and bench.py
# releases the registry between timed runs: each run pays its own
# staging build, first touch inside the timed region.
_STAGED_PERSISTS: list[DataFrame] = []


def stage(df: DataFrame) -> DataFrame:
    """Persist an intra-query staging relation, registered for scoped
    release (``release_staged``). Use for relations a single query reads
    more than once; never for cross-run result caching."""
    df = df.persist()
    _STAGED_PERSISTS.append(df)
    return df


def release_staged() -> None:
    """Unpersist every registered staging relation (bench.py calls this
    between timed runs so no staging cache survives into the next run)."""
    while _STAGED_PERSISTS:
        df = _STAGED_PERSISTS.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # a stopped session's entries are already gone


def _fixture_fingerprint(sf_dir: str) -> str:
    """Cheap content fingerprint of a fixture dir: names + sizes + mtimes."""
    parts = []
    root = Path(sf_dir)
    if root.exists():
        for p in sorted(root.rglob("*.parquet")):
            st = p.stat()
            parts.append(f"{p.name}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def spool_fixture(
    key: str, sf_dir: str, version: str, writer: Callable[[Path], None]
) -> Path:
    """Write-once spool dir for file-source fixtures, shared across queries.

    Queries that need data on disk (streaming text spools, CSV/JSONL
    round-trips) derive deterministically from the fixture parquet, so the
    spool is written ONCE per (key, sf_dir, version, fixture-content) and
    reused by every later call in the same round — the driver's correctness
    gate and bench.py's repeat runs then pay the write exactly once.
    ``version`` names the payload-construction recipe; bump it when the
    writer changes. The tag also folds in a fingerprint of the fixture
    parquet (sizes + mtimes), so regenerating the fixture in place gets a
    FRESH spool instead of serving stale data against a new oracle.

    Concurrency: each would-be writer builds into its OWN temp dir, then
    atomically renames it to the tagged path; exactly one rename wins, the
    losers delete their build and read the winner's. No lock file, no
    done-marker wait — a writer hard-killed mid-build (SIGKILL/OOM) leaves
    only an orphaned temp dir that never blocks anyone (the next caller
    just builds again), where the previous lock+marker scheme blocked
    every later caller until /tmp was cleaned by hand.
    """
    import os
    import shutil

    tag = hashlib.md5(
        f"{key}:{version}:{sf_dir}:{_fixture_fingerprint(sf_dir)}".encode()
    ).hexdigest()[:12]
    base = Path(tempfile.gettempdir()) / f"spark_graft_spool_{key}_{tag}"
    marker = base / "_SPOOL_DONE"
    if marker.exists():
        return base
    wip = Path(
        tempfile.mkdtemp(
            prefix=f"spark_graft_spool_{key}_{tag}_wip_",
            dir=tempfile.gettempdir(),
        )
    )
    try:
        writer(wip)
        (wip / "_SPOOL_DONE").write_text("ok")
    except BaseException:
        shutil.rmtree(wip, ignore_errors=True)
        raise
    try:
        os.rename(wip, base)
    except OSError:
        # rename target exists: another writer won the race (its dir is
        # complete — rename is atomic). Discard our build and use theirs.
        shutil.rmtree(wip, ignore_errors=True)
        if not marker.exists():
            raise
    return base


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL surface."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
