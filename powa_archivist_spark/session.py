"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

from pyspark.sql import SparkSession

# r13 (ADVICE r12): the set/restore window below mutates SESSION-GLOBAL
# runtime conf.  Structured Streaming foreachBatch runs each fold on its
# own micro-batch thread, so two concurrent engine passes (two streams,
# or a stream plus a StagedPass write) could interleave set/restore and
# leave the session pinned narrow.  A re-entrant lock held across the
# whole pass serializes concurrent engine folds (they are micro-jobs by
# contract, so serializing them costs little), and a depth counter makes
# nested passes (a StagedPass write inside a streaming fold) set/restore
# only at the outermost level.  Residual, documented: an ANALYTICS query
# planned by another thread DURING an engine pass still captures the
# narrow value — callers that interleave corpus-scale analytics with
# live streams should run analytics on spark.newSession() (isolated SQL
# conf, shared context).
_NARROW_LOCK = threading.RLock()
_NARROW_DEPTH = 0
#: thread-local marker for WORKER threads an engine pass spawns to
#: overlap its independent staged writes (r14, guide §2.6): the pass
#: itself holds _NARROW_LOCK with the conf already set, so a worker
#: blocking on the lock would deadlock the pass waiting on its own
#: writers — workers inherit the pass's conf scope instead.
_NARROW_TL = threading.local()


@contextmanager
def narrow_inherited():
    """Mark the current thread as running INSIDE an already-narrow
    engine pass: nested :func:`narrow_exchanges` calls become no-ops
    (the owning pass holds the conf for the worker's whole lifetime).
    Only for threads whose lifetime is enclosed by the owning pass."""
    _NARROW_TL.inherited = True
    try:
        yield
    finally:
        _NARROW_TL.inherited = False


@contextmanager
def narrow_exchanges(spark: SparkSession):
    """Plan exchanges at CLUSTER PARALLELISM for the engine's per-batch
    micro-jobs (r12, VERDICT r11 task 2): the session-wide AQE posture
    plans every exchange ``initialPartitionNum`` (256) wide so partition
    SIZE stays bounded on corpus-scale analytics shuffles — but a
    snapshot/ledger pass runs DOZENS of tiny jobs per batch, and each
    one paying the wide map-output split + block bookkeeping measured
    3.9x on ``snapshot_lifecycle_unpack`` (BENCH_AB_ATTR_r12.json warm
    arms: 11-13 s at 256 vs 2.7-3.4 s at core count, identical plans
    otherwise).  Engine lifecycle writes are bounded per (srvid, batch)
    BY DESIGN — the reference's snapshot contract — so their exchanges
    get the classic parallelism-sized plan; analytics queries keep the
    wide posture.  On a real cluster defaultParallelism is the total
    core count, so this scales with the deployment exactly like the
    wide number does; override with SPARK_GRAFT_NARROW_PARTITIONS.

    Runtime-conf scoped around the write ACTION (Spark reads the AQE
    conf at query-stage planning, i.e. execution time).  Concurrent
    engine passes (foreachBatch micro-batch threads) are serialized by
    ``_NARROW_LOCK``; nesting set/restores only at the outermost depth
    (r13, ADVICE r12)."""
    global _NARROW_DEPTH
    key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    want = os.environ.get("SPARK_GRAFT_NARROW_PARTITIONS") or str(
        spark.sparkContext.defaultParallelism
    )
    # r14 (VERDICT r13 tasks 2/6): AQE materializes every Exchange of a
    # query as its own scheduler job ("query stage"), and an engine fold
    # runs DOZENS of multi-exchange micro-statements per batch — the
    # per-fold job count (and the ~0.1 s driver gap each job carries)
    # was measured as HALF the streaming ledgers' wall clock at bounded
    # batch sizes.  Engine passes are bounded per (srvid, batch) BY
    # CONTRACT, which is exactly the regime where AQE's runtime
    # re-planning buys nothing (exchanges are already narrow-planned
    # here) and its per-stage job overhead dominates.  Analytics
    # queries keep AQE untouched.  Opt-out: SPARK_GRAFT_FOLD_AQE=true
    # restores adaptive execution inside engine passes.
    aqe_key = "spark.sql.adaptive.enabled"
    aqe_want = os.environ.get("SPARK_GRAFT_FOLD_AQE", "false")
    # The folds' bounded take()/limit-collect probes (contracted-graph
    # edges, empty-batch checks) EXPECT to read everything small:
    # executeTake's default 1 -> 4x escalation turns each probe into
    # 3-4 scheduler jobs over an already-materialized micro-frame.  One
    # job that scans all partitions is strictly cheaper here; analytics
    # limits outside engine passes keep the escalating default.
    lim_key = "spark.sql.limit.initialNumPartitions"
    lim_want = os.environ.get("SPARK_GRAFT_FOLD_LIMIT_PARTITIONS", "100000")
    if getattr(_NARROW_TL, "inherited", False):
        # worker thread of an engine pass that already holds the lock
        # and the conf (see narrow_inherited) — pure pass-through
        yield
        return
    scoped = [(key, want), (aqe_key, aqe_want), (lim_key, lim_want)]
    with _NARROW_LOCK:
        _NARROW_DEPTH += 1
        outermost = _NARROW_DEPTH == 1
        olds: list[tuple[str, str | None]] = []
        if outermost:
            for k, v in scoped:
                try:
                    olds.append((k, spark.conf.get(k)))
                except Exception:
                    olds.append((k, None))
                spark.conf.set(k, v)
        try:
            yield
        finally:
            _NARROW_DEPTH -= 1
            if outermost:
                for k, v in olds:
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)


def narrow_engine_pass(fn):
    """Decorator form of :func:`narrow_exchanges` for the engine's
    per-batch fold functions (streaming ledgers, compactions): the
    first argument is the Warehouse (or a SparkSession), and the whole
    fold — including non-staged ``wh.append`` writes and cached-frame
    materializations — runs with parallelism-sized exchanges.  Folds
    are bounded per micro-batch by the streaming contract; the one
    corpus-wide fold (the k-means refresh) only runs bounded-key
    aggregations whose reduce side is k x dim rows, where narrow is
    strictly better."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        spark = None
        if args:
            a = args[0]
            spark = a if isinstance(a, SparkSession) else getattr(
                a, "spark", None)
        if spark is None:
            return fn(*args, **kwargs)
        with narrow_exchanges(spark):
            return fn(*args, **kwargs)

    return wrapper


def get_spark(app_name: str = "powa_archivist_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Session tuned for the target: AQE on (runtime re-plan / skew-join /
    partition coalescing), UTC, Arrow for the pandas seams.

    On a real cluster, master/memory come from spark-submit; the local
    defaults mirror the driver's harness (local[$SPARK_GRAFT_CPUS])."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r10 (BENCH_STAGES_r10.json): with shuffle.partitions fixed at
        # the core count, per-partition shuffle volume grows linearly
        # with data and the hash aggregate/join falls into sort+spill —
        # measured as dedup_components' cands stage going alpha 2.77 in
        # TIME at alpha 1.00 in ROWS (sf1->sf3).  The AQE posture that
        # holds at any scale: plan exchanges WIDE (initialPartitionNum)
        # and let AQE coalesce small outputs back down — partition SIZE
        # stays bounded as data grows, small queries still end up with
        # few tasks.  On a 1000-executor cluster this number would be
        # in the tens of thousands.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS", "256"),
        )
        # r10 (BENCH_STAGES_r10.json, verify stage): a keyed join whose
        # build side is just past the 10MB broadcast threshold planned
        # as sort-merge — at sf3 that sorts 100M+ wide candidate rows
        # twice and spills (measured time alpha 2.44 at rows alpha
        # 1.00).  Prefer shuffled-hash when one side can build a local
        # map (bounded per-partition build under the wide initial
        # partition count); genuinely huge-both-sides joins still plan
        # sort-merge.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # r11 (BENCH_STAGES_r11.json, dedup_components verify stage): a
        # ~40MB dim (118k token-set rows) attached to 104M candidate
        # pairs planned as shuffled-hash — the PAIR side shuffled twice
        # carrying both token arrays (~50GB of shuffle at sf3, the
        # single-box I/O cliff: 218-1144s across identical runs).  AQE
        # converts a join to broadcast from the MEASURED runtime size of
        # the build side, so raising only the adaptive threshold lets
        # bounded dims (set arrays, shingle arrays, dictionaries) stream
        # the big side map-only while genuinely-large sides still plan
        # keyed joins.  The static estimate-based threshold stays at its
        # default — pre-runtime estimates lie.
        # MEMORY FLOOR (r12): 64MB of serialized build side can
        # deserialize to several hundred MB of JVM hash-relation per
        # executor.  This setting assumes >= 4 GB executor heaps (the
        # local[32]/128GiB harness and any reasonable 100TB-cluster
        # sizing clear it); on small-heap executors (< 2 GB) export
        # SPARK_GRAFT_AUTO_BROADCAST=8m to restore a conservative bound
        # rather than editing code.
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_GRAFT_AUTO_BROADCAST", "64m"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # long sessions run hundreds of generated-code classes; the JVM
        # default 240m code cache silently flush-thrashes once full and
        # expression-heavy queries degrade 10-30x late in a session
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # testdata events.parquet carries TIMESTAMP(NANOS) — read as long,
        # converted to micros in the loader shim (queries.t)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
