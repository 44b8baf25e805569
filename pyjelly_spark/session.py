"""SparkSession helpers with scale-appropriate defaults."""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_SESSIONS: set = set()


def ship_package(spark: SparkSession) -> None:
    """Make ``pyjelly_spark`` importable inside executor Python workers.

    On a real cluster this is the ``spark-submit --py-files`` path
    (BASELINE.json north_rule); when the driver created its own session
    without it, we ship the package as a zip via ``addPyFile`` —
    idempotent per session.
    """
    key = id(spark.sparkContext)
    if key in _SHIPPED_SESSIONS:
        return
    import pyjelly_spark

    pkg_dir = os.path.dirname(os.path.abspath(pyjelly_spark.__file__))
    if not os.path.isdir(pkg_dir):
        # already running from a --py-files zip (spark-submit path):
        # executors got the same zip from the submit line; re-shipping is
        # both impossible (no source tree to walk) and unnecessary.
        _SHIPPED_SESSIONS.add(key)
        return
    zip_path = os.path.join("/tmp", "pyjelly_spark_pyfiles.zip")
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < max(
        os.path.getmtime(os.path.join(root, name))
        for root, _dirs, names in os.walk(pkg_dir)
        for name in names
        if name.endswith(".py")
    ):
        with zipfile.ZipFile(zip_path, "w") as bundle:
            for root, _dirs, names in os.walk(pkg_dir):
                for name in names:
                    if name.endswith(".py"):
                        full = os.path.join(root, name)
                        rel = os.path.join(
                            "pyjelly_spark", os.path.relpath(full, pkg_dir)
                        )
                        bundle.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED_SESSIONS.add(key)


def _local_dir() -> str:
    if os.environ.get("SPARK_LOCAL_DIRS"):
        return os.environ["SPARK_LOCAL_DIRS"]
    shm = "/dev/shm/spark-local"
    try:
        os.makedirs(shm, exist_ok=True)
        return shm
    except OSError:
        return "/tmp"


def build_session(
    master: str | None = None,
    app_name: str = "pyjelly_spark",
    shuffle_partitions: int | None = None,
    executor_memory: str | None = None,
) -> SparkSession:
    """Session with the knobs a large shuffle-heavy job needs set.

    On a real cluster most of these come from spark-submit conf; the
    defaults here make local[k] behave like a small slice of one:
    AQE on (runtime re-plan + skew-join splitting), Arrow on (all our
    Python boundaries are vectorized), shuffle partitions sized to cores.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus * 2, 8)
    builder = SparkSession.builder.master(master)
    if executor_memory is not None:
        # multi-executor masters (local-cluster[n,c,m] / standalone):
        # per-executor heap — the knob that exists per JVM on a real
        # cluster; irrelevant in local[k] where driver == executor
        builder = builder.config("spark.executor.memory", executor_memory)
        # same lazy-heap-growth fix as the driver below, per executor JVM
        builder = builder.config(
            "spark.executor.extraJavaOptions",
            os.environ.get("SPARK_EXECUTOR_XOPTS", "-Xms4g -XX:+AlwaysPreTouch"),
        )
    session = (
        builder
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # allow joins to accept children hash-partitioned on a SUBSET of
        # the join keys (pre-3.3 behavior): the linking stage partitions
        # the mention stream and def dictionaries by symbol once and
        # reuses that exchange across four different join key sets
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # lets Python data sources (the jelly format) see filters for
        # partition pruning; no effect on built-in sources
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        # Fault the first chunk of heap in at JVM start (parallel pre-touch
        # under G1): lazy heap growth during the first heavy job otherwise
        # shows up as kernel time in the middle of that job — measured 4-5x
        # first-run walls on this host's degraded memory subsystem. On a
        # real cluster executors are long-lived, so this cost is paid once
        # per executor, never per job.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_DRIVER_XOPTS", "-Xms8g -XX:+AlwaysPreTouch"),
        )
        # shuffle/spill on tmpfs when available: local[k] funnels every
        # shuffle through one disk, which otherwise serializes the very
        # stages that should scale with cores (a real cluster spreads
        # shuffle over per-node disks instead)
        .config("spark.local.dir", _local_dir())
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ship_package(session)
    return session
