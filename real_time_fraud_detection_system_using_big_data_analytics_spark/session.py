"""SparkSession factory.

Replaces the reference's hardcoded tuning (``spark.sql.shuffle.partitions=2``
at fraud_detection_model.py:49, spark_streaming_app.py:183,
postgres_model_inference.py:164) with AQE-driven runtime planning, and pins
the session timezone to UTC so timestamp results are comparable across
engines (Spark session-TZ rendering vs naive-UTC elsewhere).

At 100 TB scale the same settings hold: AQE coalesces/re-splits shuffle
partitions at runtime, the skew-join rewrite handles hot keys, and the
broadcast threshold lets dimension tables (region/nation/customer at TPC-H
proportions) broadcast instead of shuffling the fact table.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 8


# Vendored pure-python protobuf runtimes this host happens to carry
# (Google's public protobuf, shipped inside a google-cloud-sdk install).
# Used by the transformWithStateInPandas surface (streaming/tws.py) when
# the protobuf PACKAGE is absent: no install and no network — the path is
# appended to sys.path for the driver and exported via PYTHONPATH for the
# python workers a future JVM will launch (the JVM inherits this process's
# env at launch and passes it to the workers it forks). The
# gencode/runtime version gap (Spark's StateMessage_pb2 is gencode 6.33,
# the vendored runtime 6.32.0-dev) is bridged with protobuf's own
# documented escape hatch (TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK) —
# same-major, one minor apart, and the TWS replay is value-checked end to
# end against the batch GROUP BY, so a wire-format incompatibility cannot
# pass silently.
VENDORED_PROTOBUF_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)
_used_vendored_protobuf = False
_vendored_pythonpath_entry: "str | None" = None


def bootstrap_vendored_protobuf() -> bool:
    """Make google.protobuf importable from a vendored runtime, for the
    driver (sys.path) AND future python workers (PYTHONPATH env). Called
    at package import — i.e. before any harness can build a session — and
    idempotent. Returns True when google.protobuf is importable (however
    that came to be)."""
    global _used_vendored_protobuf, _vendored_pythonpath_entry
    import sys

    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    for root in VENDORED_PROTOBUF_DIRS:
        builder = os.path.join(root, "google", "protobuf", "internal", "builder.py")
        if not os.path.isfile(builder):
            continue
        # Expose ONLY the vendored google/ package through a symlink shim
        # dir, not the whole SDK root — the SDK root carries other
        # top-level modules (api_server, wrapper_util, ...) that must not
        # become importable, least of all on the workers' PYTHONPATH
        # where they would precede site-packages.
        shim = "/tmp/spark_graft_pb_shim"
        link = os.path.join(shim, "google")
        try:
            os.makedirs(shim, exist_ok=True)
            if not os.path.islink(link):
                os.symlink(os.path.join(root, "google"), link)
        except OSError:
            shim = root  # shim unavailable: fall back to the SDK root
        if shim not in sys.path:
            sys.path.append(shim)
        os.environ["PYTHONPATH"] = (
            shim + os.pathsep + os.environ.get("PYTHONPATH", "")
        )
        os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
        try:
            import google.protobuf  # noqa: F401

            _used_vendored_protobuf = True
            _vendored_pythonpath_entry = shim
            return True
        except ImportError:
            continue
    return False


def get_session(app_name: str = "fraud-engine", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) a local SparkSession with scale-sane defaults."""
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.stopGracefullyOnShutdown", "true")
        # Python DataSource pushFilters: Spark refuses to plan a reader
        # that implements it while this is false (sources/pysource.py)
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable subset of our defaults to a session we did
    not create (the driver harness passes its own). Only touches confs that
    are safe to flip mid-session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    return spark
