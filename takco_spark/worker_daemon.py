"""Python-worker daemon with the engine's heavy imports preloaded.

Spark serves Python workers by forking them from a daemon process
(``pyspark.daemon``). A freshly forked worker pays the import cost of
numpy / pandas / pyarrow plus the engine's kernel modules on its first task
— ~1-3 s per worker on an idle host and up to ~9 s under CPU contention
(measured from the ``time to initialize Python workers`` task accumulator
on the 600k-doc ER pipeline at local[4]). Worker forks are not a one-time
cost either: the idle-worker pool is refilled asynchronously after each
task, so back-to-back jobs and concurrently-scheduled stages routinely fork
fresh workers mid-pipeline.

Importing the heavy modules in the DAEMON instead means every forked worker
inherits them copy-on-write: worker boot collapses to the fork itself plus
UDF unpickling (~50 ms). The same trick holds on a real cluster — ship the
package with ``spark-submit --py-files takco_spark.zip`` and set
``spark.python.daemon.module=takco_spark.worker_daemon`` (the session
factory sets it by default); executors then fork warm workers for the
engine's Arrow UDFs.

This is the public ``spark.python.daemon.module`` extension point; the
daemon protocol itself is entirely ``pyspark.daemon.manager``'s.
"""

# Preload order: the engine kernel module pulls in numpy, pandas and the
# pyspark.sql UDF machinery; the Arrow serializer path is what every
# pandas_udf worker exercises. Failures fall through silently to a bare
# daemon — a worker will then just pay its own imports, never break.
try:  # pragma: no cover - exercised by forked workers, not pytest
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyspark.sql.pandas.serializers  # noqa: F401  (Arrow UDF path)

    import takco_spark.functions.similarity  # noqa: F401  (engine kernels)
except Exception:  # noqa: BLE001
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
