"""Deployment-shape job for ``spark-submit --py-files ybcdc.zip``.

The north rule's production form is::

    spark-submit --master <cluster> --py-files ybcdc.zip tools/submit_job.py <workdir>

This script deliberately does NOT touch sys.path or session.get_spark —
the engine package must arrive on the driver and every executor via the
--py-files zip alone, proving the packaging works on a real multi-executor
cluster. It runs a small end-to-end replay (generate → CdcPipeline → lake)
including a kill/resume leg and the content-sha256 invariant, then prints
one machine-readable line.
"""

import hashlib
import os
import sys

from pyspark.sql import SparkSession

from debezium_connector_yugabytedb_1_spark.generator import (
    generate_events,
    write_events,
)
from debezium_connector_yugabytedb_1_spark.lake import LakeTable
from debezium_connector_yugabytedb_1_spark.operators.checkpoint import (
    CheckpointStore,
)
from debezium_connector_yugabytedb_1_spark.streaming.pipeline import CdcPipeline


def main(root: str) -> None:
    spark = SparkSession.builder.appName("ybcdc-submit-demo").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ev = os.path.join(root, "events")
    write_events(generate_events(spark, 4000, ddl_at=(2000,)), ev)
    t = LakeTable(spark, os.path.join(root, "lake"), n_buckets=4)
    t.init([("commit", "string"), ("lang", "string"), ("content", "string")])
    ck = CheckpointStore(spark, os.path.join(root, "ckpt"))
    CdcPipeline(spark, ev, t, ck, events_per_batch=1500).run(max_batches=1)
    # fresh objects — resume from the durable checkpoint like a restarted job
    CdcPipeline(
        spark,
        ev,
        LakeTable(spark, os.path.join(root, "lake"), n_buckets=4),
        CheckpointStore(spark, os.path.join(root, "ckpt")),
        events_per_batch=1500,
    ).run()
    rows = t.read().count()
    r = (
        t.read(with_meta=True)
        .select("content", "content_sha256")
        .where("content is not null")
        .first()
    )
    sha_ok = hashlib.sha256(r["content"].encode()).hexdigest() == r["content_sha256"]
    print(f"SUBMIT_OK rows={rows} sha_ok={sha_ok}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1])
