"""Build the --py-files zip for cluster submission.

The north rule's deployment shape is

    spark-submit --py-files ybcdc.zip your_job.py

on a multi-executor cluster. This script zips the engine package so Python
workers on executors can import it (the local-mode equivalent is the
spark.executorEnv.PYTHONPATH set by session.get_spark).

Usage: python tools/package_pyfiles.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "debezium_connector_yugabytedb_1_spark"


def build(out: str = "ybcdc.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(os.path.join(root, PKG)):
            if "__pycache__" in dirpath:
                continue
            for f in filenames:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "ybcdc.zip"))
