"""Ship the kit_spark package to executor Python workers.

On a cluster this is ``spark-submit --py-files kit_spark.zip`` (the launch
mode BASELINE.json mandates); in embedded/driver-harness contexts — where
the SparkSession already exists and the working directory may be anywhere —
``ensure_shipped(spark)`` zips the package once and registers it with
``addPyFile`` so UDF deserialization on workers can import it.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[int] = set()


def package_zip() -> str:
    """Build (once per process) a zip of the kit_spark package."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(),
                       f"kit_spark-{os.getpid()}.zip")
    if not os.path.exists(out):
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for name in files:
                    if not name.endswith(".py"):
                        continue
                    full = os.path.join(root, name)
                    rel = os.path.join("kit_spark",
                                       os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
        os.replace(tmp, out)
    return out


def ensure_shipped(spark) -> None:
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    spark.sparkContext.addPyFile(package_zip())
    _SHIPPED.add(key)
