"""JVM-side helper UDFs, compiled on demand from bundled Java sources.

The reference ingests ``sequenceCompressed`` payloads: base64-encoded zstd
frames compressed with the column's reference genome as a *raw-content
dictionary* (``/root/reference/documentation/input_format.md:195-236``,
``src/silo/zstd/zstd_dictionary.cpp`` — ``ZSTD_createDDict`` on the genome
string, auto-detected as raw content because it lacks the dict magic).

Python has no zstd binding in this environment, but Spark's JVM bundles
zstd-jni (it is Spark's shuffle codec), whose ``ZstdDecompressCtx.loadDict``
has the same auto-detect semantics as ``ZSTD_createDDict``. So the
decompression runs JVM-side — which is also the *fast* path: the payload
never crosses into Python until after it is already a plain aligned string.

Build strategy: ``javac`` (JDK 17 is part of the Spark image) compiles the
two tiny UDF classes once per machine into a cached jar; every session then
loads it with ``ADD JAR`` + ``registerJavaFunction`` — both work on an
already-running session, so no session-construction hook is needed.
"""

from __future__ import annotations

import glob
import os
import subprocess
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import types as T

_SRC_DIR = os.path.join(os.path.dirname(__file__), "java")
_JAR_NAME = "lapis-silo-udfs.jar"

#: sessions (by id) that already registered the UDFs
_registered: "set[int]" = set()


def _pyspark_jars_dir() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "jars")


def build_udf_jar(cache_dir: str | None = None) -> str:
    """Compile the bundled Java UDF sources into a jar (cached, idempotent).

    Returns the jar path. Raises ``RuntimeError`` when no JDK is available —
    callers degrade gracefully (``sequenceCompressed`` ingest then reports a
    clear error instead).
    """
    cache_dir = cache_dir or os.path.join(
        tempfile.gettempdir(), "lapis_silo_spark_jvm"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jar_path = os.path.join(cache_dir, _JAR_NAME)
    sources = sorted(glob.glob(os.path.join(_SRC_DIR, "*.java")))
    if not sources:
        raise RuntimeError(f"no Java sources under {_SRC_DIR}")
    newest_src = max(os.path.getmtime(s) for s in sources)
    if os.path.exists(jar_path) and os.path.getmtime(jar_path) >= newest_src:
        return jar_path
    classes_dir = os.path.join(cache_dir, "classes")
    os.makedirs(classes_dir, exist_ok=True)
    classpath = os.path.join(_pyspark_jars_dir(), "*")
    try:
        subprocess.run(
            ["javac", "-cp", classpath, "-d", classes_dir, *sources],
            check=True, capture_output=True, text=True,
        )
        subprocess.run(
            ["jar", "cf", jar_path, "-C", classes_dir, "."],
            check=True, capture_output=True, text=True,
        )
    except (OSError, subprocess.CalledProcessError) as exc:
        detail = getattr(exc, "stderr", "") or str(exc)
        raise RuntimeError(f"JVM UDF jar build failed: {detail}") from exc
    return jar_path


def ensure_zstd_udfs(spark: SparkSession) -> bool:
    """Register ``zstd_dict_decompress`` / ``zstd_dict_compress`` SQL UDFs.

    Returns True when the functions are available in this session, False when
    the environment cannot build them (no JDK). Idempotent per session.
    """
    key = id(spark)
    if key in _registered:
        return True
    try:
        jar = build_udf_jar()
        spark.sql(f"ADD JAR '{jar}'")
        spark.udf.registerJavaFunction(
            "zstd_dict_decompress", "lapis.ZstdDictDecompress", T.StringType()
        )
        spark.udf.registerJavaFunction(
            "zstd_dict_compress", "lapis.ZstdDictCompress", T.BinaryType()
        )
    except Exception:
        return False
    _registered.add(key)
    return True
