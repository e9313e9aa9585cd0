#!/usr/bin/env bash
# Run the Iceberg-gated test suite (tests/test_iceberg_gated.py) on any
# host that can provide an Iceberg Spark runtime jar. In the build
# sandbox there is no network and no jar, so those 11 tests skip; on a
# jar-present host this one command turns them into real passes.
#
# Usage:
#   ./scripts/run_iceberg_suite.sh                  # resolve via --packages
#   ICEBERG_JAR=/path/to/iceberg-spark-runtime.jar \
#   ./scripts/run_iceberg_suite.sh                  # use a local jar
#
# Coordinates (pick the one matching your Spark minor version; this
# repo is developed against PySpark 4.1.x — use the newest
# iceberg-spark-runtime published for your Spark line):
#   org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<latest>
#   org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<latest>  (Spark 3.5)
set -euo pipefail
cd "$(dirname "$0")/.."

PKG="${ICEBERG_PACKAGE:-org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0}"

if [[ -n "${ICEBERG_JAR:-}" ]]; then
  echo ">> using local jar: ${ICEBERG_JAR}"
  export PYSPARK_SUBMIT_ARGS="--jars ${ICEBERG_JAR} pyspark-shell"
else
  echo ">> resolving ${PKG} via --packages (needs network once)"
  export PYSPARK_SUBMIT_ARGS="--packages ${PKG} pyspark-shell"
fi

# the gated tests detect the runtime by trying to configure an Iceberg
# catalog; with the jar on the classpath the skips become real runs
exec python -m pytest tests/test_iceberg_gated.py -v "$@"
