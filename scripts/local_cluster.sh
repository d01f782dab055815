#!/usr/bin/env bash
# Multi-JVM validation gate: run graft.Verify (sf0.01, DuckDB-checked)
# and the full ScalaTest suite under local-cluster[2,2,2048] — two REAL
# executor JVMs, so every custom Expression, physical operator, typed
# Aggregator, and broadcast crosses a genuine task-serialization
# boundary (the failure class local[*] structurally cannot catch).
#
# `bench` mode TIMES the full sweep under the multi-JVM master
# (sf0.1, 2 executors x 2 cores x 4 GiB) — the record that catches
# serialization / broadcast-size walls local[32] hides (README
# "multi-JVM bench record").
#
# Usage: scripts/local_cluster.sh [verify|test|bench|all]  (default: all)
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${1:-all}"
export SPARK_SCALA_VERSION=2.13          # executor launcher probe
export SPARK_GRAFT_MASTER='local-cluster[2,2,2048]'
export SPARK_GRAFT_CPUS=4

sbt -batch compile package Test/package

MAIN_JAR="$(ls target/scala-2.13/*[0-9].jar | head -1)"
TEST_JAR="$(ls target/scala-2.13/*-tests.jar | head -1)"
# test closures reference the enclosing suite class → executors need
# the scalatest/scalactic jars too (test leg only)
ST_JARS="$(find ~/.cache/coursier -name 'scalatest*.jar' -o -name 'scalactic*.jar' 2>/dev/null \
  | grep -v -e sources -e javadoc | paste -sd, -)"

if [[ "$MODE" == "verify" || "$MODE" == "all" ]]; then
  SPARK_GRAFT_JARS="$MAIN_JAR" \
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/verify_lc"
  python3 scripts/check.py /root/testdata/sf0.01 target/verify_lc
fi

if [[ "$MODE" == "test" || "$MODE" == "all" ]]; then
  SPARK_GRAFT_JARS="$MAIN_JAR,$TEST_JAR,$ST_JARS" sbt -batch test
fi

if [[ "$MODE" == "bench" ]]; then
  SPARK_GRAFT_MASTER='local-cluster[2,2,4096]' \
    SPARK_GRAFT_JARS="$MAIN_JAR" \
    SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
    sbt -batch "runMain graft.Bench" | grep '"metric"'
fi
