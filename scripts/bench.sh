#!/usr/bin/env bash
# Run the benchmark and guarantee the summary JSON is the FINAL stdout
# line, whatever sbt decides to print around the forked JVM's output:
# graft.Bench writes an undecorated copy of its one-line summary to
# bench_out.json (with provenance), so the trailer-proof record is simply
# that file, cat'ed last.
#
# Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/bench.sh
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Bench" 1>&2
cat bench_out.json
