#!/usr/bin/env bash
# Content hash of everything that can change gate results: tracked and
# untracked files under src/, tools/, fixtures/, build.sbt, project/.
# Deliberately EXCLUDES markdown/round artifacts (VERDICT.md, BENCH_*)
# so a doc edit or a driver-written report does not invalidate a gate
# certification, while any source/oracle/fixture/tool edit does.
# Independent of git bookkeeping: committing certified work does not
# change the hash; editing one certified file does.
set -euo pipefail
cd "$(dirname "$0")/.."
{
  git ls-files -z -- src build.sbt project tools fixtures
  git ls-files -o --exclude-standard -z -- src build.sbt project tools fixtures
} | sort -zu | xargs -0 -r md5sum | md5sum | cut -d' ' -f1
