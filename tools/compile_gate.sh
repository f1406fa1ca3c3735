#!/usr/bin/env bash
# Pre-snapshot compile gate (round-8 post-mortem: the end-of-round
# commit shipped a one-line compile error and zeroed the round's
# official signal). Run before ANY ledger/end-of-round commit and
# record the rc in the commit message.
set -u
cd "$(dirname "$0")/.."
sbt -batch Test/compile >/tmp/compile_gate.log 2>&1
rc=$?
tail -3 /tmp/compile_gate.log
echo "COMPILE_GATE rc=$rc"
exit $rc
