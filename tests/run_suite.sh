#!/usr/bin/env bash
# The one-command full test suite.
#
# Why groups in fresh processes: a single warm pytest process dies with
# SIGSEGV at ~98% — NOT in the compile cache (writes are fork-isolated +
# atomic, reads are probe-verified in a child; the crash survived all of
# that) but inside libgcc's stack unwinder during a late big XLA:CPU
# compile (dmesg: "segfault ... in libgcc_s.so.1", error 4 read fault),
# i.e. an accumulated-state/deep-recursion defect in jax 0.9's CPU
# pipeline that no amount of cache hygiene can reach from user code.
# Three groups × fresh interpreter keep every process far from the
# accumulation point while still paying the jax import only 3x; the
# persistent compile cache (host-keyed, tests/.jax_cache) makes warm
# group runs fast.
#
# Usage: tests/run_suite.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."

# a 64 MiB stack for the deep LLVM recursions (default 8 MiB), belt to
# the fresh-process braces; harmless where ulimit is restricted
ulimit -s 65536 2>/dev/null || true

G1=$(ls tests/test_[a-p]*.py)
G2=$(ls tests/test_[q-s]*.py)
G3=$(ls tests/test_[t-z]*.py)

# no test file may silently escape the union of the groups
ALL_COUNT=$(ls tests/test_*.py | wc -l)
GROUPED_COUNT=$(echo "$G1 $G2 $G3" | tr ' ' '\n' | sed '/^$/d' | sort -u | wc -l)
if [ "$ALL_COUNT" != "$GROUPED_COUNT" ]; then
    echo "run_suite.sh: group union ($GROUPED_COUNT) != tests/test_*.py ($ALL_COUNT)" >&2
    exit 2
fi

rc=0
i=0
for group in "$G1" "$G2" "$G3"; do
    i=$((i + 1))
    echo "=== suite group $i/3 ==="
    t0=$SECONDS
    # shellcheck disable=SC2086  # word-splitting the file list is the point
    python -m pytest $group -q "$@"
    grc=$?
    echo "=== suite group $i/3 rc=$grc $((SECONDS - t0))s ==="
    if [ "$grc" != 0 ]; then
        rc=$grc
        break
    fi
done
exit $rc
