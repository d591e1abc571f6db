#!/usr/bin/env bash
# Round-close gate (VERDICT r10 #1): the FULL test suite must be green
# before a round ends. Round 10 shipped with 3 stale exchange-budget
# pins because only the shadow shards were re-run after the final plan
# rewrites; this script closes that gap.
#
# Coverage is provably total:
#   groups 0..N-1 : the shadow-oracle differential contract, sharded by
#                   crc32(name) % N markers (exact partition of
#                   SHADOW_ORACLE, pinned by
#                   tests/test_api.py::test_shadow_shards_partition_registry)
#   rest0..M-1    : EVERY test file split round-robin (sorted order)
#                   into M parallel pytest processes, each run with
#                   `-m "not shadow"` — i.e. all plan budgets, operator
#                   parity, codec, streaming, ML, API tests.
# Union(groups) == `pytest tests/` exactly: the rest groups' file sets
# partition tests/test_*.py, every test either carries a
# shadow_shard{k} marker (collected by shard group k) or carries none
# (collected by exactly one rest group's `not shadow` expression —
# conftest attaches an umbrella `shadow` marker alongside each shard
# marker).
#
# Usage: tools/round_close.sh   (exit 0 iff everything is green)
set -u
cd "$(dirname "$0")/.."
N=$(python -c "import sys; sys.path.insert(0, 'tests'); from conftest import N_SHADOW_SHARDS as n; print(n)")
M="${ROUND_CLOSE_REST_GROUPS:-6}"
OUT="${ROUND_CLOSE_DIR:-$(mktemp -d /tmp/round_close.XXXXXX)}"
mkdir -p "$OUT"
echo "round-close output dir: $OUT"
pids=()
names=()
for k in $(seq 0 $((N - 1))); do
    python -m pytest tests/ -m "shadow_shard${k}" -q \
        --junit-xml="$OUT/shadow_shard${k}.xml" \
        > "$OUT/shadow_shard${k}.log" 2>&1 &
    pids+=($!)
    names+=("shadow_shard${k}")
done
# the remainder: every test file, split round-robin over M processes
files=$(ls tests/test_*.py | sort)
for g in $(seq 0 $((M - 1))); do
    group_files=$(echo "$files" | awk -v g="$g" -v m="$M" 'NR % m == g')
    if [ -z "$group_files" ]; then
        continue
    fi
    # shellcheck disable=SC2086
    python -m pytest $group_files -m "not shadow" -q \
        --junit-xml="$OUT/rest${g}.xml" \
        > "$OUT/rest${g}.log" 2>&1 &
    pids+=($!)
    names+=("rest${g}")
done

rc=0
for i in "${!pids[@]}"; do
    wait "${pids[$i]}"
    code=$?
    if [ "$code" -ne 0 ] && [ "$code" -ne 5 ]; then
        rc=1
        echo "${names[$i]}: FAILED exit=${code} (see $OUT/${names[$i]}.log)"
        tail -15 "$OUT/${names[$i]}.log" | sed "s/^/${names[$i]}: /"
    else
        tail -1 "$OUT/${names[$i]}.log" | sed "s/^/${names[$i]}: /"
    fi
done
if [ "$rc" -eq 0 ]; then
    echo "ROUND CLOSE: all groups green"
else
    echo "ROUND CLOSE: RED — do not close the round"
fi
exit $rc
