#!/usr/bin/env bash
# Parallel shadow-oracle contract runner (VERDICT r8 #5).
#
# The 118-query shadow differential contract is sharded by deterministic
# pytest markers (crc32(name) % 4 -> shadow_shard0..3; assignment pinned
# as an exact partition of SHADOW_ORACLE by
# tests/test_api.py::test_shadow_shards_partition_registry).
# Each shard runs in its OWN pytest process / Spark session, so the four
# runs execute concurrently on a multicore box; the union of the four is
# provably equivalent to the single full run.
#
# Usage: tools/pytest_shards.sh  [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
# shard count comes from ONE source (tests/conftest.py) so rebalancing
# N_SHADOW_SHARDS can't silently desync this runner
N=$(python -c "import sys; sys.path.insert(0, 'tests'); from conftest import N_SHADOW_SHARDS as n; print(n)")
# per-invocation output dir so concurrent runs (two CI jobs on one box)
# can't interleave/clobber each other's logs; override with
# PYTEST_SHARD_DIR for a stable location
OUT="${PYTEST_SHARD_DIR:-$(mktemp -d /tmp/shadow_shards.XXXXXX)}"
mkdir -p "$OUT"
echo "shard output dir: $OUT"
pids=()
rc=0
for k in $(seq 0 $((N - 1))); do
    python -m pytest tests/test_sampling.py -m "shadow_shard${k}" -q \
        --junit-xml="$OUT/shadow_shard${k}.xml" "$@" \
        > "$OUT/shadow_shard${k}.log" 2>&1 &
    pids+=($!)
done
for i in $(seq 0 $((N - 1))); do
    wait "${pids[$i]}"
    code=$?
    # pytest exit 5 = "no tests collected" (an extra -k filter can
    # empty a shard) — that is not a failure of the contract
    if [ "$code" -ne 0 ] && [ "$code" -ne 5 ]; then
        rc=1
        echo "shard ${i}: FAILED exit=${code} (see $OUT/shadow_shard${i}.log)"
    else
        tail -1 "$OUT/shadow_shard${i}.log" | sed "s/^/shard ${i}: /"
    fi
done
exit $rc
