#!/bin/bash
# VERDICT r14 item 6: one 5-way interleaved code-state A/B of the 16
# drills whose r14 fold deltas were inside the noise floor (0.95-1.09x)
# to confirm none is a real regression.  Side A = pre-optimization
# worktree (/tmp/r14_before @ 1a7cb78, ab_bench.py copied in, untracked);
# side B = current HEAD.  Alternating processes share the same host
# windows; per-side min over the 5 process minima is the verdict basis
# (the round-14 methodology).
set -u
DRILLS="q_version_change_feed q_lakehouse_checkpoint_planning \
q_lakehouse_convert_in_place q_lakehouse_datasource_sink \
q_lakehouse_zorder q_lakehouse_sql_dml q_lakehouse_restore \
q_lakehouse_sql_ddl q_lakehouse_txn q_mor_compaction_purge \
q_mor_compaction_updates q_lakehouse_zorder_incremental \
q_lakehouse_clone q_lakehouse_change_feed q_merge_on_read_updates \
q_merge_on_read_deletes"
cd /root/repo
for i in 1 2 3 4 5; do
  echo "=== alternation $i side A (pre-opt) $(date -u +%H:%M:%S)"
  (cd /tmp/r14_before && python tools/ab_bench.py --passes 3 $DRILLS \
      2>/dev/null | tail -1) > bench_history/ab_r15_A$i.json
  echo "=== alternation $i side B (HEAD) $(date -u +%H:%M:%S)"
  python tools/ab_bench.py --passes 3 $DRILLS 2>/dev/null | tail -1 \
      > bench_history/ab_r15_B$i.json
done
echo "DONE $(date -u +%H:%M:%S)"
