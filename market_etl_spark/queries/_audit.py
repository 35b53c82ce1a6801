"""Shared audit helpers for the protocol drills.

Event-log attribution (tools/joblog.py, guide §1/§7) shows drill
wall-clock is dominated by the NUMBER of Spark actions — each pays
analyze/optimize/AQE planning plus job-scheduling fixed cost, with a
driver-side gap between jobs that often exceeds the jobs themselves —
not by data volume.  These helpers shrink the action count without
changing any audited value:

- :func:`digest_pairs_equal` folds N independent (left, right)
  row-digest parity comparisons into ONE Spark action: every side is
  tagged with (pair, side) literals, unioned, and reduced by a single
  grouped (count, bit_xor) aggregate — the same (n, xxhash64-xor)
  multiset digest the drills computed with 2N separate
  ``.agg(...).collect()`` jobs.  Per-side results are identical by
  construction (same hash expression, same reduction); only the job
  count changes.
- :func:`concurrently` runs independent driver thunks on a small
  thread pool so their jobs overlap (guide §2.6: actions are only
  sequential because driver code calls them sequentially); Spark's
  FIFO scheduler back-fills idle executors with the next job's tasks.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def digest_pairs_equal(pairs) -> list[bool]:
    """One-action multiset parity for N DataFrame pairs.

    Each pair is ``(left, right)`` where both sides are already
    projected to a SINGLE long hash column (conventionally
    ``xxhash64(...)`` over the drill's canonical columns).  Returns
    ``[left_i multiset== right_i, ...]`` — per side the digest is
    ``(row_count, bit_xor(hash))``, exactly the tuple the drills'
    per-side ``agg(count, bit_xor(xxhash64(...)))`` collected, so a
    True/False here is value-identical to the two-job form.  An empty
    side contributes no group row; empty==empty compares equal and
    empty vs non-empty compares different, as before.
    """
    tagged = []
    for i, (a, b) in enumerate(pairs):
        for s, df in ((0, a), (1, b)):
            c = df.columns[0]
            tagged.append(
                df.select(
                    F.lit(i).alias("_p"),
                    F.lit(s).alias("_s"),
                    F.col(c).cast("long").alias("_h"),
                )
            )
    u = reduce(DataFrame.unionAll, tagged)
    rows = (
        u.groupBy("_p", "_s")
        .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(_h)").alias("x"))
        .collect()
    )
    d = {(r["_p"], r["_s"]): (r["n"], r["x"]) for r in rows}
    return [d.get((i, 0)) == d.get((i, 1)) for i in range(len(pairs))]


def hashed(df: DataFrame, *cols) -> DataFrame:
    """Project ``df`` to the single-column xxhash64 shape
    :func:`digest_pairs_equal` consumes.  ``cols`` are Column objects
    or names; order matters (it is part of the hash)."""
    return df.select(F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols]).alias("_h"))


def concurrently(*thunks, max_workers: int | None = None):
    """Run independent argless callables on a thread pool and return
    their results in order.  Only for thunks whose Spark work is
    independent (no shared temp-view/table mutation, no session-conf
    flips inside the thunk)."""
    with ThreadPoolExecutor(max_workers=max_workers or len(thunks)) as ex:
        futs = [ex.submit(t) for t in thunks]
        return [f.result() for f in futs]
