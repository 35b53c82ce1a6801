"""Plan/runtime lints for scale-killer anti-patterns.

Two families live here:

1. the explode-inferred-filter trap (static, optimized-plan string) —
   below;
2. the cached-partition-width trap (runtime):
   :func:`cached_width_offenders` sweeps live caches whose partition
   count exceeds their bytes-justified width, and
   :class:`record_stage_widths` + :func:`assert_bounded_stage_widths`
   audit the stage widths an iterated driver-side fold actually
   schedules (the q_scd2_history_build round-7 finding, generalized).

Explode-inferred-filter anti-pattern:

``Generate explode(col)`` over a COMPUTED array column makes Catalyst
infer ``size(col) > 0 AND isnotnull(col)`` (InferFiltersFromGenerate)
and push it below the Project that computes the column — substituting
the column's full defining expression into the guard, so the entire
upstream expression pipeline is evaluated once in the filter (with its
subexpressions duplicated; the round-6 tokenize→shingle chain appeared
~6× per row) and again in the projection.  Measured 12.3s vs 2.7s at
sf0.1 on ``llm_ngram_novelty`` (SCALE.md "explode-inferred-filter").

Safe shapes (both produce identical rows):

1. ``explode_outer`` + explicit ``IS NOT NULL`` AFTER the Generate —
   the rule only fires for the non-outer variant;
2. explode cheap POSITIONS and build the value in the post-explode
   projection (``llm/datasets.py::shingle_rows``).

The lint runs over the OPTIMIZED logical plan string, where the
inferred guard prints as ``(size(<expr>[, bool]) > 0) AND
isnotnull(<expr>)`` with ``<expr>`` a non-attribute expression.  A
hand-written pre-explode guard on a bare attribute (``size(_w#3) >=
5``) does not match: attributes are cheap to re-evaluate and are the
intended pushdown currency.
"""

from __future__ import annotations

import re

#: A bare attribute reference as Catalyst prints it: ``name#123`` with
#: an optional type suffix (``L`` for long) and optional qualifiers.
_ATTR_RE = re.compile(r"^[A-Za-z0-9_.\-]+#\d+[A-Za-z]*$")

_CAST_RE = re.compile(r"^cast\((.+) as [a-z<>,() ]+\)$")


def _is_cheap(expr: str) -> bool:
    """True for expressions whose re-evaluation in an inferred guard is
    free: bare attributes and (nested) casts of attributes.  Those are
    the pushdown currency — only a guard that re-inlines a COMPUTED
    pipeline (split/transform/filter/...) is the trap."""
    expr = expr.strip()
    while True:
        if _ATTR_RE.match(expr):
            return True
        m = _CAST_RE.match(expr)
        if not m:
            return False
        expr = m.group(1).strip()


def _balanced_arg(s: str, start: int) -> str | None:
    """Extract the first top-level argument of a call whose open paren
    is at ``start`` — scans to the first depth-0 comma or the closing
    paren.  Returns None on unbalanced input (plan line truncation)."""
    depth = 0
    i = start
    while i < len(s):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return s[start + 1 : i]
        elif c == "," and depth == 1:
            return s[start + 1 : i]
        i += 1
    return None


def inferred_generate_guards(plan: str) -> list[str]:
    """Return the offending expressions: for each ``Filter`` line in the
    optimized-plan string, every NON-attribute expression ``e`` that
    appears both as ``size(e ...) > 0`` and ``isnotnull(e)`` in the same
    condition — the InferFiltersFromGenerate fingerprint over a computed
    array, i.e. the pipeline-re-inlining trap.  Empty list = clean."""
    offenders: list[str] = []
    for line in plan.splitlines():
        stripped = line.strip().lstrip("+-: ").strip()
        if not stripped.startswith("Filter "):
            continue
        cond = stripped[len("Filter ") :]
        for m in re.finditer(r"\bsize\(", cond):
            arg = _balanced_arg(cond, m.end() - 1)
            if arg is None:
                continue
            arg = arg.strip()
            if _is_cheap(arg):
                continue  # attribute / cast-of-attribute: free to re-evaluate
            # the guard prints as  (size(e[, bool]) > 0)
            after = cond[m.end() - 1 :]
            close = _find_close(after)
            if close is None or not after[close + 1 :].lstrip().startswith("> 0"):
                continue
            if f"isnotnull({arg})" in cond:
                offenders.append(arg)
    return offenders


def _find_close(s: str) -> int | None:
    """Index of the paren closing the call that OPENS at s[0]."""
    depth = 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
    return None


def cached_width_offenders(
    spark,
    *,
    bytes_per_partition: int = 32 << 20,
    slack: int = 4,
    min_width_floor: int = 32,
) -> list[tuple[int, str, int, int]]:
    """The cached-relation-partition-width trap, generalized from the
    round-7 ``q_scd2_history_build`` finding: a ``.cache()`` that
    materializes under a wide session default (e.g. vanilla 200
    shuffle partitions) turns every downstream rescan — fatal when
    ITERATED — into a sweep of near-empty in-memory partitions, pure
    task-scheduling cost that multiplies with cluster size.

    Inspects the live ``getRDDStorageInfo`` and returns
    ``(rdd_id, name, cached_parts, justified)`` for every cached RDD
    whose partition count exceeds its justified width:
    ``max(defaultParallelism, min_width_floor, slack × ceil(bytes /
    bytes_per_partition))``.  The floor keeps ordinary input-width
    caches (32-way local scans) green; only caches that inherited a
    partition count far beyond what their BYTES justify are flagged.
    Empty list = clean.  Call while the suspect cache is live (the
    sweep sees only currently-cached RDDs)."""
    import math

    sc = spark.sparkContext
    justified_floor = max(sc.defaultParallelism, min_width_floor)
    out: list[tuple[int, str, int, int]] = []
    for info in sc._jsc.sc().getRDDStorageInfo():
        parts = info.numCachedPartitions()
        size = info.memSize() + info.diskSize()
        justified = max(
            justified_floor,
            slack * max(1, math.ceil(size / bytes_per_partition)),
        )
        if parts > justified:
            name = info.name() or f"RDD {info.id()}"
            out.append((info.id(), name.splitlines()[0][:120], parts, justified))
    return out


def assert_no_oversized_cache(spark, name: str = "<query>", **kw) -> None:
    """Raise AssertionError if any live cached relation carries more
    partitions than its size justifies (see
    :func:`cached_width_offenders`)."""
    bad = cached_width_offenders(spark, **kw)
    if bad:
        rid, rname, parts, justified = bad[0]
        raise AssertionError(
            f"{name}: cached relation '{rname}' holds {parts} partitions "
            f"but its bytes justify <= {justified} — it materialized under "
            "a wide session default. coalesce/repartition BEFORE .cache() "
            "(or cache inside the pinned-partitions block) so iterated "
            "rescans don't sweep near-empty partitions."
        )


class record_stage_widths:
    """Context manager that records the task width of every stage a
    block launches (status-tracker job-group scoped).  The runtime
    counterpart of :func:`cached_width_offenders` for iterated
    queries whose caches are unpersisted before they return: a
    driver-side fold that schedules session-default-wide stages per
    iteration is invisible in any single plan, but its stage widths
    betray it.

    Usage::

        with record_stage_widths(spark) as rec:
            df = query(spark, sf_dir)          # runs its eager loop
        assert_bounded_stage_widths(rec.widths, max_width=32, ...)
    """

    def __init__(self, spark):
        self._spark = spark
        self.widths: list[int] = []

    def __enter__(self):
        import uuid

        self._sc = self._spark.sparkContext
        self._group = f"stage-width-audit-{uuid.uuid4().hex[:8]}"
        self._sc.setJobGroup(self._group, "planlint stage-width audit")
        return self

    def __exit__(self, exc_type, exc, tb):
        try:
            st = self._sc.statusTracker()
            for jid in sorted(st.getJobIdsForGroup(self._group) or []):
                ji = st.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = st.getStageInfo(sid)
                    if si is not None:
                        self.widths.append(si.numTasks)
        finally:
            self._sc._jsc.clearJobGroup()
        return False


def assert_bounded_stage_widths(
    widths: list[int],
    *,
    max_width: int,
    wide_threshold: int | None = None,
    wide_budget: int = 0,
    name: str = "<query>",
) -> None:
    """Enforce the iterated-query scheduling contract on recorded
    stage widths: NO stage may exceed ``max_width`` tasks (a stage at
    the 200-partition vanilla default is the trap's fingerprint), and
    at most ``wide_budget`` stages may exceed ``wide_threshold``
    (input scans are allowed to be input-width; the loop body is not).
    """
    over = [w for w in widths if w > max_width]
    if over:
        raise AssertionError(
            f"{name}: {len(over)} stage(s) wider than {max_width} tasks "
            f"(widest {max(over)}) — an iterated relation materialized at "
            "the session-default partition count. Pin/coalesce before the "
            "loop (see q_scd2_history_build)."
        )
    if wide_threshold is not None:
        wide = [w for w in widths if w > wide_threshold]
        if len(wide) > wide_budget:
            raise AssertionError(
                f"{name}: {len(wide)} stage(s) wider than {wide_threshold} "
                f"tasks (budget {wide_budget}; widths {sorted(wide, reverse=True)[:10]}) "
                "— the loop body is scheduling beyond its key-bounded width."
            )


def assert_no_inferred_generate_guard(df, name: str = "<df>") -> None:
    """Raise AssertionError if ``df``'s optimized plan carries the
    explode-inferred-filter anti-pattern.  Test-time gate; see module
    docstring for the safe rewrites."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    bad = inferred_generate_guards(plan)
    if bad:
        raise AssertionError(
            f"{name}: InferFiltersFromGenerate re-inlined a computed array "
            f"pipeline into a pushed-down guard ({len(bad)} site(s); first: "
            f"size({bad[0][:200]}...) > 0). Use explode_outer + IS NOT NULL "
            "after the Generate, or explode positions (SCALE.md "
            "'explode-inferred-filter')."
        )
