"""Logical-plan lint: the explode-inferred-filter anti-pattern.

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
