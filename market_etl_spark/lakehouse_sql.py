"""SQL-text surface for lakehouse DML — VERDICT r11 item 4.

The engine's transactional table was Python-API-only: ``MERGE INTO``,
``UPDATE``, ``DELETE``, ``DESCRIBE HISTORY``, ``RESTORE`` and time
travel all lived behind :class:`lakehouse.Transaction` methods.  The
repo already proves the SQL-translation pattern on the READ side
(:mod:`athena_compat` replays the reference's literal Athena SQL);
this module is the WRITE-side twin: a thin router that parses the
Delta-dialect statement shapes and drives the SAME transaction
methods — one implementation of the semantics, two entry points.

    run_sql(spark, "DELETE FROM lakehouse.`/t` WHERE id % 7 = 0")
    run_sql(spark, "UPDATE lakehouse.`/t` SET v = v * 2 WHERE k = 3")
    run_sql(spark, '''
        MERGE INTO lakehouse.`/t` AS t USING updates AS s
        ON t.id = s.id
        WHEN MATCHED AND s.v < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT *
    ''')
    run_sql(spark, "DESCRIBE HISTORY lakehouse.`/t`")
    run_sql(spark, "DESCRIBE DETAIL lakehouse.`/t`")
    run_sql(spark, "RESTORE TABLE lakehouse.`/t` TO VERSION AS OF 2")
    run_sql(spark, "OPTIMIZE lakehouse.`/t`")                 # compact_small
    run_sql(spark, "OPTIMIZE lakehouse.`/t` ZORDER BY (a, b)")  # incremental
    run_sql(spark, "VACUUM lakehouse.`/t` RETAIN 0 SECONDS")
    run_sql(spark, "SELECT k, sum(v) FROM lakehouse.`/t` "
                   "VERSION AS OF 3 GROUP BY k")

Design notes:

- Table references are ``lakehouse.`/abs/path``` — the Delta
  ``delta.`path``` idiom with this engine's format name.
- DML statements auto-commit ONE transaction and return a 1-row
  metrics DataFrame (``num_affected_rows`` — Delta returns the same
  shape); errors from the underlying methods (identity SET refusal,
  constraint violations, conflict retries) propagate unchanged,
  because they ARE the same methods.
- SELECT statements are rewritten, not reimplemented: every table
  reference (with optional ``VERSION AS OF`` / ``TIMESTAMP AS OF``)
  becomes a temp view over :func:`lakehouse.read_table` and the
  remaining statement runs through ``spark.sql`` untouched — Catalyst
  keeps the whole optimization surface.
- The grammar is the DOCUMENTED SUBSET above.  Anything else raises
  ``ValueError`` with the offending statement — a silent partial
  parse of DML would be a correctness bug, never a convenience.

Reference anchor: sql/athena_sample_queries.sql is read-only SELECT —
the reference has no DML surface at all; this is the engine extension
that makes the transactional table drivable from SQL.
"""

from __future__ import annotations

import datetime as _dt
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import lakehouse as lk

#: ``lakehouse.`/path``` — the one way a statement names a table.
_TBL = r"lakehouse\.`(?P<path>[^`]+)`"

_DELETE = re.compile(
    rf"(?is)^\s*DELETE\s+FROM\s+{_TBL}\s+WHERE\s+(?P<cond>.+?)\s*;?\s*$"
)
_UPDATE = re.compile(
    rf"(?is)^\s*UPDATE\s+{_TBL}\s+SET\s+(?P<sets>.+?)"
    rf"(?:\s+WHERE\s+(?P<cond>.+?))?\s*;?\s*$"
)
_MERGE = re.compile(
    rf"(?is)^\s*MERGE\s+INTO\s+{_TBL}\s*(?:AS\s+)?(?P<talias>\w+)\s+"
    rf"USING\s+(?:\((?P<subq>.+?)\)|(?P<view>\w+))\s*(?:AS\s+)?"
    rf"(?P<salias>\w+)\s+ON\s+(?P<on>.+?)\s*(?P<clauses>WHEN\s.+?)\s*;?\s*$"
)
_WHEN = re.compile(
    r"(?is)WHEN\s+(?P<not_>NOT\s+)?MATCHED\s*"
    r"(?:AND\s+(?P<cond>.+?))?\s*THEN\s+"
    r"(?P<action>DELETE|INSERT\s+\*|UPDATE\s+SET\s+(?P<sets>.+?))"
    r"\s*(?=WHEN\s|$)"
)
_HISTORY = re.compile(rf"(?is)^\s*DESCRIBE\s+HISTORY\s+{_TBL}\s*;?\s*$")
_DETAIL = re.compile(rf"(?is)^\s*DESCRIBE\s+DETAIL\s+{_TBL}\s*;?\s*$")
_VACUUM = re.compile(
    rf"(?is)^\s*VACUUM\s+{_TBL}"
    rf"(?:\s+RETAIN\s+(?P<sec>\d+)\s+SECONDS)?\s*;?\s*$"
)
_OPTIMIZE = re.compile(
    rf"(?is)^\s*OPTIMIZE\s+{_TBL}"
    rf"(?:\s+ZORDER\s+BY\s*\(\s*(?P<zcols>[\w`,\s]+?)\s*\))?\s*;?\s*$"
)
_RESTORE = re.compile(
    rf"(?is)^\s*RESTORE\s+TABLE\s+{_TBL}\s+TO\s+VERSION\s+AS\s+OF\s+"
    rf"(?P<v>\d+)\s*;?\s*$"
)
#: table reference inside a SELECT, with optional time travel
_SELECT_TBL = re.compile(
    rf"{_TBL}"
    rf"(?:\s+VERSION\s+AS\s+OF\s+(?P<v>\d+)"
    rf"|\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')?",
    re.IGNORECASE | re.DOTALL,
)


def _split_assignments(text: str) -> dict[str, str]:
    """``a = expr, b = expr`` — split on top-level commas only."""
    parts, depth, buf = [], 0, []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    out = {}
    for p in parts:
        if "=" not in p:
            raise ValueError(f"malformed SET assignment: {p!r}")
        col, expr = p.split("=", 1)
        out[col.strip().strip("`")] = expr.strip()
    return out


def _realias(text: str, talias: str, salias: str) -> str:
    """Rewrite user aliases to the ``t``/``s`` names
    :meth:`Transaction.merge_into` joins under."""
    text = re.sub(rf"\b{re.escape(talias)}\.", "t.", text)
    return re.sub(rf"\b{re.escape(salias)}\.", "s.", text)


def _counts_df(spark: SparkSession, **kv) -> DataFrame:
    names = ", ".join(f"{k} long" for k in kv)
    return spark.createDataFrame([tuple(kv.values())], names)


def run_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Route one statement of the documented grammar (module doc) to
    the transaction API, or — for SELECT — rewrite table references
    to snapshot temp views and hand the statement to Catalyst."""
    m = _DELETE.match(sql)
    if m:
        t = lk.Transaction(m.group("path"))
        n = t.delete_where(spark, F.expr(m.group("cond")))
        t.commit()
        return _counts_df(spark, num_affected_rows=n)
    m = _UPDATE.match(sql)
    if m:
        sets = {
            c: F.expr(e) for c, e in _split_assignments(m.group("sets")).items()
        }
        cond = F.expr(m.group("cond")) if m.group("cond") else F.lit(True)
        t = lk.Transaction(m.group("path"))
        n = t.update_where_mor(spark, cond, sets)
        t.commit()
        return _counts_df(spark, num_affected_rows=n)
    m = _MERGE.match(sql)
    if m:
        return _run_merge(spark, m)
    m = _HISTORY.match(sql)
    if m:
        return lk.describe_history(spark, m.group("path"))
    m = _DETAIL.match(sql)
    if m:
        d = lk.table_detail(m.group("path"))
        return spark.createDataFrame(
            [tuple(d.values())],
            ", ".join(
                f"{k} {'boolean' if isinstance(v, bool) else 'long'}"
                for k, v in d.items()
            ),
        )
    m = _VACUUM.match(sql)
    if m:
        sec = float(m.group("sec")) if m.group("sec") else 300.0
        n = lk.vacuum_orphans(m.group("path"), min_age_sec=sec)
        return _counts_df(spark, orphans_removed=n)
    m = _OPTIMIZE.match(sql)
    if m:
        t = lk.Transaction(m.group("path"))
        if m.group("zcols"):
            cols = [
                c.strip().strip("`")
                for c in m.group("zcols").split(",")
                if c.strip()
            ]
            rewritten, added = t.optimize_zorder_incremental(spark, cols)
        else:
            rewritten, added = t.compact_small(spark)
        if rewritten:
            t.commit()  # no candidates -> nothing staged, no commit
        return _counts_df(
            spark, files_rewritten=rewritten, files_added=added
        )
    m = _RESTORE.match(sql)
    if m:
        v = lk.restore_table(spark, m.group("path"), int(m.group("v")))
        return _counts_df(spark, restored_to_version=int(m.group("v")),
                          new_version=v)
    if re.match(r"(?is)^\s*(SELECT|WITH)\b", sql):
        return _run_select(spark, sql)
    raise ValueError(
        f"statement does not match the lakehouse SQL grammar "
        f"(DELETE/UPDATE/MERGE/DESCRIBE HISTORY|DETAIL/RESTORE/"
        f"OPTIMIZE [ZORDER BY]/VACUUM/SELECT over lakehouse.`path`): "
        f"{sql.strip()[:120]!r}"
    )


def _run_select(spark: SparkSession, sql: str) -> DataFrame:
    def repl(m: re.Match) -> str:
        version = int(m.group("v")) if m.group("v") else None
        ts = None
        if m.group("ts"):
            raw = m.group("ts")
            try:
                ts = float(raw)
            except ValueError:
                ts = _dt.datetime.fromisoformat(raw).timestamp()
        view = f"lakehouse_snap_{uuid.uuid4().hex[:12]}"
        lk.read_table(
            spark, m.group("path"), version=version, timestamp=ts
        ).createOrReplaceTempView(view)
        return view

    rewritten, n = _SELECT_TBL.subn(repl, sql)
    if n == 0:
        raise ValueError(
            f"SELECT names no lakehouse.`path` table: {sql.strip()[:120]!r}"
        )
    return spark.sql(rewritten)


def _run_merge(spark: SparkSession, m: re.Match) -> DataFrame:
    talias, salias = m.group("talias"), m.group("salias")
    source = (
        spark.sql(m.group("subq")) if m.group("subq")
        else spark.table(m.group("view"))
    )
    # ON must be a conjunction of t.key = s.key equalities — the
    # merge algorithm joins on key columns (Delta's findTouchedFiles
    # probe); theta residuals belong in the WHEN clause conditions
    key_cols = []
    for term in re.split(r"(?i)\s+AND\s+", m.group("on").strip()):
        eq = re.match(
            rf"(?is)^\s*(?:{re.escape(talias)}|{re.escape(salias)})\.(\w+)\s*=\s*"
            rf"(?:{re.escape(talias)}|{re.escape(salias)})\.(\w+)\s*$",
            term,
        )
        if not eq or eq.group(1) != eq.group(2):
            raise ValueError(
                f"MERGE ON must be AND-ed `{talias}.k = {salias}.k` "
                f"equalities; got {term.strip()!r}"
            )
        key_cols.append(eq.group(1))
    upd = None
    delete = None
    insert = False
    for w in _WHEN.finditer(m.group("clauses")):
        action = w.group("action")
        if w.group("not_"):
            if not re.match(r"(?i)INSERT\s*\*", action) or w.group("cond"):
                raise ValueError(
                    "only WHEN NOT MATCHED THEN INSERT * is supported"
                )
            insert = True
        elif action.upper() == "DELETE":
            delete = (
                F.expr(_realias(w.group("cond"), talias, salias))
                if w.group("cond")
                else True
            )
        else:
            if w.group("cond"):
                raise ValueError(
                    "WHEN MATCHED AND <cond> THEN UPDATE is not in the "
                    "grammar — conditional updates compose as a DELETE "
                    "clause plus a source-side filter"
                )
            upd = {
                c: F.expr(_realias(e, talias, salias))
                for c, e in _split_assignments(w.group("sets")).items()
            }
    t = lk.Transaction(m.group("path"))
    counts = t.merge_into(
        spark,
        source,
        key_cols,
        when_matched_update=upd,
        when_matched_delete=delete,
        when_not_matched_insert=insert,
    )
    t.commit()
    return _counts_df(
        spark,
        num_updated_rows=counts["updated"],
        num_deleted_rows=counts["deleted"],
        num_inserted_rows=counts["inserted"],
    )
