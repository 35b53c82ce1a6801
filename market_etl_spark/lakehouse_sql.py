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
    run_sql(spark, "DELETE FROM lakehouse.`/t`")   # no WHERE = all rows
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
    run_sql(spark, "OPTIMIZE lakehouse.`/t` WHERE day >= '2024-01-01'")
    run_sql(spark, "OPTIMIZE lakehouse.`/t` ZORDER BY (a, b)")  # incremental
    run_sql(spark, "OPTIMIZE lakehouse.`/t` ZORDER BY (a, b) FULL")  # whole
    run_sql(spark, "VACUUM lakehouse.`/t` RETAIN 0 SECONDS")
    run_sql(spark, "VACUUM lakehouse.`/t` DRY RUN")   # count, touch nothing
    run_sql(spark, "RESTORE TABLE lakehouse.`/t` TO TIMESTAMP AS OF "
                   "'2026-01-01T00:00:00'")
    run_sql(spark, "SHOW TABLES")                     # the name registry
    run_sql(spark, "ALTER TABLE lakehouse.`/t` ADD COLUMN (note string)")
    run_sql(spark, "ALTER TABLE lakehouse.`/t` RENAME COLUMN v TO val")
    run_sql(spark, "ALTER TABLE lakehouse.`/t` DROP COLUMN note")
    run_sql(spark, "ALTER TABLE lakehouse.`/t` ADD CONSTRAINT pos "
                   "CHECK (val >= 0)")
    run_sql(spark, "ALTER TABLE lakehouse.`/t` DROP CONSTRAINT pos")
    run_sql(spark, "CONVERT TO LAKEHOUSE parquet.`/plain/dir`")
    run_sql(spark, "CREATE TABLE dev SHALLOW CLONE lakehouse.`/t` "
                   "LOCATION '/dev'")          # zero-copy fork
    run_sql(spark, "SELECT * FROM table_changes('trades', 2, 5)")
    run_sql(spark, "SELECT * FROM table_changes('/abs/path', 3)")
    run_sql(spark, "SELECT k, sum(v) FROM lakehouse.`/t` "
                   "VERSION AS OF 3 GROUP BY k")
    run_sql(spark, "INSERT INTO lakehouse.`/t` VALUES (1, 'a'), (2, 'b')")
    run_sql(spark, "INSERT INTO lakehouse.`/t` SELECT * FROM src_view")
    run_sql(spark, "CREATE TABLE trades USING lakehouse LOCATION '/t'")
    run_sql(spark, "CREATE TABLE agg USING lakehouse LOCATION '/a' "
                   "AS SELECT k, sum(v) AS v FROM lakehouse.trades GROUP BY k")
    run_sql(spark, "DELETE FROM lakehouse.trades WHERE v < 0")  # by name
    run_sql(spark, "DROP TABLE trades")   # unregisters; data stays

Design notes:

- Table references are ``lakehouse.`/abs/path``` — the Delta
  ``delta.`path``` idiom with this engine's format name — or
  ``lakehouse.name`` / bare ``name`` for a table registered by
  ``CREATE TABLE name USING lakehouse LOCATION p``.  The registry is
  router-owned and process-local BY NECESSITY: Spark 4.1 constructs a
  Python-source catalog scan with EMPTY options, so a real catalog
  ``CREATE TABLE ... USING lakehouse`` cannot resolve its location at
  scan time (documented at ``lakehouse_datasource._options_path``);
  ``DROP TABLE`` therefore only unregisters — it never deletes data
  (external-table semantics).
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

#: ``lakehouse.`/path``` or ``lakehouse.name`` (registered) — how a
#: statement names a table.  The negative lookbehind keeps the bare
#: ``lakehouse.`` prefix from matching INSIDE a longer qualified
#: identifier (``prod_lakehouse.trades`` must never rewrite).
_TBL = r"(?<![\w.])lakehouse\.(?:`(?P<path>[^`]+)`|(?P<name>\w+))"

#: registered table names -> locations (see module doc: router-owned
#: because Spark 4.1 hands Python-source catalog scans empty options)
_NAMES: dict[str, str] = {}

#: when set, the registry PERSISTS as a JSON file at this path —
#: loaded lazily on first name use, written through atomically on
#: every register/drop — so ``CREATE TABLE name USING lakehouse`` and
#: ``SHOW TABLES`` survive session restarts (VERDICT r13 #5).
#: Opt-in by design: an always-on global file would leak names
#: between unrelated runs (a stale entry pointing at a dead scratch
#: path would refuse re-registration forever).
_REGISTRY_ENV = "MARKET_ETL_NAME_REGISTRY"
_names_loaded_from: str | None = None


def _load_names() -> None:
    """Merge the persisted registry (if configured) into ``_NAMES``
    once per file path; in-session registrations win on conflict."""
    import json
    import os
    import pathlib

    global _names_loaded_from
    p = os.environ.get(_REGISTRY_ENV)
    if not p or _names_loaded_from == p:
        return
    _names_loaded_from = p
    f = pathlib.Path(p)
    if not f.exists():
        return
    try:
        data = json.loads(f.read_text())
    except (OSError, ValueError) as e:
        import warnings

        warnings.warn(f"unreadable name registry at {p}: {e}")
        return
    for name, loc in data.items():
        _NAMES.setdefault(str(name), str(loc))


def _persist_names() -> None:
    """Write-through of ``_NAMES`` when persistence is configured —
    atomic (tmp + rename), so a crash never leaves a torn registry."""
    import json
    import os
    import pathlib

    p = os.environ.get(_REGISTRY_ENV)
    if not p:
        return
    f = pathlib.Path(p)
    f.parent.mkdir(parents=True, exist_ok=True)
    tmp = f.parent / f".{f.name}.tmp-{uuid.uuid4().hex[:8]}"
    tmp.write_text(json.dumps(_NAMES, indent=1, sort_keys=True))
    tmp.replace(f)


def _require_registerable(name: str, path: str) -> None:
    """The name-conflict check, callable BEFORE a CTAS/CLONE
    materializes data: failing only at the post-job
    :func:`register_table` would leave a fully committed but
    unregistered table at the target location (ADVICE r13)."""
    _load_names()
    if name in _NAMES and _NAMES[name] != path:
        raise ValueError(
            f"table name {name!r} is already registered at "
            f"{_NAMES[name]!r} — DROP TABLE {name} before re-pointing "
            f"it at {path!r}"
        )


def register_table(name: str, path: str) -> None:
    """Register ``name`` -> ``path`` for ``lakehouse.name`` references
    (the programmatic twin of ``CREATE TABLE name USING lakehouse
    LOCATION path``).  Re-registering a name to a DIFFERENT location
    is refused — silently re-pointing a long-lived session's by-name
    DML would mutate the wrong table (Delta raises
    TABLE_ALREADY_EXISTS the same way); DROP TABLE first."""
    _require_registerable(name, path)
    _NAMES[name] = path
    _persist_names()


def _resolve_name(name: str) -> str:
    """A registered bare name resolved to its table location."""
    _load_names()
    if name in _NAMES:
        return _NAMES[name]
    raise ValueError(
        f"unknown lakehouse table name {name!r} — register it with "
        f"CREATE TABLE {name} USING lakehouse LOCATION '/path' "
        f"(known: {sorted(_NAMES) or 'none'})"
    )


def _tbl_of(m: re.Match) -> str:
    """The resolved table path of a ``_TBL`` match: backtick contents
    are a location VERBATIM (relative paths included — only the
    backtick-less form consults the registry)."""
    p = m.group("path")
    return p if p is not None else _resolve_name(m.group("name"))

_DELETE = re.compile(
    rf"(?is)^\s*DELETE\s+FROM\s+{_TBL}"
    rf"(?:\s+WHERE\s+(?P<cond>.+?))?\s*;?\s*$"
)
_UPDATE = re.compile(
    rf"(?is)^\s*UPDATE\s+{_TBL}\s+SET\s+(?P<sets>.+?)"
    rf"(?:\s+WHERE\s+(?P<cond>.+?))?\s*;?\s*$"
)
_MERGE = re.compile(
    rf"(?is)^\s*MERGE\s+(?P<mevolve>WITH\s+SCHEMA\s+EVOLUTION\s+)?"
    rf"INTO\s+{_TBL}\s*(?:AS\s+)?(?P<talias>\w+)\s+"
    rf"USING\s+(?:\((?P<subq>.+?)\)|(?P<view>\w+))\s*(?:AS\s+)?"
    rf"(?P<salias>\w+)\s+ON\s+(?P<on>.+?)\s*(?P<clauses>WHEN\s.+?)\s*;?\s*$"
)
_WHEN = re.compile(
    r"(?is)WHEN\s+(?P<not_>NOT\s+)?MATCHED\s*"
    r"(?P<bysrc>BY\s+SOURCE\s*)?"
    r"(?:AND\s+(?P<cond>.+?))?\s*THEN\s+"
    r"(?P<action>DELETE|INSERT\s+\*|UPDATE\s+SET\s+(?P<sets>.+?))"
    r"\s*(?=WHEN\s|$)"
)
_HISTORY = re.compile(rf"(?is)^\s*DESCRIBE\s+HISTORY\s+{_TBL}\s*;?\s*$")
_DETAIL = re.compile(rf"(?is)^\s*DESCRIBE\s+DETAIL\s+{_TBL}\s*;?\s*$")
_VACUUM = re.compile(
    rf"(?is)^\s*VACUUM\s+{_TBL}"
    rf"(?:\s+RETAIN\s+(?P<sec>\d+)\s+SECONDS)?"
    rf"(?P<dry>\s+DRY\s+RUN)?\s*;?\s*$"
)
_SHOW = re.compile(r"(?is)^\s*SHOW\s+TABLES\s*;?\s*$")
_ALTER = re.compile(
    rf"(?is)^\s*ALTER\s+TABLE\s+{_TBL}\s+(?P<what>"
    rf"ADD\s+COLUMNS?\s*\(\s*`?(?P<acol>\w+)`?\s+(?P<atyp>[\w<>,()\s]+?)\s*\)"
    rf"|RENAME\s+COLUMN\s+`?(?P<rold>\w+)`?\s+TO\s+`?(?P<rnew>\w+)`?"
    rf"|DROP\s+COLUMN\s+`?(?P<dcol>\w+)`?"
    rf"|ADD\s+CONSTRAINT\s+(?P<ckname>\w+)\s+CHECK\s*\((?P<ckexpr>.+)\)"
    rf"|DROP\s+CONSTRAINT\s+(?P<dkname>\w+)"
    rf"|SET\s+TBLPROPERTIES\s*\(\s*(?P<props>[^)]+?)\s*\)"
    rf"|UNSET\s+TBLPROPERTIES\s*\(\s*(?P<uprops>[^)]+?)\s*\)"
    rf")\s*;?\s*$"
)
#: one 'key' = 'value' pair inside SET TBLPROPERTIES
_PROP = re.compile(r"(?is)'([^']+)'\s*=\s*'([^']*)'")
_COPY = re.compile(
    rf"(?is)^\s*COPY\s+INTO\s+{_TBL}\s+FROM\s+'(?P<csrc>[^']+)'"
    rf"(?:\s+FILEFORMAT\s*=\s*(?P<cfmt>\w+))?"
    rf"(?:\s+PATTERN\s*=\s*'(?P<cpat>[^']+)')?\s*;?\s*$"
)
_CONVERT = re.compile(
    r"(?is)^\s*CONVERT\s+TO\s+LAKEHOUSE\s+parquet\.`(?P<cpath>[^`]+)`"
    r"(?:\s+PARTITIONED\s+BY\s*\(\s*(?P<pspec>[\w`\s,()]+?)\s*\))?"
    r"\s*;?\s*$"
)
#: one `col type` pair inside a PARTITIONED BY spec
_PSPEC_COL = re.compile(r"(?is)^\s*`?(\w+)`?\s+(\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*$")
_CLONE = re.compile(
    rf"(?is)^\s*CREATE\s+TABLE\s+(?:lakehouse\.)?(?P<clname>\w+)\s+"
    rf"(?P<cldeep>DEEP\s+|SHALLOW\s+)CLONE\s+{_TBL}\s+"
    rf"LOCATION\s+'(?P<cloc>[^']+)'\s*;?\s*$"
)
#: Delta's ``table_changes('t', start [, end])`` TVF — versions are
#: INCLUSIVE on both ends (Delta's contract; :func:`lakehouse.
#: read_changes` takes an exclusive start, so the rewrite shifts by 1)
_TABLE_CHANGES = re.compile(
    r"(?is)table_changes\(\s*'(?P<tcref>[^']+)'\s*,\s*(?P<tcv1>\d+)"
    r"\s*(?:,\s*(?P<tcv2>\d+))?\s*\)"
)
_OPTIMIZE = re.compile(
    rf"(?is)^\s*OPTIMIZE\s+{_TBL}"
    rf"(?:\s+WHERE\s+(?P<owhere>.+?))?"
    rf"(?:\s+ZORDER\s+BY\s*\(\s*(?P<zcols>[\w`,\s]+?)\s*\)"
    rf"(?P<full>\s+FULL)?)?\s*;?\s*$"
)
_INSERT = re.compile(
    rf"(?is)^\s*INSERT\s+INTO\s+{_TBL}\s+"
    rf"(?P<body>(?:VALUES|SELECT|WITH)\s*.+?)\s*;?\s*$"
)
_CREATE = re.compile(
    r"(?is)^\s*CREATE\s+TABLE\s+(?:lakehouse\.)?(?P<cname>\w+)\s+"
    r"USING\s+lakehouse\s+LOCATION\s+'(?P<loc>[^']+)'\s*"
    r"(?:AS\s+(?P<q>(?:SELECT|WITH)\s.+?))?\s*;?\s*$"
)
_DROP = re.compile(
    r"(?is)^\s*DROP\s+TABLE\s+(?:lakehouse\.)?(?P<dname>\w+)\s*;?\s*$"
)
_RESTORE = re.compile(
    rf"(?is)^\s*RESTORE\s+TABLE\s+{_TBL}\s+TO\s+"
    rf"(?:VERSION\s+AS\s+OF\s+(?P<v>\d+)"
    rf"|TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')\s*;?\s*$"
)
#: table reference inside a SELECT, with optional time travel
_SELECT_TBL = re.compile(
    rf"{_TBL}"
    rf"(?:\s+VERSION\s+AS\s+OF\s+(?P<v>\d+)"
    rf"|\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')?",
    re.IGNORECASE | re.DOTALL,
)


def _frame_of_query(spark: SparkSession, text: str) -> DataFrame:
    """A SELECT/WITH/VALUES body as a DataFrame — through the
    lakehouse-reference rewrite when it names lakehouse tables, plain
    ``spark.sql`` otherwise (INSERT/CTAS bodies over temp views)."""
    chunks = _SQL_LITERAL.split(text)
    if _TABLE_CHANGES.search(text) or any(
        _SELECT_TBL.search(chunks[i]) for i in range(0, len(chunks), 2)
    ):
        return _run_select(spark, text, require_ref=False)
    return spark.sql(text)


#: one skipping-predicate term: `col op literal` / `col IN (lits)`
_PRED_TERM = re.compile(
    r"(?is)^\s*`?(?P<col>\w+)`?\s*"
    r"(?:(?P<op><=|>=|<|>|=)\s*(?P<lit>[^\s]+|'[^']*')"
    r"|IN\s*\(\s*(?P<ins>[^)]+)\s*\))\s*$"
)


def _parse_literal(text: str):
    text = text.strip()
    if text.startswith("'") and text.endswith("'"):
        return text[1:-1].replace("''", "'")
    try:
        return int(text)
    except ValueError:
        pass
    try:
        return float(text)
    except ValueError:
        raise ValueError(
            f"OPTIMIZE ... WHERE takes number/'string' literals, got "
            f"{text!r}"
        ) from None


def _split_outside_quotes(text: str, sep: re.Pattern) -> list[str]:
    """Split on ``sep`` matches that fall OUTSIDE single-quoted SQL
    literals — ``'black AND white'`` stays one token."""
    chunks = _SQL_LITERAL.split(text)
    parts, buf = [], []
    for i, chunk in enumerate(chunks):
        if i % 2:  # a quoted literal: never split inside
            buf.append(chunk)
            continue
        pieces = sep.split(chunk)
        buf.append(pieces[0])
        for piece in pieces[1:]:
            parts.append("".join(buf))
            buf = [piece]
    parts.append("".join(buf))
    return parts


_AND_SEP = re.compile(r"(?i)\s+AND\s+")
_COMMA_SEP = re.compile(r",")


def _parse_pred(text: str) -> list[tuple]:
    """``col op literal AND ...`` -> the conjunctive triples
    :func:`lakehouse.prune_files` takes.  The restricted grammar is
    deliberate: OPTIMIZE ... WHERE scopes FILE SELECTION by footer
    stats, so only stats-answerable shapes belong here — anything
    richer raises rather than silently scoping nothing.  Splitting
    (AND terms, IN-list commas) respects quoted literals."""
    triples = []
    for term in _split_outside_quotes(text.strip(), _AND_SEP):
        m = _PRED_TERM.match(term)
        if not m:
            raise ValueError(
                f"OPTIMIZE ... WHERE term {term.strip()!r} is not "
                f"`col op literal` or `col IN (...)` (op: = < <= > >=)"
            )
        col = m.group("col")
        if m.group("ins") is not None:
            vals = tuple(
                _parse_literal(x)
                for x in _split_outside_quotes(m.group("ins"), _COMMA_SEP)
            )
            triples.append((col, "in", vals))
        else:
            triples.append(
                (col, m.group("op"), _parse_literal(m.group("lit")))
            )
    return triples


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
        t = lk.Transaction(_tbl_of(m))
        # no WHERE = delete everything (Delta's DELETE FROM t)
        cond = F.expr(m.group("cond")) if m.group("cond") else F.lit(True)
        n = t.delete_where(spark, cond)
        t.commit()
        return _counts_df(spark, num_affected_rows=n)
    m = _UPDATE.match(sql)
    if m:
        sets = {
            c: F.expr(e) for c, e in _split_assignments(m.group("sets")).items()
        }
        cond = F.expr(m.group("cond")) if m.group("cond") else F.lit(True)
        t = lk.Transaction(_tbl_of(m))
        n = t.update_where_mor(spark, cond, sets)
        t.commit()
        return _counts_df(spark, num_affected_rows=n)
    m = _MERGE.match(sql)
    if m:
        return _run_merge(spark, m)
    m = _INSERT.match(sql)
    if m:
        return _run_insert(spark, _tbl_of(m), m.group("body"))
    m = _CREATE.match(sql)
    if m:
        return _run_create(spark, m)
    m = _DROP.match(sql)
    if m:
        name = m.group("dname")
        _load_names()
        if name not in _NAMES:
            raise ValueError(f"unknown lakehouse table name {name!r}")
        del _NAMES[name]  # unregister only — data stays (external table)
        _persist_names()
        return _counts_df(spark, tables_dropped=1)
    m = _HISTORY.match(sql)
    if m:
        return lk.describe_history(spark, _tbl_of(m))
    m = _DETAIL.match(sql)
    if m:
        d = lk.table_detail(_tbl_of(m))
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
        dry = bool(m.group("dry"))
        n = lk.vacuum_orphans(_tbl_of(m), min_age_sec=sec, dry_run=dry)
        return _counts_df(spark, orphans_removed=0 if dry else n,
                          orphans_found=n)
    m = _ALTER.match(sql)
    if m:
        t = lk.Transaction(_tbl_of(m))
        if m.group("acol"):
            t.add_column(m.group("acol"), m.group("atyp").strip())
        elif m.group("rold"):
            t.rename_column(m.group("rold"), m.group("rnew"))
        elif m.group("dcol"):
            t.drop_column(m.group("dcol"))
        elif m.group("ckname"):
            t.set_check_constraint(
                spark, m.group("ckname"), m.group("ckexpr").strip()
            )
        elif m.group("props"):
            pairs = _PROP.findall(m.group("props"))
            if not pairs:
                raise ValueError(
                    "SET TBLPROPERTIES expects 'key' = 'value' pairs"
                )
            props = dict(t._effective_meta().get("properties") or {})
            plain = False
            for k, val in pairs:
                # the Delta property key routes to the real feature
                # switch; everything else is a free-form property
                if k.endswith(".enableChangeDataFeed"):
                    if val.strip().lower() == "true":
                        t.enable_cdf()
                    else:
                        t.actions.append(
                            {"op": "set_meta", "meta": {"cdf": False}}
                        )
                        t._ops.append("disable_cdf")
                else:
                    props[k] = val
                    plain = True
            if plain:
                t._ops.append("set_properties")
                t.actions.append(
                    {"op": "set_meta", "meta": {"properties": props}}
                )
        elif m.group("uprops"):
            keys = re.findall(r"'([^']+)'", m.group("uprops"))
            props = dict(t._effective_meta().get("properties") or {})
            for k in keys:
                props.pop(k, None)
            t._ops.append("set_properties")
            t.actions.append(
                {"op": "set_meta", "meta": {"properties": props}}
            )
        else:
            t.drop_check_constraint(m.group("dkname"))
        v = t.commit()
        return _counts_df(spark, new_version=v)
    m = _COPY.match(sql)
    if m:
        r = lk.copy_into(
            spark,
            _tbl_of(m),
            m.group("csrc"),
            pattern=m.group("cpat"),
            file_format=(m.group("cfmt") or "parquet").lower(),
        )
        return _counts_df(
            spark,
            num_inserted_rows=r["rows_loaded"],
            num_files_loaded=r["files_loaded"],
            num_files_skipped=r["files_skipped"],
        )
    m = _CONVERT.match(sql)
    if m:
        pby = None
        if m.group("pspec"):
            pby = []
            for term in re.split(r",(?![^()]*\))", m.group("pspec")):
                cm_ = _PSPEC_COL.match(term)
                if not cm_:
                    raise ValueError(
                        f"PARTITIONED BY expects `col type` pairs; "
                        f"got {term.strip()!r}"
                    )
                pby.append((cm_.group(1), cm_.group(2).lower()))
        v = lk.convert_to_lakehouse(
            spark, m.group("cpath"), partitioned_by=pby
        )
        d = lk.table_detail(m.group("cpath"))
        return _counts_df(
            spark, converted_version=v, n_files=d["n_files"],
            n_rows=d["n_rows"],
        )
    m = _CLONE.match(sql)
    if m:
        dst = m.group("cloc")
        _require_registerable(m.group("clname"), dst)  # before the clone
        if m.group("cldeep").strip().upper() == "DEEP":
            v = lk.clone_table_deep(spark, _tbl_of(m), dst)
        else:
            v = lk.clone_table(_tbl_of(m), dst)
        register_table(m.group("clname"), dst)
        d = lk.table_detail(dst)
        return _counts_df(
            spark, cloned_version=v, n_files=d["n_files"],
            n_rows=d["n_rows"],
        )
    m = _SHOW.match(sql)
    if m:
        _load_names()
        if not _NAMES:
            return spark.createDataFrame(
                [], "table_name string, location string"
            )
        return spark.createDataFrame(
            sorted(_NAMES.items()), "table_name string, location string"
        )
    m = _OPTIMIZE.match(sql)
    if m:
        t = lk.Transaction(_tbl_of(m))
        if m.group("zcols"):
            if m.group("owhere"):
                raise ValueError(
                    "OPTIMIZE ... WHERE composes with plain compaction "
                    "only — ZORDER clusters globally, scoping it would "
                    "break the curve (run them as two statements)"
                )
            cols = [
                c.strip().strip("`")
                for c in m.group("zcols").split(",")
                if c.strip()
            ]
            # default = INCREMENTAL zorder (liquid posture: only
            # sub-target-size files rewrite — clustering debt, not the
            # whole table); `... FULL` is Delta's whole-table OPTIMIZE
            # ZORDER, which always rewrites everything live
            if m.group("full"):
                rewritten, added = t.optimize_zorder(spark, cols)
            else:
                rewritten, added = t.optimize_zorder_incremental(spark, cols)
        else:
            pred = _parse_pred(m.group("owhere")) if m.group("owhere") \
                else None
            rewritten, added = t.compact_small(spark, predicate=pred)
        if rewritten:
            t.commit()  # no candidates -> nothing staged, no commit
        return _counts_df(
            spark, files_rewritten=rewritten, files_added=added
        )
    m = _RESTORE.match(sql)
    if m:
        if m.group("v") is not None:
            target = int(m.group("v"))
        else:
            raw = m.group("ts")
            try:
                ts = float(raw)
            except ValueError:
                ts = _dt.datetime.fromisoformat(raw).timestamp()
            target = lk.version_at_timestamp(_tbl_of(m), ts)
        v = lk.restore_table(spark, _tbl_of(m), target)
        return _counts_df(spark, restored_to_version=target,
                          new_version=v)
    if re.match(r"(?is)^\s*(SELECT|WITH)\b", sql):
        return _run_select(spark, sql)
    raise ValueError(
        f"statement does not match the lakehouse SQL grammar "
        f"(DELETE/UPDATE/MERGE/INSERT INTO/CREATE TABLE ... USING "
        f"lakehouse LOCATION [AS SELECT]/DROP TABLE/SHOW TABLES/"
        f"ALTER TABLE ... ADD|RENAME|DROP COLUMN | ADD|DROP CONSTRAINT/"
        f"CONVERT TO LAKEHOUSE parquet.`dir` [PARTITIONED BY (...)]/"
        f"COPY INTO ... FROM 'dir' [FILEFORMAT = ...] [PATTERN = ...]/"
        f"CREATE TABLE ... SHALLOW CLONE ... LOCATION/"
        f"DESCRIBE HISTORY|DETAIL/RESTORE ... TO VERSION|TIMESTAMP AS "
        f"OF/OPTIMIZE [WHERE] [ZORDER BY (...) [FULL]]/VACUUM [RETAIN n "
        f"SECONDS] [DRY RUN]/SELECT over lakehouse.`path` or a "
        f"registered name): {sql.strip()[:120]!r}"
    )


def _run_insert(spark: SparkSession, path: str, body: str) -> DataFrame:
    """``INSERT INTO t VALUES ... | SELECT ...`` — the body evaluates
    as a query (``VALUES`` is a valid Spark query by itself) and
    appends through the SAME transaction path as
    :meth:`Transaction.append`: schema check, constraints, identity /
    generated columns all apply.  Columns map POSITIONALLY with a cast
    to the table type (SQL INSERT semantics; ANSI mode keeps bad casts
    loud).  Engine-supplied (identity/generated) columns are omitted
    from the positional map — the append stamps them."""
    df = _frame_of_query(spark, body)
    t = lk.Transaction(path)
    meta = t._effective_meta()
    fields = meta.get("schema", [])
    if fields:
        engine_cols = set(meta.get("identity", {})) | set(
            meta.get("generated", {})
        )
        targets = [(n, ty) for n, ty in fields if n not in engine_cols]
        if len(df.columns) != len(targets):
            raise ValueError(
                f"INSERT arity mismatch: query produces "
                f"{len(df.columns)} column(s), table takes "
                f"{[n for n, _ in targets]}"
            )
        # positional access (df[i]), never by name: an unaliased
        # expression column like `round(v, 1.5)` contains dots that
        # F.col would misparse as nested-field access
        df = df.select(
            *[
                df[i].cast(ty).alias(n)
                for i, (n, ty) in enumerate(targets)
            ]
        )
    elif body.lstrip()[:6].upper() == "VALUES":
        raise ValueError(
            "INSERT INTO a table with no committed schema cannot take "
            "VALUES (the positional names would be col1, col2, ...) — "
            "CREATE TABLE ... AS SELECT first, or INSERT a SELECT "
            "whose aliases name the columns"
        )
    t.append(df)
    t.commit()
    return _counts_df(
        spark, num_inserted_rows=t.metrics.get("rows_appended", 0)
    )


def _run_create(spark: SparkSession, m: re.Match) -> DataFrame:
    """``CREATE TABLE name USING lakehouse LOCATION p [AS SELECT]`` —
    registers the name (router-owned registry, see module doc) and,
    with an AS query, bootstraps the table at ``p`` (which must not
    already hold commits — CTAS creates, it never overwrites)."""
    name, loc = m.group("cname"), m.group("loc")
    _require_registerable(name, loc)  # before any CTAS data lands
    q = m.group("q")
    if q is not None:
        if lk.latest_commit(loc) > 0:
            raise ValueError(
                f"CREATE TABLE ... AS SELECT: {loc} already has "
                f"commits — INSERT INTO it, or point CTAS elsewhere"
            )
        df = _frame_of_query(spark, q)
        t = lk.Transaction(loc)
        t.append(df)
        t.commit()
        rows = t.metrics.get("rows_appended", 0)
    else:
        rows = 0
    register_table(name, loc)
    return _counts_df(spark, num_inserted_rows=rows)


#: a single-quoted SQL string literal (with '' escaping) — table
#: references are rewritten OUTSIDE these only, so a literal that
#: happens to contain ``lakehouse.`path``` text stays untouched
_SQL_LITERAL = re.compile(r"('(?:[^']|'')*')")


def _run_select(
    spark: SparkSession, sql: str, require_ref: bool = True
) -> DataFrame:
    views: list[str] = []

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
        path = m.group("path")
        if path is None:
            path = _resolve_name(m.group("name"))
        lk.read_table(
            spark, path, version=version, timestamp=ts,
        ).createOrReplaceTempView(view)
        views.append(view)
        return view

    def repl_changes(m: re.Match) -> str:
        ref = m.group("tcref")
        path = ref if "/" in ref else _resolve_name(ref)
        v1 = int(m.group("tcv1"))
        v2 = (
            int(m.group("tcv2")) if m.group("tcv2")
            else lk.latest_commit(path)
        )
        view = f"lakehouse_cdf_{uuid.uuid4().hex[:12]}"
        # Delta's table_changes bounds are INCLUSIVE; read_changes
        # takes an exclusive start — shift by one.  Clamp to 0:
        # commits here are 1-based (version 0 is the empty table), so
        # table_changes('t', 0) — legal in Delta — means "everything
        # since creation", exactly the exclusive start 0 (ADVICE r13)
        lk.read_changes(
            spark, path, max(v1 - 1, 0), v2
        ).createOrReplaceTempView(view)
        views.append(view)
        return view

    n = 0
    tvf_hits = 0

    def repl_changes_outside_literals(m: re.Match) -> str:
        # the TVF's shape EMBEDS a quoted literal (the table ref), so
        # it cannot ride the literal-masked pass — instead match on
        # the raw text but rewrite only matches whose START lies in
        # code: a quoted string that merely CONTAINS table_changes(…)
        # text must stay untouched (ADVICE r13)
        nonlocal tvf_hits
        if any(a <= m.start() < b for a, b in lit_spans):
            return m.group(0)
        tvf_hits += 1
        return repl_changes(m)

    try:
        # the TVF rewrites FIRST, on the raw text, guarded by the
        # literal spans of the ORIGINAL statement
        lit_spans = [
            (lm.start(), lm.end()) for lm in _SQL_LITERAL.finditer(sql)
        ]
        sql = _TABLE_CHANGES.sub(repl_changes_outside_literals, sql)
        n += tvf_hits
        # rewrite table references only OUTSIDE string literals: split
        # on quoted literals (odd chunks), substitute in code chunks
        chunks = _SQL_LITERAL.split(sql)
        for i in range(0, len(chunks), 2):
            chunks[i], k = _SELECT_TBL.subn(repl, chunks[i])
            n += k
        if n == 0 and require_ref:
            raise ValueError(
                f"SELECT names no lakehouse.`path` table: "
                f"{sql.strip()[:120]!r}"
            )
        return spark.sql("".join(chunks))
    finally:
        # spark.sql analyzes EAGERLY: the returned DataFrame's plan is
        # resolved, so the snapshot views can drop immediately — no
        # catalog entry leaks per SELECT (ADVICE r12)
        for view in views:
            spark.catalog.dropTempView(view)


def _run_merge(spark: SparkSession, m: re.Match) -> DataFrame:
    talias, salias = m.group("talias"), m.group("salias")
    source = (
        _frame_of_query(spark, m.group("subq")) if m.group("subq")
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
    upd_cond = None
    delete = None
    insert = False
    saw_update = False
    bs_upd = None
    bs_upd_cond = None
    bs_delete = None
    saw_bs_update = False

    def _no_source_refs(text: str, what: str) -> str:
        # a by-source clause sees only target rows NO source key
        # matched — a source-alias reference would silently evaluate
        # NULL; refuse it up front
        if re.search(rf"(?<![\w.]){re.escape(salias)}\.", text):
            raise ValueError(
                f"WHEN NOT MATCHED BY SOURCE {what} cannot reference "
                f"the source alias {salias!r} — there is no matching "
                f"source row"
            )
        return text

    for w in _WHEN.finditer(m.group("clauses")):
        action = w.group("action")
        if w.group("not_") and w.group("bysrc"):
            if w.group("cond"):
                cond_col = F.expr(
                    _realias(
                        _no_source_refs(w.group("cond"), "condition"),
                        talias, salias,
                    )
                )
            else:
                cond_col = None
            if action.upper() == "DELETE":
                if saw_bs_update:
                    raise ValueError(
                        "WHEN NOT MATCHED BY SOURCE clauses must list "
                        "DELETE before UPDATE (clauses apply "
                        "first-match-wins, and the merge implementation "
                        "gives DELETE priority)"
                    )
                bs_delete = cond_col if cond_col is not None else True
            elif w.group("sets"):
                saw_bs_update = True
                bs_upd_cond = cond_col
                bs_upd = {
                    c: F.expr(
                        _realias(_no_source_refs(e, "SET"), talias, salias)
                    )
                    for c, e in _split_assignments(w.group("sets")).items()
                }
            else:
                raise ValueError(
                    "WHEN NOT MATCHED BY SOURCE supports THEN DELETE "
                    "or THEN UPDATE SET"
                )
        elif w.group("not_"):
            if not re.match(r"(?i)INSERT\s*\*", action) or w.group("cond"):
                raise ValueError(
                    "only WHEN NOT MATCHED THEN INSERT * is supported"
                )
            insert = True
        elif action.upper() == "DELETE":
            if saw_update:
                # the merge algorithm gives DELETE priority over
                # UPDATE on rows matching both; Delta's clauses are
                # first-match-wins IN TEXT ORDER — accept only the
                # order whose semantics we actually implement
                raise ValueError(
                    "WHEN MATCHED clauses must list DELETE before "
                    "UPDATE (clauses apply first-match-wins, and the "
                    "merge implementation gives DELETE priority)"
                )
            delete = (
                F.expr(_realias(w.group("cond"), talias, salias))
                if w.group("cond")
                else True
            )
        else:
            saw_update = True
            if w.group("cond"):
                upd_cond = F.expr(_realias(w.group("cond"), talias, salias))
            upd = {
                c: F.expr(_realias(e, talias, salias))
                for c, e in _split_assignments(w.group("sets")).items()
            }
    t = lk.Transaction(_tbl_of(m))
    counts = t.merge_into(
        spark,
        source,
        key_cols,
        when_matched_update=upd,
        when_matched_update_cond=upd_cond,
        when_matched_delete=delete,
        when_not_matched_insert=insert,
        when_not_matched_by_source_update=bs_upd,
        when_not_matched_by_source_update_cond=bs_upd_cond,
        when_not_matched_by_source_delete=bs_delete,
        evolve_schema=bool(m.group("mevolve")),
    )
    t.commit()
    # Delta's MERGE metrics fold by-source rows into the same
    # updated/deleted counters
    return _counts_df(
        spark,
        num_updated_rows=(
            counts["updated"] + counts.get("updated_by_source", 0)
        ),
        num_deleted_rows=(
            counts["deleted"] + counts.get("deleted_by_source", 0)
        ),
        num_inserted_rows=counts["inserted"],
    )
