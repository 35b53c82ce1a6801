"""Property-based tests (hypothesis): the engine's scalar semantics and
custom operators against independent reference implementations."""

from __future__ import annotations

import calendar
import datetime as dt

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from market_etl_spark.functions import valid_calendar_date
from market_etl_spark.queries.relational_ext import asof_join

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(1800, 2200), st.integers(0, 13), st.integers(0, 32)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_valid_calendar_date_matches_python_calendar(spark, rows):
    """The explicit leap-year arithmetic must agree with Python's
    calendar module on EVERY (y, m, d) — including out-of-range parts."""
    df = spark.createDataFrame(rows, "y int, m int, d int")
    got = df.select(
        "y", "m", "d", valid_calendar_date(F.col("y"), F.col("m"), F.col("d")).alias("v")
    ).collect()
    for r in got:
        if 1 <= r.m <= 12:
            expect = 1 <= r.d <= calendar.monthrange(r.y, r.m)[1]
        else:
            expect = False
        assert bool(r.v) == expect, (r.y, r.m, r.d)


def _brute_asof(left, right):
    """O(n²) reference as-of join."""
    out = {}
    for uid, lts in left:
        best = None
        for ruid, rts, rv in right:
            if ruid == uid and rts <= lts and (best is None or rts > best[0]):
                best = (rts, rv)
        out[(uid, lts)] = best
    return out


@settings(**_SETTINGS)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=1,
        max_size=25,
        unique=True,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000), st.integers(0, 99)),
        max_size=25,
        unique_by=lambda r: (r[0], r[1]),
    ),
)
def test_asof_join_matches_bruteforce(spark, left, right):
    base = dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(u, base + dt.timedelta(seconds=s), 0.0) for u, s in left],
        "user_id long, ts timestamp, lv double",
    )
    rdf = spark.createDataFrame(
        [(u, base + dt.timedelta(seconds=s), float(v)) for u, s, v in right],
        "user_id long, ts timestamp, value double",
    ) if right else spark.createDataFrame([], "user_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.ts): (r.asof_ts, r.asof_value)
        for r in asof_join(ldf, rdf, on="user_id", ts="ts").collect()
    }
    expect = _brute_asof(left, right)
    assert len(got) == len(expect)
    for (u, s), best in expect.items():
        g = got[(u, base + dt.timedelta(seconds=s))]
        if best is None:
            assert g == (None, None), (u, s, g)
        else:
            assert g == (base + dt.timedelta(seconds=best[0]), float(best[1])), (u, s, g)


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=6, max_size=60).filter(lambda t: t.strip()),
        min_size=2,
        max_size=10,
    )
)
def test_minhash_estimates_jaccard_direction(spark, texts):
    """Identical shingle sets ⇒ identical signatures; disjoint sets ⇒
    (almost surely) different signatures."""
    from market_etl_spark.llm.dedup import with_minhash_signature
    from market_etl_spark.llm.text import shingles, words

    rows = [(i, t) for i, t in enumerate(texts)]
    df = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .withColumn("toks", words("text"))
        .withColumn("sh", shingles("toks", 3))
        .filter(F.size("sh") > 0)
    )
    got = {r.doc_id: (tuple(r.sh), tuple(r.sig)) for r in with_minhash_signature(df).collect()}
    items = list(got.values())
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            sh_a, sig_a = items[i]
            sh_b, sig_b = items[j]
            if set(sh_a) == set(sh_b):
                assert sig_a == sig_b
            elif not set(sh_a) & set(sh_b):
                assert sig_a != sig_b


def _py_bpe(words_freq, rounds):
    """Pure-Python reference BPE (control-delimiter-wrapped symbols,
    greedy left-to-right merge), mirroring llm.text.bpe_merge_rounds:
    only the U+001F/U+001E delimiter characters themselves are stripped
    from tokens (they cannot carry meaning in text; everything else —
    including literal angle brackets — merges normally), and freqs
    ACCUMULATE when two words land on the same repr (the engine never
    re-groups reprs, it sums rows)."""
    from market_etl_spark.llm.text import BPE_CLOSE as C
    from market_etl_spark.llm.text import BPE_OPEN as O

    sym = {}
    for w, f in words_freq.items():
        repr_ = "".join(f"{O}{c}{C}" for c in w if c not in O + C)
        sym[repr_] = sym.get(repr_, 0) + f
    out = []
    for _ in range(rounds):
        counts = {}
        for repr_, f in sym.items():
            toks = repr_.replace(C + O, C + "|" + O).split("|") if repr_ else []
            for a, b in zip(toks, toks[1:]):
                counts[a + b] = counts.get(a + b, 0) + f
        if not counts:
            break
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out.append(best)
        merged = best[0].replace(C + O, "")
        nxt = {}
        for k, v in sym.items():
            nk = k.replace(best[0], merged)
            nxt[nk] = nxt.get(nk, 0) + v
        sym = nxt
    return out


@settings(**_SETTINGS)
@given(
    words=st.lists(
        st.text(alphabet="abc<>.,!?-\x1f\x1e", min_size=1, max_size=5),
        min_size=1,
        max_size=25,
    )
)
def test_bpe_merges_match_python_reference(spark, words):
    """Two engine BPE rounds == a pure-Python reference on arbitrary
    tiny corpora (incl. single-char words, repeats, 'aaaa' overlaps,
    literal angle brackets and punctuation — which now merge as normal
    characters under the control-delimiter encoding — and even stray
    delimiter control characters, which both sides strip)."""
    from market_etl_spark.llm.text import bpe_merge_rounds
    from market_etl_spark.llm.text import words as words_col

    text = " ".join(words)
    df = spark.createDataFrame(
        [(1, text)], "doc_id long, text string"
    ).withColumn("toks", words_col("text"))
    got = [
        (r.merged_pair, r.cnt) for r in bpe_merge_rounds(df, rounds=2).collect()
    ]
    freq = {}
    for w in words:
        freq[w] = freq.get(w, 0) + 1
    want = _py_bpe(freq, 2)
    assert got == want, (words, got, want)


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4095), st.integers(0, 4095)),
        min_size=1,
        max_size=30,
    )
)
def test_zorder_key_matches_python_interleave(spark, rows):
    """The Morton fold equals a pure-Python bit interleave for every
    12-bit pair."""
    from market_etl_spark.sinks import zorder_key

    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        "a", "b", zorder_key(F.col("a"), F.col("b"), 12).alias("z")
    ).collect()

    def interleave(a, b):
        z = 0
        for i in range(12):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for r in got:
        assert r.z == interleave(r.a, r.b), (r.a, r.b)


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("pq rs tu vw xy".split()), min_size=1, max_size=12),
        min_size=2,
        max_size=12,
    )
)
def test_containment_matches_bruteforce_random_corpora(spark, docs):
    """Prefix-filtered containment == brute force on arbitrary tiny
    corpora (shared vocab forces collisions; short docs stress the
    empty-shingle guard)."""
    from market_etl_spark.llm.dedup import containment_pairs
    from market_etl_spark.llm.text import shingles, words as words_col

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .withColumn("toks", words_col("text"))
        .withColumn("sh", shingles("toks", 3))
    )
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(df).collect()
    }
    sh = {
        r.doc_id: set(r.sh) for r in df.select("doc_id", "sh").collect()
    }
    want = {}
    for a, sa in sh.items():
        if not sa:
            continue
        for b, sb in sh.items():
            if a == b:
                continue
            c = round(len(sa & sb) / len(sa), 6)
            if c >= 0.9:
                want[(a, b)] = c
    assert got == want, (docs, got, want)
