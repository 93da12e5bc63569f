"""Property-style checks (SURVEY §5.2.4):

- explode conservation: exploded row count == sum of array sizes,
  over hypothesis-generated corpora;
- shingle count law: distinct n-gram count ≤ max(0, words - n + 1);
- exact-decimal aggregation is partitioning-invariant (the determinism
  property the whole oracle strategy rests on).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cve_manager_spark.operators.dedup import word_shingles
from cve_manager_spark.operators.text import words
from cve_manager_spark.functions.helpers import dec
from cve_manager_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL

# printable-ish text with whitespace variety
TEXTS = st.lists(
    st.text(
        alphabet=st.sampled_from(list("abcdef \t\n")), min_size=0, max_size=60
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=TEXTS)
def test_explode_conserves_counts(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id: int, t: string")
    toks = df.select("id", words(F.col("t")).alias("w"))
    exploded = toks.select("id", F.explode("w")).count()
    summed = toks.agg(F.sum(F.size("w"))).first()[0] or 0
    assert exploded == summed


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=TEXTS)
def test_shingle_count_law(spark, texts):
    n = 3
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id: int, t: string")
    rows = df.select(
        F.size(words(F.col("t"))).alias("nw"),
        F.size(word_shingles(F.col("t"), n)).alias("ns"),
    ).collect()
    for r in rows:
        assert 0 <= r["ns"] <= max(0, r["nw"] - n + 1)


def test_decimal_sum_is_partitioning_invariant(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    vals = []
    for parts in (1, 7, 32):
        v = (
            li.repartition(parts)
            .agg(F.sum(dec(F.col("l_extendedprice"))).cast("double").alias("s"))
            .first()["s"]
        )
        vals.append(v)
    assert vals[0] == vals[1] == vals[2]  # bitwise equal, any partitioning


# --- histogram rank-select fold (the re-planned exact-median family) ------

VALUES = st.lists(st.integers(min_value=0, max_value=25), min_size=1, max_size=60)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=VALUES)
def test_histogram_rank_pick_matches_sorted_rank(spark, vals):
    """The in-row fold over (value, count) histograms must agree with
    plain sorted-list rank selection for ANY multiset: median×2 computed
    via _rank_pick == values[lo-1] + values[hi-1] of the sorted list."""
    from cve_manager_spark.plans.features import _rank_pick

    df = spark.createDataFrame([(v,) for v in vals], "q: long")
    h = df.groupBy("q").agg(F.count(F.lit(1)).alias("c"))
    g = h.agg(
        F.sum("c").alias("n"), F.collect_list(F.struct("q", "c")).alias("hist")
    )
    lo = F.expr("(n + 1) div 2")
    hi = F.expr("(n + 2) div 2")
    got = g.select(_rank_pick(lo, hi).alias("m2")).first()["m2"]

    s = sorted(vals)
    n = len(s)
    want = s[(n + 1) // 2 - 1] + s[(n + 2) // 2 - 1]
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),  # value
            st.integers(min_value=1, max_value=9),   # positive weight
        ),
        min_size=1,
        max_size=40,
    )
)
def test_weighted_median_fold_matches_row_scan(spark, pairs):
    """Weighted-median histogram fold == the smallest value whose running
    weight reaches half the total in a plain Python scan."""
    df = spark.createDataFrame(pairs, "q: long, wt: long")
    h = df.groupBy("q").agg(F.sum("wt").alias("c"))
    g = h.agg(
        F.sum("c").alias("tot"), F.collect_list(F.struct("q", "c")).alias("hist")
    )

    def merge(acc, x):
        hit = F.when(
            acc.res.isNull() & (2 * (acc.cum + x.c) >= F.col("tot")), x.q
        )
        return F.struct(
            (acc.cum + x.c).alias("cum"), F.coalesce(acc.res, hit).alias("res")
        )

    init = F.struct(
        F.lit(0).cast("long").alias("cum"), F.lit(None).cast("long").alias("res")
    )
    fold = F.aggregate(F.array_sort("hist"), init, merge, lambda acc: acc.res)
    got = g.select(fold.alias("wm")).first()["wm"]

    tot = sum(w for _, w in pairs)
    cum = 0
    want = None
    for v, w in sorted(pairs):
        cum += w
        if 2 * cum >= tot:
            want = v
            break
    assert got == want


# ---------------------------------------------------------------------------
# burst-monitor state machine: emissions are split-invariant
# ---------------------------------------------------------------------------

_MINUTES = st.lists(
    st.integers(min_value=0, max_value=400), min_size=1, max_size=120
)
_SPLITS = st.lists(st.integers(min_value=1, max_value=119), max_size=4)


class _FakeState:
    """Minimal GroupState stand-in: .exists/.get/.update — enough to drive
    streaming.stateful's update functions outside a real stream."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _drive_burst(batches):
    """Run the burst monitor's update function over a batch sequence for
    one key, returning every emitted row."""
    import pandas as pd

    from cve_manager_spark.streaming import stateful

    state = _FakeState()
    rows = []
    for minutes in batches:
        pdf = pd.DataFrame({"ts_us": [m * 60_000_000 + 7 for m in minutes]})
        for out in stateful._burst_update(("t",), iter([pdf]), state):
            rows.extend(tuple(r) for r in out.itertuples(index=False))
    return rows


@given(minutes=_MINUTES, splits=_SPLITS)
@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_burst_state_machine_split_invariant(minutes, splits):
    """However a key's event stream is chopped into micro-batches (the
    thing a restart, a backlog drain, or maxFilesPerTrigger changes),
    the burst monitor must emit exactly the batch-side finalized rows:
    every minute ≥60 older than the key's max, each exactly once, with
    the trailing-hour sum over the full data. Drives the state function
    directly with a fake GroupState so hypothesis can explore splits a
    real stream never would."""
    ordered = sorted(minutes)
    cuts = sorted({s for s in splits if s < len(ordered)})
    batches, prev = [], 0
    for c in cuts + [len(ordered)]:
        if c > prev:
            batches.append(ordered[prev:c])
            prev = c

    got = sorted(_drive_burst(batches))

    from collections import Counter

    from cve_manager_spark.streaming.stateful import BURST_FACTOR, BURST_FLOOR

    acc = Counter(minutes)
    mx = max(acc)
    want = []
    for m in sorted(acc):
        if m <= mx - 60:
            cnt = acc[m]
            trail = sum(c for mm, c in acc.items() if m - 59 <= mm <= m)
            want.append(
                ("t", m, cnt, trail, cnt >= BURST_FLOOR and cnt * 60 > BURST_FACTOR * trail)
            )
    assert got == sorted(want)


# gaps drawn around the 30-minute session boundary, in microseconds:
# exactly GAP_US must CONTINUE the session (strict > closes), so the
# strategy samples the boundary and both sides of it heavily
_GAPS = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=3_600_000_000),
        st.sampled_from([1_799_999_999, 1_800_000_000, 1_800_000_001]),
    ),
    min_size=1,
    max_size=60,
)


@given(gaps=_GAPS, splits=_SPLITS)
@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_sessionizer_state_machine_split_invariant(gaps, splits):
    """The gap sessionizer's CLOSED-session emissions must not depend on
    how a user's time-ordered event stream is chopped into micro-batches,
    and the still-open final session must remain in state. Gap values
    sample the exact 30-minute boundary: a gap of exactly GAP_US
    continues the session (the close test is strictly greater)."""
    import pandas as pd

    from cve_manager_spark.streaming import stateful
    from cve_manager_spark.streaming.stateful import GAP_US

    ts = [0]
    for g in gaps:
        ts.append(ts[-1] + g)

    cuts = sorted({s for s in splits if s < len(ts)})
    batches, prev = [], 0
    for c in cuts + [len(ts)]:
        if c > prev:
            batches.append(ts[prev:c])
            prev = c

    state = _FakeState()
    got = []
    for batch in batches:
        pdf = pd.DataFrame(
            {"ts_us": batch, "event_id": list(range(len(batch)))}
        )
        for out in stateful._session_update((7,), iter([pdf]), state):
            got.extend(tuple(r) for r in out.itertuples(index=False))

    # reference: single-pass gap rule over the full ordered stream
    sessions, start, last, n = [], None, None, 0
    for t in ts:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > GAP_US:
            sessions.append((7, start, n, last - start))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1

    assert got == sessions  # final session stays open (in state), unemitted
    assert state.get[0] == start and state.get[2] == n


@settings(deadline=None, max_examples=20, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=1, max_size=24), min_size=1, max_size=4
    ),
    n_merges=st.integers(min_value=0, max_value=6),
)
def test_bpe_apply_prefix_monotonicity(spark, texts, n_merges):
    """Applying a LONGER prefix of a merge list can only merge further:
    per-document token counts are monotonically non-increasing in the
    number of merges, for arbitrary corpora and the trainer's own merge
    tables."""
    from cve_manager_spark.operators.text import bpe_apply, bpe_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs, n_merges=max(n_merges, 1)).orderBy("rank").collect()
    ][:n_merges]
    prev = None
    for k in range(len(merges) + 1):
        counts = {
            r["id"]: r["n_tokens"] for r in bpe_apply(docs, merges[:k]).collect()
        }
        if prev is not None:
            assert all(counts[i] <= prev[i] for i in counts)
        prev = counts


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    buckets=st.lists(
        st.tuples(st.integers(0, 3), st.integers(1, 120)),
        min_size=1,
        max_size=6,
    ),
    cap=st.integers(2, 64),
    salt=st.sampled_from([2, 3, 4, 8]),
)
def test_banded_self_pairs_property_equals_naive(spark, buckets, cap, salt):
    """Property: for ANY bucket structure (sizes spanning both sides of
    the cap, ids shared across buckets), cap, and salt width,
    banded_self_pairs emits exactly the naive self-equi-join's pair
    set, each pair once."""
    from pyspark.sql import functions as F

    from cve_manager_spark.operators.dedup import banded_self_pairs

    rows = []
    next_id = 0
    for i, (band, m) in enumerate(buckets):
        ids = []
        for j in range(m):
            # overlap ids across buckets every third row
            ids.append(next_id if j % 3 else max(0, next_id - 5))
            next_id += 1
        rows += [(x, band, f"k{i}") for x in ids]
    keys = spark.createDataFrame(rows, "id long, band int, key string")
    a = keys.select(F.col("id").alias("id_a"), "band", "key")
    b = keys.select(F.col("id").alias("id_b"), "band", "key")
    naive = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .collect()
    }
    got = [
        (r["id_a"], r["id_b"])
        for r in banded_self_pairs(keys, id_col="id", cap=cap, salt=salt)
        .collect()
    ]
    assert len(got) == len(set(got))
    assert set(got) == naive
