"""r20 candidate pool (built + parity-tested, UNREGISTERED — the
registration budget drains it ≤5/round): uppercase_ratio_by_source
(the SHOUTING/boilerplate caps audit), hourly_count_autocorr (lag-1
autocorrelation of hourly count series — the burstiness detector),
sessions_per_user_histogram (engagement frequency, same 30-min rule
as the registered sessionize), funnel_conversion_delay
(signup→purchase activation speed), and embedding_clip_bounds
(per-dim p1/p99 int8 calibration table).  Oracle parity is pinned at
BOTH sf0.001 and sf0.01; each op carries a closed-form hand case."""

from __future__ import annotations

from tests.test_r9_candidates import _compare



# ------------------------------------------------ caps audit


def test_uppercase_ratio_by_source_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.textstats import (
        UPPERCASE_RATIO_BY_SOURCE_ORACLE, uppercase_ratio_by_source,
    )
    cat, duck = sf_pair
    sdf = uppercase_ratio_by_source(cat.documents)
    rows = _compare(sdf, duck, UPPERCASE_RATIO_BY_SOURCE_ORACLE)
    assert rows
    # alphabetical: n_chars_total, n_upper, source, upper_ratio
    for total, upper, _, ratio in rows:
        assert 0 <= upper <= total and 0.0 <= ratio <= 1.0


def test_uppercase_ratio_hand_case(spark):
    df = spark.createDataFrame(
        [("a", "ABcd"), ("a", "EF"), ("b", "xyz!")],
        "source string, text string")
    from data_ingestion_challenge_spark.operators.textstats import (
        uppercase_ratio_by_source,
    )
    out = {r.source: (r.n_upper, r.n_chars_total, r.upper_ratio)
           for r in uppercase_ratio_by_source(df).collect()}
    assert out == {"a": (4, 6, round(4 / 6, 6)), "b": (0, 4, 0.0)}


# ------------------------------------------------ burstiness


def test_hourly_count_autocorr_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        HOURLY_COUNT_AUTOCORR_ORACLE, hourly_count_autocorr,
    )
    cat, duck = sf_pair
    sdf = hourly_count_autocorr(cat.events)
    rows = _compare(sdf, duck, HOURLY_COUNT_AUTOCORR_ORACLE)
    assert rows
    # alphabetical: autocorr_lag1, event_type, n_pairs
    for ac, _, n in rows:
        assert -1.0 - 1e-9 <= ac <= 1.0 + 1e-9 and n >= 2


def test_hourly_count_autocorr_hand_case(spark):
    # counts per hour: 1,2,1,2,... over 6 hours -> perfect
    # alternation: autocorr_lag1 == -1
    rows = []
    for h, c in enumerate([1, 2, 1, 2, 1, 2]):
        for k in range(c):
            rows.append(("e", f"2024-01-01 0{h}:0{k}:00"))
    df = spark.createDataFrame(rows, "event_type string, ts string") \
        .selectExpr("event_type", "CAST(ts AS TIMESTAMP) AS ts")
    from data_ingestion_challenge_spark.operators.stats import (
        hourly_count_autocorr,
    )
    [r] = hourly_count_autocorr(df).collect()
    assert r.n_pairs == 5
    assert abs(r.autocorr_lag1 + 1.0) < 1e-9


def test_hourly_count_autocorr_pre_epoch_floor(spark):
    # Pre-1970 timestamps have NEGATIVE epoch micros: floor division
    # must bucket 23:30 and 23:45 of 1969-12-31 into the SAME hour
    # (h = -1), where truncate-toward-zero would land them in h = 0
    # with the 00:10/00:20 events and break the hour pairing — the
    # oracle's `//` floors, so the engines would diverge.
    rows = [("e", "1969-12-31 23:30:00"), ("e", "1969-12-31 23:45:00"),
            ("e", "1970-01-01 00:10:00"),
            ("e", "1970-01-01 01:05:00"), ("e", "1970-01-01 01:25:00")]
    df = spark.createDataFrame(rows, "event_type string, ts string") \
        .selectExpr("event_type", "CAST(ts AS TIMESTAMP) AS ts")
    from data_ingestion_challenge_spark.operators.stats import (
        hourly_count_autocorr,
    )
    # hourly counts under FLOOR: h=-1 -> 2, h=0 -> 1, h=1 -> 2: two
    # lag pairs (2,1) and (1,2) -> perfect alternation, autocorr -1.
    # Truncation would merge h=-1 into h=0 (count 3), leaving a
    # single pair -> n<2 -> no row at all.
    [r] = hourly_count_autocorr(df).collect()
    assert r.n_pairs == 2
    assert abs(r.autocorr_lag1 + 1.0) < 1e-9


def test_hourly_count_autocorr_drops_degenerate(spark):
    # constant series: zero variance -> no row (never a NaN)
    rows = [("e", f"2024-01-01 0{h}:00:00") for h in range(4)]
    df = spark.createDataFrame(rows, "event_type string, ts string") \
        .selectExpr("event_type", "CAST(ts AS TIMESTAMP) AS ts")
    from data_ingestion_challenge_spark.operators.stats import (
        hourly_count_autocorr,
    )
    assert hourly_count_autocorr(df).count() == 0


# ------------------------------------------------ session frequency


def test_sessions_per_user_histogram_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        SESSIONS_PER_USER_HISTOGRAM_ORACLE,
        sessions_per_user_histogram,
    )
    cat, duck = sf_pair
    sdf = sessions_per_user_histogram(cat.events)
    rows = _compare(sdf, duck, SESSIONS_PER_USER_HISTOGRAM_ORACLE)
    assert rows
    for n_sessions, n_users in rows:
        assert n_sessions >= 1 and n_users >= 1


def test_sessions_per_user_histogram_hand_case(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1),
        (1, "2024-01-01 10:10:00", 2),   # same session (10 min)
        (1, "2024-01-01 12:00:00", 3),   # new session
        (2, "2024-01-01 09:00:00", 4),   # single session
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long") \
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts",
                    "event_id")
    from data_ingestion_challenge_spark.operators.stats import (
        sessions_per_user_histogram,
    )
    out = {r.n_sessions: r.n_users
           for r in sessions_per_user_histogram(df).collect()}
    assert out == {2: 1, 1: 1}


# ------------------------------------------------ activation speed


def test_funnel_conversion_delay_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        FUNNEL_CONVERSION_DELAY_ORACLE, funnel_conversion_delay,
    )
    cat, duck = sf_pair
    sdf = funnel_conversion_delay(cat.events)
    rows = _compare(sdf, duck, FUNNEL_CONVERSION_DELAY_ORACLE)
    assert rows                 # testdata always carries converters
    # alphabetical: delay_days, n_users
    for delay, n in rows:
        assert delay >= 0 and n >= 1


def test_funnel_conversion_delay_hand_case(spark):
    rows = [
        (1, "signup", "2024-01-01 00:00:00"),
        (1, "purchase", "2024-01-03 12:00:00"),   # 2.5 days -> 2
        (2, "signup", "2024-01-01 00:00:00"),
        (2, "purchase", "2024-01-01 01:00:00"),   # 1 hour -> 0
        (3, "purchase", "2024-01-01 00:00:00"),   # purchase first
        (3, "signup", "2024-01-02 00:00:00"),     # -> excluded
        (4, "signup", "2024-01-01 00:00:00"),     # never converts
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string") \
        .selectExpr("user_id", "event_type",
                    "CAST(ts AS TIMESTAMP) AS ts")
    from data_ingestion_challenge_spark.operators.stats import (
        funnel_conversion_delay,
    )
    out = {r.delay_days: r.n_users
           for r in funnel_conversion_delay(df).collect()}
    assert out == {2: 1, 0: 1}


# ------------------------------------------------ int8 calibration


def test_embedding_clip_bounds_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.embstats import (
        EMBEDDING_CLIP_BOUNDS_ORACLE, embedding_clip_bounds,
    )
    cat, duck = sf_pair
    sdf = embedding_clip_bounds(cat.embeddings)
    rows = _compare(sdf, duck, EMBEDDING_CLIP_BOUNDS_ORACLE)
    assert rows
    # alphabetical: i, p01, p99, v_max, v_min
    for i, p01, p99, vmax, vmin in rows:
        assert vmin <= p01 <= p99 <= vmax


def test_embedding_clip_bounds_hand_case(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 10.0]), (2, [1.0, 20.0]), (3, [2.0, 300.0])],
        "vec_id long, embedding array<float>")
    from data_ingestion_challenge_spark.operators.embstats import (
        embedding_clip_bounds,
    )
    out = {r.i: (r.v_min, r.p01, r.p99, r.v_max)
           for r in embedding_clip_bounds(df).collect()}
    # dim 0: values 0,1,2 -> p01 = 0.02, p99 = 1.98 (interpolated)
    assert out[0] == (0.0, 0.02, 1.98, 2.0)
    assert out[1][0] == 10.0 and out[1][3] == 300.0