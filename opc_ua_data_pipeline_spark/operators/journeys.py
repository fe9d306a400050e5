"""User-journey analytics over the event stream: frequent path mining
and multi-touch revenue attribution.

The reference's events are single-stream telemetry, but the same
`events` shape (user, time, type, value) is what product/marketing
warehouses run journey analytics on; these close the family around
the existing funnel/cohort/transition-matrix operators:

* ``event_path_trigrams`` — the most common 3-step behavioral paths
  (the n-gram view of ``relational.event_transition_matrix``'s
  1-step Markov counts): two ``lead`` windows per user, one
  count shuffle over at most #types³ distinct paths.
* ``multi_touch_attribution`` — U-shaped (position-based) credit for
  each purchase across the user's touches in a trailing window:
  40% first touch, 40% last, 20% split across the middle — the
  standard marketing-attribution upgrade of the single-touch
  ``relational.q_asof_last_purchase``.

Scale shapes: every window partitions by user_id (high-cardinality,
uniform — the documented scale-safe key class); the purchase-touch
association is an equi-join on user_id with a range predicate, per
the incident_range_join precedent (per-user frames are bounded by a
user's own activity, never the corpus).  Attribution credits are
IEEE-deterministic (identical literal doubles, one division, one
multiply, DECIMAL(18,9) round before the order-free decimal sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.materialize import materialize

from ..functions.ranking import bounded_rank
from ..tables import load_table

PATH_TOP_K = 20

#: U-shape attribution constants (position-based): endpoints get 40%
#: each, the interior shares 20%.  0.4/0.2 are not binary-exact but
#: parse to the SAME double literal on both engines; everything
#: downstream is one division + one multiply on identical operands.
ATTR_END_W = 0.4
ATTR_MID_W = 0.2
ATTR_WINDOW_DAYS = 7


def event_path_trigrams(events: DataFrame, k: int = PATH_TOP_K) -> DataFrame:
    """Top-k 3-step event-type paths across all users.

    Per-user ordered stream → two leads → 'a>b>c' path strings →
    count + distinct-user count per path.  The distinct path space is
    at most #event_types³, so the count shuffle is tiny regardless of
    corpus size.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("_t2"),
        F.lead("event_type", 2).over(w).alias("_t3"),
    ).filter(F.col("_t2").isNotNull() & F.col("_t3").isNotNull())
    paths = stepped.select(
        F.concat_ws(">", "event_type", "_t2", "_t3").alias("path"), "user_id"
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("user_id").alias("n_users"),
    )
    topk = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("path").asc()
    ).limit(k)
    return bounded_rank(
        topk, [("n_occurrences", "desc"), ("path", "asc")], "rank"
    )


def multi_touch_attribution(
    events: DataFrame, window_days: int = ATTR_WINDOW_DAYS
) -> DataFrame:
    """Per-touch-type U-shaped attribution of purchase value.

    For each purchase, the user's click/view touches in the trailing
    ``window_days`` (strictly before the purchase) are ranked by
    time; credit is 1.0 for a single touch, 0.5/0.5 for two, else
    0.4 / 0.4 / 0.2·(n-2)⁻¹ for first / last / each middle touch.
    Output: one row per touch type with touch counts, total credit,
    and credited revenue (decimal-rounded credits summed order-free).
    """
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_eid"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    touches = events.filter(
        F.col("event_type").isin("click", "view")
    ).select(
        "user_id",
        F.col("event_id").alias("t_eid"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    span_us = window_days * 86_400_000_000
    joined = purchases.join(touches, "user_id").filter(
        (F.col("t_ts") < F.col("p_ts"))
        & (
            F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("t_ts"))
            <= span_us
        )
    )
    # per-purchase frame: bounded by one user's touches in the window
    w = Window.partitionBy("p_eid").orderBy("t_ts", "t_eid")
    sized = joined.select(
        "p_eid",
        "p_value",
        "touch_type",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(
            Window.partitionBy("p_eid").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    n = F.col("n")
    pos = F.col("pos")
    credit = (
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when(pos == 1, F.lit(ATTR_END_W))
        .when(pos == n, F.lit(ATTR_END_W))
        .otherwise(F.lit(ATTR_MID_W) / (n - 2).cast("double"))
    )
    scored = sized.select(
        "touch_type",
        credit.cast("decimal(18,9)").alias("credit"),
        (credit * F.col("p_value")).cast("decimal(18,9)").alias("credited"),
    )
    return scored.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum("credit").cast("decimal(28,9)").cast("double").alias(
            "total_credit"
        ),
        F.sum("credited").cast("decimal(28,9)").cast("double").alias(
            "attributed_revenue"
        ),
    )


#: the fixture generator's closed event-type domain; n_other is
#: emitted (and must stay 0) so any domain drift breaks parity loudly
#: instead of silently skewing the entropy.
EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def behavioral_entropy(events: DataFrame) -> DataFrame:
    """Shannon entropy (nats) of each user's event-type distribution —
    the behavioral-diversity score bot/fraud screens rank on: scripted
    accounts hammer one action (entropy → 0) while organic users mix
    types (entropy → ln #types).

    ONE map-side-combinable shuffle: the closed type domain means the
    per-user histogram is #types conditional counts inside a single
    aggregate — no (user, type) pre-aggregation, no join back for the
    per-user total, no pivot.  Each p·ln(p) term rounds to
    DECIMAL(18,9) at its libm call (PSI precedent) and the ≤ #types+1
    decimal terms sum exactly, so the score is bit-identical
    cross-engine.
    """
    other = " , ".join(f"'{t}'" for t in EVENT_TYPES)
    hist = events.groupBy("user_id").agg(
        F.expr("COUNT(*)").alias("n_events"),
        *[
            F.expr(
                f"SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
            ).alias(f"c{i}")
            for i, t in enumerate(EVENT_TYPES)
        ],
        F.expr(
            f"SUM(CASE WHEN event_type IN ({other}) THEN 0 ELSE 1 END)"
        ).alias("n_other"),
    )
    term = (
        "CASE WHEN {c} > 0 THEN CAST(({c} / n_events)"
        " * ln({c} / n_events) AS DECIMAL(18,9)) ELSE 0 END"
    )
    terms = " + ".join(
        term.format(c=c)
        for c in [f"c{i}" for i in range(len(EVENT_TYPES))] + ["n_other"]
    )
    return hist.selectExpr(
        "user_id",
        "n_events",
        "n_other",
        f"CAST(-({terms}) AS DOUBLE) AS entropy_nats",
    )


# RFM segmentation: the classic recency/frequency/monetary customer
# triage — every user scored 1..5 on each axis by QUINTILE, so a
# '555' is a recent, frequent, high-spend user.  The quintiles are
# GLOBAL ranks over the per-user aggregate table, which is exactly
# where the naive spelling dies at scale: NTILE(5) OVER (ORDER BY x)
# has an EMPTY partition spec, i.e. every user sorts through one
# task.  Here each axis runs the distwindow two-pass global rank
# (key_cols=[]) + the closed-form ntile — three range-shuffles over
# the (already fact-reduced) user table, no single-task sort, no
# unpartitioned Window.  Recency anchors on MAX(ts) of the corpus (a
# 1-row broadcast) so the operator is deterministic, and all three
# orderings tie-break on user_id.

RFM_BUCKETS = 5


def rfm_segments(events: DataFrame, buckets: int = RFM_BUCKETS) -> DataFrame:
    from .distwindow import (
        keyed_running_totals,
        ntile_expr,
        sample_cutpoints,
    )

    dec = F.col("value").cast("decimal(28,6)")
    per_user = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(dec).alias("_mon"),
        )
    )
    anchor = events.agg(F.max("ts").alias("_anchor"))
    per_user = per_user.crossJoin(F.broadcast(anchor)).withColumn(
        "recency_days",
        F.expr(
            "CAST((unix_micros(_anchor) - unix_micros(_last))"
            " DIV 86400000000 AS INT)"
        ),
    )
    # materialize the per-user aggregate ONCE: three chained rank
    # passes (each = quantile sample + window branch + counts branch)
    # would otherwise re-run the fact-table groupBy ~9x.  Narrow,
    # user-table-sized — persist() at cluster scale.
    per_user = per_user.transform(materialize)
    # all three axes' bucket cutpoints in ONE sketch job (round-8:
    # sample_cutpoints amortizes the per-rank-pass driver job — this
    # operator paid it three times)
    cuts = sample_cutpoints(
        per_user, ["recency_days", "frequency", "_mon"]
    )
    # The three rank passes CHAIN (pass 2's input is pass 1's output),
    # and each pass reads its input twice (window branch + counts
    # branch) — unmaterialized, pass 1's plan would execute 1+2+4
    # times across the chain and the final plan would carry four
    # inlined copies of it.  Checkpoint between passes keeps every
    # pass's input a leaf (round 10); user-table-sized, persist() at
    # cluster scale.
    t = keyed_running_totals(
        per_user,
        [],
        ["recency_days", "user_id"],
        rank_col="_r_rank",
        n_col="_r_n",
        cuts=cuts.get("recency_days"),
    ).transform(materialize)
    t = keyed_running_totals(
        t,
        [],
        [("frequency", False), "user_id"],
        rank_col="_f_rank",
        n_col="_f_n",
        cuts=cuts.get("frequency"),
    ).transform(materialize)
    t = keyed_running_totals(
        t,
        [],
        [("_mon", False), "user_id"],
        rank_col="_m_rank",
        n_col="_m_n",
        cuts=cuts.get("_mon"),
    )
    r_q = ntile_expr(F.col("_r_rank"), F.col("_r_n"), buckets)
    f_q = ntile_expr(F.col("_f_rank"), F.col("_f_n"), buckets)
    m_q = ntile_expr(F.col("_m_rank"), F.col("_m_n"), buckets)
    return t.select(
        "user_id",
        "recency_days",
        "frequency",
        F.col("_mon").cast("double").alias("monetary"),
        r_q.alias("r_quintile"),
        f_q.alias("f_quintile"),
        m_q.alias("m_quintile"),
        (r_q * 100 + f_q * 10 + m_q).cast("int").alias("rfm_code"),
    )


def q_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_path_trigrams(load_table(spark, sf_dir, "events"))


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multi_touch_attribution(load_table(spark, sf_dir, "events"))


#: reported conversion-latency quantiles (p50/p90/p95)
CONV_QUANTILES = (0.5, 0.9, 0.95)


def conversion_latency_quantiles(events: DataFrame) -> DataFrame:
    """Signup→first-purchase latency quantiles — the funnel-speed KPI
    (how long does activation take for the median user? the p95
    laggard?).

    Per user: first signup, first purchase STRICTLY after it, the
    micros delta.  The quantiles are EXACT (percentile_disc
    semantics: the value at rank ceil(q*n) of the ascending sort) but
    computed WITHOUT the unpartitioned ORDER BY window that spelling
    implies: the distwindow global two-pass rank numbers every
    latency with no single-task sort, then three broadcast quantile
    rows filter rank == ceil(q*n).  Ties on latency are broken by
    user_id, which cannot change the reported value (equal values
    sort adjacently).
    """
    from .distwindow import keyed_running_totals

    signups = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("st"))
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .join(signups, "user_id")
        .filter(F.col("ts") > F.col("st"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"), F.min("st").alias("st"))
    )
    lat = purchases.select(
        "user_id",
        (F.unix_micros("pt") - F.unix_micros("st")).alias("latency_us"),
    ).transform(materialize)
    # ^ materialize ONCE (round 10): the two-pass rank below reads its
    # input three ways (cutpoint sketch, window branch, counts branch)
    # and would re-run the two fact-table aggregations per branch —
    # the quantile_normalize_scores/rfm_segments precedent.  The frame
    # is converted-user-sized (2 cols); persist() at cluster scale.
    ranked = keyed_running_totals(
        lat,
        [],
        ["latency_us", "user_id"],
        rank_col="_rank",
        n_col="_n",
    )
    spark = events.sparkSession
    spine = spark.createDataFrame(
        [(q,) for q in CONV_QUANTILES], "quantile double"
    )
    return (
        ranked.crossJoin(F.broadcast(spine))
        .filter(
            F.col("_rank") == F.ceil(F.col("quantile") * F.col("_n"))
        )
        .select(
            "quantile",
            "latency_us",
            F.col("_n").alias("n_users"),
        )
    )


def survival_curve(events: DataFrame) -> DataFrame:
    """Kaplan-Meier survival over user lifespans — the churn curve
    ("what fraction of users are still active t days after their
    first event"): S(t) = Π_{i<=t} (1 - d_i / n_i) with d_i = users
    whose observed lifespan is exactly i days and n_i = users at
    risk entering day i.

    Scale: the fact table collapses to per-user (first, last) in ONE
    map-side-combinable shuffle; everything after runs on the
    lifespan-day spine (≤ observation-window days, ~30 here), where
    the at-risk suffix and the cumulative product are prefix
    aggregates on a constant-valued non-foldable partition (the
    distwindow warning-channel convention).  The product is
    exp(Σ ln(term)) with each ln rounded to DECIMAL(18,9) at its
    libm call and the final exp re-rounded — the PSI contract — and
    a dead-end flag (d_i = n_i, ln(0)) pins survival to exactly 0.0
    from that day on instead of feeding -inf through exp.
    """
    per_user = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("_first"),
            F.max(F.to_date("ts")).alias("_last"),
        )
    )
    died = (
        per_user.select(
            F.datediff(F.col("_last"), F.col("_first")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n_died"))
    )
    total = per_user.agg(F.count(F.lit(1)).alias("_n_total"))
    part = F.pmod(F.col("t"), F.lit(1))
    w_before = (
        Window.partitionBy(part)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    at_risk = (
        died.crossJoin(F.broadcast(total))
        .withColumn(
            "n_at_risk",
            F.col("_n_total")
            - F.coalesce(F.sum("n_died").over(w_before), F.lit(0)),
        )
        .drop("_n_total")
    )
    term_ln = F.expr(
        "CASE WHEN n_died < n_at_risk THEN"
        " CAST(ln(1.0 - CAST(n_died AS DOUBLE)"
        " / CAST(n_at_risk AS DOUBLE)) AS DECIMAL(18,9)) END"
    )
    dead = F.when(F.col("n_died") == F.col("n_at_risk"), 1).otherwise(0)
    w_cum = (
        Window.partitionBy(part)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    staged = at_risk.select(
        "t",
        "n_at_risk",
        "n_died",
        F.sum(term_ln).over(w_cum).alias("_sum_ln"),
        F.sum(dead).over(w_cum).alias("_n_dead_end"),
    )
    survival = F.when(F.col("_n_dead_end") > 0, F.lit(0.0)).otherwise(
        F.expr(
            "CAST(CAST(exp(CAST(COALESCE(_sum_ln, 0) AS DOUBLE))"
            " AS DECIMAL(18,9)) AS DOUBLE)"
        )
    )
    return staged.select(
        "t", "n_at_risk", "n_died", survival.alias("survival")
    )


QUERIES = {
    "event_path_trigrams": q_path_trigrams,
    "multi_touch_attribution": q_attribution,
    "survival_curve": lambda spark, sf: survival_curve(
        load_table(spark, sf, "events")
    ),
    "behavioral_entropy": lambda spark, sf: behavioral_entropy(
        load_table(spark, sf, "events")
    ),
    "rfm_segments": lambda spark, sf: rfm_segments(
        load_table(spark, sf, "events")
    ),
    "conversion_latency_quantiles": lambda spark, sf: (
        conversion_latency_quantiles(load_table(spark, sf, "events"))
    ),
}

_ENT_TERM = (
    "CASE WHEN {c} > 0 THEN CAST(({c} / n_events)"
    " * ln({c} / n_events) AS DECIMAL(18,9)) ELSE 0 END"
)
_ENT_TERMS = " + ".join(
    _ENT_TERM.format(c=c)
    for c in [f"c{i}" for i in range(len(EVENT_TYPES))] + ["n_other"]
)
_ENT_COUNTS = ",\n         ".join(
    f"SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS c{i}"
    for i, t in enumerate(EVENT_TYPES)
)
_ENT_OTHER = ", ".join(f"'{t}'" for t in EVENT_TYPES)


ORACLES = {
    # the oracle is the naive unpartitioned-NTILE spelling the
    # operator exists to avoid — the decomposition must be invisible
    "rfm_segments": f"""
WITH per_user AS (
  SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS frequency,
         SUM(CAST(value AS DECIMAL(28,6))) AS mon
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
),
anchor AS (SELECT MAX(ts) AS a FROM events),
base AS (
  SELECT user_id,
         CAST((epoch_us(a) - epoch_us(last_ts)) // 86400000000 AS INT)
           AS recency_days,
         frequency, mon
  FROM per_user CROSS JOIN anchor
),
q AS (
  SELECT *,
         NTILE({RFM_BUCKETS}) OVER (ORDER BY recency_days, user_id) AS r_q,
         NTILE({RFM_BUCKETS}) OVER (ORDER BY frequency DESC, user_id) AS f_q,
         NTILE({RFM_BUCKETS}) OVER (ORDER BY mon DESC, user_id) AS m_q
  FROM base
)
SELECT user_id, recency_days,
       CAST(frequency AS BIGINT) AS frequency,
       CAST(mon AS DOUBLE) AS monetary,
       CAST(r_q AS INT) AS r_quintile,
       CAST(f_q AS INT) AS f_quintile,
       CAST(m_q AS INT) AS m_quintile,
       CAST(r_q * 100 + f_q * 10 + m_q AS INT) AS rfm_code
FROM q
""",
    "event_path_trigrams": f"""
WITH stepped AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER w AS t2,
         LEAD(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
counts AS (
  SELECT event_type || '>' || t2 || '>' || t3 AS path,
         COUNT(*) AS n_occurrences,
         COUNT(DISTINCT user_id) AS n_users
  FROM stepped WHERE t2 IS NOT NULL AND t3 IS NOT NULL
  GROUP BY 1
)
SELECT path, n_occurrences, n_users,
       CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, path)
            AS INTEGER) AS rank
FROM counts
QUALIFY rank <= {PATH_TOP_K}
""",
    "multi_touch_attribution": f"""
WITH purchases AS (
  SELECT user_id, event_id AS p_eid, ts AS p_ts, value AS p_value
  FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id, event_id AS t_eid, ts AS t_ts, event_type AS touch_type
  FROM events WHERE event_type IN ('click', 'view')
),
joined AS (
  SELECT p.p_eid, p.p_value, t.touch_type, t.t_ts, t.t_eid
  FROM purchases p JOIN touches t ON p.user_id = t.user_id
  WHERE t.t_ts < p.p_ts
    AND epoch_us(p.p_ts) - epoch_us(t.t_ts) <= {ATTR_WINDOW_DAYS * 86_400_000_000}
),
sized AS (
  SELECT p_eid, p_value, touch_type,
         ROW_NUMBER() OVER (PARTITION BY p_eid ORDER BY t_ts, t_eid) AS pos,
         COUNT(*) OVER (PARTITION BY p_eid) AS n
  FROM joined
),
scored AS (
  SELECT touch_type,
         CAST(CASE WHEN n = 1 THEN 1.0
                   WHEN n = 2 THEN 0.5
                   WHEN pos = 1 THEN {ATTR_END_W!r}
                   WHEN pos = n THEN {ATTR_END_W!r}
                   ELSE {ATTR_MID_W!r} / CAST(n - 2 AS DOUBLE) END
              AS DECIMAL(18,9)) AS credit,
         CAST(CASE WHEN n = 1 THEN 1.0
                   WHEN n = 2 THEN 0.5
                   WHEN pos = 1 THEN {ATTR_END_W!r}
                   WHEN pos = n THEN {ATTR_END_W!r}
                   ELSE {ATTR_MID_W!r} / CAST(n - 2 AS DOUBLE) END * p_value
              AS DECIMAL(18,9)) AS credited
  FROM sized
)
SELECT touch_type,
       COUNT(*) AS n_touches,
       CAST(CAST(SUM(credit) AS DECIMAL(28,9)) AS DOUBLE) AS total_credit,
       CAST(CAST(SUM(credited) AS DECIMAL(28,9)) AS DOUBLE)
         AS attributed_revenue
FROM scored
GROUP BY touch_type
""",
}


ORACLES["behavioral_entropy"] = f"""
WITH hist AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         {_ENT_COUNTS},
         SUM(CASE WHEN event_type IN ({_ENT_OTHER}) THEN 0 ELSE 1 END)
           AS n_other
  FROM events
  GROUP BY user_id
)
SELECT user_id,
       n_events,
       CAST(n_other AS BIGINT) AS n_other,
       CAST(-({_ENT_TERMS}) AS DOUBLE) AS entropy_nats
FROM hist
"""

_CONV_Q_LIST = ", ".join(str(q) for q in CONV_QUANTILES)

# the oracle keeps the naive unpartitioned ROW_NUMBER/COUNT() OVER ()
# spelling the operator avoids
ORACLES["conversion_latency_quantiles"] = f"""
WITH s AS (
  SELECT user_id, MIN(ts) AS st FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS pt, MIN(s.st) AS st
  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.st
  WHERE e.event_type = 'purchase' GROUP BY 1
),
lat AS (
  SELECT user_id, epoch_us(pt) - epoch_us(st) AS latency_us FROM p
),
r AS (
  SELECT user_id, latency_us,
         ROW_NUMBER() OVER (ORDER BY latency_us, user_id) AS rk,
         COUNT(*) OVER () AS n
  FROM lat
),
q AS (SELECT CAST(UNNEST([{_CONV_Q_LIST}]) AS DOUBLE) AS quantile)
SELECT q.quantile, r.latency_us, CAST(r.n AS BIGINT) AS n_users
FROM q JOIN r ON r.rk = ceil(q.quantile * r.n)
"""

ORACLES["survival_curve"] = """
WITH per_user AS (
  SELECT user_id,
         CAST(MIN(ts) AS DATE) AS first_day,
         CAST(MAX(ts) AS DATE) AS last_day
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
),
died AS (
  SELECT CAST(last_day - first_day AS INT) AS t, COUNT(*) AS n_died
  FROM per_user GROUP BY 1
),
tot AS (SELECT COUNT(*) AS n_total FROM per_user),
risk AS (
  SELECT t, n_died,
         n_total - COALESCE(SUM(n_died) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS n_at_risk
  FROM died CROSS JOIN tot
),
staged AS (
  SELECT t, n_at_risk, n_died,
         SUM(CASE WHEN n_died < n_at_risk THEN
               CAST(ln(1.0 - CAST(n_died AS DOUBLE)
                     / CAST(n_at_risk AS DOUBLE)) AS DECIMAL(18,9))
             END) OVER w AS sum_ln,
         SUM(CASE WHEN n_died = n_at_risk THEN 1 ELSE 0 END)
           OVER w AS n_dead_end
  FROM risk
  WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
)
SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk, n_died,
       CASE WHEN n_dead_end > 0 THEN 0.0
            ELSE CAST(CAST(exp(CAST(COALESCE(sum_ln, 0) AS DOUBLE))
                 AS DECIMAL(18,9)) AS DOUBLE) END AS survival
FROM staged
"""
