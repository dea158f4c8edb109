"""Unit tests for the generalized CEP operator (operators/cep.py).

Semantics pinned on hand-built inline frames where every match is
enumerable by eye: greedy last-before binding, within-window kills,
negation kills (including a hit on the final row), and the
spec-generated DuckDB twin producing identical rows. Plan shape: one
Exchange, no Join — the device that makes this the same plan at
100 TB.
"""

import duckdb
import pandas as pd
import pytest

from flink_engagement_pipeline_spark.operators.cep import (
    Pattern,
    PatternStep,
    match_pattern,
    pattern_oracle_sql,
)

VCP = Pattern(
    steps=(
        PatternStep("view", "event_type = 'view'"),
        PatternStep("click", "event_type = 'click'"),
        PatternStep("purchase", "event_type = 'purchase'"),
    ),
    within=100,
    negation="event_type = 'error'",
)


def _events(spark, rows):
    """rows: (user_id, event_id, event_type, ts_us)"""
    return spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts_us long"
    )


def _matches(spark, rows, pattern):
    return sorted(
        tuple(r) for r in match_pattern(
            _events(spark, rows),
            pattern,
            partition_by="user_id",
            ts_col="ts_us",
            tiebreak=("event_id",),
        ).collect()
    )


def test_basic_sequence_and_latency(spark):
    rows = [(1, 1, "view", 10), (1, 2, "click", 20), (1, 3, "purchase", 30)]
    assert _matches(spark, rows, VCP) == [(1, 10, 20, 30, 20)]


def test_greedy_last_before_binding(spark):
    # two views and two clicks before the purchase: the purchase binds
    # the LATEST click (22), which bound the LATEST view before it (15)
    rows = [
        (1, 1, "view", 10),
        (1, 2, "view", 15),
        (1, 3, "click", 18),
        (1, 4, "click", 22),
        (1, 5, "purchase", 30),
    ]
    assert _matches(spark, rows, VCP) == [(1, 15, 22, 30, 15)]


def test_each_final_event_is_its_own_match(spark):
    rows = [
        (1, 1, "view", 10),
        (1, 2, "click", 20),
        (1, 3, "purchase", 30),
        (1, 4, "purchase", 40),
    ]
    assert _matches(spark, rows, VCP) == [
        (1, 10, 20, 30, 20),
        (1, 10, 20, 40, 30),
    ]


def test_order_is_enforced(spark):
    # click before view: no (view -> click) chain exists
    rows = [(1, 1, "click", 10), (1, 2, "view", 20), (1, 3, "purchase", 30)]
    assert _matches(spark, rows, VCP) == []


def test_within_window_kills(spark):
    rows = [(1, 1, "view", 10), (1, 2, "click", 20), (1, 3, "purchase", 130)]
    assert _matches(spark, rows, VCP) == []
    # boundary is inclusive: gap == within matches
    rows2 = [(1, 1, "view", 10), (1, 2, "click", 20), (1, 3, "purchase", 110)]
    assert _matches(spark, rows2, VCP) == [(1, 10, 20, 110, 100)]


def test_negation_kills_between_first_and_final(spark):
    rows = [
        (1, 1, "view", 10),
        (1, 2, "error", 15),
        (1, 3, "click", 20),
        (1, 4, "purchase", 30),
    ]
    assert _matches(spark, rows, VCP) == []
    # an error BEFORE the bound view does not kill
    rows2 = [
        (1, 1, "error", 5),
        (1, 2, "view", 10),
        (1, 3, "click", 20),
        (1, 4, "purchase", 30),
    ]
    assert _matches(spark, rows2, VCP) == [(1, 10, 20, 30, 20)]


def test_negation_hit_on_final_row_kills(spark):
    # negation over a non-type column so the final row itself can hit:
    # (first step, final step] is the negation window
    rows = [
        (1, 1, "view", 10),
        (1, 2, "click", 20),
        (1, 9, "purchase", 30),
    ]
    pat = Pattern(
        steps=(
            PatternStep("view", "event_type = 'view'"),
            PatternStep("click", "event_type = 'click'"),
            PatternStep("purchase", "event_type = 'purchase'"),
        ),
        negation="event_id >= 9",
    )
    assert _matches(spark, rows, pat) == []


def test_two_step_pattern_with_negation(spark):
    pat = Pattern(
        steps=(
            PatternStep("view", "event_type = 'view'"),
            PatternStep("purchase", "event_type = 'purchase'"),
        ),
        within=100,
        negation="event_type = 'click'",
    )
    direct = [(1, 1, "view", 10), (1, 2, "purchase", 30)]
    assert _matches(spark, direct, pat) == [(1, 10, 30, 20)]
    clicked = [
        (2, 1, "view", 10),
        (2, 2, "click", 20),
        (2, 3, "purchase", 30),
    ]
    assert _matches(spark, clicked, pat) == []


def test_partitions_do_not_leak(spark):
    rows = [
        (1, 1, "view", 10),
        (2, 2, "click", 20),
        (1, 3, "click", 25),
        (2, 4, "purchase", 30),
        (1, 5, "purchase", 35),
    ]
    # user 2 has click+purchase but no view; user 1 has all three
    assert _matches(spark, rows, VCP) == [(1, 10, 25, 35, 25)]


def test_spec_validation():
    with pytest.raises(ValueError, match="two steps"):
        Pattern(steps=(PatternStep("a", "x = 1"),))
    with pytest.raises(ValueError, match="unique"):
        Pattern(
            steps=(PatternStep("a", "x = 1"), PatternStep("a", "x = 2"))
        )


def test_oracle_twin_matches_spark(spark):
    """The spec-generated DuckDB SQL and the Spark plan produce
    identical match rows on a fixture exercising every constraint."""
    rows = [
        (1, 1, "view", 10), (1, 2, "click", 20), (1, 3, "purchase", 30),
        (2, 4, "view", 10), (2, 5, "error", 12), (2, 6, "click", 20),
        (2, 7, "purchase", 30),
        (3, 8, "view", 10), (3, 9, "click", 20), (3, 10, "purchase", 200),
        (4, 11, "view", 5), (4, 12, "view", 9), (4, 13, "click", 20),
        (4, 14, "purchase", 80), (4, 15, "purchase", 90),
    ]
    spark_rows = _matches(spark, rows, VCP)
    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "event_type", "ts_us"]
    )
    con = duckdb.connect()
    con.register("ev_tbl", pdf)
    sql = pattern_oracle_sql(
        VCP,
        source_sql="SELECT * FROM ev_tbl",
        partition_by="user_id",
        ts_col="ts_us",
        tiebreak=("event_id",),
    )
    duck_rows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert spark_rows == duck_rows
    assert len(spark_rows) == 3  # users 1 and 4 (x2); 2 negated, 3 windowed


def test_plan_one_exchange_no_join(spark):
    rows = [(1, 1, "view", 10), (1, 2, "click", 20), (1, 3, "purchase", 30)]
    plan = (
        match_pattern(
            _events(spark, rows),
            VCP,
            partition_by="user_id",
            ts_col="ts_us",
            tiebreak=("event_id",),
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_carry_cols_first_and_final_values(spark):
    """carry_cols must surface the column AT the bound first-step row
    and the match row's own value — the session-scope device: equality
    between the two restricts matches to one session."""
    rows = [
        # user 1: whole sequence in session 7 -> carried == final
        (1, 1, "view", 10, 7),
        (1, 2, "click", 20, 7),
        (1, 3, "purchase", 30, 7),
        # user 2: view in session 1, purchase in session 2
        (2, 4, "view", 10, 1),
        (2, 5, "click", 20, 1),
        (2, 6, "purchase", 30, 2),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, event_type string, ts_us long,"
        " sess_id long",
    )
    got = match_pattern(
        df,
        Pattern(steps=VCP.steps, negation="event_type = 'error'"),
        partition_by="user_id",
        ts_col="ts_us",
        tiebreak=("event_id",),
        carry_cols=("sess_id",),
    )
    assert {"view_sess_id", "purchase_sess_id"} <= set(got.columns)
    vals = {
        r["user_id"]: (r["view_sess_id"], r["purchase_sess_id"])
        for r in got.collect()
    }
    assert vals == {1: (7, 7), 2: (1, 2)}
    in_session = got.filter("view_sess_id = purchase_sess_id")
    assert [r["user_id"] for r in in_session.collect()] == [1]


def test_carry_cols_oracle_parity(spark):
    rows = [
        (1, 1, "view", 10, 7), (1, 2, "click", 20, 7),
        (1, 3, "purchase", 30, 7),
        (2, 4, "view", 10, 1), (2, 5, "click", 20, 1),
        (2, 6, "purchase", 30, 2),
        (3, 7, "view", 10, 4), (3, 8, "error", 15, 4),
        (3, 9, "click", 20, 4), (3, 10, "purchase", 30, 4),
    ]
    pat = Pattern(steps=VCP.steps, negation="event_type = 'error'")
    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, event_type string, ts_us long,"
        " sess_id long",
    )
    spark_rows = sorted(
        tuple(r)
        for r in match_pattern(
            df, pat, partition_by="user_id", ts_col="ts_us",
            tiebreak=("event_id",), carry_cols=("sess_id",),
        ).collect()
    )
    pdf = pd.DataFrame(
        rows,
        columns=["user_id", "event_id", "event_type", "ts_us", "sess_id"],
    )
    con = duckdb.connect()
    con.register("ev_tbl", pdf)
    sql = pattern_oracle_sql(
        pat, source_sql="SELECT * FROM ev_tbl", partition_by="user_id",
        ts_col="ts_us", tiebreak=("event_id",), carry_cols=("sess_id",),
    )
    duck_rows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert spark_rows == duck_rows
    assert len(spark_rows) == 2  # user 3 negated


def _inc_matches(spark, batches, pattern, carry_cols=()):
    """Feed time-ordered batches through match_pattern_incremental,
    materializing state between batches (as a replay sink would)."""
    from flink_engagement_pipeline_spark.operators.cep import (
        match_pattern_incremental,
    )

    state = None
    out = []
    schema = (
        "user_id long, event_id long, event_type string, ts_us long"
        + (", sess_id long" if "sess_id" in carry_cols else "")
    )
    for rows in batches:
        df = spark.createDataFrame(rows, schema)
        matches, state = match_pattern_incremental(
            df,
            pattern,
            state,
            partition_by="user_id",
            ts_col="ts_us",
            tiebreak=("event_id",),
            carry_cols=carry_cols,
        )
        out += [tuple(r) for r in matches.collect()]
        # materialize state rows (what the replay sink persists) so the
        # next batch reads data, not a growing lazy plan
        state = spark.createDataFrame(state.collect(), state.schema)
    return sorted(out)


# a history exercising every constraint: greedy re-binding across the
# split (user 5 is the level-aliasing trap: view@25 after the click
# must NOT replace the chain view@10 bound at click@20), negation
# arriving in a later batch, window kills, multiple matches
_INC_ROWS = [
    (1, 1, "view", 10), (1, 2, "click", 20), (1, 3, "purchase", 30),
    (2, 4, "view", 10), (2, 5, "error", 12), (2, 6, "click", 20),
    (2, 7, "purchase", 30),
    (3, 8, "view", 10), (3, 9, "click", 20), (3, 10, "purchase", 200),
    (4, 11, "view", 5), (4, 12, "view", 9), (4, 13, "click", 20),
    (4, 14, "purchase", 80), (4, 15, "purchase", 90),
    (5, 16, "view", 10), (5, 17, "click", 20), (5, 18, "view", 25),
    (5, 19, "purchase", 30), (5, 20, "click", 40), (5, 21, "purchase", 45),
    (6, 22, "view", 10), (6, 23, "click", 20), (6, 24, "error", 25),
    (6, 25, "purchase", 30), (6, 26, "view", 35), (6, 27, "click", 40),
    (6, 28, "purchase", 50),
]


def test_incremental_equals_full_at_every_split(spark):
    """match_pattern_incremental must reproduce the full-history match
    set across EVERY two-batch split of a time-ordered fixture — the
    stream==batch property with constant per-key state. The fixture
    includes the per-level-state trap: a view arriving between a
    bound click and the purchase must not corrupt the click's chain."""
    rows = sorted(_INC_ROWS, key=lambda r: (r[3], r[1]))
    full = _matches(spark, rows, VCP)
    assert len(full) == 6  # sanity: rich fixture (users 1, 4x2, 5x2, 6)
    for split in range(0, len(rows) + 1, 3):
        got = _inc_matches(spark, [rows[:split], rows[split:]], VCP)
        assert got == full, f"split at {split}"


def test_incremental_three_batches_and_carry_cols(spark):
    rows = [
        (1, 1, "view", 10, 7), (1, 2, "click", 20, 7),
        (1, 3, "purchase", 30, 7),
        (2, 4, "view", 10, 1), (2, 5, "click", 20, 1),
        (2, 6, "purchase", 30, 2),
        (5, 7, "view", 40, 3), (5, 8, "click", 50, 3),
        (5, 9, "view", 55, 3), (5, 10, "purchase", 60, 3),
    ]
    rows = sorted(rows, key=lambda r: (r[3], r[1]))
    pat = Pattern(steps=VCP.steps, negation="event_type = 'error'")
    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, event_type string, ts_us long,"
        " sess_id long",
    )
    full = sorted(
        tuple(r)
        for r in match_pattern(
            df, pat, partition_by="user_id", ts_col="ts_us",
            tiebreak=("event_id",), carry_cols=("sess_id",),
        ).collect()
    )
    got = _inc_matches(
        spark,
        [rows[:3], rows[3:7], rows[7:]],
        pat,
        carry_cols=("sess_id",),
    )
    assert got == full
    # the chain carries the BOUND view's session id across batches
    assert any(r[-2] == 1 and r[-1] == 2 for r in got)  # user 2 crosses


def test_count_constraint_quantifier(spark):
    """CountConstraint = the MATCH_RECOGNIZE quantifier class: at
    least / at most N occurrences between the bound first step and the
    final row. min bound, max bound, and the final-row-inclusive
    window all pinned."""
    from flink_engagement_pipeline_spark.operators.cep import CountConstraint

    steps = (
        PatternStep("view", "event_type = 'view'"),
        PatternStep("purchase", "event_type = 'purchase'"),
    )
    two_clicks = Pattern(
        steps=steps,
        counts=(CountConstraint("event_type = 'click'", 2, None),),
    )
    one_click = [(1, 1, "view", 10), (1, 2, "click", 20), (1, 3, "purchase", 30)]
    assert _matches(spark, one_click, two_clicks) == []
    both = one_click[:2] + [(1, 9, "click", 25), (1, 3, "purchase", 30)]
    assert _matches(spark, both, two_clicks) == [(1, 10, 30, 20)]
    # clicks BEFORE the bound view don't count toward the quantifier
    early = [
        (2, 1, "click", 1), (2, 2, "click", 2), (2, 3, "view", 10),
        (2, 4, "click", 20), (2, 5, "purchase", 30),
    ]
    assert _matches(spark, early, two_clicks) == []
    # max bound: at MOST one click
    capped = Pattern(
        steps=steps,
        counts=(CountConstraint("event_type = 'click'", 0, 1),),
    )
    assert _matches(spark, one_click, capped) == [(1, 10, 30, 20)]
    assert _matches(spark, both, capped) == []


def test_count_constraint_oracle_parity(spark):
    from flink_engagement_pipeline_spark.operators.cep import CountConstraint

    pat = Pattern(
        steps=(
            PatternStep("view", "event_type = 'view'"),
            PatternStep("purchase", "event_type = 'purchase'"),
        ),
        within=100,
        negation="event_type = 'error'",
        counts=(CountConstraint("event_type = 'click'", 2, None),),
    )
    rows = [
        (1, 1, "view", 10), (1, 2, "click", 20), (1, 3, "click", 25),
        (1, 4, "purchase", 30),
        (2, 5, "view", 10), (2, 6, "click", 20), (2, 7, "purchase", 30),
        (3, 8, "view", 10), (3, 9, "click", 20), (3, 10, "click", 22),
        (3, 11, "error", 25), (3, 12, "purchase", 30),
    ]
    spark_rows = _matches(spark, rows, pat)
    assert len(spark_rows) == 1  # only user 1: 2 clicks, no error
    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "event_type", "ts_us"]
    )
    con = duckdb.connect()
    con.register("ev_tbl", pdf)
    sql = pattern_oracle_sql(
        pat, source_sql="SELECT * FROM ev_tbl", partition_by="user_id",
        ts_col="ts_us", tiebreak=("event_id",),
    )
    assert spark_rows == sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_count_constraint_incremental(spark):
    """Quantifier constraints survive the incremental split: the
    per-key count base carries across batches."""
    from flink_engagement_pipeline_spark.operators.cep import CountConstraint

    pat = Pattern(
        steps=(
            PatternStep("view", "event_type = 'view'"),
            PatternStep("purchase", "event_type = 'purchase'"),
        ),
        counts=(CountConstraint("event_type = 'click'", 2, None),),
    )
    rows = [
        (1, 1, "view", 10), (1, 2, "click", 20), (1, 3, "click", 25),
        (1, 4, "purchase", 30),
        (2, 5, "view", 10), (2, 6, "click", 20), (2, 7, "purchase", 30),
    ]
    rows = sorted(rows, key=lambda r: (r[3], r[1]))
    full = _matches(spark, rows, pat)
    assert len(full) == 1
    for split in range(0, len(rows) + 1, 2):
        got = _inc_matches(spark, [rows[:split], rows[split:]], pat)
        assert got == full, f"split at {split}"


def test_expire_state_equivalence_and_shrink(spark):
    """Watermark expiry between batches must not change the match set
    (an expired chain could never complete a match), and keys with
    only-expired state must leave the table when the pattern has no
    count constraints — the time-bounded-state story."""
    from flink_engagement_pipeline_spark.operators.cep import (
        expire_state,
        match_pattern_incremental,
    )

    pat = Pattern(steps=VCP.steps, within=100)  # no counts -> rows can drop
    rows0 = [
        (1, 1, "view", 10), (1, 2, "click", 20),       # completes later
        (2, 3, "view", 11), (2, 4, "click", 21),       # goes stale
        (3, 5, "view", 15),                            # view only, stale
    ]
    rows1 = [
        (1, 6, "purchase", 105),                       # within 100 of v@10? 95 ✓
        (2, 7, "purchase", 300),                       # 289 > 100: no match
    ]
    full = _matches(spark, sorted(rows0 + rows1, key=lambda r: (r[3], r[1])), pat)
    assert full == [(1, 10, 20, 105, 95)]

    def run(expire):
        state = None
        got = []
        for rows, wm in ((rows0, 30), (rows1, 300)):
            df = _events(spark, rows)
            m, state = match_pattern_incremental(
                df, pat, state, partition_by="user_id", ts_col="ts_us",
                tiebreak=("event_id",),
            )
            got += [tuple(r) for r in m.collect()]
            state = spark.createDataFrame(state.collect(), state.schema)
            if expire:
                state = expire_state(state, pat, wm)
        return sorted(got), state

    plain, _ = run(expire=False)
    expired, final_state = run(expire=True)
    assert plain == expired == full
    # after the second batch's watermark (300), every chain is older
    # than 300-100: the state table empties entirely
    final_state = expire_state(
        spark.createDataFrame(final_state.collect(), final_state.schema),
        pat,
        400,
    )
    assert final_state.count() == 0


def test_expire_state_requires_within():
    from flink_engagement_pipeline_spark.operators.cep import expire_state

    pat = Pattern(steps=VCP.steps)  # no within
    with pytest.raises(ValueError, match="within"):
        expire_state(None, pat, 0)
