"""Force the DISTRIBUTED paths of the gated relational operators — the
code that actually runs at 100-TB scale, which the size gates hide from
every small-scale test: the bucketed anti-join and count-distinct
(SINGLE_TASK_BYTES gate off) and the partitioned-hash-join fallback of
the nation queries (BROADCAST_DIM_BYTES gate off) — and compare each
against its DuckDB oracle at sf0.001 (review finding: the scale path
shipped tested only via manual gate-forcing)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod
import lauchy_ray.pipelines.queries as Q
import lauchy_ray.stages.bucketing as B

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["nation", "customer", "orders", "events", "documents", "part",
          "lineitem"]

GATED_QUERIES = ["orders_by_nation", "top_orders_per_nation",
                 "customers_no_f_orders", "distinct_users_by_type",
                 # round-3 widening: bloom semi (verify path B), term
                 # shuffle, fused outer-agg — all force the bucket path
                 "building_orders_bloom", "top_terms", "user_value_outer",
                 # training-corpus ops: decontam's gram-bucket fallback,
                 # tf-idf's two bucket shuffles, windowed/set-op folds
                 "decontam", "tf_idf", "user_running_value",
                 "users_intersect", "users_except",
                 # round-3 session-4 widening: the (user, day) cohort
                 # fold, the two-phase sweep-line, the JSON payload agg
                 "cohort_retention", "session_concurrency",
                 "props_k_stats", "entity_resolution", "triangle_counts",
                 "word_cooccur", "q3_shipping_priority", "cum_distinct_users",
                 "cep_absence", "user_value_intervals", "late_ship_orders",
                 "norm_dedup"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for col in df.columns:
        if pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype("int64")
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", GATED_QUERIES)
def test_distributed_path_matches_oracle(con, name, monkeypatch):
    # gates off: broadcast falls back to the shuffle join, single-task
    # fast path falls back to the hash-bucket shuffle
    monkeypatch.setattr(Q, "BROADCAST_DIM_BYTES", 0)
    monkeypatch.setattr(B, "SINGLE_TASK_BYTES", 0)
    res = entrymod.queries()[name](SF_DIR)
    got = _normalize(res.to_pandas() if hasattr(res, "to_pandas") else res)
    exp = _normalize(con.execute(entrymod.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp), f"{name}: {len(got)} != {len(exp)} rows"
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            np.testing.assert_allclose(got[c].to_numpy(), exp[c].to_numpy(),
                                       rtol=0, atol=1e-9, err_msg=f"{name}.{c}")
        else:
            assert (got[c] == exp[c]).all(), f"{name}: column {c} differs"


def test_empty_customer_dimension_broadcast_path(tmp_path):
    """The gated-broadcast inner join must yield 0 rows (not IndexError)
    when the dimension table is empty (review finding: clip-to--1 on an
    empty sorted-key array)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({"n_nationkey": pa.array([0], pa.int32()),
                             "n_name": ["A"]}), d / "nation.parquet")
    pq.write_table(pa.table({"c_custkey": pa.array([], pa.int64()),
                             "c_nationkey": pa.array([], pa.int32())}),
                   d / "customer.parquet")
    pq.write_table(pa.table({"o_orderkey": [1, 2],
                             "o_custkey": [10, 11],
                             "o_totalprice": [5.0, 6.0]}),
                   d / "orders.parquet")
    coded, names = Q._orders_coded_by_nation(str(d), ["o_totalprice"])
    assert len(coded.to_pandas()) == 0


def test_q5_fallback_join_path_matches_broadcast(ray_session, monkeypatch):
    """Over the broadcast gate, q5_region_revenue degrades to partitioned
    hash joins — same rows as the broadcast plan."""
    import lauchy_ray.pipelines.queries as Q

    sf = "/root/testdata/sf0.001"
    fast = (Q.q_q5_region_revenue(sf).to_pandas()
            .sort_values("n_name").reset_index(drop=True))
    monkeypatch.setattr(Q, "BROADCAST_DIM_BYTES", 0)
    slow = (Q.q_q5_region_revenue(sf).to_pandas()
            .sort_values("n_name").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, slow)


def test_hash_inner_join_null_keys_match_nothing(ray_session):
    """SQL inner join on NULL matches nothing; pandas merge matches
    NA == NA, so _inner_bucket must drop null-key rows (keys are coerced
    to nullable Int64 by the tag step)."""
    import ray.data as rd

    from lauchy_ray.stages.join import hash_inner_join

    left = pd.DataFrame({"k": pd.array([1, None, 2, None], dtype="Int64"),
                         "lv": [10, 20, 30, 40]})
    right = pd.DataFrame({"k": pd.array([1, None, 3], dtype="Int64"),
                          "rv": [100, 200, 300]})
    out = (hash_inner_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                           {"lv": "Int64"}, {"rv": "Int64"})
           .to_pandas())
    assert len(out) == 1
    assert int(out["k"].iloc[0]) == 1
    assert int(out["lv"].iloc[0]) == 10 and int(out["rv"].iloc[0]) == 100


def test_q7_q12_fallback_join_path_matches_broadcast(ray_session,
                                                     monkeypatch):
    """Over the broadcast gate, the round-5 Q7/Q12 shapes degrade to
    bucketed hash joins — same rows as the broadcast plan."""
    import lauchy_ray.pipelines.queries as Q

    sf = "/root/testdata/sf0.001"

    def run(fn, keys):
        res = fn(sf)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values(keys).reset_index(drop=True)

    k7 = ["supp_nation", "cust_nation", "l_year"]
    fast7 = run(Q.q_q7_nation_volume, k7)
    fast12 = run(Q.q_q12_priority_by_status, ["l_linestatus"])
    monkeypatch.setattr(Q, "BROADCAST_DIM_BYTES", 0)
    slow7 = run(Q.q_q7_nation_volume, k7)
    slow12 = run(Q.q_q12_priority_by_status, ["l_linestatus"])
    pd.testing.assert_frame_equal(fast7, slow7.astype(fast7.dtypes.to_dict()))
    pd.testing.assert_frame_equal(
        fast12, slow12.astype(fast12.dtypes.to_dict()))


def test_q8_q17_fallback_join_path_matches_broadcast(ray_session,
                                                     monkeypatch):
    """Over the broadcast gate, Q8/Q17 degrade to bucketed hash joins —
    same values as the broadcast plans (exact integers either way)."""
    import lauchy_ray.pipelines.queries as Q

    sf = "/root/testdata/sf0.001"

    def run(fn, keys):
        res = fn(sf)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values(keys).reset_index(drop=True)

    fast8 = run(Q.q_q8_market_share, ["l_year"])
    fast17 = run(Q.q_q17_small_qty_revenue, ["sum_price_e2"])
    monkeypatch.setattr(Q, "BROADCAST_DIM_BYTES", 0)
    slow8 = run(Q.q_q8_market_share, ["l_year"])
    slow17 = run(Q.q_q17_small_qty_revenue, ["sum_price_e2"])
    pd.testing.assert_frame_equal(fast8, slow8.astype(fast8.dtypes.to_dict()))
    pd.testing.assert_frame_equal(
        fast17, slow17.astype(fast17.dtypes.to_dict()))


def test_q19_fallback_join_path_matches_broadcast(ray_session, monkeypatch):
    import lauchy_ray.pipelines.queries as Q

    sf = "/root/testdata/sf0.001"
    fast = Q.q_q19_brand_revenue(sf).to_pandas()
    monkeypatch.setattr(Q, "BROADCAST_DIM_BYTES", 0)
    slow = Q.q_q19_brand_revenue(sf).to_pandas()
    pd.testing.assert_frame_equal(fast, slow.astype(fast.dtypes.to_dict()))


def test_q10_backlog_fallbacks_match_broadcast(ray_session, monkeypatch):
    import lauchy_ray.pipelines.queries as Q

    sf = "/root/testdata/sf0.001"
    fast10 = Q.q_q10_returned_customers(sf)
    fast10 = (fast10.to_pandas() if hasattr(fast10, "to_pandas")
              else fast10).reset_index(drop=True)
    fastb = Q.q_orders_backlog(sf).to_pandas().reset_index(drop=True)
    monkeypatch.setattr(Q, "BROADCAST_DIM_BYTES", 0)
    slow10 = Q.q_q10_returned_customers(sf)
    slow10 = (slow10.to_pandas() if hasattr(slow10, "to_pandas")
              else slow10).reset_index(drop=True)
    slowb = Q.q_orders_backlog(sf).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        fast10, slow10.astype(fast10.dtypes.to_dict()))
    pd.testing.assert_frame_equal(fastb, slowb.astype(fastb.dtypes.to_dict()))


def test_inactive_rich_fallback_matches_broadcast(ray_session, monkeypatch):
    import lauchy_ray.pipelines.queries as Q

    sf = "/root/testdata/sf0.001"

    def run():
        return (Q.q_inactive_rich_customers(sf).to_pandas()
                .sort_values("c_nationkey").reset_index(drop=True))

    fast = run()
    monkeypatch.setattr(Q, "BROADCAST_DIM_BYTES", 0)
    slow = run()
    pd.testing.assert_frame_equal(fast, slow.astype(fast.dtypes.to_dict()))
