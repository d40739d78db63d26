"""Skew kill-switch (r3 verdict item #6): the bucketed per-key pipelines
must not collapse when one conv_id owns ~20% of all rows. The hot conv
hashes into ONE bucket, so its task is a single larger vectorized kernel
call — wall-time must stay within a small factor of the uniform-input
time (theory at 4 workers/64 buckets: hot task ≈ 0.2·N work vs ≈ N/4
per uniform wave ⇒ ratio < 1). The assert allows 3x to survive this
sandbox's co-tenant noise; the measured ratio is recorded in BASELINE.md
("Skew resilience")."""

import time

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from lauchy_ray.stages import bucketing

N_ROWS = 400_000
N_CONVS = 8_000


def _turnsish(skewed: bool, seed: int = 3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    if skewed:
        # one conv owns 20% of the stream; the rest uniform
        hot = int(N_ROWS * 0.2)
        conv_num = np.concatenate([
            np.zeros(hot, np.int64),
            rng.integers(1, N_CONVS, N_ROWS - hot)])
    else:
        conv_num = rng.integers(0, N_CONVS, N_ROWS)
    order = rng.permutation(N_ROWS)
    conv_num = conv_num[order]
    ts = np.int64(1_700_000_000_000_000) + np.cumsum(
        rng.integers(0, 2_000_000, N_ROWS))
    df = pd.DataFrame({
        "conv_id": pd.array([f"CONV_{c:06d}" for c in conv_num],
                            dtype=object),
        "ts_us": ts,
        "turn_idx": rng.integers(0, 1 << 20, N_ROWS).astype(np.int64),
    })
    return df


def _run(df: pd.DataFrame) -> float:
    # kernel defined LOCALLY so cloudpickle ships it by value (test
    # modules aren't importable on Ray workers)
    def sessionish(df: pd.DataFrame) -> pd.DataFrame:
        """A representative per-conv kernel (the sessionize shape): sort
        by (conv, ts), gap-split, per-session count — key-agnostic,
        vectorized."""
        df = df.sort_values(["conv_id", "ts_us"], kind="stable")
        conv = df["conv_id"].to_numpy()
        ts = df["ts_us"].to_numpy(np.int64)
        new_conv = np.r_[True, conv[1:] != conv[:-1]]
        gap = np.r_[True, (ts[1:] - ts[:-1]) > 30 * 60 * 1_000_000]
        sess = np.cumsum(new_conv | gap) - 1
        sizes = np.bincount(sess)
        first = np.r_[True, sess[1:] != sess[:-1]]
        return pd.DataFrame({"conv_id": conv[first],
                             "n_turns": sizes.astype(np.int64)})

    ds = rd.from_pandas(df).repartition(8).materialize()
    t0 = time.time()
    out = bucketing.group_map_by_key(
        ds, "conv_id", sessionish,
        size_bytes=bucketing.SINGLE_TASK_BYTES + 1)  # force the shuffle path
    n = out.count()
    assert n > 0
    return time.time() - t0


@pytest.mark.parametrize("dummy", [0])
def test_hot_key_within_3x_of_uniform(ray_session, dummy):
    uniform = _turnsish(skewed=False)
    skewed = _turnsish(skewed=True)
    _run(uniform)  # warm the worker pool once
    t_uniform = min(_run(uniform), _run(uniform))
    t_skewed = min(_run(skewed), _run(skewed))
    ratio = t_skewed / t_uniform
    print(f"skew ratio: {ratio:.2f} (uniform {t_uniform:.2f}s, "
          f"skewed {t_skewed:.2f}s)")
    assert ratio < 3.0, (
        f"hot-conv input {ratio:.1f}x slower than uniform — a single key "
        f"owning 20% of rows must not serialize the bucketed pipeline")
