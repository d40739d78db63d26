"""Training-data operators: text analysis, near-dedup family, ANN-IVF
recall, multimodal plumbing, ordered conv join."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data as rd

from lauchy_ray.stages import dedup_near, multimodal, textops
from lauchy_ray.stages.join import broadcast_join, ordered_conv_join


@pytest.fixture(scope="module")
def docs_ds():
    """Synthetic docs with PLANTED near-duplicates: pairs (i, i+100) share
    ~90% of their text."""
    rng = np.random.default_rng(3)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    base = [" ".join(rng.choice(words, size=40)) for _ in range(100)]
    texts = list(base)
    for i in range(20):  # 20 near-dup copies with a small edit
        toks = base[i].split()
        toks[5] = "MUTATED"
        texts.append(" ".join(toks))
    for i in range(20, 40):  # 20 exact dups
        texts.append(base[i])
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return rd.from_pandas(df), df


def test_minhash_lsh_finds_planted_dups(docs_ds):
    ds, df = docs_ds
    pairs = dedup_near.minhash_lsh_dups(ds, threshold=0.8)
    found = set(zip(pairs["a"], pairs["b"]))
    planted_near = {(i, i + 100) for i in range(20)}
    planted_exact = {(i, i + 100) for i in range(20, 40)}
    assert planted_exact <= found, "exact dup pairs must all be found"
    assert len(planted_near & found) >= 18, "near-dup recall too low"
    # verified jaccard really is high for reported pairs
    assert (pairs["jaccard"] >= 0.8).all()
    # no random-pair false positives (unplanted pairs have ~0 overlap)
    extras = found - planted_near - planted_exact
    assert len(extras) == 0


def test_minhash_deterministic(docs_ds):
    ds, _ = docs_ds
    a = dedup_near.minhash_lsh_dups(ds, threshold=0.8)
    b = dedup_near.minhash_lsh_dups(ds, threshold=0.8)
    pd.testing.assert_frame_equal(a, b)


def test_minhash_distributed_verify_matches_broadcast(docs_ds):
    """The no-broadcast shuffle-based verify path (the 100-TB-safe form)
    must produce exactly the broadcast path's pairs and jaccards."""
    ds, _ = docs_ds
    bc = dedup_near.minhash_lsh_dups(ds, threshold=0.8, verify="broadcast")
    dist = dedup_near.minhash_lsh_dups(ds, threshold=0.8, verify="distributed")
    pd.testing.assert_frame_equal(bc, dist)
    assert len(bc) > 0


def test_minhash_sql_oracle_parity(docs_ds):
    """At threshold 0.9 (recall ≈ 1) the exact all-pairs jaccard oracle in
    DuckDB must equal the banded+verified pipeline output."""
    import duckdb

    ds, df = docs_ds
    got = dedup_near.minhash_lsh_dups(ds, threshold=0.9)
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(dedup_near.minhash_sql(threshold=0.9)).fetchdf()
    assert set(zip(got["a"], got["b"])) == set(zip(exp["a"], exp["b"]))
    assert len(exp) > 0, "fixture must exercise the pair path"


def test_simhash_finds_exact_and_near(docs_ds):
    ds, _ = docs_ds
    pairs = dedup_near.simhash_dups(ds, max_hamming=6, n_blocks=10)
    found = set(zip(pairs["a"], pairs["b"]))
    planted_exact = {(i, i + 100) for i in range(20, 40)}
    assert planted_exact <= found
    # hamming distance of identical docs is 0
    h = dedup_near.SimHasher.simhash64("hello world test")
    assert h == dedup_near.SimHasher.simhash64("hello world test")


def test_simhash_batch_matches_reference(docs_ds):
    """The vectorized batch SimHasher must agree bit-for-bit with the
    single-doc reference implementation (and handle empty docs)."""
    _, df = docs_ds
    sub = pd.concat([df.head(7), pd.DataFrame({"doc_id": [999], "text": [""]})],
                    ignore_index=True)
    got = dedup_near.SimHasher()(sub)
    exp = [dedup_near.SimHasher.simhash64(t) for t in sub["text"]]
    assert got["simhash"].tolist() == exp
    assert got["simhash"].iloc[-1] == 0  # empty doc → 0


def test_simhash_sql_oracle_parity(docs_ds):
    """The DuckDB oracle (full simhash in SQL over md5-60bit token hashes)
    must produce EXACTLY the pairs the distributed pipeline finds."""
    import duckdb

    ds, df = docs_ds
    pairs = dedup_near.simhash_dups(ds, max_hamming=3, n_blocks=4)
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(dedup_near.simhash_sql(max_hamming=3)).fetchdf()
    got_set = set(zip(pairs["a"], pairs["b"]))
    exp_set = set(zip(exp["a"], exp["b"]))
    assert got_set == exp_set
    assert len(exp_set) > 0, "fixture must exercise the pair path"


def test_ngram_jaccard_values():
    assert dedup_near.jaccard("abc def ghi", "abc def ghi") == 1.0
    assert dedup_near.jaccard("abc def", "zzz qqq") < 0.2
    near = dedup_near.jaccard("the quick brown fox jumps", "the quick brown fox jumped")
    assert 0.5 < near < 1.0


def test_embedding_near_dups_and_ivf_recall():
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(400, 32))
    # plant near-dups: vectors 300..319 are tiny perturbations of 0..19
    mat[300:320] = mat[0:20] + rng.normal(scale=0.01, size=(20, 32))
    ids = np.arange(400)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(mat.astype(np.float32))})
    ds = rd.from_pandas(df)

    pairs = dedup_near.embedding_near_dups(ds, ids, mat, threshold=0.98).to_pandas()
    found = set(zip(pairs["a"], pairs["b"]))
    assert {(i, i + 300) for i in range(20)} <= found

    # IVF recall vs brute force for 3 queries
    qids = ids[:3]
    qmat = mat[:3]
    approx = dedup_near.ann_ivf_topk(ds, qids, qmat, n_centroids=8, nprobe=4, k=5)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = qn @ mn.T
    hits = 0
    for qi, qid in enumerate(qids):
        s = sims[qi].copy()
        s[qid] = -np.inf
        brute = set(np.argsort(-s)[:5])
        got = set(approx[approx["qid"] == qid]["vec_id"])
        hits += len(brute & got)
    assert hits / 15 >= 0.6, f"IVF recall too low: {hits}/15"


def test_embedding_near_dups_ivf_blocking():
    """IVF-blocked near-dup (the 10^9-vector scale path): planted
    near-identical pairs must survive the multiprobe blocking, and every
    reported pair must also be a brute-force pair (no false positives)."""
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(400, 32))
    mat[300:320] = mat[0:20] + rng.normal(scale=0.01, size=(20, 32))
    ids = np.arange(400)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(mat.astype(np.float32))})
    ds = rd.from_pandas(df)

    blocked = dedup_near.embedding_near_dups_ivf(ds, threshold=0.98,
                                                 n_centroids=16, nassign=2)
    found = set(zip(blocked["a"], blocked["b"]))
    planted = {(i, i + 300) for i in range(20)}
    assert len(planted & found) >= 18, f"blocking recall too low: {len(planted & found)}/20"
    brute = dedup_near.embedding_near_dups(ds, ids, mat, threshold=0.98).to_pandas()
    brute_set = set(zip(brute["a"], brute["b"]))
    assert found <= brute_set  # blocking can only LOSE pairs, never invent


def test_textops_deterministic_and_sane():
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["The quick brown fox. And the dog!",
                                "el la de que y en un por",
                                ""]})
    q = textops.quality_batch(df)
    assert (q["n_chars"] == [33, 24, 0]).all()
    assert q.loc[2, "quality"] < q.loc[0, "quality"]
    lang = textops.lang_id_batch(df)
    assert lang["lang_pred"].tolist() == ["en", "es", "und"]
    tok = textops.token_count_batch(df)
    assert tok["n_ws_tokens"].tolist() == [7, 8, 0]
    fp1 = textops.fingerprint_batch(df)
    fp2 = textops.fingerprint_batch(df)
    assert fp1["fingerprint"].tolist() == fp2["fingerprint"].tolist()
    # identical token streams (case/punct-insensitive) share a fingerprint;
    # different docs don't collide
    long = " ".join(f"w{i}" for i in range(50))
    fps = textops.fingerprint_batch(pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": [long, long.upper() + "!", "zz " * 50]}))
    assert fps.loc[0, "fingerprint"] == fps.loc[1, "fingerprint"]
    assert fps.loc[0, "fingerprint"] != fps.loc[2, "fingerprint"]


def test_multimodal_plumbing():
    media = rd.from_arrow(multimodal.generate_media(48, seed=42))
    outs = multimodal.media_pipeline(media, dim=32)
    img = outs["image_features"].to_pandas()
    assert len(img) > 0
    assert all(len(f) == 32 for f in img["features"])
    aud = outs["audio_features"].to_pandas()
    assert (aud["duration_ms"] > 0).all()
    frames = outs["video_frames"].to_pandas()
    assert len(frames) >= media.filter(lambda r: r["kind"] == "video").count()
    # deterministic stub: same payload → same features
    img2 = outs["image_features"].to_pandas()
    assert img.sort_values("media_id")["width"].tolist() == \
        img2.sort_values("media_id")["width"].tolist()


def test_strict_mode_raises():
    """strict=True: undecodable payloads raise instead of silently taking
    the stub path (real PNGs decode fine)."""
    import pyarrow as pa
    dec = multimodal.ImageDecode(strict=True)
    bad = pa.table({"media_id": pa.array([1], pa.int64()),
                    "payload": pa.array([b"not a png"], pa.binary())})
    with pytest.raises(ValueError):
        dec(bad)


def test_png_wav_roundtrip():
    """The pure-stdlib codecs must round-trip bit-exactly, including
    filter types 1/2 on decode."""
    import struct
    import zlib

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(21, 33), dtype=np.uint8)
    assert np.array_equal(multimodal.png_decode_gray(
        multimodal.png_encode_gray(px)), px)
    # filter-1 (Sub) and filter-2 (Up) rows decode correctly
    w = 5
    rows = rng.integers(0, 256, size=(3, w), dtype=np.uint8)
    raw = b"\x00" + rows[0].tobytes()
    sub = np.diff(np.concatenate([[0], rows[1]]).astype(np.int16)) % 256
    raw += b"\x01" + sub.astype(np.uint8).tobytes()
    up = (rows[2].astype(np.int16) - rows[1]) % 256
    raw += b"\x02" + up.astype(np.uint8).tobytes()

    def chunk(tag, data):
        import binascii
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, 3, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert np.array_equal(multimodal.png_decode_gray(png), rows)

    samples = rng.integers(-30000, 30000, size=777).astype(np.int16)
    rate, got = multimodal.wav_decode(multimodal.wav_encode(samples))
    assert rate == multimodal.WAV_RATE and np.array_equal(got, samples)


def test_ordered_conv_join(fixture_dir):
    from lauchy_ray.sources.stream import read_stream
    ds = ordered_conv_join(read_stream(fixture_dir["turns"], arrival=False))
    df = ds.to_pandas().sort_values(["conv_id", "turn_idx"])
    one = df[df["conv_id"] == df["conv_id"].iloc[0]]
    # prev_role is the role of the previous turn_idx; first gap is -1
    assert one.iloc[0]["prev_role"] == "" and one.iloc[0]["gap_us"] == -1
    assert one.iloc[2]["prev_role"] == one.iloc[1]["role"]
    # gaps are event-time deltas in turn order: mostly positive, negative
    # only where a late turn carries an older event-ts (bounded by lateness)
    assert (one["gap_us"].iloc[1:] >= -30 * 60 * 1_000_000).all()
    assert (one["gap_us"].iloc[1:] > 0).mean() > 0.8


def test_broadcast_join():
    df = pd.DataFrame({"k": ["a", "b", "c"], "v": [1, 2, 3]})
    lookup = {"a": {"name": "A"}, "b": {"name": "B"}}
    out = broadcast_join(rd.from_pandas(df), lookup, "k",
                         {"kname": "name"}).to_pandas()
    assert out.sort_values("k")["kname"].tolist() == ["A", "B", None]


def test_pii_scrub_redaction():
    """PII redaction: emails/CC-runs/phones replaced in order, counts from
    the ORIGINAL text, and the SQL oracle is byte-identical."""
    import duckdb

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["contact me at alice.b+spam@example.co.uk or 555-123-4567",
                 "card 4111111111111111 exp 12/26; backup 12345678901234",
                 "no pii here, just words and 12 digits: 123456789012",
                 "bob@x.io and carol@y.org share 555-000-1111"],
    })
    out = textops.pii_scrub_batch(df)
    assert out.loc[0, "n_email"] == 1 and out.loc[0, "n_phone"] == 1
    assert "<EMAIL>" in out.loc[0, "clean_text"]
    assert "<PHONE>" in out.loc[0, "clean_text"]
    assert out.loc[1, "n_cc"] == 2
    assert out.loc[1, "clean_text"].count("<CC>") == 2
    assert out.loc[2, "n_cc"] == 0  # 12 digits: below the 13-digit floor
    assert out.loc[3, "n_email"] == 2
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(textops.pii_scrub_sql()).fetchdf()
    g = out.sort_values("doc_id").reset_index(drop=True)
    x = exp.sort_values("doc_id").reset_index(drop=True)[g.columns]
    pd.testing.assert_frame_equal(g, x, check_dtype=False)


def test_exact_collapse_degenerate_cluster_matches_oracle():
    """A 70-copy identical-text cluster exceeds MAX_BUCKET (64): without
    exact-duplicate collapse the cap silently drops all C(70,2) pairs and
    the pipeline diverges from the all-pairs SQL oracle; with the default
    collapse the cluster costs O(output) and matches the oracle exactly.
    Same for simhash (cluster > SIMHASH_MAX_BUCKET would need 257 docs,
    so simhash is checked for collapse==no-collapse equivalence here)."""
    import duckdb

    rng = np.random.default_rng(11)
    words = "alpha beta gamma delta epsilon zeta".split()
    texts = [" ".join(rng.choice(words, size=30)) for _ in range(30)]
    texts += ["the same boilerplate page body repeated verbatim"] * 70
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(df)

    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(dedup_near.minhash_sql(threshold=0.9)).fetchdf()
    exp_set = set(zip(exp["a"], exp["b"]))
    assert len(exp_set) >= 70 * 69 // 2

    got = dedup_near.minhash_lsh_dups(ds, threshold=0.9)  # collapse default
    assert set(zip(got["a"], got["b"])) == exp_set
    assert (got["jaccard"] >= 0.9).all()

    # without collapse, the cap drops the cluster — the documented
    # divergence this feature exists to remove
    raw = dedup_near.minhash_lsh_dups(ds, threshold=0.9, collapse_exact=False)
    assert len(raw) < len(got)

    sh_c = dedup_near.simhash_dups(ds)
    sh_exp = con.execute(dedup_near.simhash_sql(max_hamming=3)).fetchdf()
    assert set(zip(sh_c["a"], sh_c["b"])) == set(zip(sh_exp["a"], sh_exp["b"]))


def test_exact_collapse_equivalence_on_normal_corpus(docs_ds):
    """On a corpus whose duplicate groups are under the caps, collapse
    on/off must be pair-identical (it is a pure optimization)."""
    ds, _ = docs_ds
    on = dedup_near.minhash_lsh_dups(ds, threshold=0.8, collapse_exact=True)
    off = dedup_near.minhash_lsh_dups(ds, threshold=0.8, collapse_exact=False)
    assert set(zip(on["a"], on["b"])) == set(zip(off["a"], off["b"]))
    s_on = dedup_near.simhash_dups(ds, max_hamming=6, n_blocks=10)
    s_off = dedup_near.simhash_dups(ds, max_hamming=6, n_blocks=10,
                                    collapse_exact=False)
    assert set(zip(s_on["a"], s_on["b"])) == set(zip(s_off["a"], s_off["b"]))


def test_near_dup_clusters_matches_pairs(docs_ds):
    """Cluster assignment must equal union-find over the pair output."""
    ds, df = docs_ds
    pairs = dedup_near.minhash_lsh_dups(ds, threshold=0.9)
    clusters = dedup_near.near_dup_clusters(ds, method="minhash",
                                            threshold=0.9).to_pandas()
    assert len(clusters) == len(df)
    # reference: union-find over the expanded pair list
    parent = {int(d): int(d) for d in df["doc_id"]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = {d: find(int(d)) for d in df["doc_id"]}
    got = dict(zip(clusters["doc_id"], clusters["rep_id"]))
    assert got == exp


def test_near_dup_clusters_big_group_linear():
    """A 10^5-copy exact-duplicate cluster: the pair contract would be
    ~5e9 pairs; the cluster contract completes and is LINEAR (one row per
    doc), with every copy assigned rep_id = the smallest doc_id."""
    n_copies = 100_000
    texts = ["the same boilerplate page body repeated verbatim"] * n_copies
    texts += ["a genuinely distinct document about alpha beta gamma",
              "another distinct document entirely unlike the others"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = dedup_near.near_dup_clusters(
        rd.from_pandas(df), method="minhash", threshold=0.9).to_pandas()
    assert len(out) == len(df)                      # linear output
    copies = out[out["doc_id"] < n_copies]
    assert (copies["rep_id"] == 0).all()            # one cluster, min id rep
    singles = out[out["doc_id"] >= n_copies]
    assert (singles["rep_id"] == singles["doc_id"]).all()


def test_expand_pairs_guard_refuses_blowup():
    """The pair-list API must refuse (not OOM) when expansion exceeds
    max_expand_pairs, pointing at the cluster contract."""
    texts = ["the same boilerplate page body repeated verbatim"] * 500
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError, match="near_dup_clusters"):
        dedup_near.minhash_lsh_dups(ds, threshold=0.9,
                                    max_expand_pairs=10_000)
    # and the cluster path handles the same corpus fine
    out = dedup_near.near_dup_clusters(ds, method="simhash").to_pandas()
    assert len(out) == 500 and (out["rep_id"] == 0).all()


def test_dedup_docs_cli(tmp_path):
    """dedup-docs CLI: cluster sink (doc_id, rep_id, keep) + opt-in pair
    sink, end-to-end through main()."""
    import pyarrow.parquet as pq

    from lauchy_ray.cli import main

    texts = ["unique document number %d about topic %d" % (i, i)
             for i in range(40)]
    texts += [texts[0], texts[0], texts[1]]          # exact dups
    src = tmp_path / "docs.parquet"
    pq.write_table(
        __import__("pyarrow").table({"doc_id": list(range(len(texts))),
                                     "text": texts}), str(src))
    out = tmp_path / "clusters"
    pairs_out = tmp_path / "pairs"
    rc = main(["dedup-docs", "--input", str(src), "--out", str(out),
               "--pairs-out", str(pairs_out)])
    assert rc in (0, None)
    c = pq.ParquetDataset(str(out)).read().to_pandas()
    assert len(c) == len(texts)
    assert set(c.columns) == {"doc_id", "rep_id", "keep"}
    # doc 40, 41 are copies of doc 0; 42 of doc 1
    by_id = c.set_index("doc_id")
    assert by_id.loc[40, "rep_id"] == 0 and not by_id.loc[40, "keep"]
    assert by_id.loc[41, "rep_id"] == 0
    assert by_id.loc[42, "rep_id"] == 1
    assert by_id.loc[0, "keep"] and by_id.loc[1, "keep"]
    p = pq.ParquetDataset(str(pairs_out)).read().to_pandas()
    assert {(0, 40), (0, 41), (40, 41), (1, 42)} <= set(zip(p["a"], p["b"]))


def test_asof_join_ties_and_no_match():
    """As-of semantics pinned: inclusive ts ties (click at the same ts is
    eligible, greatest event_id wins), -1 sentinel when no prior click,
    per-user isolation."""
    import pyarrow as pa

    from lauchy_ray.stages.join import asof_join

    def ev(eid, uid, ts_us, etype):
        return {"event_id": eid, "user_id": uid,
                "ts": pd.Timestamp(ts_us, unit="us"), "event_type": etype}

    rows = [
        ev(0, 1, 100, "click"), ev(1, 1, 200, "click"),
        ev(2, 1, 200, "click"),            # tie at 200: eid 2 wins
        ev(3, 1, 200, "purchase"),         # same-ts click eligible
        ev(4, 1, 300, "purchase"),
        ev(5, 2, 50, "purchase"),          # user 2 has no clicks -> -1
        ev(6, 3, 400, "click"),            # user 3: click only, no probe
    ]
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df)
    left = ds.filter(expr="event_type == 'purchase'")
    right = ds.filter(expr="event_type == 'click'")
    for size_ds in (ds, None):   # single-task fast path AND bucketed path
        out = (asof_join(left, right, size_ds=size_ds).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
        assert out["event_id"].tolist() == [3, 4, 5]
        assert out["asof_id"].tolist() == [2, 2, -1]
        assert out["asof_ts_us"].tolist() == [200, 200, -1]
        assert out["ts_us"].tolist() == [200, 300, 50]


def test_range_join_uncovered_points():
    """Range join pins: containment is inclusive on both ends, points
    between/before intervals get the -1 sentinel, per-key isolation."""
    from lauchy_ray.stages.join import range_join

    pts = pd.DataFrame({
        "conv_id": ["A", "A", "A", "A", "B"],
        "turn_idx": [0, 1, 2, 3, 0],
        "ts_us": [100, 200, 250, 301, 100],
    })
    ivs = pd.DataFrame({
        "conv_id": ["A", "A", "B"],
        "session_id": [0, 1, 0],
        "start_us": [100, 300, 500],
        "end_us": [200, 400, 600],
    })
    out = (range_join(rd.from_pandas(pts), rd.from_pandas(ivs))
           .to_pandas().sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    assert out["session_id"].tolist() == [0, 0, -1, 1, -1]


def test_hll_accuracy_and_split_invariance():
    """HLL sketch pins: (1) estimate error vs exact stays inside the
    ~3.25/sqrt(m) envelope at cardinalities spanning the linear-counting
    and raw regimes; (2) the estimate is invariant to how rows split
    across batches (register merges are elementwise max)."""
    from lauchy_ray.stages.sketches import (HLL_M, hll_merge_registers,
                                            hll_register_partial)

    rng = np.random.default_rng(7)
    frames = []
    for key, n in [("small", 40), ("mid", 800), ("large", 20000)]:
        users = rng.choice(10**9, size=n, replace=False)
        frames.append(pd.DataFrame({
            "event_type": key,
            "user_id": np.repeat(users, 3)}))  # dups must not count
    df = pd.concat(frames, ignore_index=True).sample(frac=1.0,
                                                     random_state=3)

    one = hll_merge_registers(hll_register_partial(
        df, "event_type", "user_id"), "event_type")
    parts = [hll_register_partial(c, "event_type", "user_id")
             for c in np.array_split(df, 13)]
    many = hll_merge_registers(pd.concat(parts, ignore_index=True),
                               "event_type")
    pd.testing.assert_frame_equal(
        one.sort_values("event_type").reset_index(drop=True),
        many.sort_values("event_type").reset_index(drop=True))

    est = dict(zip(one["event_type"], one["est_users"]))
    for key, n in [("small", 40), ("mid", 800), ("large", 20000)]:
        rel = abs(est[key] - n) / n
        assert rel < 3.25 / np.sqrt(HLL_M) + 0.02, (key, est[key], n, rel)


def test_knn_join_recall_and_soundness():
    """IVF KNN self-join: per-vector recall vs brute-force top-k stays
    high under multiprobe blocking, planted near-identical twins are each
    other's #1 neighbour, and every reported neighbour is a real in-bucket
    candidate (symmetric-distance soundness: s values match brute)."""
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(400, 32))
    mat[300:320] = mat[0:20] + rng.normal(scale=0.01, size=(20, 32))
    ids = np.arange(400)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(mat.astype(np.float32))})
    ds = rd.from_pandas(df)

    got = dedup_near.knn_join_ivf(ds, k=3, n_centroids=16,
                                  nassign=2).to_pandas()
    by_q = got.groupby("qid")["vec_id"].agg(set)
    # per-vector cap honoured
    assert got.groupby("qid").size().max() <= 3
    # planted twins find each other
    twin_hits = sum(1 for i in range(20)
                    if i + 300 in by_q.get(i, set())
                    and i in by_q.get(i + 300, set()))
    assert twin_hits >= 18, f"twin recall too low: {twin_hits}/20"
    # aggregate recall vs brute-force top-3
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mn @ mn.T
    np.fill_diagonal(sims, -np.inf)
    hits = total = 0
    for qid in ids:
        brute = set(np.argsort(-sims[qid])[:3])
        total += 3
        hits += len(brute & by_q.get(qid, set()))
    assert hits / total >= 0.6, f"knn recall too low: {hits}/{total}"


def test_chunk_dedup_semantics():
    """Chunk dedup: trailing partial chunks dropped, first occurrence in
    (doc_id, chunk_idx) order kept, later identical chunks counted as
    duplicates — including the cross-doc and intra-doc cases."""
    from lauchy_ray.stages.textops import chunk_dedup_summary

    a = " ".join(f"w{i}" for i in range(8))          # one 8-token chunk
    b = " ".join(f"x{i}" for i in range(8))
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            a + " tail tok",          # doc1: chunk A + dropped partial
            b,                        # doc2: chunk B (unique)
            a + " " + a,              # doc3: A twice (one dup vs doc1,
                                      # one intra-corpus dup)
            b + " " + a,              # doc4: B dup + A dup
        ],
    })
    got = (chunk_dedup_summary(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [1, 2, 3, 4]
    assert got["n_chunks"].tolist() == [1, 1, 2, 2]
    # doc1 owns A (first), doc2 owns B; doc3's two A's are both dups;
    # doc4's B and A are both dups
    assert got["n_dup_chunks"].tolist() == [0, 0, 2, 2]
    assert got["dup_ratio"].tolist() == [0.0, 0.0, 1.0, 1.0]


def test_token_packing_multi_range(tmp_path, monkeypatch):
    """The multi-range prefix path of q_token_packing: testdata never has
    >65536 docs, so shrink PACK_RANGE_W and check the distributed range
    fold against a scalar global cumsum — including a zero-token doc
    (occupies no tape, absent from output) and a gap in doc_id space."""
    from lauchy_ray.pipelines import queries as Q

    monkeypatch.setattr(Q, "PACK_RANGE_W", 5)
    monkeypatch.setattr(Q, "PACK_CAPACITY", 16)
    rng = np.random.default_rng(7)
    ids = np.r_[np.arange(23), np.arange(40, 60)]     # gap across ranges
    texts = [" ".join(f"t{j}" for j in range(int(rng.integers(0, 13))))
             for _ in ids]
    df = pd.DataFrame({"doc_id": ids, "text": texts,
                       "lang": "en", "source": "s", "n_chars": 1})
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))

    got = (Q.q_token_packing(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # scalar reference: global cumsum in doc_id order
    ref_rows = []
    off = 0
    for i, t in sorted(zip(ids, texts)):
        n = len(t.split())
        if n > 0:
            ref_rows.append((i, n, off // 16, (off + n - 1) // 16,
                             off % 16))
        off += n
    ref = pd.DataFrame(ref_rows, columns=["doc_id", "n_tokens",
                                          "start_bin", "end_bin",
                                          "bin_off"]).astype("int64")
    pd.testing.assert_frame_equal(
        got[ref.columns].astype("int64"), ref)


def test_mixture_sample_rebalances_domains(tmp_path):
    """Temperature-0.5 mixture: the dominant source is downsampled harder
    than rare sources (keep-rate ratio follows 1/sqrt(c) up to the cap),
    and the pick is a pure function of doc_id (rerun-identical)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lauchy_ray.pipelines.queries import q_mixture_sample

    rows = []
    for i in range(3000):
        rows.append({"doc_id": i, "text": "x", "lang": "en",
                     "source": "big", "n_chars": 1})
    for i in range(3000, 3300):
        rows.append({"doc_id": i, "text": "x", "lang": "en",
                     "source": "small", "n_chars": 1})
    sf = str(tmp_path / "mix")
    import os
    os.makedirs(sf)
    pq.write_table(pa.Table.from_pylist(rows), f"{sf}/documents.parquet")
    out = q_mixture_sample(sf).to_pandas()
    got = out.groupby("source").size()
    keep_big = got.get("big", 0) / 3000
    keep_small = got.get("small", 0) / 300
    # alpha=0.5: keep-rate ratio small/big = sqrt(c_big/c_small) = sqrt(10)
    assert keep_small > 2.0 * keep_big
    out2 = q_mixture_sample(sf).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_bottomk_and_curriculum_shapes(tmp_path):
    """Bottom-k: ≤k rows per lang, positions dense, mergeable-determinism
    (same result from a 1-row-batch rerun). Curriculum: bands 1..10,
    monotone in n_tok."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lauchy_ray.pipelines.queries import (BOTTOMK_K, q_bottomk_sample,
                                              q_curriculum_bands)

    rows = [{"doc_id": i, "lang": ["en", "de"][i % 2],
             "text": "w " * (i % 37 + 1), "source": "s", "n_chars": 1}
            for i in range(500)]
    sf = str(tmp_path / "bk")
    os.makedirs(sf)
    pq.write_table(pa.Table.from_pylist(rows), f"{sf}/documents.parquet")

    bk = q_bottomk_sample(sf).to_pandas()
    per = bk.groupby("lang").size()
    assert (per <= BOTTOMK_K).all() and (per == BOTTOMK_K).all()
    for _, grp in bk.groupby("lang"):
        assert list(grp["pos"]) == list(range(1, len(grp) + 1))
        assert grp["h"].is_monotonic_increasing

    cb = q_curriculum_bands(sf).to_pandas()
    assert cb["band"].between(1, 10).all()
    m = cb.groupby("band")["n_tok"]
    lo, hi = m.min(), m.max()
    bands = sorted(lo.index)
    for a, b in zip(bands, bands[1:]):
        assert hi[a] <= lo[b]  # bands partition the value axis monotonically


def test_cluster_assignments_distributed_equals_broadcast(docs_ds):
    """broadcast_limit=0 forces the bucketed distributed join (the 100-TB
    dup-heavy path: no driver-held doc->root map); output must be
    IDENTICAL to the broadcast fast path on a corpus mixing exact-dup
    groups, near-dup pairs, and singletons."""
    _, df = docs_ds
    # fresh Dataset: Ray Data's eager GC can free the module fixture's
    # materialized blocks after earlier consumers, and stale block refs
    # fail arg-prep with "owner is unknown"
    ds = rd.from_pandas(df)
    rep_pairs, multi = dedup_near.collapse_and_pairs(ds, "minhash",
                                                     threshold=0.9)
    fast = (dedup_near.cluster_assignments(ds, rep_pairs, multi)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    dist = (dedup_near.cluster_assignments(ds, rep_pairs, multi,
                                           broadcast_limit=0)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        fast, dist[["doc_id", "rep_id"]].astype(fast.dtypes.to_dict()))
    # multi as a DATASET (the no-driver-materialization form) too
    import ray.data as rd_
    dist2 = (dedup_near.cluster_assignments(ds, rep_pairs,
                                            rd_.from_pandas(multi),
                                            broadcast_limit=0)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        fast, dist2[["doc_id", "rep_id"]].astype(fast.dtypes.to_dict()))
