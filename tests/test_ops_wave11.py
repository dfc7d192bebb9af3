"""Session-11 operator wave: multi-source BFS, SCD2 validity intervals,
event debouncing, bloom-prefiltered semi join, group-aware holdout split,
smoothed target encoding, longest activity streaks, inverted index,
systematic sampling. Each test pins the op against an independent local
recompute (DuckDB SQL or exact construction) at tiny scale."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["documents", "events", "lineitem", "orders", "customer", "supplier", "part"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def _assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame):
    a, b = _sorted(a), _sorted(b)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert np.array_equal(av.astype(np.float64), bv.astype(np.float64)), c
        else:
            assert (av == bv).all(), c


# ------------------------------------------------------- multi-source BFS


def _brute_bfs(edges, seeds, max_hops, directed):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = h
                    nxt.add(m)
        frontier = nxt
    return dist


def test_bfs_hops_matches_brute_force(ray_session):
    import ray.data

    from orc_format_ray.ops.graph import bfs_hops

    rng = np.random.default_rng(7)
    n_edges = 300
    edges = np.unique(rng.integers(0, 40, size=(n_edges, 2)), axis=0)
    edges = edges[edges[:, 0] != edges[:, 1]]
    ds = ray.data.from_pandas(pd.DataFrame({"src": edges[:, 0], "dst": edges[:, 1]}))
    for directed in (False, True):
        for hops in (0, 1, 3):
            out = bfs_hops(ds, seeds=[0, 5], max_hops=hops, directed=directed)
            want = _brute_bfs([tuple(e) for e in edges], [0, 5], hops, directed)
            got = dict(zip(out["node"], out["hops"]))
            assert got == want, (directed, hops)


def test_bfs_hops_isolated_seed_and_empty(ray_session):
    import ray.data

    from orc_format_ray.ops.graph import bfs_hops

    ds = ray.data.from_pandas(pd.DataFrame({"src": [1, 2], "dst": [2, 3]}))
    out = bfs_hops(ds, seeds=[99], max_hops=2)
    assert list(out["node"]) == [99] and list(out["hops"]) == [0]
    out = bfs_hops(ds, seeds=[], max_hops=2)
    assert out.empty and list(out.columns) == ["node", "hops"]

# ------------------------------------------- SCD2 intervals + debounce


def test_scd2_intervals_semantics(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import scd2_intervals

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2, 2, 3],
            "ts": pd.to_datetime([10, 20, 30, 40, 5, 15, 7], unit="s"),
            "event_type": ["a", "a", "b", "a", "x", "x", "q"],
        }
    )
    ds = ray.data.from_pandas(df)
    out = (
        scd2_intervals(ds).to_pandas().sort_values(["user_id", "valid_from_us"]).reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 3],
            "event_type": ["a", "b", "a", "x", "q"],
            "valid_from_us": [10_000_000, 30_000_000, 40_000_000, 5_000_000, 7_000_000],
            "valid_to_us": [30_000_000, 40_000_000, -1, -1, -1],
        }
    )
    _assert_frames_equal(out, want)


def test_scd2_intervals_vs_duckdb_events(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import scd2_intervals

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"])
    out = scd2_intervals(ds).to_pandas()
    want = _con().execute(
        "WITH x AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS o, event_type AS a, "
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS pa FROM events), "
        "ch AS (SELECT user_id, o, a FROM x WHERE pa IS NULL OR a <> pa) "
        "SELECT user_id, a AS event_type, o AS valid_from_us, "
        "coalesce(lead(o) OVER (PARTITION BY user_id ORDER BY o), CAST(-1 AS BIGINT)) AS valid_to_us FROM ch"
    ).fetchdf()
    _assert_frames_equal(out, want)


def test_scd2_intervals_guards(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import scd2_intervals

    dup = pd.DataFrame(
        {
            "user_id": [1, 1],
            "ts": pd.to_datetime([10, 10], unit="s"),
            "event_type": ["a", "b"],
        }
    )
    with pytest.raises(Exception, match="duplicate or unordered"):
        scd2_intervals(ray.data.from_pandas(dup)).to_pandas()
    nul = pd.DataFrame(
        {
            "user_id": [1],
            "ts": pd.to_datetime([10], unit="s"),
            "event_type": pd.array([None], dtype="string"),
        }
    )
    with pytest.raises(Exception, match="non-null"):
        scd2_intervals(ray.data.from_pandas(nul)).to_pandas()


def test_debounce_vs_duckdb_events(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import debounce

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "event_id"])
    out = debounce(ds, min_gap_us=21_600_000_000).to_pandas()
    want = _con().execute(
        "WITH x AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id, "
        "lag(CAST(epoch_us(ts) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us FROM events) "
        "SELECT user_id, ts_us, event_id FROM x WHERE prev_us IS NULL OR ts_us - prev_us > 21600000000"
    ).fetchdf()
    _assert_frames_equal(out, want)


def test_debounce_semantics_and_guard(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import debounce

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime([0, 50, 111, 3], unit="s"),
            "event_id": [10, 11, 12, 20],
        }
    )
    out = debounce(ray.data.from_pandas(df), min_gap_us=60_000_000).to_pandas()
    assert sorted(out["event_id"]) == [10, 12, 20]
    dup = df.copy()
    dup.loc[1, "ts"] = dup.loc[0, "ts"]
    with pytest.raises(Exception, match="duplicate or unordered"):
        debounce(ray.data.from_pandas(dup), min_gap_us=60_000_000).to_pandas()

# ------------------------------------------------ bloom-prefiltered joins


def test_bloom_semi_join_exact_even_with_tiny_bloom(ray_session):
    import ray.data

    from orc_format_ray.ops.join import bloom_semi_join

    rng = np.random.default_rng(3)
    left = pd.DataFrame({"k": rng.integers(0, 1000, 5000), "v": np.arange(5000)})
    right = pd.DataFrame({"k": rng.integers(500, 700, 300)})
    lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)
    rset = set(right["k"])
    for nb in (8, 1 << 12):  # 8 bits: every probe positive -> pure exact path
        semi = bloom_semi_join(lds, rds, "k", how="semi", num_bits=nb).to_pandas()
        anti = bloom_semi_join(lds, rds, "k", how="anti", num_bits=nb).to_pandas()
        assert sorted(semi["v"]) == sorted(left[left["k"].isin(rset)]["v"]), nb
        assert sorted(anti["v"]) == sorted(left[~left["k"].isin(rset)]["v"]), nb


def test_bloom_semi_join_guards(ray_session):
    import ray.data

    from orc_format_ray.ops.join import bloom_semi_join

    lds = ray.data.from_arrow(pa.table({"k": pa.array([1, None], pa.int64())}))
    rds = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    with pytest.raises(Exception, match="non-null"):
        bloom_semi_join(lds, rds, "k").to_pandas()
    ok = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="power of two"):
        bloom_semi_join(ok, rds, "k", num_bits=1000)
    with pytest.raises(ValueError, match="num_hashes"):
        bloom_semi_join(ok, rds, "k", num_hashes=0)
    # right NULL keys drop like SQL semi/anti
    rnull = ray.data.from_arrow(pa.table({"k": pa.array([None], pa.int64())}))
    out = bloom_semi_join(ok, rnull, "k", how="semi").to_pandas()
    assert len(out) == 0

# ------------------------------------------- group split + systematic sample


def test_group_split_keeps_groups_atomic(ray_session):
    import ray.data

    from orc_format_ray.ops.sample import group_split, knuth_hash

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(2000),
            "source": [f"s{g}" for g in rng.integers(0, 37, 2000)],
        }
    )
    out = group_split(ray.data.from_pandas(df), rate_pct=40).to_pandas()
    reps = df.groupby("source")["doc_id"].min()
    kept = set(reps.index[(knuth_hash(reps.to_numpy()) % np.uint64(100)) < np.uint64(40)])
    assert set(out["source"].unique()) == {s for s in kept if (df["source"] == s).any()}
    # every kept group arrives whole
    want = df[df["source"].isin(kept)]
    assert sorted(out["doc_id"]) == sorted(want["doc_id"])
    # rate bounds
    with pytest.raises(ValueError, match="rate_pct"):
        group_split(ray.data.from_pandas(df), rate_pct=101)


def test_systematic_sample_global_rank(ray_session):
    import ray.data

    from orc_format_ray.ops.sample import systematic_sample

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"event_id": np.arange(1000), "value": rng.normal(size=1000)})
    out = systematic_sample(ray.data.from_pandas(df), every=9).to_pandas().sort_values("rn")
    srt = df.sort_values(["value", "event_id"]).reset_index(drop=True)
    want = srt.iloc[::9]
    assert list(out["event_id"]) == list(want["event_id"])
    assert list(out["rn"]) == list(range(1, 1001, 9))
    # NaN value -> loud
    bad = df.copy()
    bad.loc[3, "value"] = np.nan
    with pytest.raises(Exception, match="non-NaN"):
        systematic_sample(ray.data.from_pandas(bad), every=9).to_pandas()
    with pytest.raises(ValueError, match="every"):
        systematic_sample(ray.data.from_pandas(df), every=0)

# ---------------------------------------- target encoding + longest streak


def test_target_encode_matches_classic_formula(ray_session):
    import ray.data

    from orc_format_ray.ops.agg import target_encode

    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "cat": [f"c{g}" for g in rng.integers(0, 6, 800)],
            "y": np.round(rng.uniform(0, 1000, 800), 2),
        }
    )
    out = target_encode(ray.data.from_pandas(df), "cat", "y", prior_weight=10)
    units = np.floor(df["y"].to_numpy() * 100 + 0.5).astype(np.int64)
    S, N = units.sum(), len(df)
    for _, r in out.iterrows():
        m = df["cat"] == r["category"]
        su, n = units[m.to_numpy()].sum(), int(m.sum())
        assert r["n"] == n and r["sum_units"] == su
        # mathematically the classic smoothed mean
        classic = (su + 10 * (S / N)) / (n + 10)
        assert abs(r["enc"] - classic) < 1e-6
        # bitwise the lifted single division
        assert r["enc"] == np.float64(su * N + 10 * S) / np.float64(N * (n + 10))
    # NaN target -> loud
    bad = df.copy()
    bad.loc[0, "y"] = np.nan
    with pytest.raises(Exception, match="non-NaN"):
        target_encode(ray.data.from_pandas(bad), "cat", "y")


def test_longest_streak_semantics(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import longest_streak

    day = 86_400
    ts = {
        1: [0, 1 * day, 2 * day, 2 * day + 5, 5 * day],       # streak 3, 4 days
        2: [10 * day, 12 * day, 14 * day],                    # streak 1, 3 days
        3: [7 * day, 8 * day, 9 * day, 10 * day, 11 * day],   # streak 5
    }
    rows = [(u, t) for u, l in ts.items() for t in l]
    df = pd.DataFrame({"user_id": [r[0] for r in rows],
                       "ts": pd.to_datetime([r[1] for r in rows], unit="s")})
    out = longest_streak(ray.data.from_pandas(df)).to_pandas().set_index("user_id")
    assert out.loc[1, "longest_streak"] == 3 and out.loc[1, "n_days"] == 4
    assert out.loc[2, "longest_streak"] == 1 and out.loc[2, "n_days"] == 3
    assert out.loc[3, "longest_streak"] == 5 and out.loc[3, "n_days"] == 5

# ------------------------------------------ rolling DAU + RFM segmentation


def test_rolling_active_users_semantics(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import rolling_active_users

    day = 86_400
    rows = [(1, 0), (1, 0), (2, 0), (1, 2 * day), (3, 9 * day)]
    df = pd.DataFrame({"user_id": [r[0] for r in rows],
                       "ts": pd.to_datetime([r[1] for r in rows], unit="s")})
    out = rolling_active_users(ray.data.from_pandas(df), window_days=3).to_pandas()
    got = dict(zip(out["wday"], out["n_users"]))
    # day0: users {1,2}; day2 adds user 1 again (still distinct);
    # windows: wday0 {1,2}=2, wday1 {1,2}=2, wday2 {1,2}+{1}=2, wday3 {1}=1, wday4 {1}=1
    assert got == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1, 9: 1, 10: 1, 11: 1}
    with pytest.raises(ValueError, match="window_days"):
        rolling_active_users(ray.data.from_pandas(df), window_days=0)


def test_rfm_segments_vs_duckdb(ray_session):
    import ray.data

    from orc_format_ray.ops.agg import rfm_segments

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
    out = rfm_segments(ds, n=5)
    want = _con().execute(
        "WITH m AS (SELECT user_id, CAST(max(epoch_us(ts)) AS BIGINT) AS last_us, "
        "CAST(count(*) AS BIGINT) AS f_cnt, "
        "CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS m_units FROM events GROUP BY user_id), "
        "g AS (SELECT max(last_us) AS tmax FROM m), "
        "x AS (SELECT user_id, (g.tmax - last_us) // 86400000000 AS r_days, f_cnt, m_units FROM m, g) "
        "SELECT user_id, r_days, f_cnt, m_units, "
        "CAST(ntile(5) OVER (ORDER BY r_days, user_id) AS BIGINT) AS r_bucket, "
        "CAST(ntile(5) OVER (ORDER BY f_cnt, user_id) AS BIGINT) AS f_bucket, "
        "CAST(ntile(5) OVER (ORDER BY m_units, user_id) AS BIGINT) AS m_bucket FROM x"
    ).fetchdf()
    _assert_frames_equal(out, want)

# ------------------------------------------------------- ORC lake delete


def test_delete_rows_prunes_and_rewrites(ray_session, tmp_path):
    import os

    import ray.data

    from orc_format_ray.orcfile import read_orc_dataset, write_orc_dataset
    from orc_format_ray.orcmerge import delete_rows

    lake = str(tmp_path / "lake")
    # two disjoint id ranges -> two files via repartition
    df = pd.DataFrame({"doc_id": np.arange(200), "v": np.arange(200) * 3})
    ds = ray.data.from_pandas(df).repartition(2)
    write_orc_dataset(ds, lake).materialize()
    files0 = {
        p: os.path.getmtime(os.path.join(lake, p))
        for p in os.listdir(lake) if p.endswith(".orc")
    }
    assert len(files0) == 2
    # tombstones hit only the low range [0, 100)
    res = delete_rows(lake, "doc_id", [5, 7, 9999])
    assert res["n_rewritten"] == 1 and res["n_deleted_rows"] == 2
    kept = [p for p, a in res["files"] if a == "kept"]
    assert len(kept) == 1  # high-range file provably clean from stats alone
    assert os.path.basename(kept[0]) in files0
    assert os.path.getmtime(kept[0]) == files0[os.path.basename(kept[0])]
    back = (
        pa.concat_tables(read_orc_dataset(lake, native=True).to_pandas().pipe(lambda d: [pa.Table.from_pandas(d)]))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(back["doc_id"]) == [i for i in range(200) if i not in (5, 7)]
    # idempotent re-run: nothing left to delete
    res2 = delete_rows(lake, "doc_id", [5, 7])
    assert res2["n_deleted_rows"] == 0 and res2["n_rewritten"] == 0


def test_delete_rows_removes_fully_matched_file(ray_session, tmp_path):
    import os

    import ray.data

    from orc_format_ray.orcfile import write_orc_dataset
    from orc_format_ray.orcmerge import delete_rows

    lake = str(tmp_path / "lake2")
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": np.arange(50), "v": np.arange(50)}))
    write_orc_dataset(ds, lake).materialize()
    res = delete_rows(lake, "doc_id", list(range(50)))
    assert res["n_deleted_rows"] == 50
    assert [a for _, a in res["files"]] == ["removed"]
    assert not [p for p in os.listdir(lake) if p.endswith(".orc")]

# ------------------------------------------------ substring containment


def test_substring_containment_word_aligned(ray_session):
    import ray.data

    from orc_format_ray.ops.spans import substring_containment

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a b c d e f g h i j",      # container
                "c d e f g h i j",          # contained in 1 (words 3..10)
                "x b c d e f g h i",        # shares gram "b c d..." but not contained
                "za b c d e f g h i j",     # char-contains doc1's text mid-word — NOT word-aligned
            ],
        }
    )
    out = substring_containment(ray.data.from_pandas(docs), gram_words=4)
    got = set(zip(out["contained_id"], out["container_id"]))
    assert (2, 1) in got
    assert (1, 4) not in got        # mid-word char match must not count
    assert all(a != b for a, b in got)
    # short docs (< gram_words) never participate
    short = pd.DataFrame({"doc_id": [9], "text": ["tiny text"]})
    both = pd.concat([docs, short], ignore_index=True)
    out2 = substring_containment(ray.data.from_pandas(both), gram_words=4)
    assert 9 not in set(out2["contained_id"]) | set(out2["container_id"])


def test_substring_containment_empty_and_guard(ray_session):
    import ray.data

    from orc_format_ray.ops.spans import substring_containment

    docs = pd.DataFrame({"doc_id": [1, 2], "text": ["p q r s t", "u v w x y"]})
    out = substring_containment(ray.data.from_pandas(docs), gram_words=4)
    assert out.empty and list(out.columns) == ["contained_id", "container_id"]
    assert out["contained_id"].dtype == np.int64
    # a boilerplate anchor gram blowing the bucket cap is loud
    many = pd.DataFrame({"doc_id": np.arange(40), "text": ["same gram here now"] * 40})
    with pytest.raises(Exception, match="max_bucket_pairs"):
        substring_containment(ray.data.from_pandas(many), gram_words=4, max_bucket_pairs=100)

# --------------------------------------- conversion lag + negative samples


def test_conversion_lag_semantics(ray_session):
    import ray.data

    from orc_format_ray.ops.paths import conversion_lag

    rows = [
        (1, 10, "view"), (1, 5, "purchase"), (1, 20, "purchase"),   # buy-before-view ignored
        (2, 30, "view"),                                            # never converts
        (3, 40, "purchase"),                                        # no view at all
        (4, 50, "view"), (4, 50, "purchase"),                       # same instant counts (>=)
    ]
    df = pd.DataFrame({"user_id": [r[0] for r in rows],
                       "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
                       "event_type": [r[2] for r in rows]})
    out = conversion_lag(ray.data.from_pandas(df), "view", "purchase")
    got = {int(r.user_id): (int(r.ta_us), int(r.tb_us), int(r.lag_us)) for r in out.itertuples()}
    assert got == {1: (10_000_000, 20_000_000, 10_000_000), 4: (50_000_000, 50_000_000, 0)}
    # no converting users -> typed empty
    out2 = conversion_lag(ray.data.from_pandas(df), "view", "signup")
    assert out2.empty and list(out2.columns) == ["user_id", "ta_us", "tb_us", "lag_us"]


def test_negative_samples_exact_ranking(ray_session):
    import ray.data

    from orc_format_ray.ops.knn import negative_samples

    rng = np.random.default_rng(4)
    df = pd.DataFrame({"vec_id": np.arange(60), "label": rng.integers(0, 3, 60)})
    out = negative_samples(ray.data.from_pandas(df), k=4).to_pandas()
    M32, K = 1 << 32, 2654435761
    for a in range(60):
        al = int(df.loc[a, "label"])
        cands = [(((a * 1000003 + n) % M32 * K) % M32, n) for n in range(60)
                 if int(df.loc[n, "label"]) != al]
        want = [n for _, n in sorted(cands)[:4]]
        got = out[out["anchor_id"] == a].sort_values("rank")["neg_id"].tolist()
        assert got == want, a
    # anchors never pick their own label
    lab = df.set_index("vec_id")["label"]
    assert (out.apply(lambda r: lab[r["anchor_id"]] != lab[r["neg_id"]], axis=1)).all()
    # fewer negatives than k: ranks truncate, no same-label fill
    tiny = pd.DataFrame({"vec_id": [0, 1, 2], "label": [0, 0, 1]})
    t = negative_samples(ray.data.from_pandas(tiny), k=5).to_pandas()
    assert t[t["anchor_id"] == 2].shape[0] == 2 and t[t["anchor_id"] == 0].shape[0] == 1

# ---------------------------------------------------- byte-stream-split codec


def test_byte_split_bit_exact_and_wins_on_smooth(ray_session):
    from orc_format_ray.codecs import byte_split, selector

    rng = np.random.default_rng(8)
    cases = [
        rng.normal(1000, 1, 50_000),                      # smooth doubles
        np.array([np.nan, -0.0, 0.0, np.inf, -np.inf]),   # special bit patterns
        np.array([], dtype=np.float64),
        rng.normal(size=999).astype(np.float32),
        rng.integers(-5, 5, 777).astype(np.int64),
    ]
    for arr in cases:
        dec = byte_split.decode(byte_split.encode(arr))
        assert dec.dtype == arr.dtype
        assert np.array_equal(arr.view(np.uint8), dec.view(np.uint8))
    smooth = rng.normal(1000, 1, 100_000)
    assert selector.select_float_codec(smooth) == "byte_split"
    import pyarrow as pa_
    z = pa_.Codec("zstd", compression_level=3)
    assert len(z.compress(byte_split.encode(smooth))) < len(z.compress(smooth.tobytes()))
    # truncated body is loud
    with pytest.raises(ValueError, match="body holds"):
        byte_split.decode(byte_split.encode(smooth)[:-3])
    # selector menu roundtrip for both entries
    for name in ("raw", "byte_split"):
        rt = selector.decode_floats(selector.encode_floats(smooth, name), name)
        assert np.array_equal(rt, smooth)

# --------------------------------------------------- label centroid sums


def test_label_centroid_sums_exact(ray_session):
    import ray.data

    from orc_format_ray.ops.agg import label_centroid_sums

    rng = np.random.default_rng(6)
    n, d = 300, 8
    emb = rng.normal(size=(n, d)).astype(np.float32)
    lab = rng.integers(0, 4, n)
    tbl = pa.table({
        "label": pa.array(lab, pa.int32()),
        "embedding": pa.FixedSizeListArray.from_arrays(pa.array(emb.ravel(), pa.float32()), d).cast(pa.list_(pa.float32())),
    })
    out = label_centroid_sums(ray.data.from_arrow(tbl)).to_pandas()
    units = np.floor(emb.astype(np.float64) * (1 << 20) + 0.5).astype(np.int64)
    for l in np.unique(lab):
        m = lab == l
        for p in range(d):
            row = out[(out["label"] == l) & (out["pos"] == p)].iloc[0]
            assert row["n"] == m.sum()
            assert row["sum_units"] == units[m, p].sum()
    # ragged lengths are loud
    bad = pa.table({
        "label": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[0.1, 0.2], [0.3]], pa.list_(pa.float32())),
    })
    with pytest.raises(Exception, match="ragged"):
        label_centroid_sums(ray.data.from_arrow(bad)).to_pandas()

# ------------------------------------------------ melt + period-over-period


def test_melt_roundtrip_shape(ray_session):
    import ray.data

    from orc_format_ray.ops.etl import melt

    df = pd.DataFrame({"id": [1, 2], "a": [1.5, 2.5], "b": [10.0, 20.0]})
    out = melt(ray.data.from_pandas(df), ["id"], ["a", "b"]).to_pandas()
    assert len(out) == 4
    got = {(r.id, r.variable): r.value for r in out.itertuples()}
    assert got == {(1, "a"): 1.5, (2, "a"): 2.5, (1, "b"): 10.0, (2, "b"): 20.0}
    with pytest.raises(ValueError, match="value column"):
        melt(ray.data.from_pandas(df), ["id"], [])


def test_period_over_period_lags_existing_periods(ray_session):
    import ray.data

    from orc_format_ray.ops.etl import period_over_period

    day = 86_400
    rows = [("a", 0, 1.0), ("a", day // 2, 2.0), ("a", 3 * day, 5.0), ("b", day, 7.0)]
    df = pd.DataFrame({"event_type": [r[0] for r in rows],
                       "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
                       "value": [r[2] for r in rows]})
    out = period_over_period(ray.data.from_pandas(df)).to_pandas()
    a = out[out["event_type"] == "a"].sort_values("period")
    # day0 total 300 units; day3 total 500, prev = 300 (previous EXISTING period)
    assert list(a["period"]) == [0, 3]
    assert list(a["units"]) == [300, 500]
    assert list(a["prev_units"]) == [0, 300]
    assert list(a["delta_units"]) == [300, 200]
    b = out[out["event_type"] == "b"]
    assert list(b["prev_units"]) == [0]

# ------------------------------------------------- cumulative distinct


def test_cumulative_distinct_vs_duckdb(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import cumulative_distinct

    ds = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["user_id", "ts", "event_type", "event_id"])
    out = cumulative_distinct(ds).to_pandas()
    want = _con().execute(
        "WITH x AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS o, event_id, "
        "row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts) AS rn FROM events) "
        "SELECT user_id, o AS ts_us, event_id, "
        "CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY o) AS BIGINT) "
        "AS n_distinct FROM x"
    ).fetchdf()
    _assert_frames_equal(out, want)


def test_cumulative_distinct_semantics(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import cumulative_distinct

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2],
            "ts": pd.to_datetime([1, 2, 3, 4, 9], unit="s"),
            "event_type": ["a", "a", "b", "a", "z"],
            "event_id": [10, 11, 12, 13, 20],
        }
    )
    out = cumulative_distinct(ray.data.from_pandas(df)).to_pandas().sort_values("event_id")
    assert list(out["n_distinct"]) == [1, 1, 2, 2, 1]

# ------------------------------------------------- grouped winsorize


def test_winsorize_by_group_vs_duckdb(ray_session):
    import ray.data

    from orc_format_ray.ops.agg import winsorize_by_group

    ds = ray.data.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"],
    )
    out = winsorize_by_group(ds, "l_returnflag", "l_extendedprice",
                             ["l_orderkey", "l_linenumber"], q_lo=0.1, q_hi=0.9).to_pandas()
    want = _con().execute(
        "WITH u AS (SELECT l_returnflag, l_orderkey, l_linenumber, "
        "CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS units FROM lineitem), "
        "b AS (SELECT l_returnflag, quantile_disc(units, 0.1) AS lo, quantile_disc(units, 0.9) AS hi "
        "FROM u GROUP BY l_returnflag) "
        "SELECT u.l_orderkey, u.l_linenumber, u.l_returnflag, u.units, "
        "CAST(least(greatest(u.units, b.lo), b.hi) AS BIGINT) AS w_units "
        "FROM u JOIN b ON u.l_returnflag = b.l_returnflag"
    ).fetchdf()
    _assert_frames_equal(out, want)
    # clipping is idempotent and bounded within the group's band
    g = out.groupby("l_returnflag")["w_units"]
    assert (out["w_units"] >= g.transform("min")).all()

# ---------------------------------------------- churn + bitmap index


def test_churned_users_semantics(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import churned_users

    week = 7 * 86_400
    rows = [(1, 0), (1, week), (2, 0), (3, week)]  # u1 retained w0->w1; u2 churns w0; all churn at last week
    df = pd.DataFrame({"user_id": [r[0] for r in rows],
                       "ts": pd.to_datetime([r[1] for r in rows], unit="s")})
    out = churned_users(ray.data.from_pandas(df)).to_pandas().set_index("period")
    assert out.loc[0, "n_active"] == 2 and out.loc[0, "n_churned"] == 1
    assert out.loc[1, "n_active"] == 2 and out.loc[1, "n_churned"] == 2


def test_bitmap_index_build_query_resume(ray_session, tmp_path):
    import duckdb

    from orc_format_ray.ops.bitmapindex import (bitmap_count, bitmap_crosstab,
                                                build_bitmap_index)

    idx = str(tmp_path / "idx")
    src = f"{SF}/documents.parquet"
    r1 = build_bitmap_index(src, idx, ["lang", "source"])
    assert r1["parts_written"] >= 1 and r1["parts_skipped"] == 0
    # resume: everything skips
    r2 = build_bitmap_index(src, idx, ["lang", "source"])
    assert r2["parts_written"] == 0 and r2["parts_skipped"] == r1["num_row_groups"]
    ct = bitmap_crosstab(idx, "lang", "source").to_pandas()
    want = duckdb.sql(f"SELECT lang, source, count(*) c FROM '{src}' GROUP BY 1,2").fetchdf()
    wmap = {(r.lang, r.source): r.c for r in want.itertuples()}
    gmap = {(r.a, r.b): r.cnt for r in ct.itertuples()}
    assert gmap == wmap
    # AND count matches SQL
    lang, srcname = next(iter(wmap))[0], next(iter(wmap))[1]
    n = bitmap_count(idx, {"lang": lang, "source": srcname})
    assert n == wmap[(lang, srcname)]
    # absent value counts zero; unknown column is loud
    assert bitmap_count(idx, {"lang": "zz-not-there"}) == 0
    with pytest.raises(ValueError, match="not in index"):
        bitmap_count(idx, {"n_chars": "5"})
    # numeric columns refuse to index
    with pytest.raises(ValueError, match="only string"):
        build_bitmap_index(src, str(tmp_path / "idx2"), ["n_chars"])

# ------------------------------------- global dictionary + lake transcode


def test_global_dict_encode_semantics(ray_session):
    import ray.data

    from orc_format_ray.ops.etl import global_dict_encode

    df = pd.DataFrame({"id": [1, 2, 3, 4], "s": ["b", "a", "b", "c"]})
    enc, mapping = global_dict_encode(ray.data.from_pandas(df), "s")
    out = enc.to_pandas().sort_values("id")
    assert list(out["s_id"]) == [1, 0, 1, 2]
    assert list(mapping["value"]) == ["a", "b", "c"] and list(mapping["id"]) == [0, 1, 2]
    assert "s" not in out.columns
    nul = pa.table({"id": pa.array([1], pa.int64()), "s": pa.array([None], pa.string())})
    with pytest.raises(Exception, match="non-null"):
        global_dict_encode(ray.data.from_arrow(nul), "s")


def test_orc_to_parquet_transcode_bit_exact(ray_session, tmp_path):
    import ray.data

    from orc_format_ray.orcfile import read_orc_dataset, write_orc_dataset

    df = pd.DataFrame({"doc_id": np.arange(100), "v": np.random.default_rng(1).normal(size=100),
                       "lang": ["en", "fr"] * 50})
    orc_lake = str(tmp_path / "orc")
    pq_lake = str(tmp_path / "pq")
    write_orc_dataset(ray.data.from_pandas(df), orc_lake, partition_by=["lang"]).materialize()
    read_orc_dataset(orc_lake, native=True).write_parquet(pq_lake)
    back = ray.data.read_parquet(pq_lake).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = df.sort_values("doc_id").reset_index(drop=True)
    assert np.array_equal(back["v"].to_numpy().view(np.uint8), want["v"].to_numpy().view(np.uint8))
    assert list(back["lang"]) == list(want["lang"])

# --------------------------------------------- weighted grouped quantiles


def test_weighted_quantile_by_group_semantics(ray_session):
    import ray.data

    from orc_format_ray.ops.agg import weighted_quantile_by_group

    # one heavy row dominates the median despite being a single row
    df = pd.DataFrame({"g": ["x"] * 4, "v": [1.0, 2.0, 3.0, 100.0], "w": [1, 1, 1, 97]})
    out = weighted_quantile_by_group(ray.data.from_pandas(df), "g", "v", "w",
                                     qs=[0.5]).to_pandas()
    assert out.loc[0, "q_0_5"] == 10000  # 100.00 in cents — weight pulls the median
    assert out.loc[0, "total_w"] == 100
    # zero weights hold no rank mass
    df2 = pd.DataFrame({"g": ["y"] * 3, "v": [5.0, 6.0, 7.0], "w": [0, 1, 0]})
    out2 = weighted_quantile_by_group(ray.data.from_pandas(df2), "g", "v", "w", qs=[0.5]).to_pandas()
    assert out2.loc[0, "q_0_5"] == 600
    # negative weight is loud
    df3 = pd.DataFrame({"g": ["z"], "v": [1.0], "w": [-1]})
    with pytest.raises(Exception, match=">= 0"):
        weighted_quantile_by_group(ray.data.from_pandas(df3), "g", "v", "w").to_pandas()
