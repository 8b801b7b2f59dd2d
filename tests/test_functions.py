"""Unit tests for the training-data pipeline ops (functions/): near-dup
detection recall, simhash hamming, ANN recall, multimodal plumbing.
The oracle-equivalence side is covered by tests/test_contract.py;
these pin behavioral properties the SQL oracles can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions import multimodal as MM
from crawler_spark.functions import neardup as ND
from crawler_spark.functions import similarity as SIM
from crawler_spark.functions import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the band plays on "
        "and the crowd cheers for more of the same old song and dance routine"
    )
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("crowd", "audience")),  # near dup of 0
        (3, "completely different text about spark dataframes and shuffles"),
        (4, base.upper() + "   "),  # case/whitespace dup of 0
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_exact_dedup_canonicalizes(docs):
    groups = {r["keeper"]: r["n_dups"] for r in ND.exact_dup_groups(docs).collect()}
    # 0,1,4 collapse (case/whitespace-insensitive); 2, 3, 5 stand alone
    assert groups[0] == 3
    assert groups[2] == 1 and groups[3] == 1 and groups[5] == 1


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in ND.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 4)] == 1.0
    assert 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_minhash_lsh_recall_on_near_dups(docs):
    got = {(r["a"], r["b"]) for r in ND.minhash_neardup_pairs(docs, threshold=0.5).collect()}
    # near-identical pairs survive banding with near-certainty and are
    # exact-verified; the unrelated doc never appears
    assert (0, 1) in got and (0, 4) in got and (0, 2) in got
    assert all(3 not in p and 5 not in p for p in got)


def test_simhash_hamming(docs, spark):
    sigs = ND.simhash64(docs)
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in ND.simhash_neardup_pairs(sigs, max_hamming=63).collect()
    }
    assert pairs[(0, 1)] == 0  # identical text → identical signature
    m = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    assert bin((m[0] ^ m[2]) & (2**64 - 1)).count("1") < bin(
        (m[0] ^ m[3]) & (2**64 - 1)
    ).count("1"), "near-dup should be closer in hamming space than unrelated text"


def test_lang_and_quality(docs):
    out = {
        r["doc_id"]: (r["lang"], r["q"])
        for r in docs.select(
            "doc_id",
            TX.predicted_lang("text").alias("lang"),
            TX.quality_score("text").alias("q"),
        ).collect()
    }
    assert out[0][0] == "en"
    assert out[5][0] == "und"
    assert out[0][1] > out[5][1]  # real text scores above empty


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    rows = []
    for i in range(40):
        if i < 5:  # tight cluster around base
            v = base + 0.05 * rng.standard_normal(16)
        else:
            v = rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


def test_topk_bruteforce_finds_cluster(vectors):
    top = [r["vec_id"] for r in SIM.topk_bruteforce(vectors, query_vec_id=0, k=4).collect()]
    assert set(top) >= {1, 2, 3, 4}


def test_lsh_topk_subset_of_bruteforce_space(vectors):
    exact = [r["vec_id"] for r in SIM.topk_bruteforce(vectors, query_vec_id=0, k=4).collect()]
    approx = [
        r["vec_id"]
        for r in SIM.topk_lsh(vectors, query_vec_id=0, dim=16, k=4).collect()
    ]
    # multiprobe LSH on a tight cluster recovers most of the exact set
    assert len(set(exact) & set(approx)) >= 3


@pytest.fixture(scope="module")
def corpus(spark):
    """400 vectors, 8 loose clusters — the recall fixture (structured
    like the driver's embeddings fixture: clustered, unit-ish scale)."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 32)) * 2.0
    rows = [
        (i, [float(x) for x in centers[i % 8] + 0.6 * rng.standard_normal(32)])
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


def test_lsh_topk_recall_at_10(corpus):
    """The round-1 failure mode: fixed 16 planes → 0 candidates.  Pin
    the corpus-scaled multi-table index to recall@10 ≥ 0.8 and full k."""
    exact = [r["vec_id"] for r in SIM.topk_bruteforce(corpus, query_vec_id=0, k=10).collect()]
    approx = SIM.topk_lsh(corpus, query_vec_id=0, dim=32, k=10).collect()
    assert len(approx) == 10  # returns a full k, not an empty bucket
    recall = len(set(exact) & {r["vec_id"] for r in approx}) / 10
    assert recall >= 0.8, f"recall@10 = {recall}"


def test_plane_count_scales_with_corpus():
    assert SIM.plane_count(1_000, 64) == 4
    assert SIM.plane_count(10**9, 64) == 24
    assert SIM.plane_count(10, 64) == 2  # floor: never a degenerate 1-plane table


def test_ivf_knn_recall_vs_bruteforce(corpus):
    """IVF per-vector kNN (no global crossJoin) recovers ≥0.8 of the
    exact neighbor pairs on the clustered corpus."""
    exact = {
        (r["vec_id"], r["nbr_id"])
        for r in SIM.pairwise_topk_bruteforce(corpus, k=3).collect()
    }
    approx_rows = SIM.pairwise_topk_ivf(corpus, k=3, n_probe=2).collect()
    approx = {(r["vec_id"], r["nbr_id"]) for r in approx_rows}
    # every vector still gets k rows (cells are never empty for their members)
    from collections import Counter

    per_vec = Counter(r["vec_id"] for r in approx_rows)
    assert min(per_vec.values()) == 3 and len(per_vec) == 400
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"pair recall = {recall}"


def test_cosine_neardup_ivf_recall(corpus):
    """IVF-bucketed near-dup pairs recover ≥0.8 of the exact pair set
    (near-dups are cell-local by construction)."""
    exact = {
        (r["a"], r["b"])
        for r in SIM.cosine_neardup_pairs(corpus, threshold=0.6).collect()
    }
    assert exact, "fixture produced no near-dup pairs — threshold too high"
    approx = {
        (r["a"], r["b"])
        for r in SIM.cosine_neardup_pairs(corpus, threshold=0.6, ivf=True).collect()
    }
    assert not (approx - exact), "IVF path produced a pair the exact path lacks"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"near-dup pair recall = {recall}"


def test_ivf_deterministic_across_runs(corpus):
    a = sorted(map(tuple, SIM.pairwise_topk_ivf(corpus, k=3).collect()))
    b = sorted(map(tuple, SIM.pairwise_topk_ivf(corpus, k=3).collect()))
    assert a == b


def test_image_decode_roundtrip(spark):
    df = spark.range(12).select(F.col("id").alias("doc_id"))
    imgs = MM.attach_synthetic_images(df, "doc_id")
    meta = MM.decode_meta(imgs).collect()
    assert len(meta) == 12
    assert all(r["decode_ok"] for r in meta)
    assert all(r["dec_w"] == 32 and r["dec_h"] == 32 for r in meta)


def test_image_decode_flags_corrupt_payload(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {"image_id": ["bad-1"], "bytes": [b"\x00garbage-not-an-image"], "fmt": ["png"]}
    )
    df = spark.createDataFrame(pdf)
    meta = MM.decode_meta(df).collect()
    assert len(meta) == 1 and meta[0]["decode_ok"] is False


def test_resize_and_embedding_shapes(spark):
    df = spark.range(6).select(F.col("id").alias("doc_id"))
    imgs = MM.attach_synthetic_images(df, "doc_id")
    rs = MM.resize(imgs, 16, 16).collect()
    assert all(r["w"] == 16 and r["h"] == 16 for r in rs)
    emb = MM.image_embedding(imgs, dim=64).collect()
    assert all(len(r["embedding"]) == 64 for r in emb)
    # deterministic: same id → same vector
    emb2 = MM.image_embedding(imgs, dim=64).collect()
    assert {r["image_id"]: r["embedding"] for r in emb} == {
        r["image_id"]: r["embedding"] for r in emb2
    }


def test_frame_sample_real_container(spark):
    import pandas as pd

    from crawler_spark import images as I
    from crawler_spark import video as V

    # two clips: lossless PNG frames and real baseline-JPEG frames
    clips = {
        "v-png": V.gen_video(42, 3, 24, 20, n_frames=7, fmt="png"),
        "v-jpg": V.gen_video(42, 4, 24, 20, n_frames=7, fmt="jpg"),
    }
    pdf = pd.DataFrame(
        {"image_id": list(clips), "bytes": list(clips.values())}
    )
    rows = MM.frame_sample(spark.createDataFrame(pdf), every_n=3).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["image_id"], []).append(r)
    assert sorted(r["frame_idx"] for r in by_vid["v-png"]) == [0, 3, 6]
    assert sorted(r["frame_idx"] for r in by_vid["v-jpg"]) == [0, 3, 6]
    # every sampled frame payload decodes to the source pixels within
    # the input_hint invariant (exact for PNG, PSNR>=40dB for JPEG),
    # and the emitted phash matches a local re-decode
    for r in rows:
        k = 3 if r["image_id"] == "v-png" else 4
        dec = I.decode_image(bytes(r["frame"]), "png")
        ref = I.gen_pixels(42, k * 997 + r["frame_idx"], 24, 20)
        assert I.phash64(dec) == r["frame_phash"]
        if r["image_id"] == "v-png":
            assert (dec == ref).all()
        else:
            assert I.psnr(dec, ref) >= 40.0
    # sub-32px frames must hash non-degenerately (phash64 upsampling
    # previously divided by zero-width bins → every small image → 0)
    assert len({r["frame_phash"] for r in rows}) > len(rows) // 2


def test_video_container_rejects_foreign_magic():
    import pytest

    from crawler_spark import video as V

    with pytest.raises(NotImplementedError):
        list(V.iter_frame_offsets(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 32))
    with pytest.raises(ValueError):
        list(V.iter_frame_offsets(b"garbage-neither-container"))
    meta = V.probe(V.gen_video(42, 9, 16, 12, n_frames=5))
    assert meta == {"n_frames": 5, "fps": 8, "w": 16, "h": 12}


def test_pack_shards_properties(spark):
    """Contiguity + budget semantics: shard ids are non-decreasing in
    doc order, start at 0, and each shard's docs START below the next
    budget boundary (a doc belongs to the shard its first token lands
    in; shards may overflow past the boundary, never underfill it)."""
    import random

    from crawler_spark.functions.text import pack_shards

    rng = random.Random(3)
    rows = [(i, rng.randrange(1, 700)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id: long, n_tokens: long")
    budget = 1000
    got = sorted(
        pack_shards(df, "n_tokens", budget).collect(), key=lambda r: r["doc_id"]
    )
    run = 0
    prev_shard = 0
    for r in got:
        assert r["shard_id"] == run // budget, r
        assert r["shard_id"] >= prev_shard
        prev_shard = r["shard_id"]
        run += r["n_tokens"]
    assert got[0]["shard_id"] == 0 and prev_shard > 0
    # small path identical
    small = sorted(
        pack_shards(df, "n_tokens", budget, small=True).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r["shard_id"] for r in small] == [r["shard_id"] for r in got]


def test_asof_join_matches_bruteforce(spark):
    import random
    from datetime import datetime, timedelta

    from crawler_spark.functions.temporal import asof_join

    rng = random.Random(11)
    t0 = datetime(2024, 1, 1)
    # right: unique (key, ts) as required by the operator contract
    right_rows = sorted(
        {(k, rng.randrange(0, 5000)) for k in range(5) for _ in range(40)}
    )
    right = spark.createDataFrame(
        [(k, t0 + timedelta(seconds=s), 100000 + i) for i, (k, s) in enumerate(right_rows)],
        "k: int, ts: timestamp, v: long",
    )
    left = spark.createDataFrame(
        [(i, rng.randrange(0, 5), t0 + timedelta(seconds=rng.randrange(0, 5200))) for i in range(300)],
        "lid: long, k: int, ts: timestamp",
    )
    got = {r["lid"]: r["v"] for r in asof_join(left, right, ["k"], "ts", ["v"]).collect()}
    rmap = {}
    for i, (k, s) in enumerate(right_rows):
        rmap.setdefault(k, []).append((t0 + timedelta(seconds=s), 100000 + i))
    for row in left.collect():
        # the as-of winner is the LATEST ts <= left.ts
        want = None
        best = None
        for ts, v in rmap.get(row["k"], []):
            if ts <= row["ts"] and (best is None or ts > best):
                best, want = ts, v
        assert got[row["lid"]] == want, (row, want, got[row["lid"]])
    # exactly one output row per left row
    assert len(got) == 300


def test_asof_join_rejects_column_collision(spark):
    import pytest

    from crawler_spark.functions.temporal import asof_join

    df = spark.createDataFrame([(1, 2)], "k: int, v: int")
    ts = df.withColumn("ts", df["v"].cast("timestamp"))
    with pytest.raises(ValueError, match="collide"):
        asof_join(ts, ts, ["k"], "ts", ["v"])


def test_interval_join_matches_bruteforce(spark):
    import random

    from crawler_spark.functions.temporal import interval_join

    rng = random.Random(23)
    pts = [(i, rng.randrange(0, 4), rng.randrange(0, 10_000)) for i in range(400)]
    ivs = []
    for j in range(120):
        lo = rng.randrange(-500, 10_000)
        ivs.append((j, rng.randrange(0, 4), lo, lo + rng.randrange(0, 900)))
    p_df = spark.createDataFrame(pts, "pid: long, k: int, p: long")
    i_df = spark.createDataFrame(ivs, "iid: long, k: int, lo: long, hi: long")
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(p_df, i_df, ["k"], "p", "lo", "hi", 300).collect()
    )
    want = sorted(
        (pid, iid)
        for pid, pk, p in pts
        for iid, ik, lo, hi in ivs
        if pk == ik and lo <= p < hi
    )
    assert got == want and len(want) > 50
    # each qualifying pair appears exactly once (single-cell meeting)
    assert len(got) == len(set(got))


def test_connected_components_matches_union_find(spark):
    import random

    from crawler_spark.functions.graph import connected_components

    rng = random.Random(31)
    n = 120
    # the documented regime: small-diameter components (near-dup
    # clusters) — cliques of <=5 plus a few 4-chains, nodes shuffled so
    # min ids land arbitrarily inside components
    ids = list(range(n))
    rng.shuffle(ids)
    edges = []
    i = 0
    while i + 5 <= n - 20:
        group = ids[i : i + 5]
        edges += [(x, y) for xi, x in enumerate(group) for y in group[xi + 1 :]]
        i += 5
    for j in range(n - 20, n - 4, 4):
        chain = ids[j : j + 4]
        edges += list(zip(chain, chain[1:]))
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in range(n)}
    # canonical label = min member id
    comp_min = {}
    for v in range(n):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    want = {v: comp_min[find(v)] for v in range(n)}

    e_df = spark.createDataFrame(edges, "a: long, b: long").repartition(7)
    nodes = spark.range(n).select(F.col("id").alias("node"))
    got = {
        r["node"]: r["component"]
        for r in connected_components(e_df, nodes=nodes).collect()
    }
    assert got == want
    # isolated nodes label themselves
    isolated = [v for v in range(n) if want[v] == v and all(v not in e for e in edges)]
    assert all(got[v] == v for v in isolated)
    # the star algorithm produces the IDENTICAL label set on the same
    # near-dup-shaped fixture (its output contract is the same)
    got_star = {
        r["node"]: r["component"]
        for r in connected_components(e_df, nodes=nodes, algorithm="star").collect()
    }
    assert got_star == want


def test_connected_components_star_handles_long_chains(spark):
    """A path graph's diameter exceeds the min-label budget: the default
    recurrence refuses loudly (pointing at the fallback), and the
    large-star/small-star variant converges in O(log^2 n) rounds with
    correct labels."""
    import pytest

    from crawler_spark.functions.graph import connected_components

    n = 60  # path 0-1-...-59: diameter 59 > max_iter=8
    edges = list(zip(range(n - 1), range(1, n)))
    e_df = spark.createDataFrame(edges, "a: long, b: long").repartition(5)
    with pytest.raises(RuntimeError, match="algorithm='star'"):
        connected_components(e_df, max_iter=8)
    got = {
        r["node"]: r["component"]
        for r in connected_components(e_df, max_iter=8, algorithm="star").collect()
    }
    assert got == {v: 0 for v in range(n)}
    # unknown algorithm names fail fast
    with pytest.raises(ValueError, match="unknown algorithm"):
        connected_components(e_df, algorithm="boruvka")


def test_connected_components_empty_edges(spark):
    from crawler_spark.functions.graph import connected_components

    e_df = spark.createDataFrame([], "a: long, b: long")
    nodes = spark.range(5).select(F.col("id").alias("node"))
    got = {r["node"]: r["component"] for r in connected_components(e_df, nodes=nodes).collect()}
    assert got == {i: i for i in range(5)}


def test_asof_join_null_value_is_not_skipped(spark):
    """A genuinely-NULL right-side value must be carried as NULL, not
    skipped in favor of an older right row; multiple value columns must
    all come from the SAME matched right row."""
    from datetime import datetime

    from crawler_spark.functions.temporal import asof_join

    t = lambda m: datetime(2024, 1, 1, 0, m)
    right = spark.createDataFrame(
        [(1, t(0), 5, 100), (1, t(10), None, 200)],
        "k: int, ts: timestamp, v: int, w: int",
    )
    left = spark.createDataFrame([(7, 1, t(15))], "lid: long, k: int, ts: timestamp")
    row = asof_join(left, right, ["k"], "ts", ["v", "w"]).collect()[0]
    # matched row is the t(10) one: v genuinely NULL, w=200 — never
    # (v=5, w=200), a tuple existing in no right row
    assert row["v"] is None and row["w"] == 200


def test_connected_components_folds_missing_endpoints(spark):
    from crawler_spark.functions.graph import connected_components

    e_df = spark.createDataFrame([(0, 5)], "a: long, b: long")
    nodes = spark.createDataFrame([(5,)], "node: long")
    got = {r["node"]: r["component"] for r in connected_components(e_df, nodes=nodes).collect()}
    # node 0 was missing from nodes but is an endpoint: both get min id 0
    assert got == {0: 0, 5: 0}


def test_connected_components_rejects_string_ids(spark):
    import pytest

    from crawler_spark.functions.graph import connected_components

    e_df = spark.createDataFrame([("a", "b")], "a: string, b: string")
    with pytest.raises(TypeError, match="integer node ids"):
        connected_components(e_df)


def test_image_phash_neardup_catches_recompressed_copies(spark, sf_dir):
    """Original vs lossy-recompressed copies must pair up by phash
    banding (>=90% of copies found at hamming<=3 — the real-JPEG copies
    are near-exact; the declared stand-in codec is lossier), with no
    false pairs between unrelated images."""
    from crawler_spark import contract as C

    rows = C.q_image_phash_neardup(spark, sf_dir).collect()
    n_docs = min(C._t(spark, sf_dir, "documents").count(), 100)
    true_pairs = [
        r for r in rows if r["b"] == r["a"] + "~jpg" or r["a"] == r["b"] + "~jpg"
    ]
    assert len(true_pairs) >= 0.9 * n_docs
    assert len(true_pairs) == len(rows), "false near-dup pair between unrelated images"


def test_recompress_psnr_gate(spark, sf_dir):
    """input_hint invariant as an operator: real-JPEG quality-99
    recompression must clear the 40 dB gate on every decodable image;
    corrupt payloads yield NULL psnr + pass_40db=False, not a failure."""
    import pandas as pd
    from pyspark.sql import functions as F

    from crawler_spark import contract as C
    from crawler_spark.functions.multimodal import recompress_psnr

    rows = C.q_image_psnr(spark, sf_dir).collect()
    n = min(C._t(spark, sf_dir, "documents").count(), 100)
    assert len(rows) == n
    assert all(r["pass_40db"] for r in rows)
    assert all(r["psnr_db"] is not None and r["psnr_db"] >= 40.0 for r in rows)
    # corrupt payload: a row, not an exception
    bad = spark.createDataFrame(
        pd.DataFrame(
            {"image_id": ["x"], "bytes": [b"notanimage"], "fmt": ["png"]}
        )
    )
    out = recompress_psnr(bad, "jpg").collect()
    assert len(out) == 1
    assert out[0]["pass_40db"] is False and out[0]["psnr_db"] is None
    # lossless round-trip caps at cap_db instead of going infinite
    docs = C._t(spark, sf_dir, "documents").limit(3)
    from crawler_spark.functions.multimodal import attach_synthetic_images

    png = recompress_psnr(
        attach_synthetic_images(docs, "doc_id").withColumn("fmt", F.lit("png")),
        "png",
    ).collect()
    assert all(r["psnr_db"] == 99.0 and r["pass_40db"] for r in png)


def test_pair_quality_gate(spark, sf_dir):
    """Joint image+caption gate: every pair gets exactly one reason,
    kept == (reason=='kept'), and the flags agree with the thresholds
    recomputed from the row's own columns."""
    from crawler_spark import contract as C

    rows = C.q_pair_quality(spark, sf_dir).collect()
    n = min(C._t(spark, sf_dir, "documents").count(), 200)
    assert len(rows) == n
    allowed = {
        "image_corrupt", "image_too_small", "bad_exposure",
        "caption_short", "caption_low_quality", "kept",
    }
    for r in rows:
        assert r["reason"] in allowed
        assert r["kept"] == (r["reason"] == "kept")
        if r["kept"]:
            assert r["dec_w"] >= 16 and r["dec_h"] >= 16
            assert 16.0 <= r["mean_luma"] <= 240.0
            assert r["cap_tokens"] >= 8 and r["cap_quality_bp"] >= 5500
    assert any(r["kept"] for r in rows), "gate dropped every pair"
    assert any(not r["kept"] for r in rows), "gate kept every pair"


def test_resolve_chains_terminals_and_cycle_cap(spark):
    """Pointer doubling resolves every source to its terminal with the
    exact hop count; a CYCLE cannot reach a fixed point, so it stops at
    the doubling cap with hops past any acyclic chain's bound (the
    documented reject-filter), instead of hanging."""
    from crawler_spark.functions.graph import resolve_chains

    m = spark.createDataFrame(
        [(k, k - 1) for k in range(1, 10) if k % 5], "src: long, dst: long"
    )
    got = {
        r["node"]: (r["final"], r["hops"])
        for r in resolve_chains(m, max_hops=8).collect()
    }
    assert got[9] == (5, 4) and got[6] == (5, 1)
    assert got[4] == (0, 4) and got[1] == (0, 1)
    # 3-cycle: terminates (capped), hops exceed the acyclic bound
    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src: long, dst: long")
    rows = resolve_chains(cyc, max_hops=4).collect()
    assert len(rows) == 3
    assert all(r["hops"] > 4 for r in rows), rows


def test_video_foreign_and_truncated_classification():
    """WAV/WEBP are RIFF but NOT videos — they must be ValueError
    ('wrong data'), only RIFF/AVI earns the av-library
    NotImplementedError; truncated MJV1 is ValueError at the exact
    corruption point, never struct.error."""
    import struct

    import pytest as _pytest

    from crawler_spark import images as I
    from crawler_spark import video as V

    wav = b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"\x00" * 24
    with _pytest.raises(ValueError):
        V.probe(wav)
    avi = b"RIFF" + struct.pack("<I", 36) + b"AVI " + b"\x00" * 24
    with _pytest.raises(NotImplementedError):
        V.probe(avi)
    good = V.gen_video(42, 9, 16, 12, n_frames=5)
    for cut in (6, 12, len(good) - 3):
        with _pytest.raises(ValueError):
            list(V.iter_frame_offsets(good[:cut]))
    with _pytest.raises(ValueError):
        V.encode_video([I.gen_pixels(1, 1, 8, 8)], fps=300)


def test_multimodal_kernels_tolerate_corrupt_payloads(spark):
    """One bad byte string must yield a NULL/skipped row, not a dead
    Spark task — for resize, image_embedding, AND frame_sample (the
    contract decode_meta/audio_features already satisfy)."""
    import pandas as pd

    from crawler_spark import images as I
    from crawler_spark import video as V

    good_img = I.encode_png(I.gen_pixels(5, 1, 16, 16))
    pdf = pd.DataFrame(
        {
            "image_id": ["ok", "bad"],
            "bytes": [good_img, b"\x89PNG\r\n\x1a\ngarbage"],
            "fmt": ["png", "png"],
        }
    )
    df = spark.createDataFrame(pdf)
    rs = {r["image_id"]: r for r in MM.resize(df, 8, 8).collect()}
    assert rs["ok"]["bytes"] is not None and rs["bad"]["bytes"] is None
    em = {r["image_id"]: r for r in MM.image_embedding(df).collect()}
    assert em["ok"]["embedding"] is not None and em["bad"]["embedding"] is None

    good_vid = V.gen_video(42, 3, 16, 12, n_frames=6)
    vdf = spark.createDataFrame(
        pd.DataFrame(
            {"image_id": ["v-ok", "v-bad"], "bytes": [good_vid, good_vid[:10]]}
        )
    )
    rows = MM.frame_sample(vdf, every_n=2).collect()
    assert {r["image_id"] for r in rows} == {"v-ok"}
    assert len([r for r in rows if r["image_id"] == "v-ok"]) == 3


def test_decode_meta_mean_luma_is_rec601(spark):
    """mean_luma must be Rec.601 luma, not an unweighted RGB mean: a
    saturated blue frame is DARK (29.1), and a threshold gate using the
    unweighted 85.0 would misclassify colorful images."""
    import numpy as np
    import pandas as pd

    from crawler_spark import images as I

    blue = np.zeros((8, 8, 3), dtype=np.uint8)
    blue[..., 2] = 255
    pdf = pd.DataFrame(
        {"image_id": ["b"], "bytes": [I.encode_png(blue)], "fmt": ["png"]}
    )
    row = MM.decode_meta(spark.createDataFrame(pdf)).collect()[0]
    assert row["decode_ok"] and abs(row["mean_luma"] - 255 * 0.114) < 0.01


def test_pagerank_matches_python_reference(spark):
    """graph.pagerank vs an independent pure-Python evaluation of the
    same integer recurrence on a hand-built graph (hub, chain, dangling
    sink, isolated-from-src node) — exact equality, plus the authority
    ordering a PageRank must produce (hub out-ranks its spokes)."""
    from crawler_spark.functions.graph import pagerank

    edges = [(1, 0), (2, 0), (3, 0), (0, 1), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {
        r["node"]: r["rank_micros"] for r in pagerank(df, n_iter=5).collect()
    }

    nodes = sorted({n for e in edges for n in e})
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(5):
        inflow = {n: 0 for n in nodes}
        for s, ds in out.items():
            for d in ds:
                inflow[d] += rank[s] // len(ds)
        rank = {n: 150_000 + (85 * inflow[n]) // 100 for n in nodes}
    assert got == rank
    assert got[0] > max(got[1], got[2], got[3])  # hub wins
    assert got[6] > got[5] > got[4] == 150_000  # chain accumulates; source is base


def test_connected_components_huge_hashed_ids(spark):
    """Regression: the convergence probe sums labels — with md5-int60
    hashed ids (up to 2^60) a few hundred nodes overflow an int64 sum
    under ANSI mode; the decimal(38,0) probe must not."""
    from crawler_spark.functions.graph import connected_components

    base = (1 << 60) - 1
    edges = [(base - i, base - i - 1) for i in range(0, 40, 2)]
    df = spark.createDataFrame(edges, "a: long, b: long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    for a, b in edges:
        assert got[a] == got[b] == b


def test_image_phash_clusters_cocluster_copies(spark, sf_dir):
    """Each original image and its quality-99 JPEG recompression must
    land in the same visual cluster (pigeonhole-exact banding at
    hamming ≤ 3) — the e2e guarantee behind q_image_phash_clusters."""
    from crawler_spark import contract as C

    rows = C.q_image_phash_clusters(spark, sf_dir).collect()
    keeper = {r["image_id"]: r["keeper_image_id"] for r in rows}
    origs = [i for i in keeper if "~" not in i]
    assert len(origs) >= 90
    co = sum(1 for i in origs if keeper.get(i + "~jpg") == keeper[i])
    assert co >= 0.9 * len(origs), f"{co}/{len(origs)} co-clustered"


def test_approx_distinct_within_pinned_error(spark, sf_dir):
    """q_distinct_urls_approx (HLL++, rsd=2%) must land within 5%
    relative error of the exact two-level twin on every host."""
    from crawler_spark import contract as C

    exact = {
        r["host_id"]: r["n_urls"] for r in C.q_distinct_urls(spark, sf_dir).collect()
    }
    approx = {
        r["host_id"]: r["n_urls_approx"]
        for r in C.q_distinct_urls_approx(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    worst = max(abs(approx[h] - exact[h]) / exact[h] for h in exact)
    assert worst <= 0.05, f"worst relative error {worst:.3f}"


def test_html_visible_text_adversarial(spark):
    """Script bodies containing '<' are fully dropped, and nested
    entities do not double-decode (&amp;lt; -> literal '&lt;')."""
    from crawler_spark.functions.text import html_visible_text

    cases = [
        ("<script>if(a<b){x();}</script><p>keep</p>", "keep"),
        ("<p>a &amp;lt; b</p>", "a &lt; b"),
        ("<p>x &lt;tag&gt; &amp; y</p>", "x <tag> & y"),
        ("<script src='x'>var a = 1 < 2;</script>ok<br/>done", "ok done"),
    ]
    df = spark.createDataFrame(cases, "html: string, want: string")
    rows = df.select("want", html_visible_text("html").alias("got")).collect()
    for r in rows:
        assert r["got"] == r["want"], (r["got"], r["want"])


def test_jaccard_dense_and_prefix_paths_identical(spark):
    """Both physical strategies of ngram_jaccard_pairs (dense bitmap
    matmul / PPJoin prefix filter) must emit IDENTICAL rows — the path
    choice is a plan decision, never a semantics one.  Random corpus
    with planted near-dups, threshold at a rounding-sensitive value."""
    import random

    rng = random.Random(11)
    words = ["crawl", "spark", "graft", "image", "shard", "token", "pixel", "query"]
    rows = []
    for i in range(150):
        base = " ".join(rng.choices(words, k=rng.randint(3, 10)))
        rows.append((i, base))
        if rng.random() < 0.5:
            rows.append((1000 + i, base + " " + rng.choice(words)))
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    dense = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ND.ngram_jaccard_pairs(docs, threshold=0.4).collect()
    }
    sparse = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ND.ngram_jaccard_pairs(docs, threshold=0.4, dense_vocab_max=0).collect()
    }
    assert dense, "fixture must produce near-dup pairs"
    assert dense == sparse


def test_jaccard_dense_path_avoids_shingle_pair_shuffle(spark):
    """Hot-vocabulary corpora (every shingle shared by ~all docs) must
    take the dense path: the plan contains the block-matmul
    FlatMapGroupsInPandas and NO equi-join — the per-shingle pair join
    degenerates to Σ df² rows exactly when the vocabulary is small
    (measured 1.5e9 joined rows / ~5 min for 5k docs before the fix)."""
    docs = spark.createDataFrame(
        [(i, "aaaa bbbb cccc dddd " * 10) for i in range(50)],
        "doc_id: long, text: string",
    )
    plan = ND.ngram_jaccard_pairs(docs, threshold=0.4)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_bind_once_evaluates_expensive_expr_once_per_row(spark):
    """bind_once must stop Catalyst from re-inlining a computed column
    into per-element lambda bodies: shingling a 6 KiB document (~6k
    element lambda) over a bound norm_text must produce the same rows
    as the direct formulation, and the executed plan's transform lambda
    must reference a lambda variable, not a regexp_replace subtree."""
    doc = " ".join(f"tok{i:04d}" for i in range(800))  # ~6k distinct shingles
    df = spark.createDataFrame([(1, doc)], "doc_id: long, text: string")
    out = df.select(TX.char_shingles("text", 5).alias("sh"))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # exactly one regex evaluation site: the bound array element
    assert plan.count("regexp_replace") == 1, plan
    n = out.select(F.size("sh")).first()[0]
    assert n > 1000


def test_repetition_stats_pinned_values(spark):
    """Pin the repetition-signal arithmetic on hand-computed docs:
    dup_token_per_mille = 1000*(n - n_distinct) div n over the shared
    tokenization; token_ngrams_all keeps duplicate bigrams in order."""
    rows = [
        (0, "spam spam spam spam"),            # 4 tokens, 1 distinct -> 750
        (1, "all words here are unique"),      # 5 tokens, 0 dups -> 0
        (2, "a b a b a b"),                    # 6 tokens, 2 distinct -> 666
        (3, "solo"),                           # 1 token, no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    rep = TX.repetition_stats("text")
    got = {
        r["doc_id"]: (r["n"], r["dup"])
        for r in df.select(
            "doc_id", rep["n_tokens"].alias("n"), rep["dup_token_per_mille"].alias("dup")
        ).collect()
    }
    assert got == {0: (4, 750), 1: (5, 0), 2: (6, 666), 3: (1, 0)}

    bigrams = {
        r["doc_id"]: r["bg"]
        for r in df.select("doc_id", TX.token_ngrams_all("text", 2).alias("bg")).collect()
    }
    assert bigrams[0] == ["spam spam"] * 3          # duplicates KEPT
    assert bigrams[2] == ["a b", "b a", "a b", "b a", "a b"]
    assert bigrams[3] == []                          # <2 tokens -> empty


def test_incremental_neardup_probe_cross_set_only(spark):
    """The incremental probe must report ONLY (increment x corpus)
    near-dups: corpus-corpus duplicates stay silent (they are the
    index's business), novel increment docs produce nothing, and an
    increment doc near-duplicating a corpus doc is found with the
    same exact-verified jaccard the self-join pipeline reports."""
    base = (
        "the quick brown fox jumps over the lazy dog while the band plays on "
        "and the crowd cheers for more of the same old song and dance routine"
    )
    corpus = spark.createDataFrame(
        [(1, base), (2, base), (3, "unrelated corpus text about parquet row groups")],
        "doc_id: long, text: string",
    )
    increment = spark.createDataFrame(
        [
            (10, base.replace("crowd", "audience")),   # near-dup of 1 and 2
            (11, "completely novel text about watermark state eviction"),
        ],
        "doc_id: long, text: string",
    )
    got = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in ND.incremental_neardup_pairs(
            corpus, increment, threshold=0.5
        ).collect()
    }
    assert set(got) == {(10, 1), (10, 2)}          # cross-set only; 1-2 dup silent
    assert got[(10, 1)] == got[(10, 2)]            # identical corpus texts
    assert 0.5 <= got[(10, 1)] < 1.0
    # agrees with the self-join pipeline's exact-verified jaccard
    self_pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ND.minhash_neardup_pairs(
            corpus.union(increment), threshold=0.5
        ).collect()
    }
    assert self_pairs[(1, 10)] == got[(10, 1)]


def test_dup_cc_minhash_matches_exact(spark, sf_dir):
    """The wired scale switch (contract.dup_cc pair_kind='minhash') must
    resolve the fixture corpus to the same near-dup components as the
    oracle-exact kernel.  At 64 perms / 16 bands x 4 rows the banding
    curve's capture probability at j=0.4 is ~0.97 per pair and the
    fixture's true pairs all sit well above threshold, so we pin full
    component-set equality here (a recall bound would mask a broken
    kernel); if a future fixture adds pairs hovering exactly at 0.4,
    relax this to recall >= 0.95 with a comment."""
    from crawler_spark import contract

    exact = {
        (r["node"], r["component"])
        for r in contract.dup_cc(spark, sf_dir, pair_kind="exact").collect()
    }
    mh = {
        (r["node"], r["component"])
        for r in contract.dup_cc(spark, sf_dir, pair_kind="minhash").collect()
    }
    assert mh == exact


def test_dup_cc_env_switch_and_bad_kind(spark, sf_dir, monkeypatch):
    from crawler_spark import contract

    monkeypatch.setenv("SPARK_GRAFT_CC_PAIRS", "minhash")
    df = contract.dup_cc(spark, sf_dir)
    assert df.columns == ["node", "component"]
    with pytest.raises(ValueError, match="pair_kind"):
        contract.dup_cc(spark, sf_dir, pair_kind="bogus")
