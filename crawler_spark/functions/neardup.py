"""Deduplication operators over a document corpus.

Four tiers, each the standard web-corpus construction (Broder '97
shingling/minhash; Charikar '02 simhash), re-expressed Spark-first:

- **exact**       — md5(canonical text) groupBy.  One shuffle on a
  16-byte key; at 100 TB this is the cheapest possible full-corpus
  dedup (combiner-backed, no skew risk beyond genuinely duplicated
  docs, which AQE skew-split absorbs).
- **n-gram Jaccard** — exact pairwise Jaccard over char-5-gram sets,
  candidates restricted to pairs sharing ≥1 shingle (any pair with
  J>0 shares one, so this is EXACT, not approximate).  Shingles are
  hashed to int64 JVM-side before the self-join so the shuffle moves
  8-byte keys, never strings.  O(pairs-sharing-a-shingle) — fine per
  LSH bucket or small corpus; the 100 TB path is minhash below.
- **MinHash + LSH** — k permutations via the (a*h+b) mod p universal
  family over shingle xxhash64s (numpy matrix per Arrow batch —
  vectorized, no per-row Python); band-hash bucketing → candidate
  pairs → exact Jaccard verification of candidates only.
- **SimHash**     — 64-bit signature from token xxhash64s, computed
  entirely in JVM aggregates (explode tokens → 64 conditional sums →
  bit reassembly); near-dup = Hamming distance ≤ t via bit_count(xor),
  candidates from 16-bit band buckets (pigeonhole: d≤3 ⇒ some band of
  4 equal).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import char_shingles, fingerprint, norm_text, token_array

MERSENNE_P = (1 << 61) - 1


# ----------------------------------------------------------------- exact
def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct canonical text: (fp, n_dups, keeper=min id)."""
    return (
        docs.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.min(id_col).alias("keeper"),
        )
    )


def drop_exact_dups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative of each canonical-text group."""
    keepers = exact_dup_groups(docs, id_col, text_col).select(
        F.col("keeper").alias(id_col)
    )
    return docs.join(keepers, id_col, "left_semi")


# ------------------------------------------------------------ shingle sets
def shingle_hashes(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    hash_fn=None,
) -> DataFrame:
    """(id, shingle_hashes: array<long>) — distinct char n-grams hashed
    JVM-side.  Default hash is xxhash64 (fastest JVM path);
    ``hash_fn=text.md5_int60`` makes every downstream signature
    DuckDB-reproducible (driver-contract oracles).  Arrays stay
    un-exploded until a consumer needs the shuffle."""
    hf = hash_fn or F.xxhash64
    return docs.select(
        F.col(id_col),
        F.transform(char_shingles(text_col, n), lambda g: hf(g)).alias("shingle_hashes"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.4,
    hash_fn=None,
    dense_vocab_max: int = 1 << 16,
    dense_docs_max: int = 50_000,
) -> DataFrame:
    """EXACT near-dup pairs by char-n-gram Jaccard ≥ threshold.
    Output: (a, b, jaccard) with a < b, jaccard rounded to 4 decimals.

    Adaptive physical strategy (both paths produce identical rows —
    the choice is a plan decision, like AQE's, made from one cheap
    stats aggregate):

    - **dense** (distinct shingles ≤ ``dense_vocab_max`` AND docs ≤
      ``dense_docs_max``): boilerplate-heavy / small-vocabulary corpora
      make EVERY shingle hot, so any candidate join on shared shingles
      degenerates to Σ df(g)² rows (measured 1.5e9 joined rows for
      5,000 synthetic docs over a 2,041-shingle vocabulary — minutes of
      pure shuffle for a 256-pair answer).  Here each doc's shingle set
      is a ≤8 KiB packed bitmap over the collected vocabulary, docs are
      hash-blocked, and every block-pair's exact intersection matrix is
      ONE numpy matmul inside ``applyInPandas`` (Arrow-batched; float32
      is exact for counts < 2^24).  Work is inherently Θ(docs²·vocab/w)
      in this regime — vectorizing it is the only lever — and the
      shuffle is docs·√(groups) bitmap replicas, never pair rows.
    - **sparse** (real Zipf vocabularies): prefix-filtered candidate
      join (AllPairs/PPJoin, Bayardo et al. WWW'07; Xiao et al.
      WWW'08): under a global (df asc, hash) shingle order, any pair
      with J ≥ t shares a shingle in both docs' first
      ``|A| − ⌈t·|A|⌉ + 1`` shingles, so only those rare-first prefixes
      enter the equi-join; hot shingles sit in suffixes and never
      become join keys.  Candidates are then verified exactly with one
      ``array_intersect`` per pair — no per-shingle pair-count shuffle.

    At 10^10 docs neither exact path is the tool (candidate
    completeness costs Ω(true-pair count); dense-vocab corpora are
    quadratic by construction): `minhash_neardup_pairs` is the scale
    path, with this kernel as its per-bucket verifier.
    """
    # Persist the shingled frame: the stats probe AND the chosen path
    # both consume it (the probe alone re-ran the whole shingling scan
    # — measured ~4 s of the 11.5 s exact-pairs wall at sf0.1).  The
    # probe's collect() populates the cache eagerly; the pair result is
    # materialized below so the cache can be released before returning
    # (same lifecycle as minhash_neardup_pairs).
    sh = shingle_hashes(docs, id_col, text_col, n, hash_fn=hash_fn).persist()
    exploded = sh.select(F.col(id_col), F.explode("shingle_hashes").alias("sh"))
    id_integral = dict(docs.select(id_col).dtypes)[id_col] in (
        "tinyint",
        "smallint",
        "int",
        "bigint",
    )
    pairs = None
    if id_integral:
        # one bounded stats pass: distinct-with-limit collects at most
        # cap+1 hashes (driver-safe for any corpus; a huge vocabulary
        # just overflows the limit and falls through to the sparse path)
        probe = (
            exploded.select("sh").distinct().limit(dense_vocab_max + 1).collect()
        )
        if len(probe) <= dense_vocab_max:
            n_docs = sh.count()
            if n_docs <= dense_docs_max:
                vocab = np.sort(np.array([r[0] for r in probe], dtype=np.int64))
                pairs = _jaccard_pairs_dense(sh, id_col, threshold, vocab, n_docs)
    if pairs is None:
        pairs = _jaccard_pairs_prefix(sh, exploded, id_col, threshold)
    pairs = pairs.persist()
    pairs.count()
    sh.unpersist()
    return pairs


def _jaccard_pairs_prefix(
    sh: DataFrame, exploded: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Sparse path: prefix-filtered candidates + exact array_intersect
    verify (see ngram_jaccard_pairs docstring)."""
    from pyspark.sql import Window

    dfreq = exploded.groupBy("sh").agg(F.count("*").alias("_df"))
    w = Window.partitionBy(id_col).orderBy(F.col("_df").asc(), F.col("sh").asc())
    ranked = (
        exploded.join(dfreq, "sh")
        .withColumn("_pos", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(Window.partitionBy(id_col)))
    )
    # Jaccard prefix length |A| - ceil(t'*|A|) + 1 (PPJoin, exact).
    # t' is threshold minus half an output ulp: the final filter is on
    # the 4-dp ROUNDED value (HALF_UP), so a pair at J = t - 4e-5 is
    # kept by the filter and must be reachable by the candidate join.
    t_eff = max(1e-9, threshold - 5e-5)
    prefix = ranked.filter(
        F.col("_pos") <= F.col("_n") - F.ceil(F.lit(t_eff) * F.col("_n")) + 1
    ).select(F.col(id_col), "sh")
    cand = (
        prefix.alias("x")
        .join(prefix.alias("y"), "sh")
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b")
        )
        .distinct()
    )
    sa = sh.select(F.col(id_col).alias("a"), F.col("shingle_hashes").alias("_sa"))
    sb = sh.select(F.col(id_col).alias("b"), F.col("shingle_hashes").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("long")
    union = (F.size("_sa") + F.size("_sb")).cast("long") - inter
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard", F.round(inter.cast("double") / union.cast("double"), 4)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _jaccard_pairs_dense(
    sh: DataFrame, id_col: str, threshold: float, vocab: np.ndarray, n_docs: int
) -> DataFrame:
    """Dense path: packed-bitmap doc blocks, exact per-block-pair
    intersection matmul (see ngram_jaccard_pairs docstring).  Shuffles
    bitmap replicas (docs × (B+1) rows), never per-shingle pair rows."""
    import math

    n_vocab = max(1, len(vocab))
    # block sizing: ≤64 MiB unpacked float32 per side, ≥8 blocks for
    # parallelism once the corpus is big enough to matter
    mem_rows = max(64, (64 << 20) // (4 * n_vocab))
    block_rows = min(mem_rows, max(256, math.ceil(n_docs / 8)))
    n_blocks = max(1, math.ceil(n_docs / block_rows))
    nbytes = (n_vocab + 7) // 8

    @F.pandas_udf(T.BinaryType())
    def pack_udf(hashes: pd.Series) -> pd.Series:
        out = []
        for arr in hashes:
            bits = np.zeros(n_vocab, dtype=np.uint8)
            if arr is not None and len(arr):
                a = np.asarray(arr, dtype=np.int64)
                idx = np.searchsorted(vocab, a)
                # every hash is in vocab by construction; guard anyway
                ok = (idx < n_vocab) & (vocab[np.minimum(idx, n_vocab - 1)] == a)
                bits[idx[ok]] = 1
            out.append(np.packbits(bits).tobytes())
        return pd.Series(out)

    packed = sh.select(
        F.col(id_col).alias("_id"),
        F.size("shingle_hashes").cast("long").alias("_n"),
        pack_udf("shingle_hashes").alias("_bits"),
        F.pmod(F.xxhash64(id_col), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    left = packed.select(
        F.col("_blk").alias("bi"),
        F.explode(F.sequence("_blk", F.lit(n_blocks - 1))).alias("bj"),
        F.lit(0).alias("_side"),
        "_id",
        "_n",
        "_bits",
    )
    right = packed.filter(F.col("_blk") > 0).select(
        F.explode(F.sequence(F.lit(0), F.col("_blk") - 1)).alias("bi"),
        F.col("_blk").alias("bj"),
        F.lit(1).alias("_side"),
        "_id",
        "_n",
        "_bits",
    )

    # pre-filter margin: jaccard is ROUND-HALF-UPed to 4 dp Spark-side
    # below, so the UDF must keep anything that could round up to thr
    thr = float(threshold) - 5e-5

    def block_pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        same = key[0] == key[1]  # diagonal group: within-block triangle
        lt = pdf[pdf["_side"] == 0]
        rt = lt if same else pdf[pdf["_side"] == 1]
        if len(lt) == 0 or len(rt) == 0:
            return pd.DataFrame({"a": [], "b": [], "jaccard": []}).astype(
                {"a": "int64", "b": "int64", "jaccard": "float64"}
            )

        def unpack(rows: pd.Series) -> np.ndarray:
            m = np.frombuffer(b"".join(rows.tolist()), dtype=np.uint8).reshape(
                len(rows), nbytes
            )
            return np.unpackbits(m, axis=1, count=n_vocab).astype(np.float32)

        A, B = unpack(lt["_bits"]), unpack(rt["_bits"])
        inter = (A @ B.T).astype(np.float64)  # exact: counts < 2^24
        na = lt["_n"].to_numpy(dtype=np.float64)
        nb = rt["_n"].to_numpy(dtype=np.float64)
        union = na[:, None] + nb[None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            # float64 division == Spark double division bit-for-bit
            jac = np.where(union > 0, inter / union, 0.0)
        ia = lt["_id"].to_numpy(dtype=np.int64)
        ib = rt["_id"].to_numpy(dtype=np.int64)
        keep = (jac >= thr) & (ia[:, None] != ib[None, :])
        if same:
            keep &= ia[:, None] < ib[None, :]
        xi, yi = np.nonzero(keep)
        a, b = ia[xi], ib[yi]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a": lo, "b": hi, "jaccard": jac[xi, yi]})

    return (
        left.unionByName(right)
        .groupBy("bi", "bj")
        .applyInPandas(block_pairs, schema="a long, b long, jaccard double")
        # round + threshold in Spark so 4-dp HALF_UP semantics match the
        # sparse path (and the DuckDB oracle) exactly
        .withColumn("jaccard", F.round("jaccard", 4))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# --------------------------------------------------------------- minhash
def _perm_params(k: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=k, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, size=k, dtype=np.int64)
    return a, b


def minhash_signatures(
    shingled: DataFrame, k: int = 64, seed: int = 42, id_col: str = "doc_id"
) -> DataFrame:
    """(id, sig: array<long>) — k-permutation MinHash over shingle hashes.

    Arrow-batched numpy: one (k × m) modular-multiply per doc, no
    per-row Python interpretation of the inner loop.  Empty shingle
    sets get the all-MAX signature (never collides).
    """
    a, b = _perm_params(k, seed)
    a_o = np.array(a, dtype=object)  # python ints: exact 122-bit products
    b_o = np.array(b, dtype=object)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(hashes: pd.Series) -> pd.Series:
        out = []
        for arr in hashes:
            if arr is None or len(arr) == 0:
                out.append([np.iinfo(np.int64).max] * k)
                continue
            h = np.array([int(x) & ((1 << 61) - 1) for x in arr], dtype=object)
            # (k, m) universal-hash matrix, min along m
            mat = (a_o[:, None] * h[None, :] + b_o[:, None]) % MERSENNE_P
            out.append([int(v) for v in mat.min(axis=1)])
        return pd.Series(out)

    return shingled.select(F.col(id_col), sig_udf("shingle_hashes").alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 16, rows: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Band the signature (bands × rows = k), bucket by band hash, emit
    distinct candidate pairs (a < b).  The band hash is xxhash64 over
    the band's slice serialized to a string — JVM-side."""
    banded = _banded(signatures, bands, rows, id_col)
    return (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b"))
        .distinct()
    )


def minhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    k: int = 64,
    bands: int = 16,
    rows: int = 4,
    threshold: float = 0.4,
    seed: int = 42,
    hash_fn=None,
) -> DataFrame:
    """Full MinHash+LSH pipeline: candidates from banding, then EXACT
    Jaccard verification of candidates only (no false positives in the
    output; recall governed by the banding curve).  The 100 TB path:
    all shuffles move (int64 key, int64 id) pairs.

    With ``hash_fn=text.md5_int60`` the whole pipeline (signatures,
    band candidates, verified pairs) is bit-reproducible in ANSI SQL —
    the driver contract's oracle replays it in DuckDB with HUGEINT
    modular arithmetic over the same permutation constants."""
    sh = shingle_hashes(docs, id_col, text_col, n, hash_fn=hash_fn).persist()
    cand = lsh_candidate_pairs(minhash_signatures(sh, k, seed, id_col), bands, rows, id_col)
    sizes = sh.select(F.col(id_col), F.size("shingle_hashes").cast("long").alias("n_sh"))
    ex = sh.select(F.col(id_col), F.explode("shingle_hashes").alias("sh"))
    # exact intersection via explode+join restricted to candidate ids
    cand_ids = cand.select(F.col("a").alias(id_col)).union(
        cand.select(F.col("b").alias(id_col))
    ).distinct()
    ex_c = ex.join(cand_ids, id_col, "left_semi")
    inter = (
        ex_c.alias("x")
        .join(ex_c.alias("y"), "sh")
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b"))
        .join(cand, ["a", "b"], "left_semi")  # only LSH candidates
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    verified = (
        inter.join(sizes.withColumnRenamed(id_col, "a").withColumnRenamed("n_sh", "na"), "a")
        .join(sizes.withColumnRenamed(id_col, "b").withColumnRenamed("n_sh", "nb"), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    # Materialize the (tiny) verified pair set so the shingle cache can be
    # released immediately — long-lived sessions call this repeatedly and
    # would otherwise accumulate cached shingle blocks until the periodic
    # context-cleaner GC gets around to them.
    verified = verified.persist()
    verified.count()
    sh.unpersist()
    return verified


def incremental_neardup_pairs(
    corpus: DataFrame,
    increment: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    k: int = 64,
    bands: int = 16,
    rows: int = 4,
    threshold: float = 0.4,
    seed: int = 42,
    hash_fn=None,
) -> DataFrame:
    """Cross-set near-dup probe: which INCREMENT docs near-duplicate an
    already-indexed CORPUS doc — the per-crawl-round dedup shape at
    100 TB, where the corpus side is a persisted MinHash index that is
    NEVER recomputed and each round only signatures its delta (the
    dedup analogue of the engine's incremental frontier delta log,
    sinks/__init__.py).  Reference grounding: ON CONFLICT DO NOTHING
    (commons/Entry.go:37) is the reference's new-vs-seen write
    predicate; this is its near-duplicate generalization.

    Same banding + exact-verify contract as
    :func:`minhash_neardup_pairs` (no false positives; recall from the
    banding curve), but the band join is increment⋈corpus instead of a
    self-join: the increment's banded keys are BROADCAST (a crawl
    round's delta is small next to the corpus index), so the corpus
    side is a map-side probe — no corpus shuffle.  Verification
    explodes shingles only for docs that appear in a candidate pair
    (left_semi pushdown on both sides).

    Returns (new_id, corpus_id, jaccard) with jaccard ≥ threshold.
    """
    sh_c = shingle_hashes(corpus, id_col, text_col, n, hash_fn=hash_fn).persist()
    sh_i = shingle_hashes(increment, id_col, text_col, n, hash_fn=hash_fn).persist()
    band_c = _banded(minhash_signatures(sh_c, k, seed, id_col), bands, rows, id_col)
    band_i = _banded(minhash_signatures(sh_i, k, seed, id_col), bands, rows, id_col)
    cand = (
        band_c.alias("c")
        .join(F.broadcast(band_i.alias("i")), ["band", "bucket"])
        .select(
            F.col(f"i.{id_col}").alias("new_id"),
            F.col(f"c.{id_col}").alias("corpus_id"),
        )
        .distinct()
    )
    sizes_i = sh_i.select(
        F.col(id_col).alias("new_id"), F.size("shingle_hashes").cast("long").alias("n_i")
    )
    sizes_c = sh_c.select(
        F.col(id_col).alias("corpus_id"),
        F.size("shingle_hashes").cast("long").alias("n_c"),
    )
    ex_i = sh_i.select(F.col(id_col).alias("new_id"), F.explode("shingle_hashes").alias("sh")).join(
        cand.select("new_id").distinct(), "new_id", "left_semi"
    )
    ex_c = sh_c.select(
        F.col(id_col).alias("corpus_id"), F.explode("shingle_hashes").alias("sh")
    ).join(cand.select("corpus_id").distinct(), "corpus_id", "left_semi")
    inter = (
        ex_i.join(ex_c, "sh")
        .join(cand, ["new_id", "corpus_id"], "left_semi")
        .groupBy("new_id", "corpus_id")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    verified = (
        inter.join(sizes_i, "new_id")
        .join(sizes_c, "corpus_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("n_i") + F.col("n_c") - F.col("inter")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", "jaccard")
    )
    verified = verified.persist()
    verified.count()
    sh_c.unpersist()
    sh_i.unpersist()
    return verified


def _banded(
    signatures: DataFrame, bands: int, rows: int, id_col: str = "doc_id"
) -> DataFrame:
    """(id, band, bucket) banded signature keys — the LSH index rows."""
    return signatures.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice("sig", i * rows + 1, rows))
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


# --------------------------------------------------------------- simhash
def simhash64(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", hash_fn=None
) -> DataFrame:
    """(id, simhash: long) — 64-bit SimHash, 100% JVM aggregates.

    explode(tokens) → token hash → per-doc, for each bit j: sum(±1 by
    bit j of the token hash) → bit j of the signature = sign.  64
    conditional sums in ONE hash-aggregate pass (map-side combined).
    Default token hash xxhash64; ``hash_fn=text.md5_int60`` for the
    DuckDB-reproducible contract variant (bits 60-63 then carry no
    entropy — identically in both engines).
    """
    hf = hash_fn or F.xxhash64
    toks = docs.select(
        F.col(id_col), F.explode(token_array(text_col)).alias("tok")
    ).withColumn("th", hf(F.col("tok")))
    # SWAR bit-slicing: accumulator m packs TWO bit-counts into 32-bit
    # lanes of one long — sum((th >> m) & 0x0000000100000001) counts
    # bit m in the low lane and bit m+32 in the high lane.  32 branch-
    # free sums replace the naive 64 conditional (±1) sums: half the
    # aggregate buffers and ~4x cheaper per input row, while the
    # per-doc token count n recovers the same majority rule exactly
    # (sum(±1) > 0  ⇔  2*c_j > n).  Lanes cannot overflow below 2^31
    # tokens per document, so no length cap is needed for exactness.
    lane_mask = F.lit(0x0000000100000001).cast("long")
    bit_sums = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"),
        *[
            F.sum(F.shiftright(F.col("th"), m).bitwiseAND(lane_mask)).alias(f"acc{m}")
            for m in range(32)
        ],
    )
    sig = F.lit(0).cast("long")
    for j in range(64):
        m, k = j % 32, j // 32
        c_j = F.shiftright(F.col(f"acc{m}"), 32 * k).bitwiseAND(
            F.lit(0xFFFFFFFF).cast("long")
        )
        bit = (1 << j) if j < 63 else -(1 << 63)  # j=63 is the sign bit
        sig = sig + F.when(2 * c_j > F.col("n_tok"), F.lit(bit).cast("long")).otherwise(
            F.lit(0)
        )
    return bit_sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_neardup_pairs(
    sigs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ t, banded for scale:
    split the 64-bit sig into 4×16-bit bands; d≤3 ⇒ at least one band
    identical (pigeonhole) → equi-join per band, verify bit_count(xor).

    Skew guard (``max_bucket``): short/degenerate docs concentrate in a
    few band values (0x0000/0xFFFF chunks), and a band bucket of n docs
    contributes O(n²) join pairs — one hot bucket is the whole job's
    runtime at corpus scale.  Buckets larger than ``max_bucket`` are
    dropped from BOTH join sides before the self-join (the hot set is
    tiny → broadcast anti-join).  A pair is lost only if EVERY band the
    two docs agree on is hot — for real corpora that means degenerate
    near-empty docs, which exact dedup upstream removes anyway.
    ``max_bucket=None`` disables the guard (exact banding).
    """
    banded = sigs.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.chunk")
    if max_bucket is not None:
        hot = (
            banded.groupBy("band", "chunk")
            .count()
            .filter(F.col("count") > max_bucket)
            .select("band", "chunk")
        )
        banded = banded.join(F.broadcast(hot), ["band", "chunk"], "left_anti")
    return (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "chunk"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("a"),
            F.col(f"y.{id_col}").alias("b"),
            F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
