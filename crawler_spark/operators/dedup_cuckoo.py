"""URL-seen dedup: partitioned CUCKOO-filter prefilter + exact anti-join.

The north rule names "bloom/cuckoo URL-seen"; ``operators/dedup.py`` is
the Bloom arm, this module is the cuckoo arm (Fan et al., "Cuckoo
Filter: Practically Better Than Bloom", CoNEXT 2014) behind the SAME
three-name contract the engine consumes (``FILTER_STATE_SCHEMA``,
``update_seen_filters``, ``anti_join_seen_with_delta``), so
``CrawlConfig(filter_kind="cuckoo")`` swaps the state kind with no
other engine change.  Semantics are identical by construction — the
filter is only a prefilter; "maybe seen" survivors always go through
the exact ``left_anti`` join (north_rule: "identical URL-seen set"),
and the equivalence is pinned by the same test battery as the Bloom.

What the cuckoo arm adds over Bloom:

- **deletion** (``delete_keys``): a recrawl scheduler can un-see a
  stale URL so the next round re-fetches it, WITHOUT rebuilding the
  filter state — impossible with a Bloom (bits are shared).  Standard
  cuckoo caveat applies and is enforced by the caller: only delete
  keys known to be inserted (the engine deletes from the exact seen
  table in the same commit, which is the source of truth anyway).
- **lower FPP for the same state size regime**: 16-bit fingerprints,
  4-slot buckets → ~2·b/2^f ≈ 0.012% per epoch vs the Bloom's ~1%,
  so fewer candidates pay the exact join.

Layout per (part_id, epoch): ``table`` is an (n_buckets × 4) uint16
array (0 = empty; fingerprints are remapped to be nonzero),
n_buckets a power of two.  Bucket choice uses a splitmix-style mix of
the 64-bit url_hash — NOT the raw low bits, which are constant within
a partition (part_id = hash mod n_parts uses them).  Epoch overflow
mirrors the Bloom arm: when an epoch is full (or an insert exceeds
MAX_KICKS evictions), leftovers open a fresh epoch sized 2× the batch
— geometric growth, O(log) epochs, no rebuilds.  Inserts sort the
key batch first so the table bytes are deterministic for a given key
set (checkpoint-resume byte-stability; lookups don't depend on it).

Membership probe is fully vectorized numpy (two gathers + compare)
inside the same cogroup-by-part_id plan as the Bloom arm: candidates
shuffle once on part_id to meet their partition's epoch tables; blobs
never collect to the driver.  Insert/delete walk keys in a Python
loop, but only over the per-round DELTA within one partition task —
the probe (every round × every candidate) is the hot path, not the
fold.  Reference analogue: the seen set is the reference's
``INSERT ... ON CONFLICT DO NOTHING`` (commons/Entry.go:37).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import part_id_col

FILTER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("filter", T.BinaryType(), False),  # uint16 (m,4) table
        T.StructField("n_keys", T.LongType(), False),
        T.StructField("capacity", T.LongType(), False),
        T.StructField("n_parts", T.IntegerType(), True),
    ]
)

CUCKOO_STATE_SCHEMA = FILTER_STATE_SCHEMA  # descriptive alias

_SLOTS = 4
_MAX_KICKS = 500
_MIN_CAPACITY = 4096
_LOAD = 0.95  # target fill; 4-slot tables reliably reach ~95%


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche so bucket bits are independent of the
    low bits consumed by part_id = hash mod n_parts."""
    z = h.astype(np.uint64)
    z = (z ^ (z >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    z ^= z >> np.uint64(33)
    return z


def _fingerprints(h: np.ndarray) -> np.ndarray:
    fp = ((_mix(h) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(48)).astype(np.uint16)
    fp[fp == 0] = 0x9E37  # 0 is the empty-slot sentinel
    return fp


def _bucket_pair(h: np.ndarray, fp: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    mask = np.uint64(m - 1)  # m is a power of two
    i1 = (_mix(h) & mask).astype(np.int64)
    fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & mask
    i2 = (i1.astype(np.uint64) ^ fph).astype(np.int64)
    return i1, i2


def _alt_bucket(i: int, fp: int, m: int) -> int:
    return int((np.uint64(i) ^ ((np.uint64(fp) * np.uint64(0x5BD1E995)) & np.uint64(m - 1))))


def _n_buckets_for(capacity: int) -> int:
    m = 1
    while m * _SLOTS * _LOAD < capacity:
        m *= 2
    return max(m, 64)


def _lookup(table: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Vectorized membership: fp present in either candidate bucket."""
    m = table.shape[0]
    fp = _fingerprints(h)
    i1, i2 = _bucket_pair(h, fp, m)
    return (table[i1] == fp[:, None]).any(axis=1) | (table[i2] == fp[:, None]).any(axis=1)


def _insert_with_undo(table: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Insert keys; returns a bool mask of keys that did NOT fit (caller
    opens a fresh epoch for them).

    Two phases.  The bulk phase is vectorized: rounds of conflict-free
    claims (one claimant per bucket per round via ``np.unique``, i1
    preferred over i2), which places everything short of eviction —
    the common case at ≤95% load, and the reason a 10^5-key partition
    delta folds in milliseconds instead of a per-key Python walk.  The
    residue takes the classic per-key eviction walk (victim slot
    cycles with the kick count, start at i1 — deterministic); a failed
    chain is rolled back via an exact undo log so the table is left
    unchanged — a chain abandoned mid-rotation would displace an
    EARLIER key's fingerprint out of both its buckets, i.e. a false
    negative."""
    m = table.shape[0]
    fp = _fingerprints(h)
    i1, i2 = _bucket_pair(h, fp, m)
    n = len(h)
    placed = np.zeros(n, dtype=bool)
    while True:
        progressed = False
        for buckets in (i1, i2):
            rem = np.flatnonzero(~placed)
            if not len(rem):
                break
            b = buckets[rem]
            has_free = (table[b] == 0).any(axis=1)
            cand = rem[has_free]
            if not len(cand):
                continue
            _, first = np.unique(buckets[cand], return_index=True)
            take = cand[first]
            tb = buckets[take]
            slot = (table[tb] == 0).argmax(axis=1)
            table[tb, slot] = fp[take]
            placed[take] = True
            progressed = True
        if not progressed or placed.all():
            break

    leftover = np.zeros(n, dtype=bool)
    for k in np.flatnonzero(~placed):
        f = int(fp[k])
        b = int(i1[k])
        done = False
        log: list[tuple[int, int, int]] = []  # (bucket, slot, previous fp)
        for kick in range(_MAX_KICKS):
            slot = kick % _SLOTS
            prev = int(table[b, slot])
            log.append((b, slot, prev))
            table[b, slot] = f
            f = prev
            b = _alt_bucket(b, f, m)
            empty = np.flatnonzero(table[b] == 0)
            if len(empty):
                table[b, empty[0]] = f
                done = True
                break
        if not done:
            for b_u, slot_u, prev_u in reversed(log):
                table[b_u, slot_u] = prev_u
            leftover[k] = True
    return leftover


def _delete(table: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Remove ONE stored copy of each key's fingerprint; returns a bool
    mask of keys actually deleted from this table.  Vectorized rounds
    with one claimant per (bucket, slot) — two distinct keys sharing a
    (bucket, fingerprint) pair each remove their own copy, never the
    same slot twice."""
    m = table.shape[0]
    fp = _fingerprints(h)
    i1, i2 = _bucket_pair(h, fp, m)
    deleted = np.zeros(len(h), dtype=bool)
    while True:
        progressed = False
        for buckets in (i1, i2):
            rem = np.flatnonzero(~deleted)
            if not len(rem):
                break
            b = buckets[rem]
            match = table[b] == fp[rem][:, None]
            hasm = match.any(axis=1)
            cand = rem[hasm]
            if not len(cand):
                continue
            slot = match[hasm].argmax(axis=1)
            tb = buckets[cand]
            _, first = np.unique(tb * _SLOTS + slot, return_index=True)
            table[tb[first], slot[first]] = 0
            deleted[cand[first]] = True
            progressed = True
        if not progressed:
            break
    return deleted


def _blob_to_table(blob: bytes) -> np.ndarray:
    t = np.frombuffer(bytes(blob), dtype=np.uint16)
    return t.reshape(len(t) // _SLOTS, _SLOTS).copy()


_STATE_COLS = [f.name for f in FILTER_STATE_SCHEMA.fields]


def update_seen_filters(
    filters_prev: DataFrame,
    new_seen: DataFrame,
    n_parts: int = 64,
) -> DataFrame:
    """Fold this round's new keys into the cuckoo state (REWRITE
    semantics, same contract as ``dedup.update_seen_filters``).
    Epochs under a different ``n_parts`` are dropped — the engine
    refolds the full seen set on config change, exactly as for Bloom.
    """

    def fold(key, blobs: pd.DataFrame, keys: pd.DataFrame) -> pd.DataFrame:
        part = int(key[0])
        rows = blobs.sort_values("epoch").to_dict("records") if len(blobs) else []
        h = keys["url_hash"].to_numpy(dtype=np.int64) if len(keys) else np.array([], np.int64)
        h = np.sort(h)  # deterministic table bytes for a given key set
        if len(h):
            pending = h
            if rows:
                cur = rows[-1]
                room = int(cur["capacity"]) - int(cur["n_keys"])
                if room > 0:
                    take, pending = pending[:room], pending[room:]
                    table = _blob_to_table(cur["filter"])
                    left = _insert_with_undo(table, take)
                    cur["filter"] = table.tobytes()
                    cur["n_keys"] = int(cur["n_keys"]) + int((~left).sum())
                    if left.any():
                        pending = np.concatenate([take[left], pending])
            while len(pending):
                cap = max(_MIN_CAPACITY, 2 * len(pending))
                m = _n_buckets_for(cap)
                table = np.zeros((m, _SLOTS), dtype=np.uint16)
                left = _insert_with_undo(table, pending)
                rows.append(
                    {
                        "part_id": part,
                        "epoch": (int(rows[-1]["epoch"]) + 1) if rows else 0,
                        "filter": table.tobytes(),
                        "n_keys": int((~left).sum()),
                        "capacity": cap,
                        "n_parts": n_parts,
                    }
                )
                if left.all():  # fresh 2×-sized epoch must make progress
                    raise RuntimeError(
                        f"cuckoo epoch insert made no progress (part {part}, "
                        f"{len(pending)} keys, {m} buckets)"
                    )
                pending = pending[left]  # geometric epochs: terminates
        return pd.DataFrame(rows, columns=_STATE_COLS)

    prev_k = filters_prev.filter(F.col("n_parts") == F.lit(n_parts)).groupBy("part_id")
    new_k = (
        new_seen.select("url_hash")
        .withColumn("part_id", part_id_col("url_hash", n_parts))
        .groupBy("part_id")
    )
    return prev_k.cogroup(new_k).applyInPandas(fold, schema=FILTER_STATE_SCHEMA)


def delete_keys(
    filters_state: DataFrame,
    del_keys: DataFrame,
    n_parts: int = 64,
) -> DataFrame:
    """Un-see keys (recrawl invalidation): remove one fingerprint copy
    per key, newest epoch first.  The Bloom arm has no counterpart —
    this is the operation that motivates the cuckoo kind.  Only keys
    actually inserted may be deleted (standard cuckoo-filter contract);
    the engine guarantees that by deleting from the exact seen table in
    the same commit."""

    def fold(key, blobs: pd.DataFrame, keys: pd.DataFrame) -> pd.DataFrame:
        rows = blobs.sort_values("epoch").to_dict("records") if len(blobs) else []
        h = keys["url_hash"].to_numpy(dtype=np.int64) if len(keys) else np.array([], np.int64)
        if len(h) and rows:
            remaining = np.unique(h)
            for cur in reversed(rows):  # newest epoch first
                if not len(remaining):
                    break
                table = _blob_to_table(cur["filter"])
                deleted = _delete(table, remaining)
                if deleted.any():
                    cur["filter"] = table.tobytes()
                    cur["n_keys"] = max(0, int(cur["n_keys"]) - int(deleted.sum()))
                    remaining = remaining[~deleted]
        return pd.DataFrame(rows, columns=_STATE_COLS)

    prev_k = filters_state.groupBy("part_id")
    del_k = (
        del_keys.select("url_hash")
        .withColumn("part_id", part_id_col("url_hash", n_parts))
        .groupBy("part_id")
    )
    return prev_k.cogroup(del_k).applyInPandas(fold, schema=FILTER_STATE_SCHEMA)


def anti_join_seen_partitioned(
    candidates: DataFrame,
    seen: DataFrame,
    filters_state: DataFrame,
    n_parts: int = 64,
    prune_seen_parts: bool = False,
    unpersist_into: list | None = None,
) -> DataFrame:
    """candidates \\ seen — exact, cuckoo-prefiltered; identical plan
    shape and conservative-default semantics as the Bloom arm."""
    filters_state = filters_state.filter(F.col("n_parts") == F.lit(n_parts))
    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("_maybe", T.BooleanType(), False)]
    )
    cand_cols = [f.name for f in candidates.schema.fields]

    def probe(key, cands: pd.DataFrame, blobs: pd.DataFrame) -> pd.DataFrame:
        if not len(cands):
            return pd.DataFrame(columns=cand_cols + ["_maybe"])
        out = cands[cand_cols].copy()
        if not len(blobs):
            # absent/partial state is NOT "nothing seen" — degrade to the
            # exact anti-join (same conservative default as the Bloom arm)
            out["_maybe"] = True
            return out
        h = cands["url_hash"].to_numpy(dtype=np.int64)
        maybe = np.zeros(len(h), dtype=bool)
        for blob in blobs["filter"]:
            t = np.frombuffer(bytes(blob), dtype=np.uint16)
            maybe |= _lookup(t.reshape(len(t) // _SLOTS, _SLOTS), h)
        out["_maybe"] = maybe
        return out

    cand_k = candidates.withColumn("part_id", part_id_col("url_hash", n_parts)).groupBy(
        "part_id"
    )
    flagged = cand_k.cogroup(filters_state.groupBy("part_id")).applyInPandas(
        probe, schema=out_schema
    )
    pruning = prune_seen_parts and "seen_part" in seen.columns
    if pruning:
        # persist: the prune's eager part-list collect would otherwise
        # run the probe once for the list and again for the anti-join;
        # the persisted frame registers with the caller's unpersist
        # list at persist time (same explicit hand-off as the Bloom arm)
        flagged = flagged.persist()
        if unpersist_into is not None:
            unpersist_into.append(flagged)
    definitely_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    needs_check = flagged.filter(F.col("_maybe")).drop("_maybe")
    seen_keys = seen
    if pruning:
        from .dedup import prune_seen_to_maybe_parts

        seen_keys = prune_seen_to_maybe_parts(seen, needs_check, n_parts)
    checked = needs_check.join(
        seen_keys.select("url_hash"), "url_hash", "left_anti"
    )
    return definitely_new.unionByName(checked)


def anti_join_seen_with_delta(
    candidates: DataFrame,
    seen_prev: DataFrame,
    new_seen: DataFrame,
    filters_state: DataFrame,
    n_parts: int = 64,
    prune_seen_parts: bool = False,
    unpersist_into: list | None = None,
) -> DataFrame:
    """candidates \\ (seen_prev ∪ new_seen) — the filter covers only
    seen_prev; the one-round delta gets its own exact anti-join (the
    round-1 delta-blindspot fix, shared semantics with the Bloom arm).
    """
    base = anti_join_seen_partitioned(
        candidates, seen_prev, filters_state, n_parts, prune_seen_parts,
        unpersist_into=unpersist_into,
    )
    return base.join(new_seen.select("url_hash"), "url_hash", "left_anti")
