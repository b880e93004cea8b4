"""Segmented Bloom + cuckoo URL-seen pre-filter (SURVEY.md §4, M3).

Why segmented: at the 10^10-key target a single Bloom filter is ~11.2 GiB of
bits at 1% FPR — un-broadcastable. Segments are keyed by the SAME
``domain_hash`` bucketing as the frontier, so a probe task loads exactly one
segment (its own bucket) from the segment store; nothing is broadcast at full
scale. (For per-epoch deltas / small scale a broadcast would also work; the
store path is the scale path and is what's implemented.)

Build and probe are both ``applyInPandas`` grouped ops over ``domain_hash``
— Arrow-batched, numpy-vectorized inside, zero per-row Python.

Guarantees (property-tested): the Bloom has NO false negatives; the cuckoo
refinement never rejects a true member (saturated segments degrade to
bloom-only). A false *positive* only costs an extra probe in the exact
anti-join backstop — set parity is never at risk (SURVEY.md M3).

Hashing: url_sha1 is already a uniform 160-bit digest; h1/h2 are its first
two 64-bit words, bit_i = (h1 + i*h2) mod m (standard double hashing).

Reference analog: the in-memory ``set`` seen-check
(blockchain-multichain-monitor.py:28, :83-85) and dir-existence probes
(contract_crawler.py:364-365, :378-379).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FP_MULT = np.uint64(0x5BD1E995)


def _h1h2(sha1_hex: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """First two big-endian 64-bit words of each sha1 hex digest — decoded in
    one C-speed pass (bytes.fromhex on the concatenated column), not per-row
    Python int(s, 16)."""
    joined = "".join(sha1_hex.str.slice(0, 32))
    words = np.frombuffer(bytes.fromhex(joined), dtype=">u8").astype(np.uint64)
    h1 = words[0::2].copy()
    h2 = words[1::2] | np.uint64(1)
    return h1, h2


def _bloom_params(
    n_keys: int, bits_per_key: int = 12, n_hashes: int = 7, headroom: float = 2.0
) -> tuple[int, int]:
    """Bits sized with growth headroom so incremental deltas can be OR-ed in
    for ~headroom x growth before a segment needs a full rebuild."""
    m = max(64, int(n_keys * bits_per_key * headroom))
    return m, n_hashes


class SegmentStore:
    """Filesystem-backed, versioned bloom+cuckoo segments, one per bucket.

    Layout: ``{root}/v{version:06d}/seg{bucket:05d}.npz``. On a cluster the
    root is shared storage (HDFS/S3 via a local mount or download-to-tmp);
    each task touches only its own bucket's file.
    """

    def __init__(self, root: str, n_buckets: int, bits_per_key: int = 12, n_hashes: int = 7):
        self.root = root
        self.n_buckets = n_buckets
        self.bits_per_key = bits_per_key
        self.n_hashes = n_hashes

    def _seg_path(self, version: int, bucket: int) -> str:
        return os.path.join(self.root, f"v{version:06d}", f"seg{bucket:05d}.npz")

    def versions(self) -> list[int]:
        if not os.path.isdir(self.root):
            return []
        return sorted(int(d[1:]) for d in os.listdir(self.root) if d.startswith("v"))

    # ---------- build ----------
    def build(self, seen: DataFrame, version: int) -> dict[int, int]:
        """Build segments from the url_seen table (cols url_sha1, domain_hash).

        Returns {bucket: n_keys} (recorded in snapshot lineage as the bloom
        segment version map). Distributed: one grouped-map task per bucket.
        """
        out_dir = os.path.join(self.root, f"v{version:06d}")
        os.makedirs(out_dir, exist_ok=True)
        bits_per_key, n_hashes = self.bits_per_key, self.n_hashes
        seg_path_tpl = os.path.join(out_dir, "seg{:05d}.npz")

        def build_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            bucket = int(pdf["domain_hash"].iloc[0])
            n = len(pdf)
            m, k = _bloom_params(n, bits_per_key, n_hashes)
            h1, h2 = _h1h2(pdf["url_sha1"])
            bitmap = np.zeros((m + 7) // 8, dtype=np.uint8)
            mm = np.uint64(m)
            for i in range(k):
                idx = (h1 + np.uint64(i) * h2) % mm
                np.bitwise_or.at(bitmap, (idx >> np.uint64(3)).astype(np.int64),
                                 np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
            ck = _CuckooTable.build(h1, h2, headroom=2.0)
            # savez appends '.npz' unless the name already ends with it
            tmp = seg_path_tpl.format(bucket) + f".tmp{os.getpid()}.npz"
            np.savez_compressed(
                tmp, bitmap=bitmap, m=np.int64(m), k=np.int64(k), n=np.int64(n),
                ck_table=ck.table, ck_saturated=np.int8(ck.saturated),
            )
            os.replace(tmp, seg_path_tpl.format(bucket))
            return pd.DataFrame({"domain_hash": [bucket], "n_keys": [n]})

        res = (
            seen.select("url_sha1", "domain_hash")
            .groupBy("domain_hash")
            .applyInPandas(build_segment, schema="domain_hash int, n_keys long")
            .collect()
        )
        return {r["domain_hash"]: r["n_keys"] for r in res}

    def build_delta(
        self, delta: DataFrame, seen: DataFrame, prev_version: int | None, version: int
    ) -> dict[int, int]:
        """Incremental segment build: OR the epoch's new keys into the
        previous version's segments instead of rescanning the whole seen set.

        At the 10^10-key target a full rebuild per epoch is O(total) and
        grows without bound; this is O(epoch delta). Segments are sized with
        2x headroom (``_bloom_params``), so a bucket only needs a full
        rebuild (from ``seen``, restricted to that bucket) after it roughly
        doubles; untouched buckets are hardlinked into the new version dir.
        Falls back to a full build when there is no previous version.
        """
        if prev_version is None:
            return self.build(seen, version)
        out_dir = os.path.join(self.root, f"v{version:06d}")
        os.makedirs(out_dir, exist_ok=True)
        prev_dir = os.path.join(self.root, f"v{prev_version:06d}")
        bits_per_key = self.bits_per_key
        store = self
        pv = prev_version

        def delta_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            bucket = int(pdf["domain_hash"].iloc[0])
            prev_path = store._seg_path(pv, bucket)
            new_path = store._seg_path(version, bucket)
            h1, h2 = _h1h2(pdf["url_sha1"])
            if os.path.exists(prev_path):
                seg = np.load(prev_path)
                m, k, n_prev = int(seg["m"]), int(seg["k"]), int(seg["n"])
                n_total = n_prev + len(pdf)
                if n_total * bits_per_key > m:  # headroom exhausted
                    return pd.DataFrame(
                        {"domain_hash": [bucket], "n_keys": [n_total], "rebuilt": [True]}
                    )
                bitmap = seg["bitmap"].copy()
                mm = np.uint64(m)
                for i in range(k):
                    idx = (h1 + np.uint64(i) * h2) % mm
                    np.bitwise_or.at(
                        bitmap, (idx >> np.uint64(3)).astype(np.int64),
                        np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8),
                    )
                ck = _CuckooTable(seg["ck_table"].copy(), saturated=bool(seg["ck_saturated"]))
                if not ck.saturated:
                    ck.insert_many(h1, h2)
            else:  # brand-new bucket: fresh segment from the delta alone
                n_total = len(pdf)
                m, k = _bloom_params(n_total, bits_per_key)
                bitmap = np.zeros((m + 7) // 8, dtype=np.uint8)
                mm = np.uint64(m)
                for i in range(k):
                    idx = (h1 + np.uint64(i) * h2) % mm
                    np.bitwise_or.at(
                        bitmap, (idx >> np.uint64(3)).astype(np.int64),
                        np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8),
                    )
                ck = _CuckooTable.build(h1, h2, headroom=2.0)
            tmp = new_path + f".tmp{os.getpid()}.npz"
            np.savez_compressed(
                tmp, bitmap=bitmap, m=np.int64(m), k=np.int64(k), n=np.int64(n_total),
                ck_table=ck.table, ck_saturated=np.int8(ck.saturated),
            )
            os.replace(tmp, new_path)
            return pd.DataFrame(
                {"domain_hash": [bucket], "n_keys": [n_total], "rebuilt": [False]}
            )

        res = (
            delta.select("url_sha1", "domain_hash")
            .groupBy("domain_hash")
            .applyInPandas(delta_segment, schema="domain_hash int, n_keys long, rebuilt boolean")
            .collect()
        )
        # buckets whose headroom ran out: full rebuild from seen, those only
        rebuild = [r["domain_hash"] for r in res if r["rebuilt"]]
        if rebuild:
            self.build(seen.filter(F.col("domain_hash").isin(rebuild)), version)
        # carry over untouched buckets (hardlink — no data copied)
        touched = {r["domain_hash"] for r in res}
        if os.path.isdir(prev_dir):
            for fname in os.listdir(prev_dir):
                bucket = int(fname[3:8])
                if bucket not in touched:
                    dst = os.path.join(out_dir, fname)
                    if not os.path.exists(dst):
                        os.link(os.path.join(prev_dir, fname), dst)
        return {r["domain_hash"]: r["n_keys"] for r in res}

    # ---------- probe ----------
    def probe(self, candidates: DataFrame, version: int) -> DataFrame:
        """Add ``bloom_maybe: boolean`` — False means DEFINITELY unseen.

        Grouped by domain_hash so each task reads one segment file once.
        """
        seg_path = self._seg_path  # bound method is picklable via self
        store = self

        def probe_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            bucket = int(pdf["domain_hash"].iloc[0])
            path = store._seg_path(version, bucket)
            if not os.path.exists(path):
                pdf["bloom_maybe"] = False
                return pdf
            seg = np.load(path)
            bitmap, m, k = seg["bitmap"], np.uint64(int(seg["m"])), int(seg["k"])
            h1, h2 = _h1h2(pdf["url_sha1"])
            maybe = np.ones(len(pdf), dtype=bool)
            for i in range(k):
                idx = (h1 + np.uint64(i) * h2) % m
                bit = (bitmap[(idx >> np.uint64(3)).astype(np.int64)]
                       >> (idx & np.uint64(7)).astype(np.uint8)) & 1
                maybe &= bit.astype(bool)
            if not bool(seg["ck_saturated"]):
                ck = _CuckooTable(seg["ck_table"], saturated=False)
                maybe &= ck.contains(h1, h2)
            pdf["bloom_maybe"] = maybe
            return pdf

        from pyspark.sql import types as T

        # StructType.add mutates in place — build a fresh copy
        schema = T.StructType(
            list(candidates.schema.fields) + [T.StructField("bloom_maybe", T.BooleanType())]
        )
        return candidates.groupBy("domain_hash").applyInPandas(probe_segment, schema=schema)


class _CuckooTable:
    """Minimal cuckoo filter: 4-slot buckets, 16-bit fingerprints.

    Refines bloom positives (second stage) to cut false positives before the
    exact anti-join (north_star's "cuckoo-filter refinement"; cf. PAPERS.md
    learned-cuckoo entry for the design space). Never produces a false
    negative: if any insert fails after max kicks the table is marked
    saturated and the probe stage skips it.
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, table: np.ndarray, saturated: bool):
        self.table = table
        self.saturated = saturated

    @staticmethod
    def _fp_and_buckets(h1: np.ndarray, h2: np.ndarray, nb: np.uint64):
        fp = (h2 % np.uint64(65535)).astype(np.uint64) + np.uint64(1)
        i1 = h1 % nb
        i2 = (i1 ^ (fp * _FP_MULT)) % nb
        return fp.astype(np.uint16), i1.astype(np.int64), i2.astype(np.int64)

    @classmethod
    def build(cls, h1: np.ndarray, h2: np.ndarray, headroom: float = 1.0) -> "_CuckooTable":
        n = len(h1)
        nb = max(8, 1 << int(np.ceil(np.log2(max(1, int(n * headroom)) / cls.SLOTS / 0.84 + 1))))
        table = np.zeros((nb, cls.SLOTS), dtype=np.uint16)
        t = cls(table, saturated=False)
        t.insert_many(h1, h2)
        return t

    def insert_many(self, h1: np.ndarray, h2: np.ndarray) -> None:
        """Insert keys into the existing table (used by both the full build
        and the incremental delta path). Marks the table saturated — never a
        false negative — when an eviction chain exhausts MAX_KICKS."""
        cls = type(self)
        table = self.table
        nb = table.shape[0]
        n = len(h1)
        fp, i1, i2 = cls._fp_and_buckets(h1, h2, np.uint64(nb))
        rng = np.random.default_rng(12345)  # deterministic eviction choices
        saturated = self.saturated
        for j in range(n):
            f, a, b = int(fp[j]), int(i1[j]), int(i2[j])
            if f in table[a] or f in table[b]:
                continue
            placed = False
            for idx in (a, b):
                empt = np.where(table[idx] == 0)[0]
                if len(empt):
                    table[idx, empt[0]] = f
                    placed = True
                    break
            if placed:
                continue
            cur, fcur = a, f
            mult, mask = int(_FP_MULT), nb - 1
            for _ in range(cls.MAX_KICKS):
                slot = int(rng.integers(0, cls.SLOTS))
                fcur, table[cur, slot] = int(table[cur, slot]), fcur
                # fp*mult < 2^48 so the Python-int product matches the
                # non-wrapping uint64 product used in _fp_and_buckets
                cur = (cur ^ (fcur * mult)) & mask
                empt = np.where(table[cur] == 0)[0]
                if len(empt):
                    table[cur, empt[0]] = fcur
                    placed = True
                    break
            if not placed:
                saturated = True
                break
        self.saturated = saturated

    def contains(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        nb = np.uint64(self.table.shape[0])
        fp, i1, i2 = self._fp_and_buckets(h1, h2, nb)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2
