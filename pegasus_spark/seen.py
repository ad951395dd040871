"""URL-seen set: partitioned Bloom filter + exact table + overflow.

Replaces shriphani/pegasus's LMDB visited-cache (``src/pegasus/cache.clj``
``initialize-caches`` — symbol cite per SURVEY.md §0) per the north rule's
"partitioned Bloom-filter-with-cuckoo-overflow URL-seen set"
(BASELINE.json). Design (SURVEY.md §2 O4):

- ``seen`` table: exact ever-enqueued ``url_hash`` rows, partitioned by
  ``part_id = pmod(url_hash, P)`` — **the source of truth**. The north
  rule requires *matching* the reference's URL-seen set, so the bloom is
  an I/O saver, never authoritative.
- ``bloom`` table: one row per partition, numpy bit array (binary) +
  an exact int64 *overflow* array holding hashes inserted after the
  partition reached its fpp capacity (the cuckoo-overflow role). When
  the overflow grows past a threshold, the partition's bloom is rebuilt
  at 2× m from the exact ``seen`` partition (executor-side).
- ``probe``: Arrow-batched pandas UDF against broadcast bloom bytes —
  rows the bloom rejects are *definitely new* and skip the exact
  anti-join entirely; only "maybe seen" rows pay the join.

Scale math (10^10 URLs, SURVEY.md §7.3): P partitions of m bits each,
m ≤ 64 MB/partition → P = 2048 × 48 MB blooms holds 10^10 keys at
fpp ≈ 1%. Blooms live in a table and broadcast per round; the exact
table is only touched via co-partitioned anti-joins — nothing
driver-side grows with the frontier (the driver holds P bloom rows,
never URL rows). Merge/rebuild are grouped-map ``applyInPandas`` per
part_id on executors, returning P small rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from .hashing import bloom_indexes
from .tables import ManifestCatalog

SEEN_DDL = "url_hash long, part_id int"
BLOOM_DDL = "part_id int, m_bits long, bloom binary, n_items long, overflow binary"
BLOOM_ARROW = pa.schema([
    ("part_id", pa.int32()), ("m_bits", pa.int64()), ("bloom", pa.binary()),
    ("n_items", pa.int64()), ("overflow", pa.binary()),
])


def _set_bits(bits: np.ndarray, hashes: np.ndarray, m_bits: int, k: int) -> None:
    idx = bloom_indexes(hashes, m_bits, k)
    np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))


class SeenSet:
    def __init__(
        self,
        catalog: ManifestCatalog,
        n_parts: int = 8,
        m_bits: int = 1 << 20,
        k: int = 5,
        overflow_rebuild: int = 4096,
    ):
        self.cat = catalog
        self.n_parts = n_parts
        self.m_bits = m_bits
        self.k = k
        self.overflow_rebuild = overflow_rebuild
        catalog.create("seen", SEEN_DDL)
        catalog.create("bloom", BLOOM_DDL)

    def _capacity(self, m_bits: int) -> int:
        # items at which the partition hits its design fpp: n ≈ m·ln2/k
        return int(m_bits * 0.693 / self.k)

    def with_part_id(self, df: DataFrame, col: str = "url_hash") -> DataFrame:
        return df.withColumn("part_id", F.pmod(F.col(col), F.lit(self.n_parts)).cast("int"))

    # ---- state ------------------------------------------------------
    def _load_blooms(self) -> dict[int, dict]:
        rows = self.cat.read("bloom").collect()  # ≤ P rows by design
        out = {}
        for r in rows:
            out[r["part_id"]] = {
                "m_bits": int(r["m_bits"]),
                "bits": np.frombuffer(r["bloom"], dtype=np.uint8),
                "ovf": np.frombuffer(r["overflow"], dtype=np.int64)
                if r["overflow"] else np.empty(0, dtype=np.int64),
                "n_items": int(r["n_items"]),
            }
        return out

    def _store_blooms(self, blooms: dict[int, dict]) -> None:
        rows = [
            {
                "part_id": pid,
                "m_bits": e["m_bits"],
                "bloom": e["bits"].tobytes(),
                "n_items": e["n_items"],
                "overflow": e["ovf"].tobytes(),
            }
            for pid, e in sorted(blooms.items())
        ]
        self.cat.overwrite_local("bloom", pa.Table.from_pylist(rows, schema=BLOOM_ARROW))

    # ---- probe ------------------------------------------------------
    def split_maybe_seen(self, df: DataFrame, col: str = "url_hash") -> DataFrame:
        """Adds ``maybe_seen:boolean``. False ⇒ definitely not in the set
        (bloom guarantee); True ⇒ must be checked against ``seen``."""
        blooms = self._load_blooms()
        if not blooms:
            return df.withColumn("maybe_seen", F.lit(False))
        b = self.cat.spark.sparkContext.broadcast(blooms)
        n_parts, k = self.n_parts, self.k

        @F.pandas_udf("boolean")
        def might_contain(h: pd.Series) -> pd.Series:
            hv = h.to_numpy(dtype=np.int64)
            parts = np.mod(hv, n_parts)
            res = np.zeros(len(hv), dtype=bool)
            for pid in np.unique(parts):
                e = b.value.get(int(pid))
                if e is None:
                    continue
                mask = parts == pid
                idx = bloom_indexes(hv[mask], e["m_bits"], k)
                hit = ((e["bits"][idx >> 3] >> (idx & 7)) & 1).all(axis=1)
                if len(e["ovf"]):
                    hit |= np.isin(hv[mask], e["ovf"])
                res[mask] = hit
            return pd.Series(res)

        return df.withColumn("maybe_seen", might_contain(F.col(col)))

    def filter_new(self, df: DataFrame, col: str = "url_hash") -> DataFrame:
        """Exact 'not in seen set' filter: bloom prefilter + ONE anti-join
        whose condition is gated on the bloom verdict (SURVEY.md §2 O4).

        Single-branch on purpose: ``maybe_seen AND hash match`` as the
        anti-join condition gives the same result as splitting into
        definitely-new ∪ checked branches, but keeps every upstream node
        unique in the plan — callers can attach ``observe()`` metrics
        without double-counting, and the probe still prunes the join
        (rows with maybe_seen=false never probe the hash table)."""
        probed = self.split_maybe_seen(df, col)
        seen = self.cat.read("seen").select(F.col("url_hash").alias("_seen_hash"))
        cond = F.col("maybe_seen") & (F.col(col) == F.col("_seen_hash"))
        return probed.join(seen, on=cond, how="left_anti").drop("maybe_seen")

    # ---- update -----------------------------------------------------
    def add(self, new_hashes: DataFrame, col: str = "url_hash") -> None:
        """Insert distinct, not-yet-present hashes: append to the exact
        table; OR-merge the blooms per partition executor-side."""
        hdf = self.with_part_id(new_hashes.select(F.col(col).alias("url_hash"))).persist()
        self.cat.append("seen", hdf)

        blooms = self._load_blooms()
        b = self.cat.spark.sparkContext.broadcast(blooms)
        m_default, k = self.m_bits, self.k

        def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            pid = int(key[0])
            hv = pdf["url_hash"].to_numpy(dtype=np.int64)
            e = b.value.get(pid)
            if e is None:
                e = {"m_bits": m_default,
                     "bits": np.zeros(m_default // 8, dtype=np.uint8),
                     "ovf": np.empty(0, dtype=np.int64), "n_items": 0}
            bits = e["bits"].copy()
            room = max(0, int(e["m_bits"] * 0.693 / k) - e["n_items"])
            into_bloom, into_ovf = hv[:room], hv[room:]
            if len(into_bloom):
                _set_bits(bits, into_bloom, e["m_bits"], k)
            ovf = np.concatenate([e["ovf"], into_ovf]) if len(into_ovf) else e["ovf"]
            return pd.DataFrame({
                "part_id": [pid], "m_bits": [e["m_bits"]], "bloom": [bits.tobytes()],
                "n_items": [e["n_items"] + len(hv)], "overflow": [ovf.tobytes()],
            })

        merged = hdf.groupBy("part_id").applyInPandas(merge, schema=BLOOM_DDL)
        new_rows = {int(r["part_id"]): r for r in merged.collect()}  # ≤ P rows
        hdf.unpersist()
        for pid, r in new_rows.items():
            blooms[pid] = {
                "m_bits": int(r["m_bits"]),
                "bits": np.frombuffer(r["bloom"], dtype=np.uint8),
                "ovf": np.frombuffer(r["overflow"], dtype=np.int64)
                if r["overflow"] else np.empty(0, dtype=np.int64),
                "n_items": int(r["n_items"]),
            }
        self._store_blooms(blooms)
        self._rebuild_overflowed(blooms)

    def _rebuild_overflowed(self, blooms: dict[int, dict]) -> None:
        """Partitions whose overflow passed the threshold get a fresh
        bloom at 2× m rebuilt from the exact seen partition."""
        over_ids = [pid for pid, e in blooms.items() if len(e["ovf"]) > self.overflow_rebuild]
        if not over_ids:
            return
        new_m = {pid: blooms[pid]["m_bits"] * 2 for pid in over_ids}
        nm_b = self.cat.spark.sparkContext.broadcast(new_m)
        k = self.k

        def rebuild(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            pid = int(key[0])
            m_bits = nm_b.value[pid]
            hv = pdf["url_hash"].to_numpy(dtype=np.int64)
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
            _set_bits(bits, hv, m_bits, k)
            return pd.DataFrame({
                "part_id": [pid], "m_bits": [m_bits], "bloom": [bits.tobytes()],
                "n_items": [len(hv)], "overflow": [b""],
            })

        seen = self.cat.read("seen").filter(F.col("part_id").isin(over_ids))
        for r in seen.groupBy("part_id").applyInPandas(rebuild, schema=BLOOM_DDL).collect():
            blooms[int(r["part_id"])] = {
                "m_bits": int(r["m_bits"]),
                "bits": np.frombuffer(r["bloom"], dtype=np.uint8),
                "ovf": np.empty(0, dtype=np.int64),
                "n_items": int(r["n_items"]),
            }
        self._store_blooms(blooms)
