"""Deterministic sf1 scale-up of the driver's sf0.1 testdata (round 12).

VERDICT r11 item 7 asks for one decade of *measured* scaling on the
bench heavies (sf0.1 -> sf1) to convert the 100 TB argument from
structural to empirical. The container has no network (duckdb's tpch
extension cannot download) and /root/testdata is read-only, so this
script derives an sf1 directory from sf0.1 itself: 10 key-offset
replicas per fact table, dimensions untouched. Writing happens with
pyarrow only (no Spark) so it can run alongside nothing and be exactly
reproducible (no RNG at all — every perturbation is a pure function of
(row, replica)).

Design choices that keep the scaled workload HONEST for the ops under
test rather than degenerate:

- Keys: every surrogate/foreign key gets `+ i * STRIDE` per replica i
  (STRIDE = 10^ceil(log10(max_key+1)) per key family), so joins keep
  the same per-key fan-out and per-group sizes as sf0.1 — exactly how
  TPC-H itself scales (more customers/orders, not bigger groups).
- `region`/`nation` stay 5/25 rows — dimensional, scale-invariant.
- `events.ts` is NOT shifted: 10x event density per time window is the
  realistic scale-up for windowed aggregations.
- `documents.text`: replica i>0 inserts an `ri` token every 7 words.
  A plain 10x copy would make every doc a 10-clone near-dup cluster
  and inflate MinHash-LSH verify volume ~100x per bucket for an
  artifactual reason; the periodic insertion breaks ~5/7 of 5-gram
  shingles, dropping cross-replica Jaccard to ~0.2 — below every
  near-dup threshold in the registry — while keeping length/quality
  distributions intact. Exact-dedup duplicate RATE is likewise
  preserved (exact dups within a replica stay exact dups).
- `embeddings.embedding`: replica i rotates the vector by i positions
  (np.roll). Norm-preserving, direction-scrambling: replicas are not
  mutual near-neighbours, so ANN probe/verify volume scales with
  corpus size, not with an artificial clone structure.
- `part.p_name`: replica i>0 appends ` r{i}` — keeps the length-band
  blocking distribution of `part_name_neardup` while preventing 10x
  exact-name clones.

Usage: python tools/gen_sf1.py [SRC_DIR] [DST_DIR]
Defaults: /root/testdata/sf0.1 -> /tmp/sf1
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPLICAS = 10


def _stride(max_key: int) -> int:
    return 10 ** math.ceil(math.log10(max_key + 2))


def _insert_token_every(words_sep: str, text: str, tok: str, n: int) -> str:
    w = text.split(words_sep)
    out = []
    for j, word in enumerate(w):
        if j and j % n == 0:
            out.append(tok)
        out.append(word)
    return words_sep.join(out)


def scale_table(name: str, src: str, dst: str) -> None:
    t = pq.read_table(os.path.join(src, f"{name}.parquet"))
    if name in ("region", "nation"):
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: copied (dimension), {t.num_rows} rows")
        return

    df0 = t.to_pandas()
    key_cols = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }[name]
    # Strides per key FAMILY so FKs offset consistently across tables:
    # derive from the referenced table's own max at sf0.1.
    family_max = {
        "c_custkey": 15000, "o_custkey": 15000,
        "s_suppkey": 1000, "l_suppkey": 1000,
        "p_partkey": 20000, "l_partkey": 20000,
        "o_orderkey": 600000, "l_orderkey": 600000,
        "event_id": 100000, "user_id": 100000,
        "doc_id": 5000, "vec_id": 2000,
    }

    out_path = os.path.join(dst, f"{name}.parquet")
    writer = None
    for i in range(REPLICAS):
        df = df0.copy()
        for k in key_cols:
            df[k] = df[k] + i * _stride(int(family_max[k]))
        if i > 0:
            if name == "documents":
                tok = f"r{i}"
                df["text"] = [
                    _insert_token_every(" ", s, tok, 7) for s in df["text"]
                ]
                df["n_chars"] = [len(s) for s in df["text"]]
            elif name == "embeddings":
                df["embedding"] = [
                    np.roll(np.asarray(v, dtype=np.float32), i)
                    for v in df["embedding"]
                ]
            elif name == "part":
                df["p_name"] = df["p_name"] + f" r{i}"
        batch = pa.Table.from_pandas(df, schema=t.schema, preserve_index=False)
        if writer is None:
            writer = pq.ParquetWriter(out_path, t.schema)
        writer.write_table(batch)
    writer.close()
    meta = pq.read_metadata(out_path)
    print(f"{name}: {t.num_rows} -> {meta.num_rows} rows")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    os.makedirs(dst, exist_ok=True)
    for name in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        scale_table(name, src, dst)


if __name__ == "__main__":
    main()
