"""Synthesize a K-times-larger copy of a testdata scale factor for scaling
probes (SCALE.md "Measured scaling").

Replication alone would be a degenerate corpus for dedup/similarity — every
document would have K-1 exact twins and every embedding K-1 cosine-1.0
copies, exploding pair counts quadratically BY DATA and telling us nothing
about the operators.  Each replica is therefore perturbed so cross-replica
rows are unrelated:

- documents: every token gets a per-replica suffix (``the`` -> ``the__3``),
  so all shingles/grams differ across replicas (within-replica dup
  structure is preserved exactly);
- embeddings: dimensions are rotated by k positions — within-replica
  geometry is intact, cross-replica cosines decorrelate;
- events/lineitem/orders/...: ids shift by k*N, event times stay inside the
  calendar window so date-dim joins keep matching.

Writes multi-row-group parquet (~64k rows/group) so Spark gets real input
splits, unlike the single-row-group driver files.

Usage: python tools/make_scaled_testdata.py [K] [out_dir]
"""

from __future__ import annotations

import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

ID_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "region": [],
    "nation": [],
}


def _shift_ids(tbl: pa.Table, table: str, k: int, sizes: dict) -> pa.Table:
    for col in ID_COLS.get(table, []):
        base = col
        off = k * sizes[table]
        idx = tbl.schema.get_field_index(base)
        shifted = pc.add(tbl.column(base), off)
        tbl = tbl.set_column(idx, base, shifted.cast(tbl.schema.field(base).type))
    return tbl


PERTURB_MODE = "suffix"  # set to "rotate" for the non-pathological probe


def _perturb_documents(tbl: pa.Table, k: int) -> pa.Table:
    if k == 0:
        return tbl
    texts = tbl.column("text").to_pylist()
    if PERTURB_MODE == "rotate":
        # rotate each token's characters by k: cross-replica grams differ
        # WITHOUT introducing any corpus-universal substring — the honest
        # 10x corpus for char-gram dedup
        def mut(t):
            out = []
            for tok in t.split(" "):
                r = k % len(tok) if tok else 0
                out.append(tok[r:] + tok[:r])
            return " ".join(out)

    else:
        # same suffix on every token: plants a corpus-universal gram — the
        # boilerplate-pathology probe (see SCALE.md bounded-worst-case LSH)
        suf = f"__{k}"

        def mut(t):
            return " ".join(tok + suf if tok else tok for tok in t.split(" "))

    texts = [mut(t) if t is not None else None for t in texts]
    idx = tbl.schema.get_field_index("text")
    return tbl.set_column(idx, "text", pa.array(texts, pa.string()))


def _perturb_embeddings(tbl: pa.Table, k: int) -> pa.Table:
    if k == 0:
        return tbl
    embs = tbl.column("embedding").to_pylist()
    rot = k % 64
    embs = [e[rot:] + e[:rot] if e is not None else None for e in embs]
    idx = tbl.schema.get_field_index("embedding")
    return tbl.set_column(
        idx, "embedding", pa.array(embs, pa.list_(pa.float32()))
    )


def main() -> None:
    global PERTURB_MODE
    k_total = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_spotify_sf1"
    if len(sys.argv) > 3:
        PERTURB_MODE = sys.argv[3]
    import os

    os.makedirs(out, exist_ok=True)
    sizes = {}
    for table in ID_COLS:
        src = pq.read_table(f"{SRC}/{table}.parquet")
        for col in ID_COLS[table]:
            sizes.setdefault(
                table, int(pc.max(src.column(col)).as_py()) + 1
            )
        sizes.setdefault(table, len(src))
        reps = []
        for k in range(k_total if ID_COLS[table] else 1):
            t = _shift_ids(src, table, k, sizes)
            if table == "documents":
                t = _perturb_documents(t, k)
            if table == "embeddings":
                t = _perturb_embeddings(t, k)
            reps.append(t)
        full = pa.concat_tables(reps)
        pq.write_table(
            full, f"{out}/{table}.parquet", row_group_size=65536
        )
        print(table, len(full), "rows")


if __name__ == "__main__":
    main()
