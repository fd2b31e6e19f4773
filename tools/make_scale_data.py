"""Deterministic SF upsampler for scale-ratio measurement.

The driver ships parquet at sf{0.001,0.01,0.1}; the 100x-design claims in
SCALE.md need at least one measured decade above the bench SF. This tool
builds an sf1-shaped directory from sf0.1 by stacking MULT key-shifted
replicas, reproducing how TPC-H scale factors actually grow:

- region/nation: fixed dimensions, copied once (they do not scale with SF);
- customer/supplier/part/orders/lineitem/events/embeddings: replica i
  shifts every entity key by i * (the entity's key-space size in the
  SOURCE, max+1 — derived from the data), so keys stay dense and
  contiguous (sf1 custkeys are exactly 0..10*|sf0.1|-1) and every foreign
  key still joins to exactly one parent — fan-outs, join selectivities and
  group sizes match a native sf1;
- events keep their timestamps (a bigger deployment means more traffic in
  the SAME window — time-spine-bounded operators must NOT scale with SF,
  and keeping the window fixed is precisely what tests that);
- documents: replica i > 0 rewrites every token with a replica suffix, so
  each replica is an isomorphic copy of the corpus over a DISJOINT token
  space — within-replica duplicate/shingle structure is preserved exactly
  (candidate-pair counts scale linearly, the property dedup is designed
  for) while cross-replica near-dup pairs, which a real 10x corpus would
  not have, cannot appear;
- embeddings: replica i rotates each vector by i positions — norms and
  component distributions survive. CAVEAT (measured, round 12): rotation
  does NOT decorrelate — cross-replica cosines clear 0.4 often enough
  that true pair counts grow ~quadratically with mult (95k pairs at
  mult 10 → 9.7M at mult 100), and beyond mult 64 the rotation index
  wraps (i % dim), so replica i+64 duplicates replica i's vectors
  EXACTLY (72k cosine-1.0 pairs measured at mult 100). Near-dup /
  ANN pair benchmarks should stay at mult <= 64 or account for the
  output-volume growth when reading decade ratios (SCALE.md r12).

Output parquet is written with bounded row groups (~48 per table) so scans
parallelize the way a real multi-file sf1 would, instead of inheriting the
driver files' single-row-group shape.

Usage: python tools/make_scale_data.py [--mult 10]
       [--src /root/testdata/sf0.1] [--dst .scale/sf1]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# Every replica shifts an entity's keys by i * (that entity's key-space
# size IN THE SOURCE, max+1) — derived from the data, not hardcoded, so
# the tool builds a dense contiguous key space from any source SF, and
# foreign keys shift in lockstep with their parents because they share
# the parent entity's offset.
_ENTITY_HOME = {  # entity -> (table, key column) that defines its span
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}

_KEY_ENTITY = {
    "c_custkey": "cust",
    "s_suppkey": "supp",
    "p_partkey": "part",
    "o_orderkey": "order",
    "o_custkey": "cust",
    "l_orderkey": "order",
    "l_partkey": "part",
    "l_suppkey": "supp",
    "event_id": "event",
    "user_id": "user",
    "doc_id": "doc",
    "vec_id": "vec",
}

_FIXED_DIMS = ("region", "nation")
_SCALED = ("customer", "supplier", "part", "orders", "lineitem",
           "events", "documents", "embeddings")


def _entity_spans(src: str) -> dict[str, int]:
    """max(key)+1 per entity, read from the source tables — the replica
    stride that keeps the output key space dense from 0 at any source SF."""
    spans: dict[str, int] = {}
    for ent, (table, col) in _ENTITY_HOME.items():
        column = pq.read_table(os.path.join(src, f"{table}.parquet"),
                               columns=[col]).column(0)
        spans[ent] = pc.max(column).as_py() + 1
    return spans


def _shift_keys(table: pa.Table, replica: int,
                spans: dict[str, int]) -> pa.Table:
    for name in table.column_names:
        ent = _KEY_ENTITY.get(name)
        if ent is None or replica == 0:
            continue
        col = table.column(name)
        shifted = pc.add(col, pa.scalar(replica * spans[ent],
                                        type=col.type))
        table = table.set_column(table.schema.get_field_index(name),
                                 name, shifted)
    return table


def _salt_documents(table: pa.Table, replica: int) -> pa.Table:
    if replica == 0:
        return table
    suffix = f"~{replica}"
    texts = table.column("text").to_pylist()
    salted = [" ".join(tok + suffix for tok in (t or "").split())
              for t in texts]
    table = table.set_column(table.schema.get_field_index("text"),
                             "text", pa.array(salted, type=pa.string()))
    if "n_chars" in table.column_names:
        idx = table.schema.get_field_index("n_chars")
        n_type = table.column("n_chars").type
        table = table.set_column(
            idx, "n_chars",
            pa.array([len(s) for s in salted], type=n_type))
    return table


def _rotate_embeddings(table: pa.Table, replica: int) -> pa.Table:
    if replica == 0:
        return table
    idx = table.schema.get_field_index("embedding")
    vec_type = table.column("embedding").type
    vecs = table.column("embedding").to_pylist()
    rot = []
    for v in vecs:
        if v:
            k = replica % len(v)
            rot.append(v[k:] + v[:k])
        else:
            rot.append(v)
    return table.set_column(idx, "embedding", pa.array(rot, type=vec_type))


def build(src: str, dst: str, mult: int,
          tables: list[str] | None = None) -> None:
    """Build an sf*mult-shaped directory from src.

    Replicas stream through a ParquetWriter as they are built, so peak
    memory is one flush buffer (~1/48 of the output table), not the whole
    output — the tool itself has to scale to --mult 1000 (sf100, 600M-row
    lineitem) for the third measured decade in SCALE.md. `tables`
    restricts which SCALED tables are built (fixed dims always copy);
    the sf100 run skips documents/embeddings, whose per-replica Python
    rewrite (token salting) is priced for the 10x/100x decades only.
    """
    os.makedirs(dst, exist_ok=True)
    spans = _entity_spans(src)
    for name in _FIXED_DIMS:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows (fixed dim)")
    for name in _SCALED:
        if tables is not None and name not in tables:
            continue
        base = pq.read_table(os.path.join(src, f"{name}.parquet"))
        path = os.path.join(dst, f"{name}.parquet")
        total = base.num_rows * mult
        row_group = max(4096, total // 48)
        buf: list[pa.Table] = []
        buf_rows = 0
        with pq.ParquetWriter(path, base.schema) as writer:
            for i in range(mult):
                t = _shift_keys(base, i, spans)
                if name == "documents":
                    t = _salt_documents(t, i)
                elif name == "embeddings":
                    t = _rotate_embeddings(t, i)
                buf.append(t)
                buf_rows += t.num_rows
                if buf_rows >= row_group:
                    writer.write_table(pa.concat_tables(buf),
                                       row_group_size=row_group)
                    buf, buf_rows = [], 0
            if buf:
                writer.write_table(pa.concat_tables(buf),
                                   row_group_size=row_group)
        groups = pq.ParquetFile(path).metadata.num_row_groups
        print(f"{name}: {base.num_rows} -> {total} rows, "
              f"{groups} row groups", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", "sf1"))
    ap.add_argument("--tables", default="",
                    help="comma list restricting which scaled tables to "
                         "build (fixed dims always copy)")
    args = ap.parse_args()
    tables = [t for t in args.tables.split(",") if t] or None
    build(args.src, args.dst, args.mult, tables=tables)


if __name__ == "__main__":
    main()
