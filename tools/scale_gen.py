#!/usr/bin/env python3
"""Scale generator for the graft bench — reproduces SCALE.md's ~sf1 dataset.

Usage:  python3 tools/scale_gen.py SRC_DIR OUT_DIR FACTOR
e.g.:   python3 tools/scale_gen.py /root/testdata/sf0.1 /tmp/sf1synth 10

Replicates the fact tables FACTOR times with replica-shifted keys while
copying the dimension tables byte-identically, so every join in the catalog
still resolves and replica 0 is byte-identical to the source:

- orders / lineitem: o_orderkey / l_orderkey shifted by
  replica * (max(o_orderkey)+1) — the join key moves IN STEP on both sides;
  o_custkey / l_partkey / l_suppkey stay in the dimension key range.
- documents: doc_id shifted by replica * (max(doc_id)+1+1e6) — the extra
  1e6 keeps replica ranges clear of the +10000/+20000/+30000 clone ids the
  gated dedup queries synthesize (see the stride comment below); for
  replicas > 0
  every 3rd token gets a per-replica suffix and n_chars is recomputed.
  WHY: cross-replica docs must NOT be near-duplicates, or the LSH/Jaccard/
  SimHash pair stages grow quadratically on fake duplicates that real
  corpora don't have (the dedup queries' cost would be dominated by an
  artifact of the generator, not by scale).
- embeddings: vec_id shifted likewise (same 1e6 headroom); for replicas > 0
  each element is
  rescaled by a deterministic element-AND-replica-dependent factor (1.5x on
  alternating positions, sign flip on ~1/13 of positions) — same
  non-near-dup reasoning for the embedding near-dup / ANN queries. A
  constant additive nudge would NOT work: it preserves direction, so
  replicas keep cosine >= 0.999 and the near-dup pair stage goes quadratic
  on generator artifacts; the element-wise rescale drops cross-replica
  cosine well below the 0.99 near-dup threshold (~0.97 from the scale
  pattern alone, lower once sign flips differ) and perturbs the sign-LSH
  bucket of most replicas.
- events: event_id shifted by replica * (max(event_id)+1); ts shifted by
  replica * (span + 1 day) so each replica occupies its own disjoint time
  block — the "longer history" scale story. user_id is NOT shifted: q12/q22
  join events.user_id to o_custkey and x85 measures containment against
  c_custkey, so user ids must stay inside the dimension key range. Keeping
  user_id fixed while extending the time axis preserves per-user ordering
  and every session-gap/window structure (the inter-replica joint gap is
  ~30 days, far above any session threshold), while windowed queries see
  FACTOR x more windows at constant rows per window. The rewrite goes
  through DuckDB, so ts lands as TIMESTAMP(MICROS) — the current fixture
  vintage; graft.Tables.events dispatches on whichever physical type it
  finds.
- region nation customer supplier part: straight file copies.

Then benchmark with:
  SPARK_GRAFT_SF_DIR=OUT_DIR SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench"
and the DuckDB side with the oracle_sql.json a Verify run dumps.
"""
import os
import shutil
import sys

import duckdb

COPY_AS_IS = ["region", "nation", "customer", "supplier", "part"]


def write(con, query, out_dir, table):
    con.sql(f"COPY ({query}) TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{out_dir}/{table}.parquet'").fetchone()[0]
    print(f"  {table}: {n} rows")


def main():
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    assert factor >= 1
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in COPY_AS_IS:
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"  {t}: copied as-is")

    k_ev, span_us = con.sql(f"""
        SELECT max(event_id) + 1,
               epoch_us(max(ts)) - epoch_us(min(ts)) + 86400000000
        FROM '{src}/events.parquet'""").fetchone()
    write(con, f"""
        SELECT event_id + r * {k_ev} AS event_id,
               ts + to_microseconds(r * {span_us}) AS ts,
               user_id, event_type, value, props
        FROM '{src}/events.parquet', range({factor}) t(r)""", out, "events")

    k_ord = con.sql(
        f"SELECT max(o_orderkey) + 1 FROM '{src}/orders.parquet'").fetchone()[0]
    write(con, f"""
        SELECT d.* REPLACE (o_orderkey + r * {k_ord} AS o_orderkey)
        FROM '{src}/orders.parquet' d, range({factor}) t(r)""", out, "orders")
    write(con, f"""
        SELECT d.* REPLACE (l_orderkey + r * {k_ord} AS l_orderkey)
        FROM '{src}/lineitem.parquet' d, range({factor}) t(r)""", out, "lineitem")

    # doc_id / vec_id replica stride needs headroom above max(id)+1: several
    # gated queries synthesize clones at id + 10000/20000/30000, so a stride
    # of exactly max+1 lets replica r's ORIGINALS land on replica r-k's CLONE
    # range (e.g. sf0.1: max doc_id 4999, replica 2 originals = 10000..14999 =
    # replica 0's +10000 clones). Colliding ids merge unrelated docs inside
    # one group, manufacturing a fake near-dup blowup in the LSH pair stages.
    # 1,000,000 of headroom keeps every replica's [originals .. +30000 clones]
    # window disjoint from the next replica's.
    k_doc = con.sql(
        f"SELECT max(doc_id) + 1 + 1000000 FROM '{src}/documents.parquet'"
    ).fetchone()[0]
    # DuckDB list lambdas: (tok, i) -> ... with 1-based index i.
    # Stride 3, not 5: the dedup family shingles TOKEN 3-GRAMS, and every
    # window of 3 consecutive tokens contains an index === 1 (mod 3), so a
    # stride-3 per-replica suffix perturbs EVERY shingle — no shingle, no
    # minhash minimum, and no LSH band signature survives across replicas.
    # The round-8 stride of 5 left 2 of every 5 shingles byte-identical
    # across replicas, which preserved enough minhash minima that at the
    # 100x decade 28.5M of 29.2M candidate pairs were CROSS-replica
    # (measured, graft.PairStats round 9) — a generator artifact that made
    # the pair stage look quadratic when the operator itself is linear on
    # decorrelated data.
    perturbed = """CASE WHEN r = 0 THEN text ELSE array_to_string(
        list_transform(string_split(text, ' '),
            (tok, i) -> CASE WHEN i % 3 = 1 THEN tok || '~r' || r::VARCHAR
                        ELSE tok END), ' ') END"""
    write(con, f"""
        SELECT doc_id + r * {k_doc} AS doc_id,
               {perturbed} AS text,
               lang, source,
               CAST(length({perturbed}) AS BIGINT) AS n_chars
        FROM '{src}/documents.parquet', range({factor}) t(r)""", out, "documents")

    k_vec = con.sql(
        f"SELECT max(vec_id) + 1 + 1000000 FROM '{src}/embeddings.parquet'"
    ).fetchone()[0]
    write(con, f"""
        SELECT vec_id + r * {k_vec} AS vec_id,
               CASE WHEN r = 0 THEN embedding
                    ELSE list_transform(embedding,
                         (x, i) -> CAST(x * (1 + 0.5 * ((i + r) % 2))
                                          * (CASE WHEN (i * 7 + r) % 13 = 0
                                             THEN -1 ELSE 1 END) AS FLOAT))
               END AS embedding,
               label
        FROM '{src}/embeddings.parquet', range({factor}) t(r)""", out, "embeddings")
    print(f"done: {out} at {factor}x {src}")


if __name__ == "__main__":
    main()
