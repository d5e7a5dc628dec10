#!/usr/bin/env python3
"""Build a synthetic N-times scale-up of an sf fixture directory for the
scale rehearsal (SCALING.md): every fact table is replicated N times with
shifted keys and per-copy content perturbation, so row counts scale
linearly WITHOUT creating artificial cross-copy duplicate cliques:

 - events: copy i>0 suffixes event_type with _c{i} (metric cardinality
   scales with data, like a real fleet) and shifts ids.
 - documents: copy i>0 deterministically permutes each document's word
   order with a per-copy salt — token counts and lengths survive, but
   3-gram shingle sets across copies are disjoint-ish, so near-dup pair
   output stays O(corpus) instead of every doc becoming an 8-clique.
 - embeddings: copy i>0 adds deterministic per-copy, per-dimension noise
   (direction changes, so cosine-dup output doesn't explode; uniform
   scaling would be invisible to cosine).
 - lineitem/orders: shifted orderkeys, same customers (more orders per
   customer, the realistic growth mode).
 - dimension tables are copied as-is (dims don't grow 8x when facts do).

With --skew FRAC (e.g. --skew 0.07), a deterministic FRAC of the FINAL
documents and embeddings tables is overwritten with one boilerplate
cluster — near-identical template text (a rotating one-word variant, so
members are near-dups, not all byte-dups) and one shared embedding
direction with tiny per-id noise. Applied AFTER replication, so the
cluster grows WITH the corpus (a 5–10% boilerplate mass is the standard
web-corpus pathology the band-population caps exist for); the
content-perturbed replication deliberately avoids cross-copy dups, which
is exactly why the unskewed rehearsal could never surface it.

Usage: make_scale_fixture.py <src_sf_dir> <out_dir> <factor> [--skew FRAC]
"""
import sys
import duckdb

src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
skew_frac = None
if "--skew" in sys.argv:
    skew_frac = float(sys.argv[sys.argv.index("--skew") + 1])
con = duckdb.connect()
con.execute(f"SET threads TO 16")

import os
os.makedirs(out, exist_ok=True)

def write(name, sql):
    con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

copies = ", ".join(f"CAST({i} AS BIGINT)" for i in range(factor))

# dimension tables: unchanged
for t in ("region", "nation", "customer", "supplier", "part"):
    write(t, f"SELECT * FROM '{src}/{t}.parquet'")

write("events", f"""
  SELECT event_id + i * 1000000000 AS event_id, ts,
         user_id + i * 10000000 AS user_id,
         CASE WHEN i = 0 THEN event_type ELSE event_type || '_c' || i END
           AS event_type,
         value, props
  FROM '{src}/events.parquet', (SELECT unnest([{copies}]) AS i)
""")

write("lineitem", f"""
  SELECT l_orderkey + i * 100000000 AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{src}/lineitem.parquet', (SELECT unnest([{copies}]) AS i)
""")

write("orders", f"""
  SELECT o_orderkey + i * 100000000 AS o_orderkey, o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{src}/orders.parquet', (SELECT unnest([{copies}]) AS i)
""")

# documents: per-copy deterministic word permutation (copy 0 = original)
write("documents", f"""
  WITH base AS (
    SELECT d.*, i FROM '{src}/documents.parquet' d,
      (SELECT unnest([{copies}]) AS i)),
  toks AS (
    SELECT doc_id, i, lang, source, n_chars,
           unnest(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM base WHERE i > 0),
  permuted AS (
    SELECT doc_id, i, lang, source, n_chars,
           string_agg(tok, ' ' ORDER BY hash(tok || pos || i), pos) AS text
    FROM toks GROUP BY doc_id, i, lang, source, n_chars)
  SELECT doc_id, text, lang, source, n_chars
  FROM '{src}/documents.parquet'
  UNION ALL
  SELECT doc_id + i * 1000000 AS doc_id, text, lang, source, n_chars
  FROM permuted
""")

# embeddings: per-copy directional noise (copy 0 = original)
write("embeddings", f"""
  SELECT vec_id, embedding, label FROM '{src}/embeddings.parquet'
  UNION ALL
  SELECT vec_id + i * 1000000 AS vec_id,
         list_transform(embedding, (x, j) -> CAST(x +
           0.2 * (CAST(hash(j * 31 + i * 7919) % 100 AS DOUBLE) / 100.0 - 0.5)
           AS FLOAT)) AS embedding,
         label
  FROM '{src}/embeddings.parquet', (SELECT unnest([{copies}]) AS i)
  WHERE i > 0
""")
if skew_frac:
    K = round(1 / skew_frac)
    boiler = ("subscribe to our newsletter for updates terms of service "
              "privacy policy all rights reserved contact us about careers "
              "press sitemap help variant")
    # documents: every K-th doc becomes the template + a rotating variant
    # word (near-dups: shingle sets differ only at the tail)
    # n_chars is recomputed from the REWRITTEN text: leaving the
    # original value would make the fixture internally inconsistent for
    # any operator that reads n_chars (quality/stats rehearsals)
    con.execute(f"""COPY (
      SELECT doc_id, text, lang, source,
             length(text) AS n_chars
      FROM (
        SELECT doc_id,
               CASE WHEN doc_id % {K} = 0
                    THEN '{boiler} v' || CAST(doc_id % 5 AS VARCHAR)
                    ELSE text END AS text,
               lang, source
        FROM '{out}/documents.parquet'))
      TO '{out}/documents_skew.parquet' (FORMAT PARQUET)""")
    os.replace(f"{out}/documents_skew.parquet", f"{out}/documents.parquet")
    # embeddings: every K-th vector snaps to one shared direction plus
    # tiny per-id noise (cosine ~0.9999 within the cluster; SRP signs and
    # IVF assignment collapse the cluster into shared buckets)
    con.execute(f"""COPY (
      SELECT vec_id,
             CASE WHEN vec_id % {K} = 0
                  THEN list_transform(embedding, (x, j) -> CAST(
                    (CAST(hash(j * 7919) % 100 AS DOUBLE) / 100.0 - 0.5)
                    + 0.0005 * (CAST(hash(vec_id * 31 + j) % 100 AS DOUBLE)
                                / 100.0 - 0.5) AS FLOAT))
                  ELSE embedding END AS embedding,
             label
      FROM '{out}/embeddings.parquet')
      TO '{out}/embeddings_skew.parquet' (FORMAT PARQUET)""")
    os.replace(f"{out}/embeddings_skew.parquet", f"{out}/embeddings.parquet")
    n = con.execute(
        f"SELECT count(*) FROM '{out}/documents.parquet' WHERE doc_id % {K} = 0"
    ).fetchone()[0]
    print(f"skew: boilerplate cluster of {n} docs/vecs (1/{K} of corpus)")

print("done:", out)
