"""Build a 64x documents tile set for the round-5 deep-scale rung.

Unlike the round-3 8x tiles (which APPEND 12 marker tokens, leaving
cross-tile Jaccard ~0.68 — deliberately adversarial, inflating candidates
64x while data grew 8x), this 64x set models a NATURAL sharded corpus:
every token is prefixed with a tile salt, a vocabulary bijection that
preserves the within-tile near-dup structure EXACTLY (Jaccard is over
token sets) while making cross-tile Jaccard 0. Candidate volume therefore
grows linearly with data (64 x the sf0.1 candidate set), which is the
regime the "linear in candidates" claim describes.
"""
import duckdb
import os

SRC = "/root/testdata/sf0.1/documents.parquet"
OUT_DIR = "/tmp/scale64/sf6.4"
N_TILES = 64

os.makedirs(OUT_DIR, exist_ok=True)
con = duckdb.connect()
n_base = con.execute(f"SELECT COUNT(*) FROM '{SRC}'").fetchone()[0]
tiles = ", ".join(str(t) for t in range(N_TILES))
con.execute(
    f"""
COPY (
  SELECT
    d.doc_id + t.tile * {n_base} AS doc_id,
    list_aggregate(
      list_transform(string_split(d.text, ' '),
                     w -> 's' || t.tile || '_' || w),
      'string_agg', ' ') AS text,
    d.lang,
    d.source,
    d.n_chars
  FROM '{SRC}' d
  CROSS JOIN (SELECT unnest([{tiles}]) AS tile) t
) TO '{OUT_DIR}/documents.parquet' (FORMAT parquet)
"""
)
n = con.execute(f"SELECT COUNT(*) FROM '{OUT_DIR}/documents.parquet'").fetchone()[0]
print("rows:", n, "tiles:", N_TILES, "base:", n_base)
