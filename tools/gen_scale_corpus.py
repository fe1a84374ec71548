#!/usr/bin/env python3
"""Generate the Nx scale corpus used by docs/SCALE.md (driver-side tool).

Usage: python3 tools/gen_scale_corpus.py <src_sf_dir> <dst_dir> [N=10]

Method (documented in docs/SCALE.md "10x spot bench"):
- documents: N replicas; replica 0 is the original, replicas 1..N-1 get
  deterministically WORD-SHUFFLED text (same length/vocabulary profile
  per replica WITHOUT exact copies -- pure duplication would
  quadruple-count every dedup operator's true-pair output). doc_id
  shifts by replica*OFF.
- embeddings/events: N replicas with shifted ids (embedding floats get
  a tiny deterministic per-replica jitter so ANN dedup does not see N
  exact copies of every vector).
- TPC-H tables: N replicas with ALL keys shifted by replica*OFF per
  key domain -- referential integrity is preserved (orders.o_custkey
  shifts with customer.c_custkey, lineitem.(orderkey,partkey,suppkey)
  shift with their parents), so every join's output scales linearly
  instead of quadratically. nation/region are dimension constants and
  stay as-is (their keys are the 0..24 / 0..4 domains).

Everything is keyed on md5(...) only -- byte-stable across runs.
"""
import sys
import duckdb


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    con = duckdb.connect()

    def copy(table: str, select_for_rep) -> None:
        parts = " UNION ALL ".join(select_for_rep(i) for i in range(n))
        con.execute(f"COPY ({parts}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        c0 = con.sql(f"SELECT count(*) FROM '{src}/{table}.parquet'").fetchone()[0]
        c1 = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {c0} -> {c1} ({c1 / max(c0, 1):.1f}x)")

    off = {}
    for t, k in [("documents", "doc_id"), ("embeddings", "vec_id"),
                 ("events", "event_id"), ("customer", "c_custkey"),
                 ("orders", "o_orderkey"), ("part", "p_partkey"),
                 ("supplier", "s_suppkey"), ("events_user", "user_id")]:
        tbl = "events" if t == "events_user" else t
        off[t] = con.sql(
            f"SELECT max({k}) + 1 FROM '{src}/{tbl}.parquet'").fetchone()[0]

    # documents: word-shuffle replicas 1..N-1 (md5-keyed per word slot)
    copy("documents", lambda i: (
        f"SELECT doc_id + {i * off['documents']} AS doc_id, text, lang, source, n_chars "
        f"FROM '{src}/documents.parquet'" if i == 0 else f"""
        SELECT doc_id + {i * off['documents']} AS doc_id,
               string_agg(w, ' ' ORDER BY md5(w || '|' || wi || '|{i}')) AS text,
               any_value(lang) AS lang, any_value(source) AS source,
               any_value(n_chars) AS n_chars
        FROM (SELECT doc_id, lang, source, n_chars, u.i AS wi, t[u.i] AS w
              FROM (SELECT *, string_split(text, ' ') AS t
                    FROM '{src}/documents.parquet'),
                   unnest(generate_series(1, len(t))) u(i))
        GROUP BY doc_id"""))

    # embeddings: shifted ids + per-replica deterministic jitter
    copy("embeddings", lambda i: (
        f"SELECT vec_id + {i * off['embeddings']} AS vec_id, embedding, label "
        f"FROM '{src}/embeddings.parquet'" if i == 0 else f"""
        SELECT vec_id + {i * off['embeddings']} AS vec_id,
               list_transform(embedding, x -> CAST(x + 1e-3 * {i} AS FLOAT)) AS embedding,
               label
        FROM '{src}/embeddings.parquet'"""))

    copy("events", lambda i:
         f"SELECT event_id + {i * off['events']} AS event_id, ts, "
         f"user_id + {i * off['events_user']} AS user_id, event_type, value, props "
         f"FROM '{src}/events.parquet'")

    # TPC-H: key-shifted replicas, referential integrity preserved
    copy("customer", lambda i:
         f"SELECT c_custkey + {i * off['customer']} AS c_custkey, c_name, "
         f"c_nationkey, c_acctbal, c_mktsegment FROM '{src}/customer.parquet'")
    copy("orders", lambda i:
         f"SELECT o_orderkey + {i * off['orders']} AS o_orderkey, "
         f"o_custkey + {i * off['customer']} AS o_custkey, o_orderstatus, "
         f"o_totalprice, o_orderdate, o_orderpriority FROM '{src}/orders.parquet'")
    copy("lineitem", lambda i:
         f"SELECT l_orderkey + {i * off['orders']} AS l_orderkey, "
         f"l_partkey + {i * off['part']} AS l_partkey, "
         f"l_suppkey + {i * off['supplier']} AS l_suppkey, "
         f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
         f"l_returnflag, l_linestatus, l_shipdate FROM '{src}/lineitem.parquet'")
    copy("part", lambda i:
         f"SELECT p_partkey + {i * off['part']} AS p_partkey, p_name, p_brand, "
         f"p_type, p_size, p_retailprice FROM '{src}/part.parquet'")
    copy("supplier", lambda i:
         f"SELECT s_suppkey + {i * off['supplier']} AS s_suppkey, s_name, "
         f"s_nationkey, s_acctbal FROM '{src}/supplier.parquet'")
    for t in ("nation", "region"):
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
                    f"'{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied as-is (dimension constants)")


if __name__ == "__main__":
    main()
