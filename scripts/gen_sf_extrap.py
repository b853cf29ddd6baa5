"""Statistical scale-up of the driver's sf0.1 tables for isolation
benching at the driver's measurement scale (BENCH_r05 ran at sf=1.0).

The driver's own generator is not available in this sandbox and
/root/testdata is read-only, so this produces an sf1.0-SHAPED stand-in
whose distributions are calibrated against sf0.1 (measured in DuckDB,
see OPTIMIZATION_r06.md):

* documents: 10x rows; iid words from the measured 30-word uniform
  vocabulary, doc length uniform 10..100 words, lang/source at the
  measured frequencies, plus the measured 5% near-dup rate (another
  doc's text + the rare ``dup`` token) — this reproduces the shingle
  counts, signature-bucket skew and near-dup pair volumes that drive
  simhash/minhash/jaccard cost.
* embeddings: 10x iid unit float32 vectors (sf0.1's are isotropic:
  measured cos-to-label-center 0.06 +/- 0.12, max pairwise cos 0.51),
  labels uniform 0..9 — reproduces LSH bucket collision volumes.
* relational tables + events: 10x key-offset replication of sf0.1
  (join fan-outs and value distributions preserved exactly);
  region/nation copied (fixed dimensions).

NOT bit-identical to driver data — used only for relative before/after
timing at scale, never for correctness gates (those run on the real
sf0.001/0.01/0.1).

Usage: python scripts/gen_sf_extrap.py [out_dir] [scale]
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.412, 0.151, 0.149, 0.148, 0.140]


def gen_documents(con, out: Path, n_docs: int, seed: int = 1006) -> None:
    rng = random.Random(seed)
    n_dup = int(round(n_docs * 0.05))
    n_base = n_docs - n_dup
    texts = []
    for _ in range(n_base):
        wc = rng.randint(10, 100)
        texts.append(" ".join(rng.choices(VOCAB, k=wc)))
    for _ in range(n_dup):
        texts.append(texts[rng.randrange(n_base)] + " dup")
    rng.shuffle(texts)
    rows = []
    for i, t in enumerate(texts):
        lang = rng.choices(LANGS, weights=LANG_P, k=1)[0]
        rows.append((i, t, lang, f"src{rng.randrange(20)}", len(t)))
    con.execute(
        "create or replace table _docs(doc_id bigint, text varchar, "
        "lang varchar, source varchar, n_chars bigint)"
    )
    con.executemany("insert into _docs values (?,?,?,?,?)", rows)
    con.execute(
        f"copy _docs to '{out}/documents.parquet' (format parquet)"
    )


def gen_embeddings(con, out: Path, n_vec: int, seed: int = 1007) -> None:
    import numpy as np

    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n_vec, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    lab = rng.integers(0, 10, n_vec).astype(np.int32)
    import pandas as pd

    df = pd.DataFrame(
        {
            "vec_id": np.arange(n_vec, dtype=np.int64),
            "embedding": list(v),
            "label": lab,
        }
    )
    con.register("_embdf", df)
    con.execute(
        f"copy (select vec_id, embedding::float[] as embedding, label "
        f"from _embdf) to '{out}/embeddings.parquet' (format parquet)"
    )


def replicate(con, out: Path, scale: int) -> None:
    offs = {
        "customer": ("c_custkey",),
        "supplier": ("s_suppkey",),
        "part": ("p_partkey",),
        "orders": ("o_orderkey", "o_custkey"),
        "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
        "events": ("event_id", "user_id"),
    }
    key_base = {}
    for tbl in ["customer", "supplier", "part", "orders", "events"]:
        pk = offs[tbl][0]
        key_base[tbl] = con.sql(
            f"select max({pk})+1 from '{SRC}/{tbl}.parquet'"
        ).fetchone()[0]
    key_base["user"] = con.sql(
        f"select max(user_id)+1 from '{SRC}/events.parquet'"
    ).fetchone()[0]
    base_of = {
        "c_custkey": key_base["customer"], "o_custkey": key_base["customer"],
        "s_suppkey": key_base["supplier"], "l_suppkey": key_base["supplier"],
        "p_partkey": key_base["part"], "l_partkey": key_base["part"],
        "o_orderkey": key_base["orders"], "l_orderkey": key_base["orders"],
        "event_id": key_base["events"], "user_id": key_base["user"],
    }
    for tbl, keys in offs.items():
        cols = [c[0] for c in con.sql(
            f"describe select * from '{SRC}/{tbl}.parquet'"
        ).fetchall()]
        selects = []
        for rep in range(scale):
            parts = []
            for c in cols:
                if c in keys:
                    parts.append(f"{c} + {rep * base_of[c]} as {c}")
                else:
                    parts.append(c)
            selects.append(
                f"select {', '.join(parts)} from '{SRC}/{tbl}.parquet'"
            )
        con.execute(
            f"copy ({' union all '.join(selects)}) to "
            f"'{out}/{tbl}.parquet' (format parquet)"
        )
    for tbl in ["region", "nation"]:
        con.execute(
            f"copy (select * from '{SRC}/{tbl}.parquet') to "
            f"'{out}/{tbl}.parquet' (format parquet)"
        )


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/sf_extrap/sf1.0")
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    gen_documents(con, out, 5000 * scale)
    gen_embeddings(con, out, 2000 * scale)
    replicate(con, out, scale)
    for t in [
        "documents", "embeddings", "customer", "orders", "lineitem",
        "events", "supplier", "part", "region", "nation",
    ]:
        n = con.sql(f"select count(*) from '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
