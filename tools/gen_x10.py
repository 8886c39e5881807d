"""Generate the x10 scaling tier: documents + embeddings at 10x sf0.1.

Usage: python tools/gen_x10.py  (writes /root/repo/testdata_x10/*.parquet)

The driver's testdata tops out at sf0.1 (5,000 docs / 2,000 vectors) —
a 100x range over sf0.001. The dedup/ANN tier's "overhead-bound, not
data-bound" claim deserves a longer lever, so this builds a 1000x-range
endpoint for the two tables those queries read: 50,000 documents and
20,000 embeddings with the SAME distributions as the driver data
(vocab, language/source mix, word-count profile, unit-norm isotropic
vectors, 10 labels) but fresh content — naive duplication of sf0.1
would plant 10 exact copies of every doc and quadratically inflate the
LSH bucket pair counts, distorting exactly the queries being measured.

Deterministic: text words come from md5 draws keyed by (doc, position);
embeddings from a fixed-seed numpy Generator. Idempotent: rerunning
rewrites identical files.
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
OUT = Path(__file__).resolve().parent.parent / "testdata_x10"
FACTOR = 10


def main() -> None:
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    OUT.mkdir(exist_ok=True)
    con = duckdb.connect()
    base = con.execute(
        f"SELECT lang, source, len(string_split(text, ' ')) AS n_words "
        f"FROM '{SRC}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    vocab = [
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
            f"FROM '{SRC}/documents.parquet' ORDER BY w"
        ).fetchall()
    ]
    n_vecs = con.execute(
        f"SELECT count(*) FROM '{SRC}/embeddings.parquet'"
    ).fetchone()[0]
    con.close()

    nv = len(vocab)
    doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
    for i in range(FACTOR * len(base)):
        lang, source, n_words = base[i % len(base)]
        # one md5 per doc, stretched: 16 bytes/digest, 1 byte per word
        words = []
        need = n_words
        block = 0
        while need > 0:
            dig = hashlib.md5(f"x10-{i}-{block}".encode()).digest()
            take = min(need, len(dig))
            words.extend(vocab[b % nv] for b in dig[:take])
            need -= take
            block += 1
        t = " ".join(words)
        doc_ids.append(i)
        texts.append(t)
        langs.append(lang)
        sources.append(source)
        n_chars.append(len(t))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": texts,
                "lang": langs,
                "source": sources,
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        OUT / "documents.parquet",
    )

    # orders + customer at x10 (round 6: the temporal/robust-stats/
    # entity queries deserve the same 1000x lever). Replica k shifts
    # every key by k * (base key range), so per-customer order counts —
    # the window-partition and join-group sizes that drive those
    # queries' cost — keep the base distribution exactly, while all
    # keys and names are FRESH (no planted duplicate inflation).
    # Customer names keep the fixed-width 'Customer#%09d' format the
    # typo blocking is designed around.
    con = duckdb.connect()
    ob = con.execute(
        f"SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM '{SRC}/orders.parquet' ORDER BY o_orderkey"
    ).fetch_arrow_table()
    cb = con.execute(
        f"SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment "
        f"FROM '{SRC}/customer.parquet' ORDER BY c_custkey"
    ).fetch_arrow_table()
    con.close()
    ck_span = 10 ** (len(str(max(cb["c_custkey"].to_pylist()))))
    ok_span = 10 ** (len(str(max(ob["o_orderkey"].to_pylist()))))
    o_cols = {n: ob[n].to_pylist() * FACTOR for n in ob.column_names}
    n_o = ob.num_rows
    o_cols["o_orderkey"] = [
        k + (i // n_o) * ok_span for i, k in enumerate(o_cols["o_orderkey"])
    ]
    o_cols["o_custkey"] = [
        k + (i // n_o) * ck_span for i, k in enumerate(o_cols["o_custkey"])
    ]
    pq.write_table(pa.table(o_cols, schema=ob.schema), OUT / "orders.parquet")
    c_cols = {n: cb[n].to_pylist() * FACTOR for n in cb.column_names}
    n_c = cb.num_rows
    c_cols["c_custkey"] = [
        k + (i // n_c) * ck_span for i, k in enumerate(c_cols["c_custkey"])
    ]
    c_cols["c_name"] = [f"Customer#{k:09d}" for k in c_cols["c_custkey"]]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(c_cols["c_custkey"], pa.int64()),
                "c_name": c_cols["c_name"],
                "c_nationkey": pa.array(c_cols["c_nationkey"], pa.int32()),
                "c_acctbal": c_cols["c_acctbal"],
                "c_mktsegment": c_cols["c_mktsegment"],
            }
        ),
        OUT / "customer.parquet",
    )

    # duplicate-heavy customer variant (own subdir so load_table reads it
    # as `customer`): real entity-resolution corpora are dominated by
    # EXACT-duplicate identifiers, the case the unique-name tier above
    # structurally cannot exhibit (r06 found the raw-row typo blocking
    # quadratic exactly there). Name classes: one hot name at ~1% of
    # rows (1,500 copies), 40% of rows in classes of 10, the rest
    # unique — the id_typo_pairs dup-heavy SCALING row runs against
    # this. Deterministic and idempotent like everything else here.
    dup_dir = OUT / "dup"
    dup_dir.mkdir(exist_ok=True)
    n_cust = len(c_cols["c_custkey"])
    hot_every = 100          # 1% of rows -> one shared hot name
    class10_until = int(n_cust * 0.4)  # first 40% -> classes of 10
    dup_names = []
    for i in range(n_cust):
        if i % hot_every == 0:
            dup_names.append("Customer#DUPLICATE")
        elif i < class10_until:
            # spread class ids (x7919, injective below 1e8) so
            # neighboring classes are not accidental distance-1
            # names — the dup tier measures the EXACT-duplicate
            # path, not extra planted typos
            dup_names.append(f"Customer#C{(i // 10) * 7919:08d}")
        else:
            dup_names.append(f"Customer#{c_cols['c_custkey'][i]:09d}")
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(c_cols["c_custkey"], pa.int64()),
                "c_name": dup_names,
                "c_nationkey": pa.array(c_cols["c_nationkey"], pa.int32()),
                "c_acctbal": c_cols["c_acctbal"],
                "c_mktsegment": c_cols["c_mktsegment"],
            }
        ),
        dup_dir / "customer.parquet",
    )

    rng = np.random.default_rng(4242)
    x = rng.normal(size=(FACTOR * n_vecs, 64))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(FACTOR * n_vecs), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in x], pa.list_(pa.float32())
                ),
                "label": pa.array(
                    [int(i % 10) for i in range(FACTOR * n_vecs)], pa.int32()
                ),
            }
        ),
        OUT / "embeddings.parquet",
    )
    print(f"wrote {len(doc_ids)} docs, {FACTOR * n_vecs} vectors -> {OUT}")


if __name__ == "__main__":
    main()
