"""Producer-controlled physical types, beyond the events time axis.

Round 3's regression was a regenerated testdata shifting events.ts
from TIMESTAMP(NANOS) to TIMESTAMP(MICROS); timeaxis.py now adapts and
tests/test_timeaxis_contract.py pins it. This suite extends the same
insurance to the OTHER plausible producer shifts:

- ``o_orderdate`` / ``l_shipdate`` arriving as DATE instead of
  TIMESTAMP (both are legitimate parquet encodings of a day-grained
  business date);
- ``embeddings.embedding`` arriving as list<double> instead of
  list<float> (the two common vector dtypes).

Each date/aggregate query must return IDENTICAL rows on the variant
data; similarity must return the same neighbor sets with cosines equal
to float-upcast precision. If a future regeneration flips these types,
this fails in pytest before the driver sees it.
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from eurovision_spark.catalog import registry
from tools.verify_local import TABLES

SF = "/root/testdata/sf0.001"

DATE_QUERIES = [
    "monthly_orders",
    "window_suite",
    "flagship_denorm",
    "pricing_summary",
    "impute_status",
]


@pytest.fixture(scope="module")
def variant_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_variant")
    for t in TABLES:
        shutil.copy(f"{SF}/{t}.parquet", out)
    orders = pq.read_table(f"{SF}/orders.parquet")
    orders = orders.set_column(
        orders.schema.get_field_index("o_orderdate"),
        "o_orderdate",
        pc.cast(orders["o_orderdate"], pa.date32()),
    )
    pq.write_table(orders, out / "orders.parquet")
    li = pq.read_table(f"{SF}/lineitem.parquet")
    li = li.set_column(
        li.schema.get_field_index("l_shipdate"),
        "l_shipdate",
        pc.cast(li["l_shipdate"], pa.date32()),
    )
    pq.write_table(li, out / "lineitem.parquet")
    emb = pq.read_table(f"{SF}/embeddings.parquet")
    emb = emb.set_column(
        emb.schema.get_field_index("embedding"),
        "embedding",
        pc.cast(emb["embedding"], pa.list_(pa.float64())),
    )
    pq.write_table(emb, out / "embeddings.parquet")
    return str(out)


@pytest.mark.parametrize("name", DATE_QUERIES)
def test_date_queries_identical_on_date32(spark, name, variant_dir):
    fn = registry()[name].fn
    base = sorted(tuple(r) for r in fn(spark, SF).collect())
    variant = sorted(tuple(r) for r in fn(spark, variant_dir).collect())
    assert base == variant


def test_similarity_stable_on_double_vectors(spark, variant_dir):
    fn = registry()["cosine_topk"].fn
    base = {(r["probe_id"], r["neighbor_id"]): r["cosine_sim"] for r in fn(spark, SF).collect()}
    variant = {
        (r["probe_id"], r["neighbor_id"]): r["cosine_sim"]
        for r in fn(spark, variant_dir).collect()
    }
    assert set(base) == set(variant)
    for k in base:
        assert abs(base[k] - variant[k]) < 1e-6
