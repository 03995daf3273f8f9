"""docs_token_bpe left the driver's capped 50-entry catalog in round 4
(swapped for docs_clean_corpus_cluster; docs_token_stats keeps token
counting covered there) — this test preserves its DuckDB oracle at the
same rigor the gate applied."""

import duckdb
import pytest


@pytest.fixture(scope="module")
def spark():
    from kit_spark.session import get_spark

    return get_spark()


def test_docs_token_bpe_matches_duckdb(spark):
    from kit_spark.queries import DOCS_TOKEN_BPE_SQL, docs_token_bpe

    sf = "/root/testdata/sf0.001"
    got = {r["doc_id"]: (r["n_bpe_tokens"], r["n_cheap_tokens"])
           for r in docs_token_bpe(spark, sf).collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    expect = {r[0]: (r[1], r[2])
              for r in con.execute(DOCS_TOKEN_BPE_SQL).fetchall()}
    assert got == expect
    assert expect  # non-empty fixture
