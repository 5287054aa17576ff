"""Adversarial-corpus differential sweep for the STAGED pack: the
sf0.001 corpus plus handcrafted hostile rows — unicode text (CJK,
emoji, combining marks), empty strings, duplicate order dates and
event timestamps (tie-break stressors), negative balances, exact
.xx5 price boundaries — with EVERY staged key compared Spark vs
DuckDB.  The driver corpus is well-formed; real 100 TB corpora are
not, and cross-engine semantics (regex classes, UTF-8 vs char
lengths, null-on-divide, rounding at half-steps) diverge exactly on
rows like these.

Nulls and zero-norm embeddings are deliberately excluded from v1:
the generator keeps schema-semantic validity (statuses in {O,F,P},
non-null text) so findings are actionable in the staged module.
(Zero-norm embeddings would hit the unguarded cosine in shared
functions — documented, left for a round that can absorb the
whole-similarity-family re-verification.)
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_stream_writer_spark.operators import staged

from tests.conftest import assert_results_match

_BASE = "/root/testdata/sf0.001"
_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def adversarial_sf(tmp_path_factory):
    out = tmp_path_factory.mktemp("adversarial_sf")
    con = duckdb.connect()
    extra = {}

    docs = con.sql(f"SELECT * FROM read_parquet('{_BASE}/documents.parquet') LIMIT 1").df()
    nasty_texts = [
        "汉字文本，没有空格也没有句号但是很长" * 3,
        "emoji 😀😀 text… with ellipsis… and nbsp",
        "",
        "ééé combining acutes. Zürich naïve façade!",
        "ONE.WORD.MANY.SENTENCES.",
        " \t\n ",
        "a" * 5000,
        # vertical tab: Java \s matches it, RE2's does not — the row
        # that forced the explicit WS_CLASS tokenizers (round 16)
        "vertical\x0btab words\x0bdisagree",
    ]
    extra["documents"] = pd.DataFrame(
        {
            "doc_id": np.arange(900001, 900001 + len(nasty_texts), dtype="int64"),
            "text": nasty_texts,
            "lang": ["zh", "en", "en", "de", "en", "xx", "en", "en"],
            "source": ["adv"] * len(nasty_texts),
            "n_chars": [len(t) for t in nasty_texts],
        }
    ).astype({c: docs[c].dtype for c in docs.columns})

    ev = con.sql(f"SELECT * FROM read_parquet('{_BASE}/events.parquet') LIMIT 5").df()
    t0 = ev.ts.iloc[0]
    extra["events"] = pd.DataFrame(
        {
            "event_id": np.arange(900001, 900013, dtype="int64"),
            # one user, 12 events, ONE timestamp: pure tie-break regime
            "ts": [t0] * 12,
            "user_id": np.int64(900001),
            "event_type": (["view"] * 6 + ["purchase"] * 6),
            "value": [0.005, 0.015, 0.125, 1.005, 2.675, 0.045] * 2,  # .xx5 edges
            "props": ["{}"] * 12,
        }
    )
    extra["events"]["ts"] = extra["events"]["ts"].astype(ev.ts.dtype)

    od = con.sql(f"SELECT * FROM read_parquet('{_BASE}/orders.parquet') LIMIT 1").df()
    extra["orders"] = pd.DataFrame(
        {
            "o_orderkey": np.arange(900001, 900009, dtype="int64"),
            "o_custkey": np.int64(1),  # one customer, 8 orders
            "o_orderstatus": ["O", "F", "P", "O", "F", "P", "O", "F"],
            "o_totalprice": [0.005, 1.015, 99999.995, 10.105, 0.005, 1.015, 5.555, 2.225],
            # four orders share ONE date (orderkey tie-break), four span years
            "o_orderdate": pd.to_datetime(
                ["1996-02-29"] * 4 + ["1996-03-01", "1997-02-28", "1999-12-31", "2000-01-01"]
            ),
            "o_orderpriority": ["1-URGENT"] * 8,
        }
    )
    extra["orders"]["o_orderdate"] = extra["orders"]["o_orderdate"].astype(
        od.o_orderdate.dtype
    )

    cu = con.sql(f"SELECT * FROM read_parquet('{_BASE}/customer.parquet') LIMIT 1").df()
    extra["customer"] = pd.DataFrame(
        {
            "c_custkey": np.arange(900001, 900005, dtype="int64"),
            "c_name": ["Ünïcode#900001", "客户九", "", "O'Brien \"quote\""],
            "c_nationkey": np.int64([0, 0, 24, 24]),
            "c_acctbal": [-999.995, 0.0, 0.005, -0.005],
            "c_mktsegment": ["BUILDING"] * 4,
        }
    ).astype({c: cu[c].dtype for c in cu.columns})

    for t in _TABLES:
        base = con.sql(f"SELECT * FROM read_parquet('{_BASE}/{t}.parquet')").arrow()
        if t in extra:
            addition = pa.Table.from_pandas(
                extra[t], schema=base.schema, preserve_index=False
            )
            base = pa.concat_tables([base, addition])
        pq.write_table(base, out / f"{t}.parquet")
    con.close()
    return str(out)


@pytest.fixture(scope="module")
def adversarial_con(adversarial_sf):
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{adversarial_sf}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(staged.QUERIES))
def test_staged_query_matches_oracle_on_adversarial_corpus(
    name, spark, adversarial_sf, adversarial_con
):
    df = staged.QUERIES[name](spark, adversarial_sf)
    assert_results_match(df, adversarial_con, staged.ORACLE[name])
