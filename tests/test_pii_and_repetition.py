"""Unit + plan-shape tests for the PII scrub and repetition-signal ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_one(spark, text):
    from streamalert_spark.ops.pii import scan

    df = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    return scan(df).collect()[0].asDict()


def test_pii_counts_and_redaction(spark):
    row = _scan_one(
        spark,
        "mail a@b.co from 1.2.3.4 call 555-123-4567 ssn 123-45-6789 "
        "card 4111 1111 1111 1111",
    )
    assert row["n_emails"] == 1
    assert row["n_ipv4"] == 1
    assert row["n_phones"] == 1
    assert row["n_ssns"] == 1
    assert row["n_ccs"] == 1
    assert row["n_ccs_luhn_valid"] == 1
    assert row["redacted_text"] == (
        "mail <EMAIL> from <IP> call <PHONE> ssn <SSN> card <CC>")


def test_luhn_rejects_bad_checksum(spark):
    row = _scan_one(spark, "cards 4111-1111-1111-1112 and 4111111111111111")
    assert row["n_ccs"] == 2
    assert row["n_ccs_luhn_valid"] == 1  # only the bare valid one


def test_no_pii_is_all_zero(spark):
    row = _scan_one(spark, "nothing sensitive here")
    assert (row["n_emails"], row["n_ipv4"], row["n_phones"], row["n_ssns"],
            row["n_ccs"], row["n_ccs_luhn_valid"]) == (0, 0, 0, 0, 0, 0)
    assert row["redacted_text"] == "nothing sensitive here"


def test_seventeen_digit_run_is_not_a_card(spark):
    row = _scan_one(spark, "serial 41111111111111111 ok")
    assert row["n_ccs"] == 0


def test_pii_scan_is_single_projection_no_shuffle(spark):
    from streamalert_spark.ops.pii import scan

    plain = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(scan(plain))
    assert "Exchange" not in plan, plan


def test_dup_ngram_fraction_edges(spark):
    from streamalert_spark.ops.text import dup_ngram_fraction, tokens

    df = spark.createDataFrame(
        [(0, "a b a b a"), (1, "x"), (2, "p q r")],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id",
            dup_ngram_fraction(tokens(F.col("text")), 2).alias("f"),
        ).collect()
    }
    # "a b a b a" bigrams: [a b, b a, a b, b a] -> 2 distinct of 4 = 0.5 dup
    assert out[0] == 0.5
    assert out[1] is None  # single token: no bigrams
    assert out[2] == 0.0


def test_repetition_signals_top_share(spark):
    from streamalert_spark.ops.text import repetition_signals

    df = spark.createDataFrame([(7, "a b a b a")], "doc_id bigint, text string")
    row = repetition_signals(df).collect()[0].asDict()
    assert row["n_tokens"] == 5
    assert row["dup_bigram_frac"] == 0.5
    assert row["top_bigram_share"] == 0.5  # 'a b' twice of 4 bigrams


def test_clean_text_nfc_and_whitespace(spark):
    from streamalert_spark.ops.text import clean_text

    df = spark.createDataFrame(
        [(0, "résume\x07   has\tspace  "), (1, None)],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["c"]
           for r in df.select("doc_id",
                              clean_text(F.col("text")).alias("c")).collect()}
    assert out[0] == "résume has space"  # precomposed, control-free
    assert out[1] is None


def test_clean_text_lowercase_flag(spark):
    from streamalert_spark.ops.text import clean_text

    df = spark.createDataFrame([(0, "  MiXeD Case ")], "doc_id bigint, text string")
    row = df.select(clean_text(F.col("text"), lowercase=True).alias("c")).collect()[0]
    assert row["c"] == "mixed case"


def _luhn_check_digit(body: str) -> str:
    # python reference: digit making body+d luhn-valid
    total = 0
    for i, ch in enumerate(reversed(body)):
        d = int(ch)
        if i % 2 == 0:  # positions 2,4,... from the right once d appended
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return str((10 - total % 10) % 10)


def test_luhn_expression_matches_python_reference(spark):
    from streamalert_spark.ops.pii import luhn_valid

    rows = []
    for seed in range(120):
        body = str(1000000000000000 + seed * 987654321)[:15]
        valid = body + _luhn_check_digit(body)
        bad_digit = (int(valid[-1]) + 1) % 10
        invalid = valid[:-1] + str(bad_digit)
        rows.append((valid, True))
        rows.append((invalid, False))
    df = spark.createDataFrame(rows, "digits string, expect boolean")
    got = df.select("digits", "expect",
                    luhn_valid(F.col("digits")).alias("got")).collect()
    for r in got:
        assert r["got"] == r["expect"], r["digits"]


def test_pack_sequences_conserves_tokens_and_docs(spark):
    from streamalert_spark.ops.packing import pack_sequences

    rows = [
        (i, f"src{i % 3}", " ".join(["w"] * (1 + (i * 37) % 90)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    packs = pack_sequences(df, seq_len=256, n_shards=4).collect()
    # conservation: every doc lands in exactly one pack
    assert sum(p["n_docs"] for p in packs) == 200
    expect_tokens = sum(1 + (i * 37) % 90 for i in range(200))
    assert sum(p["total_tokens"] for p in packs) == expect_tokens
    # pack ids are dense per (source, shard) starting at 0
    from collections import defaultdict
    by_shard = defaultdict(list)
    for p in packs:
        by_shard[(p["source"], p["shard"])].append(p["pack_id"])
    for ids in by_shard.values():
        ids.sort()
        assert ids == list(range(len(ids)))


def test_asof_join_tie_and_ordering(spark):
    from streamalert_spark.ops.asof import asof_join_backward

    left = spark.createDataFrame(
        [("k", 1, 10), ("k", 2, 20), ("k", 3, 30)],
        "key string, id bigint, ts bigint")
    right = spark.createDataFrame(
        [("k", 100, 10, 1.0), ("k", 101, 10, 2.0), ("k", 102, 25, 3.0)],
        "key string, rid bigint, ts bigint, v double")
    out = {r["id"]: r["asof_v"] for r in asof_join_backward(
        left, right, key="key", ts="ts", order_col="rid",
        value_cols=["v"]).collect()}
    assert out[1] == 2.0   # equal-ts right rows visible; highest rid wins
    assert out[2] == 2.0   # nothing newer at-or-before 20
    assert out[3] == 3.0


def test_asof_join_matches_duckdb_native_asof(spark):
    """Cross-validate the union+window composition against DuckDB's
    native ASOF JOIN on the purchase-attachment query at sf0.001."""
    import duckdb

    from streamalert_spark.queries import load_all

    s = {(r["user_id"], r["event_id"]): (r["asof_value"], r["asof_us"])
         for r in load_all()["asof_last_purchase"].fn(
             spark, "/root/testdata/sf0.001").collect()}
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/events.parquet')")
    d = con.execute("""
        WITH e AS (
          SELECT user_id, event_id, event_type, value,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events
        ),
        l AS (SELECT user_id, event_id, us FROM e
              WHERE event_type <> 'purchase'),
        r AS (SELECT user_id, us, value FROM e
              WHERE event_type = 'purchase')
        SELECT l.user_id, l.event_id, r.value, CAST(r.us AS BIGINT)
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.us >= r.us
    """).fetchall()
    mismatches = []
    for user_id, event_id, v, us in d:
        got = s[(user_id, event_id)]
        if got != (v, us):
            mismatches.append((user_id, event_id, got, (v, us)))
    # native ASOF picks an arbitrary row among equal-ts matches; the
    # synthetic data has no equal-ts purchases per user, so exact equality
    assert not mismatches, mismatches[:5]


def test_asof_join_no_global_sort(spark):
    from streamalert_spark.queries import load_all

    df = load_all()["asof_last_purchase"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), plan


def test_bucketed_range_join_edges(spark):
    from streamalert_spark.ops.rangejoin import bucketed_range_join

    points = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 20), (4, 21), (5, 35)],
        "pid bigint, x bigint")
    intervals = spark.createDataFrame(
        [(100, 10, 20), (101, 18, 28)], "iid bigint, lo bigint, hi bigint")
    out = sorted(
        (r["pid"], r["iid"])
        for r in bucketed_range_join(points, intervals, "x", "lo", "hi",
                                     bucket_width=11).collect())
    # inclusive bounds both ends; overlapping intervals both match
    assert out == [(2, 100), (3, 100), (3, 101), (4, 101)]


def test_redaction_is_idempotent_on_generated_corpus(spark):
    """redact(redact(x)) == redact(x): placeholder tokens contain no
    digits/@, so a second pass must be a no-op — checked over a
    deterministic 200-case mixed corpus in one job."""
    from streamalert_spark.ops.pii import redact

    rows = []
    for i in range(200):
        parts = [
            f"word{i}",
            f"user{i}@ex{i % 7}.org" if i % 3 == 0 else "",
            f"10.{i % 256}.{(i * 3) % 256}.{i % 250}" if i % 4 == 0 else "",
            f"{100 + i % 900}-{10 + i % 90}-{1000 + i % 9000}" if i % 5 == 0 else "",
            "4111 1111 1111 1111" if i % 7 == 0 else "",
            f"555-{100 + i % 900}-{1000 + i % 9000}" if i % 2 == 0 else "",
        ]
        rows.append((i, " ".join(p for p in parts if p)))
    df = spark.createDataFrame(rows, "i bigint, text string")
    out = df.select(
        redact(F.col("text")).alias("once"),
    ).select("once", redact(F.col("once")).alias("twice")).collect()
    for r in out:
        assert r["once"] == r["twice"], r["once"]


def test_ngram_array_counts(spark):
    from streamalert_spark.ops.text import ngram_array, tokens

    rows = [(i, " ".join(["w"] * i)) for i in range(1, 12)]
    df = spark.createDataFrame(rows, "n bigint, text string")
    for k in (2, 3, 5):
        out = df.select(
            "n", F.size(ngram_array(tokens(F.col("text")), k)).alias("g")
        ).collect()
        for r in out:
            assert r["g"] == max(0, r["n"] - k + 1), (k, r["n"], r["g"])
