"""PII redaction: DuckDB RE2 parity (regexp_replace 'g' with the same
patterns, same application order) and count semantics."""

import duckdb
import pandas as pd
import ray.data as rd

from deduplicate_ray.functions import redact


def _corpus():
    return pd.DataFrame({
        "doc_id": range(8),
        "text": [
            "contact a@b.co or x.y+z@d.org today",
            "server at 10.0.0.1 and 192.168.255.3, port 8080",
            "card 1234567890123456 ok, short 12345678 kept",
            "mixed: root@10.0.0.1 mail root@host.example.com",
            "",
            "no pii here at all",
            "ip-ish 999.999.999.999 still redacts by shape",
            "a@b.co 1.2.3.4 123456789",
        ]})


def test_redact_matches_duckdb():
    df = _corpus()
    got = rd.from_pandas(df).repartition(3).map_batches(
        redact.redact_pii, batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    email, ip, dig = (p for _, p, _ in redact.PII_PATTERNS)
    want = con.execute(f"""
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(text,
            '{email}', '<EMAIL>', 'g'),
            '{ip}', '<IP>', 'g'),
            '{dig}', '<ID>', 'g') AS text,
          CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT)
            AS n_email,
          CAST(len(regexp_extract_all(text, '{ip}')) AS BIGINT) AS n_ip,
          CAST(len(regexp_extract_all(text, '{dig}')) AS BIGINT)
            AS n_digits
        FROM documents ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(
        got[["doc_id", "text", "n_email", "n_ip", "n_digits"]], want,
        check_dtype=False)


def test_redact_semantics():
    df = _corpus()
    out = rd.from_pandas(df).map_batches(
        redact.redact_pii, batch_format="pyarrow").to_pandas() \
        .set_index("doc_id")
    assert out.loc[0, "text"] == "contact <EMAIL> or <EMAIL> today"
    assert out.loc[0, "n_email"] == 2
    # 8-digit run is below the 9-digit floor and survives
    assert "12345678 kept" in out.loc[2, "text"]
    assert "<ID>" in out.loc[2, "text"]
    # root@10.0.0.1 is not an email (TLD must be alphabetic): the host
    # part redacts as an IP instead; the real address redacts as email
    assert out.loc[3, "text"] == "mixed: root@<IP> mail <EMAIL>"
    assert out.loc[4, "text"] == ""
    assert out.loc[5, "text"] == "no pii here at all"
