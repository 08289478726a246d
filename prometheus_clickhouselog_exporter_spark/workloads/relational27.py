"""Relational breadth, round 6 batch 2: the XML surface (``from_xml``
schema-directed parsing + the ``xpath_*`` extractor family, Spark 4),
a second scalar-string-function battery (split_part / translate /
overlay / find_in_set / left / right / repeat / strpos), and the AES
encrypt→decrypt round-trip certificate.

The XML oracle uses the multimodal-decode pattern: the document is
SYNTHESIZED deterministically from integer columns, Spark must
encode→parse→extract through the real XML machinery, and DuckDB (which
has no XML) recomputes the extracted values arithmetically — proving
the round-trip, not re-testing the parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import query, table


@query(
    "xml_events_extract",
    oracle="""
    SELECT event_id,
           event_type AS xp_type,
           CAST(event_id * 7 % 100 AS BIGINT) AS xp_qty,
           CAST(event_id % 13 AS BIGINT) AS fx_bucket,
           event_type AS fx_type,
           len(string_split(event_type, '')) AS type_len
    FROM events
    WHERE event_id % 10 = 3
    ORDER BY event_id
    """,
)
def xml_events_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML round-trip: synthesize an XML fragment per event
    (`<e bucket="..."><t>type</t><q>qty</q></e>`, integer-only payloads
    so string formatting is engine-neutral), then extract fields BOTH
    ways Spark offers — the ``xpath_string``/``xpath_long`` expression
    family and schema-directed ``from_xml`` into a struct — and emit
    both extractions side by side. The oracle recomputes every value
    arithmetically from the source columns, so a hash match proves the
    synthesize→parse→extract pipeline is lossless through two
    independent XML code paths.

    100 TB: both extractors are scan-stage expressions (no UDF, no
    shuffle); from_xml is the one to prefer in production — one parse
    per row, N fields — where each xpath_* call re-parses.
    """
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 3)
    xml = F.concat(
        F.lit('<e bucket="'),
        (F.col("event_id") % 13).cast("string"),
        F.lit('"><t>'),
        F.col("event_type"),
        F.lit("</t><q>"),
        (F.col("event_id") * 7 % 100).cast("string"),
        F.lit("</q></e>"),
    )
    parsed = F.from_xml(
        xml, "struct<_bucket: bigint, t: string, q: bigint>"
    )
    return e.select(
        "event_id",
        F.xpath_string(xml, F.lit("/e/t")).alias("xp_type"),
        F.xpath_long(xml, F.lit("/e/q")).alias("xp_qty"),
        parsed.getField("_bucket").alias("fx_bucket"),
        parsed.getField("t").alias("fx_type"),
        F.length(F.col("event_type")).cast("bigint").alias("type_len"),
    ).orderBy("event_id")


@query(
    "string_battery2_parts",
    oracle="""
    SELECT p_partkey,
           split_part(p_name, ' ', 2) AS second_word,
           translate(p_name, 'aeiou', '_____') AS devoweled,
           substr(p_name, 1, 2) || 'XX' || substr(p_name, 5)
             AS overlaid,
           CAST(strpos(p_name, 'o') AS BIGINT) AS first_o,
           left(p_name, 4) AS head4,
           right(p_name, 3) AS tail3,
           repeat(left(p_name, 1), 3) AS initial3,
           CAST(coalesce(list_position(string_split(p_name, ' '),
                                       'green'), 0) AS BIGINT) AS green_pos
    FROM part
    WHERE p_partkey % 20 = 0
    ORDER BY p_partkey
    """,
)
def string_battery2_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string battery II — the functions the first battery
    (relational.py scalar lane) didn't cover: ``split_part`` (field
    extraction), ``translate`` (char mapping), ``overlay`` (in-place
    splice; DuckDB mirrors it as substr concat), ``instr``/strpos,
    ``left``/``right``, ``repeat``, and ``find_in_set`` over the
    space-split name re-joined with commas (DuckDB mirrors via
    list_position). All scan-stage codegen expressions.
    """
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0)
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.translate(F.col("p_name"), "aeiou", "_____").alias("devoweled"),
        F.overlay(F.col("p_name"), F.lit("XX"), F.lit(3), F.lit(2)).alias(
            "overlaid"
        ),
        F.instr(F.col("p_name"), "o").cast("bigint").alias("first_o"),
        F.left(F.col("p_name"), F.lit(4)).alias("head4"),
        F.right(F.col("p_name"), F.lit(3)).alias("tail3"),
        F.repeat(F.left(F.col("p_name"), F.lit(1)), 3).alias("initial3"),
        F.find_in_set(
            F.lit("green"), F.array_join(F.split(F.col("p_name"), " "), ",")
        )
        .cast("bigint")
        .alias("green_pos"),
    ).orderBy("p_partkey")


@query(
    "crypto_aes_roundtrip",
    oracle="""
    SELECT doc_id, md5(text) AS plain_hash, true AS roundtrip_ok
    FROM documents WHERE doc_id % 5 = 0
    ORDER BY doc_id
    """,
)
def crypto_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AES-128-ECB encrypt→decrypt round-trip certificate: each selected
    document's text is encrypted with ``aes_encrypt`` (ECB — the
    deterministic mode; GCM's random IV would make ciphertext
    nondeterministic), decrypted back with ``aes_decrypt``, and the
    literal boolean that the decrypted bytes equal the original UTF-8
    text is emitted next to the plaintext md5 (which the oracle
    recomputes — so the hash check covers both the identity of the
    data that survived the round trip and the certificate itself).
    DuckDB has no AES; the certificate pattern (certify_topk_bound,
    Misra-Gries) carries the non-SQL half.

    100 TB: both ciphers are scan-stage JVM expressions — this is the
    column-level-encryption shape (crypto-shredding, PII vaulting)
    with zero shuffle cost."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    key = F.lit("0123456789abcdef")  # 16-byte demo key
    ct = F.aes_encrypt(F.col("text").cast("binary"), key, F.lit("ECB"))
    pt = F.aes_decrypt(ct, key, F.lit("ECB"))
    return d.select(
        "doc_id",
        F.md5(F.col("text")).alias("plain_hash"),
        (pt.cast("string") == F.col("text")).alias("roundtrip_ok"),
    ).orderBy("doc_id")
