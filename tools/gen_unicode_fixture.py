"""Generate a MULTI-BYTE-TEXT fixture dir for the third robustness-sweep
axis: charset.

gen_robust_fixture.py perturbs SIZE/vocabulary and gen_skew_fixture.py
perturbs SHAPE; both keep the corpus pure ASCII — which means every
char-vs-byte, code-point-vs-code-unit, and regex-class assumption in the
engine (and in its DuckDB oracles) is untested: Spark strings are UTF-8
walked by code point (UTF8String), its regex functions run Java Matchers
over UTF-16 (surrogate pairs for non-BMP chars), Python UDFs see code
points, DuckDB counts code points. Derived from sf0.01 into
/tmp/pmr_unicode, documents.text gets a deterministic per-doc transform:

- doc_id % 4 == 1 → Latin accents, in BOTH normalization forms:
  doc_id % 8 == 1 precomposed NFC code points (a→á, e→é, o→ö, n→ñ);
  doc_id % 8 == 5 DECOMPOSED NFD sequences (e→e+U+0301, o→o+U+0308,
  n→n+U+0303) — canonically equal text in different byte forms, the
  case Unicode-normalization-aware operators (dedup_unicode_normalized)
  must see through and byte-exact digests must NOT;
- doc_id % 4 == 2 → every token prefixed with 'データ' (3-byte CJK range);
- doc_id % 4 == 3 → every token suffixed with '🙂' (4-byte, non-BMP —
  a UTF-16 SURROGATE PAIR, the case where Java-length ≠ code points);
- doc_id % 4 == 0 → unchanged ASCII control group.

n_chars is recomputed as LENGTH(text) (code points) so the metadata
invariant the base fixture satisfies still holds. All other tables copy
unchanged. Deterministic, no RNG. Run the whole differential against it:
``python tools/driver_sim.py --sf-dir /tmp/pmr_unicode``. Disagreements
= charset semantics divergence between the Spark plan and its oracle.

Measurement/validation only — never used by the committed correctness
gates.
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.01"
OUT = "/tmp/pmr_unicode"

_ACCENT_FROM = "aeonAEON"
_ACCENT_TO = "áéöñÁÉÖÑ"


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"):
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )

    con.sql(
        f"""
        COPY (
            WITH xf AS (
                SELECT doc_id,
                       CASE doc_id % 4
                           WHEN 1 THEN CASE doc_id % 8
                               WHEN 1 THEN translate(text, '{_ACCENT_FROM}', '{_ACCENT_TO}')
                               -- NFD: base letter + combining mark (769
                               -- acute, 776 diaeresis, 771 tilde)
                               ELSE replace(replace(replace(text,
                                        'e', 'e' || chr(769)),
                                        'o', 'o' || chr(776)),
                                        'n', 'n' || chr(771))
                           END
                           WHEN 2 THEN array_to_string(
                               list_transform(
                                   list_filter(string_split_regex(text, '\\s+'),
                                               t -> t <> ''),
                                   t -> 'データ' || t), ' ')
                           WHEN 3 THEN array_to_string(
                               list_transform(
                                   list_filter(string_split_regex(text, '\\s+'),
                                               t -> t <> ''),
                                   t -> t || '🙂'), ' ')
                           ELSE text
                       END AS text,
                       lang, source
                FROM read_parquet('{SRC}/documents.parquet')
            )
            SELECT doc_id, text, lang, source,
                   CAST(LENGTH(text) AS BIGINT) AS n_chars
            FROM xf
        ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
        """
    )

    n, uni = con.sql(
        f"SELECT COUNT(*),"
        f" SUM(CASE WHEN octet_length(encode(text)) <> LENGTH(text)"
        f" THEN 1 ELSE 0 END)"
        f" FROM read_parquet('{OUT}/documents.parquet')"
    ).fetchone()
    print(f"wrote {OUT}: {n} docs, {uni} with multi-byte text")


if __name__ == "__main__":
    main()
