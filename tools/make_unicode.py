"""Synthesize the UNICODE-injected fixture for the multibyte-text sweep.

The driver fixture's document text is pure ASCII, so every cross-engine
string-semantics question — are length()/substr() code-point-based on
both engines? do regex character classes agree outside ASCII? does the
md5/utf-8 byte path survive non-BMP code points? — is structurally
untested, while a real 100 TB corpus is multilingual.  This derives a
fixture where ~10% of documents (doc_id % 10 = 3) gain a multibyte
PREFIX mixing Latin-1 accents, CJK, Cyrillic, an emoji (non-BMP,
surrogate-pair in UTF-16), and a combining mark; n_chars is recomputed
as the CODE-POINT length of the new text so the metadata stays
consistent with both engines' length().

Usage:  python tools/make_unicode.py [src_dir] [out_dir]
        (defaults /root/testdata/sf0.001 -> /tmp/testdata/sf001uni)
"""

from __future__ import annotations

import os
import sys

import duckdb

#: the multibyte gauntlet: 2-byte (é, ß, ц), 3-byte (北, 京), 4-byte
#: non-BMP (🚀), and a combining acute on 'e' (e + U+0301)
UNI_PREFIX = "café ß Müller 北京 мир 🚀 résumé "

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata/sf001uni"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"COPY (SELECT doc_id, "
                f"CASE WHEN doc_id % 10 = 3 THEN '{UNI_PREFIX}' || text "
                f"ELSE text END AS text, lang, source, "
                f"CASE WHEN doc_id % 10 = 3 THEN "
                f"length('{UNI_PREFIX}') + n_chars ELSE n_chars END "
                f"AS n_chars "
                f"FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/documents.parquet') "
        f"WHERE text LIKE 'café%'"
    ).fetchone()[0]
    con.close()
    print(f"{out}: documents with unicode prefix = {n}")


if __name__ == "__main__":
    main()
