"""Deterministic robustness fixtures: empty-input and unicode corpora.

Round 8 swept degenerate VALUES (NULLs, zero-norm vectors, malformed
wire data); round 9 swept two more axes every 100 TB pipeline hits:

- **empty relations** (``--empty``): schema-identical zero-row copies
  of all ten tables. A filter matching nothing is guaranteed at scale;
  N=0 breaks count-derived literals and grouping-set semantics (the
  sweep found five real divergence classes — see README round 9).
- **unicode text** (``--unicode``): the sf0.001 corpus with a
  deterministic multilingual hazard phrase appended to every document
  (Turkish dotted I, sharp s, Greek final sigma, CJK, ZWJ emoji,
  combining marks, RTL, ligatures, astral-plane letters). This is the
  fixture that exposed engine ``lower()`` divergence (Java full
  Unicode casing vs DuckDB simple mapping) and drove the ASCII-fold
  tokenizer contract (functions/text.py::ASCII_UPPER).

Usage:
    python tools/robustness_fixtures.py --empty   [--out /tmp/sf_empty]
    python tools/robustness_fixtures.py --unicode [--out /tmp/sf_unicode]
then:
    python tools/selfcheck.py --sf-dir /tmp/sf_empty
    python tools/selfcheck.py --sf-dir /tmp/sf_unicode <text/dedup names>

Known, documented residual on the unicode fixture: ``d_editdist_neardup``
— Spark ``levenshtein`` counts CODEPOINTS (the engine contract, correct
for multilingual near-dup verification) while DuckDB's counts UTF-8
BYTES, so its oracle twin verifies the ASCII regime where the two
definitions coincide; the codepoint semantics are pinned by pytest
(tests/test_llm_ext.py::test_levenshtein_is_codepoint_based).
"""

from __future__ import annotations

import argparse
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: per-doc hazard phrases, cycled deterministically by doc index —
#: each targets a known cross-engine unicode hazard class
UNICODE_PHRASES = [
    "İstanbul DİYARBAKIR ışık",            # Turkish dotted/dotless I
    "STRASSE straße ẞß",                    # sharp s casing
    "ΣΊΣΥΦΟΣ σίσυφος τέλος",                # Greek final sigma
    "日本語のテキスト 中文文本 한국어",       # CJK no-space scripts
    "emoji 🎉🚀 family 👨‍👩‍👧‍👦 flag 🇫🇷",  # ZWJ sequences, flags
    "café naïve résumé",                    # precomposed + combining
    "مرحبا بالعالم עברית",                   # RTL Arabic + Hebrew
    "nbsp joined thin space",     # non-class whitespace
    "ligature ﬁne ǅungla Ǆ",                # ligatures, titlecase digraph
    "math 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 supplementary 😀𐍈",      # astral plane
]


def build_empty(base: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        schema = pq.read_schema(f"{base}/{t}.parquet")
        pq.write_table(schema.empty_table(), f"{out}/{t}.parquet")
    print(f"empty fixture at {out} ({len(TABLES)} zero-row tables)")


def build_unicode(base: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        if t == "documents":
            continue
        shutil.copyfile(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    tbl = pq.read_table(f"{base}/documents.parquet")
    d = tbl.to_pydict()
    d["text"] = [
        (txt or "") + " " + UNICODE_PHRASES[i % len(UNICODE_PHRASES)]
        for i, txt in enumerate(d["text"])
    ]
    pq.write_table(pa.table(d, schema=tbl.schema), f"{out}/documents.parquet")
    print(f"unicode fixture at {out} ({len(d['text'])} docs)")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument("--empty", action="store_true")
    ap.add_argument("--unicode", action="store_true")
    ap.add_argument("--out")
    args = ap.parse_args()
    if args.empty:
        build_empty(args.base, args.out or "/tmp/sf_empty")
    if args.unicode:
        build_unicode(args.base, args.out or "/tmp/sf_unicode")
    if not (args.empty or args.unicode):
        ap.error("pass --empty and/or --unicode")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
