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

Unicode-sweep family (``--list-unicode-family`` prints it): every
registered query whose VALUES depend on the documents.text column
(prefixes d_/t_/pipeline_) plus p_string_funcs (the §2.7 engine-casing
demo with its documented ASCII-domain pin) — 60 names. The edit-distance
contract appears twice in the family: ``d_editdist_neardup`` (production
form — Spark ``levenshtein`` counts CODEPOINTS, the right contract for
multilingual near-dup verification, while DuckDB's counts UTF-8 BYTES,
so its raw-text twin verifies the ASCII regime by engine-primitive
necessity and diverges on this fixture BY DESIGN) and
``d_editdist_unicode`` (r11 — the codepoint-exact oracle row: identical
candidate pipeline, cross-engine-identical ASCII projection, Spark-side
injective multibyte substitution; green on this fixture iff Spark's
levenshtein is codepoint-based). Sweep accounting: 60/60 verifiable
contracts green — the raw-text editdist twin is the one documented
engine-primitive exclusion, and the contract it cannot check is checked
exactly by the variant. Codepoint semantics also pinned by pytest
(tests/test_llm_ext.py::test_levenshtein_is_codepoint_based,
::test_editdist_unicode_bijection_preserves_distance).
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


def unicode_family() -> list[str]:
    """The unicode-sweep query set: every registered query whose values
    depend on documents.text (prefixes d_/t_/pipeline_) plus
    p_string_funcs (see module docstring). Derived from the live
    registry so the list cannot silently go stale."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    names = [
        n
        for n in entrymod.queries()
        if n.startswith(("d_", "t_", "pipeline_"))
    ]
    return names + ["p_string_funcs"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument("--empty", action="store_true")
    ap.add_argument("--unicode", action="store_true")
    ap.add_argument("--list-unicode-family", action="store_true")
    ap.add_argument("--out")
    args = ap.parse_args()
    if args.list_unicode_family:
        print(" ".join(unicode_family()))
        return 0
    if args.empty:
        build_empty(args.base, args.out or "/tmp/sf_empty")
    if args.unicode:
        build_unicode(args.base, args.out or "/tmp/sf_unicode")
    if not (args.empty or args.unicode):
        ap.error("pass --empty and/or --unicode")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
