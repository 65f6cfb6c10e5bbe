"""Text-analysis column builders (LLM-pipeline extension surface).

All JVM-side (split / higher-order array functions / replace-trick
substring counting) — no Python UDFs in any hot path. Each builder has
a ``*_sql`` twin rendering the identical DuckDB expression so the
oracle can check values, with shared constants (stopword lists, marker
tables, hash moduli) defined once here.

Tokenization contract: ASCII-fold case (A-Z -> a-z via ``translate``,
every other codepoint passes through case-preserved — see
``ASCII_UPPER`` for why engine ``lower()`` is not cross-engine
portable on unicode), split on runs of the explicit whitespace class —
deliberately simple and engine-portable on ANY input; a BPE-ish regex
tokenizer is provided separately (:func:`bpe_ish_tokens`) for token
*counting*.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny multilingual stopword markers for n-gram/stopword language ID
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "una", "por"),
}

#: english stopwords for the quality score
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "that", "this",
)

#: word-id hash constants (Knuth multiplicative, small prime modulus)
HASH_MULT = 2654435761
HASH_MOD = 1000003
#: SimHash width. 62 bits = two 31-bit mixes packed side by side —
#: the widest signature whose per-word mixing stays inside BIGINT in
#: BOTH engines (wid ≤ HASH_MOD, wid·mult < 2^63; a true 64-bit mix
#: would need modular arithmetic past 2^63, which DuckDB BIGINT can't
#: express). Width matters at scale: a 16-bit signature over a corpus
#: with heavily-overlapping vocabularies rated 40% of ALL pairs as
#: "hamming ≤ 3" (5.1M pairs at sf0.1) — the banded join was fine but
#: the OUTPUT was quadratic. 62 bits makes the radius discriminating
#: (357k pairs, 14× less) and keeps band buckets sparse.
SIMHASH_BITS = 62
#: second mixer for the high 31 bits (Knuth MMIX LCG multiplier mod 2^31)
SIMHASH_MULT2 = 6364136223846793005 % (2**31)
#: positional weights for the rolling fingerprint (31^k mod HASH_MOD)
FP_POWERS = [pow(31, k, HASH_MOD) for k in range(8)]


def md5_id(col: Column | str) -> Column:
    """Engine-portable element id: the first 15 hex chars of md5 (60
    bits, positive bigint) mod HASH_MOD.

    This is the id strategy that kills the global dense_rank vocab
    window WITHOUT giving up the oracle: md5 over UTF-8 bytes is
    bit-identical in Spark and DuckDB, so the id is computed inline
    per row — no distinct, no join, no window — and the DuckDB twin
    (:func:`md5_id_sql`) reproduces it exactly. Collisions mod
    HASH_MOD are possible but identical in both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint") % HASH_MOD
    )


def md5_id_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_id` (hex-literal cast, verified
    bit-equal against Spark's conv())."""
    return f"(CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT) % {HASH_MOD})"


#: whitespace as an EXPLICIT class — `\s` is engine-dependent at the
#: edges (Java adds \x0B, Python adds \x1c-\x1f, RE2 has neither), so
#: a doc containing those chars would silently break oracle parity.
#: The explicit class means the same five chars in Java, RE2, and the
#: Python model used by the property tests.
WHITESPACE_CLASS = r"[ \t\n\x0B\f\r]"

#: ASCII-explicit case folding (r9 unicode sweep). Engine ``lower()``
#: is NOT cross-engine portable on unicode input: Java/Spark applies
#: the full Unicode SpecialCasing rules — 'İ' (U+0130) lowers to
#: 'i' + U+0307 combining dot (string GROWS), trailing 'Σ' takes the
#: context-sensitive final form 'ς' — while DuckDB applies the simple
#: per-codepoint map ('İ'→'i', 'Σ'→'σ' everywhere). Any token, shingle
#: or signature downstream of engine lower() therefore diverges on
#: real multilingual text (18 of 58 text/dedup oracles flipped on a
#: unicode-injected corpus). ``translate`` over the explicit 26-letter
#: ASCII alphabet is codepoint-exact in BOTH engines (verified
#: primitive-by-primitive), locale- and ICU-version-independent, and
#: the identity on the all-ASCII fixtures — so the tokenizer contract
#: becomes: ASCII letters fold, every other codepoint passes through
#: case-preserved. That is the standard determinism trade a
#: cross-engine corpus pipeline makes (full Unicode folding, where
#: wanted, belongs in one engine's normalize stage, not in a contract
#: two engines must reproduce bit-identically).
ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(text: Column | str) -> Column:
    """Fold A-Z to a-z, pass every other codepoint through unchanged."""
    c = F.col(text) if isinstance(text, str) else text
    return F.translate(c, ASCII_UPPER, ASCII_LOWER)


def ascii_lower_sql(expr: str) -> str:
    return f"translate({expr}, '{ASCII_UPPER}', '{ASCII_LOWER}')"


def tokens(text: Column | str) -> Column:
    """ASCII-case-folded whitespace tokens (explicit whitespace class;
    fold contract at ``ASCII_UPPER`` — r9: engine ``lower()`` made
    every downstream shingle/signature engine-specific on unicode).

    PINNED semantics note (r6 review): split keeps boundary empties —
    leading/trailing whitespace (or an empty string) yields ''
    tokens, so ' hello ' counts 3 and '' counts 1. Both engines
    behave identically (string_split_regex does the same), so oracle
    parity holds; the fixture corpus has no padded documents, so
    registered counts are exact there. This is the tokenizer CONTRACT
    ~40 oracle-checked queries and every measured sweep are built on
    — changing it (e.g. filtering empties) would shift token counts,
    shingle sets, and signatures across the whole suite at once, so
    any change is an all-at-once migration with full re-verification,
    not a drive-by fix. Callers that need padded-input exactness
    should trim upstream (t_normalize does)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(ascii_lower(c), WHITESPACE_CLASS + "+")


def tokens_sql(expr: str) -> str:
    return f"string_split_regex({ascii_lower_sql(expr)}, '{WHITESPACE_CLASS}+')"


def token_count(text: Column | str) -> Column:
    """Whitespace token count (the cheap length signal)."""
    return F.size(tokens(text))


def token_count_sql(expr: str) -> str:
    return f"CAST(len({tokens_sql(expr)}) AS INT)"


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-ish token counting: split into word pieces / digits /
    punctuation runs — approximates subword token counts without a
    vocab (what you budget LLM context by when no tokenizer is at
    hand). Regex kept RE2-compatible so the oracle matches."""
    c = F.col(text) if isinstance(text, str) else text
    # extract all: letter runs (≤4 chars per piece), digit runs, punct
    # (explicit whitespace class — see WHITESPACE_CLASS; ASCII fold —
    # see ASCII_UPPER)
    pat = r"[a-z]{1,4}|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]"
    return F.regexp_extract_all(ascii_lower(c), F.lit(pat), 0)


def bpe_ish_count_sql(expr: str) -> str:
    return (
        f"CAST(len(regexp_extract_all({ascii_lower_sql(expr)}, "
        f"'[a-z]{{1,4}}|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]')) AS INT)"
    )


def substring_count(text: Column | str, needle: str) -> Column:
    """Occurrences of a literal substring via the replace trick —
    (len(s) - len(replace(s, needle, ''))) / len(needle), exact integer
    arithmetic, identical in any engine."""
    c = F.col(text) if isinstance(text, str) else text
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def substring_count_sql(expr: str, needle: str) -> str:
    quoted = needle.replace("'", "''")
    return (
        f"CAST((length({expr}) - length(replace({expr}, '{quoted}', '')))"
        f" / {len(needle)} AS INT)"
    )


def stopword_count(text: Column | str) -> Column:
    """Number of tokens that are stopwords (higher-order filter, no UDF)."""
    return F.size(F.filter(tokens(text), lambda t: t.isin(*STOPWORDS))).cast("int")


def stopword_count_sql(expr: str) -> str:
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"CAST(len(list_filter({tokens_sql(expr)}, t -> t IN ({in_list}))) AS INT)"


def marker_score(text: Column | str, lang: str) -> Column:
    """Language-ID score: how many tokens are that language's markers."""
    toks = tokens(text)
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("int")


def marker_score_sql(expr: str, lang: str) -> str:
    in_list = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"CAST(len(list_filter({tokens_sql(expr)}, t -> t IN ({in_list}))) AS INT)"


def predicted_lang(text: Column | str) -> Column:
    """Arg-max language by marker score; 'und' (undetermined) when every
    score is 0. Ties break by the fixed language order of LANG_MARKERS
    — the same CASE ladder the oracle runs."""
    scores = {lang: marker_score(text, lang) for lang in LANG_MARKERS}
    expr: Column | None = None
    langs = list(LANG_MARKERS)
    for i, lang in enumerate(langs):
        cond = scores[lang] > 0
        for other in langs[:i]:
            cond = cond & (scores[lang] > scores[other])
        for other in langs[i + 1 :]:
            cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    assert expr is not None
    return expr.otherwise(F.lit("und"))


def predicted_lang_sql(expr: str) -> str:
    langs = list(LANG_MARKERS)
    whens = []
    for i, lang in enumerate(langs):
        conds = [f"{marker_score_sql(expr, lang)} > 0"]
        for other in langs[:i]:
            conds.append(f"{marker_score_sql(expr, lang)} > {marker_score_sql(expr, other)}")
        for other in langs[i + 1 :]:
            conds.append(
                f"{marker_score_sql(expr, lang)} >= {marker_score_sql(expr, other)}"
            )
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    joined = "\n       ".join(whens)
    return f"CASE {joined}\n       ELSE 'und' END"


def normalize_text(col: Column | str) -> Column:
    """THE corpus normalization (lowercase → strip non-alphanumerics →
    collapse whitespace runs → trim) — single Spark-side definition
    (r7 review: t_normalize, pipeline_corpus, and pipeline_corpus_v2
    carried verbatim copies of the two-stage regex chain, so an edit
    to the character class could silently diverge the fused pipeline
    from the standalone stage; a composition≡stages pytest guards the
    SQL twins the same way). Patterns restricted to the RE2 ∩ Java
    dialect so the DuckDB twin agrees."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(ascii_lower(c), r"[^a-z0-9 \t\n\x0B\f\r]", ""),
            r"[ \t\n\x0B\f\r]+",
            " ",
        )
    )


def normalize_text_sql(expr: str = "text") -> str:
    """DuckDB twin of :func:`normalize_text` — single-sourced (r9; the
    four inline copies in llm_star/llm_ext could silently drift from
    the Spark definition AND from each other)."""
    return (
        rf"trim(regexp_replace(regexp_replace({ascii_lower_sql(expr)}, "
        rf"'[^a-z0-9 \t\n\x0B\f\r]', '', 'g'), '[ \t\n\x0B\f\r]+', ' ', 'g'))"
    )


def quality_score_from_counts(
    n_tokens: Column, n_stopwords: Column, n_punct: Column
) -> Column:
    """The t_quality 0..1 score from its three integer count columns —
    single Spark-side definition shared by the standalone query and
    the fused pipeline (all three terms are exact binary fractions,
    so the sum is FP-exact in any order)."""
    stop_ratio = n_stopwords.cast("double") / n_tokens
    return (
        F.when((n_tokens >= 20) & (n_tokens <= 2000), F.lit(0.5)).otherwise(F.lit(0.0))
        + F.when(n_punct <= n_tokens, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((stop_ratio >= 0.05) & (stop_ratio <= 0.6), F.lit(0.25)).otherwise(
            F.lit(0.0)
        )
    )
