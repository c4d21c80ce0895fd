"""Text analysis for training-data pipelines — all native Catalyst
column expressions (JVM-side, whole-stage-codegen'd; zero Python).

Operators: language ID (char-class n-gram heuristic), quality scoring
(length / punctuation / stopword / repetition ratios), token counting
(whitespace + BPE-ish regex), document fingerprinting (normalized-text
hash + rolling shingle hash), simhash (64-bit, xxhash64 token votes).

These run over the `extracted.canonical_text` output of the kernel (or
any text column) at full scan speed — important at 10^12 docs where a
Python hop per row would dominate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# ------------------------------------------------------------- tokens

_WS = r"\s+"
#: BPE-ish pretokenizer: letter runs | digit runs | single non-space symbol
BPE_ISH = r"[A-Za-zÀ-ɏЀ-ӿ]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokens, empties dropped (kernel tokenization rule)."""
    return F.filter(F.split(col, _WS), lambda x: x != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count via the BPE-style pretokenizer regex."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH), 0)).cast("bigint")


# ------------------------------------------------------------ lang id

#: char-class counts per script — a deterministic n-gram-free heuristic
#: (script dominance), robust at web scale and fully relational.
_SCRIPTS = {
    "cyrillic": r"[Ѐ-ӿ]",
    "cjk": r"[一-鿿぀-ヿ]",
    "latin": r"[A-Za-z]",
}


def _script_count(col: Column, pattern: str) -> Column:
    # regexp_count of the single-char class == number of matching
    # characters == length(regexp_replace(col, [^class], '')) — same
    # integer, but counts matches without BUILDING a filtered copy of
    # every row's text (the replace form allocated a new string per
    # row per script; measured 0.29 s vs 0.39 s per pass at sf1.0).
    return F.regexp_count(col, F.lit(pattern))


def lang_id(col: Column) -> Column:
    """'ru' | 'zh' | 'latin' | 'unknown' by dominant script."""
    cyr = _script_count(col, _SCRIPTS["cyrillic"])
    cjk = _script_count(col, _SCRIPTS["cjk"])
    lat = _script_count(col, _SCRIPTS["latin"])
    return (
        F.when((cyr >= cjk) & (cyr >= lat) & (cyr > 0), "ru")
        .when((cjk >= lat) & (cjk > 0), "zh")
        .when(lat > 0, "latin")
        .otherwise("unknown")
    )


# ------------------------------------------------------- quality score

_STOPWORDS = (
    "the a an and or of to in is are was were be on at for with that this "
    "it as by from"
).split()


def quality_features(col: Column) -> list[Column]:
    """Standard web-corpus quality signals (Gopher/C4-style rule inputs),
    each aliased; ratios rounded to 4 for cross-engine stability."""
    toks = tokens(col)
    n_tok = F.size(toks)
    n_chars = F.length(col)
    stop_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(_STOPWORDS))
    )
    punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))
    uniq = F.size(F.array_distinct(F.transform(toks, F.lower)))
    safe = lambda num, den: F.when(den > 0, F.round(num / den, 4)).otherwise(
        F.lit(0.0)
    )
    return [
        n_chars.cast("bigint").alias("n_chars"),
        n_tok.cast("bigint").alias("n_tokens"),
        safe(n_chars.cast("double"), n_tok.cast("double")).alias(
            "mean_token_len"
        ),
        safe(punct.cast("double"), n_chars.cast("double")).alias(
            "punct_ratio"
        ),
        safe(stop_hits.cast("double"), n_tok.cast("double")).alias(
            "stopword_ratio"
        ),
        safe(uniq.cast("double"), n_tok.cast("double")).alias(
            "type_token_ratio"
        ),
    ]


def quality_score(col: Column) -> Column:
    """Composite 0..1 score: stopword presence, sane token length,
    lexical diversity, not punctuation-soup. Deterministic weights."""
    toks = tokens(col)
    n_tok = F.size(toks).cast("double")
    stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(_STOPWORDS)))
    uniq = F.size(F.array_distinct(F.transform(toks, F.lower)))
    punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", "")).cast("double")
    n_chars = F.length(col).cast("double")
    s_len = F.when((n_tok >= 10) & (n_tok <= 5000), 1.0).otherwise(0.25)
    s_stop = F.when(n_tok > 0, F.least(stop / n_tok * 10.0, F.lit(1.0))).otherwise(0.0)
    s_div = F.when(n_tok > 0, uniq / n_tok).otherwise(0.0)
    s_punct = F.when(n_chars > 0, 1.0 - F.least(punct / n_chars * 5.0, F.lit(1.0))).otherwise(0.0)
    return F.round(
        0.25 * s_len + 0.25 * s_stop + 0.25 * s_div + 0.25 * s_punct, 4
    )


def quality_keep(col: Column) -> Column:
    """C4/Gopher-style keep rule (boolean): sane length, lexical
    diversity, plausible mean token length. Deterministic thresholds —
    part of the engine contract."""
    toks = tokens(col)
    n_tok = F.size(toks)
    uniq = F.size(F.array_distinct(F.transform(toks, F.lower)))
    mean_len = F.when(
        n_tok > 0, F.length(col).cast("double") / n_tok.cast("double")
    ).otherwise(F.lit(0.0))
    return (
        (n_tok >= 20)
        & (n_tok <= 5000)
        & (uniq.cast("double") >= 0.3 * n_tok.cast("double"))
        & (mean_len >= 2.0)
        & (mean_len <= 12.0)
    )


# ------------------------------------------------- Gopher rule set

#: the eight stop words of the Gopher quality filter (Rae et al. 2021,
#: "Scaling Language Models", Appendix A1.1): a document must contain
#: at least TWO distinct members or it is dropped.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: severity-ordered (rule, reason) labels — first match wins.
GOPHER_REASONS = (
    "word_count",
    "mean_word_len",
    "symbol_ratio",
    "bullet_lines",
    "ellipsis_lines",
    "alpha_words",
    "stopwords",
)


def gopher_signals(col: Column) -> dict[str, Column]:
    """The integer inputs of the full Gopher quality rule set (Rae et
    al. 2021, Appendix A1.1) — every count a bigint so the downstream
    ratio rules are INTEGER comparisons (no float crosses the engine
    boundary; CLAUDE.md cross-engine rule). All JVM-side; the only
    higher-order exprs are the per-word filters (bounded by doc token
    count, same shape as quality_features).

    NULL text counts as empty (word_count reject), like every sibling
    op that coalesces text to '' — without this, every comparison in
    the reason chain is NULL and ``gopher_keep`` (reason IS NULL)
    would PASS null-text rows the c4 gate drops."""
    col = F.coalesce(col, F.lit(""))
    toks = tokens(col)
    return {
        # words + their total character mass (mean length = chars/words)
        "n_words": F.size(toks).cast("bigint"),
        "n_word_chars": F.length(
            F.regexp_replace(col, r"\s", "")
        ).cast("bigint"),
        # symbol counts: '#' occurrences + non-overlapping '...' / '…'
        "n_hash": (
            F.length(col) - F.length(F.regexp_replace(col, "#", ""))
        ).cast("bigint"),
        "n_ellipsis": F.regexp_count(
            col, F.lit(r"(\.\.\.|…)")
        ).cast("bigint"),
        # line-shape counts ((?m) works identically in Java regex + RE2)
        "n_lines": (F.regexp_count(col, F.lit("\n")) + 1).cast("bigint"),
        "n_bullet_lines": F.regexp_count(
            col, F.lit(r"(?m)^[-•*] ")
        ).cast("bigint"),
        "n_ellipsis_lines": F.regexp_count(
            col, F.lit(r"(?m)(\.\.\.|…)$")
        ).cast("bigint"),
        "n_alpha_words": F.size(
            F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
        ).cast("bigint"),
        "n_stop_distinct": F.size(
            F.array_distinct(
                F.filter(
                    F.transform(toks, F.lower),
                    lambda t: t.isin(list(GOPHER_STOPWORDS)),
                )
            )
        ).cast("bigint"),
    }


def gopher_reason(s: dict[str, Column]) -> Column:
    """First failing Gopher rule (severity order), NULL = keep. The
    published thresholds, rewritten as exact integer comparisons:
    50 <= words <= 100000; 3 <= mean word length <= 10 (chars vs
    3*words / 10*words); symbol-to-word ratio <= 0.1 (10*symbols vs
    words); <= 90% bullet-started lines (10*bullets vs 9*lines);
    <= 30% ellipsis-ended lines (10*ell vs 3*lines); >= 80% words
    with an alphabetic char (5*alpha vs 4*words); >= 2 distinct
    Gopher stop words."""
    return (
        F.when(
            (s["n_words"] < 50) | (s["n_words"] > 100000),
            F.lit("word_count"),
        )
        .when(
            (s["n_word_chars"] < 3 * s["n_words"])
            | (s["n_word_chars"] > 10 * s["n_words"]),
            F.lit("mean_word_len"),
        )
        .when(
            10 * (s["n_hash"] + s["n_ellipsis"]) > s["n_words"],
            F.lit("symbol_ratio"),
        )
        .when(
            10 * s["n_bullet_lines"] > 9 * s["n_lines"],
            F.lit("bullet_lines"),
        )
        .when(
            10 * s["n_ellipsis_lines"] > 3 * s["n_lines"],
            F.lit("ellipsis_lines"),
        )
        .when(
            5 * s["n_alpha_words"] < 4 * s["n_words"],
            F.lit("alpha_words"),
        )
        .when(s["n_stop_distinct"] < 2, F.lit("stopwords"))
    )


def gopher_keep(col: Column) -> Column:
    """Boolean form of the full Gopher rule set — the production
    corpus-gate column (reason = NULL)."""
    return gopher_reason(gopher_signals(col)).isNull()


# -------------------------------------------------------- fingerprints

def normalized(col: Column) -> Column:
    """Dedup normalization: lowercase + collapse all whitespace runs."""
    return F.trim(F.regexp_replace(F.lower(col), _WS, " "))


def fingerprint_md5(col: Column) -> Column:
    """Exact-dup fingerprint over normalized text (md5 hex — identically
    computable in DuckDB for oracle checks)."""
    return F.md5(F.encode(normalized(col), "utf-8"))


def rolling_fingerprint(col: Column, window: int = 8) -> Column:
    """Winnowing-style document fingerprint: min xxhash64 over
    `window`-gram shingles of the normalized token stream (a single
    stable representative n-gram — cheap near-dup prefilter)."""
    toks = tokens(normalized(col))
    n = F.size(toks)
    shingles = F.when(
        n >= window,
        F.transform(
            F.sequence(F.lit(0), n - window),
            lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, window), " ")),
        ),
    ).otherwise(F.array(F.xxhash64(F.array_join(toks, " "))))
    return F.array_min(shingles)


def simhash64(col: Column) -> Column:
    """64-bit simhash over whitespace tokens, all JVM-side:
    per-token xxhash64; per-bit majority vote -> bit set when the vote
    is positive. Near-dup docs differ in few bits (hamming).

    Expression form (64 folds over the token-hash array) — fine inline
    on moderate docs; for corpus-scale simhash use
    ``operators.dedup.simhash_table`` (explode + hash-aggregate, the
    shape that vectorizes and partial-aggregates)."""
    hashes = F.transform(tokens(col), lambda t: F.xxhash64(t))
    n = F.size(hashes)
    bit = lambda b: F.when(
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("int"),
        )
        * 2
        > n,
        F.lit(1).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    out = F.lit(0).cast("bigint")
    for b in range(64):
        out = out + F.shiftleft(bit(b), b)
    return F.when(n > 0, out).otherwise(F.lit(0).cast("bigint"))


# ------------------------------------------------------------- PII scrub

#: cross-engine-safe patterns (valid and identical in Java regex and
#: RE2/DuckDB — no backrefs, no lookaround): conservative by design,
#: favoring precision. Order matters: emails first (their user part
#: can contain digits a later pass would chew), then IPv4, then
#: phone-like digit runs (which would otherwise eat IP octets).
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d() -]{7,}\d", "<PHONE>"),
)


def redact_pii(col: Column) -> Column:
    """Redact emails / IPv4 addresses / phone-like digit runs with
    typed placeholder tokens — the corpus-hygiene scrub a training
    pipeline runs before publication. Pure chained regexp_replace
    (JVM-side, codegen; zero Python), identically executable in
    DuckDB's RE2 for the oracle."""
    out = col
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


#: URL canonicalization pieces (CCNet-style crawl hygiene). All are
#: RE2-compatible so DuckDB replays them verbatim for the oracle.
URL_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
URL_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
URL_REST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$"
#: anchored on the preceding ?/& (kept via backref) so a REAL param
#: merely ending in a tracking name ('href=', 'prefref=') never
#: matches the 'ref' alternative as a substring
URL_TRACKING_RE = "([?&])(utm_[A-Za-z0-9_]+|ref|fbclid|gclid)=[^&]*"


def url_scheme(col: Column) -> Column:
    return F.lower(F.regexp_extract(col, URL_SCHEME_RE, 1))


def url_host(col: Column) -> Column:
    """Lowercased host with the scheme's default port and a leading
    'www.' stripped — the key for host-level aggregation/dedup.
    Non-default ports are preserved (they address a different vhost)."""
    hp = F.lower(F.regexp_extract(col, URL_HOSTPORT_RE, 1))
    sch = url_scheme(col)
    hp = (
        F.when(sch == "http", F.regexp_replace(hp, ":80$", ""))
        .when(sch == "https", F.regexp_replace(hp, ":443$", ""))
        .otherwise(hp)
    )
    return F.regexp_replace(hp, r"^www\.", "")


def canonical_url(col: Column) -> Column:
    """Canonical URL for crawl dedup: lowercase scheme+host, strip the
    default port / 'www.' / fragment / tracking query params
    (utm_*, ref, fbclid, gclid — real params survive), '' path -> '/'.
    Pure chained JVM regex (codegen, zero Python); case-sensitive
    path/query are preserved byte-for-byte. Different crawls of one
    page ('HTTP://WWW.X.COM:80/a?utm_source=f' vs 'http://x.com/a')
    collapse to one key, which is what makes URL-level dedup reach
    the ~duplicate-fetch rate of a real crawl."""
    u0 = F.regexp_replace(col, "#.*$", "")
    rest = F.regexp_extract(u0, URL_REST_RE, 1)
    rest = F.regexp_replace(rest, URL_TRACKING_RE, "$1")
    rest = F.regexp_replace(rest, "&+", "&")
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, "[?&]+$", "")
    path = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.concat(url_scheme(u0), F.lit("://"), url_host(u0), path)


def nfc(col: Column) -> Column:
    """Unicode NFC normalization — the canonicalization pass a training
    corpus runs before fingerprinting (decomposed accents, compatibility
    variants from different crawls hash differently without it). Spark
    SQL has no normalization builtin, so this is the ONE sanctioned
    Python escape hatch: an Arrow-batched pandas UDF (never a row
    UDF). Oracle: DuckDB's nfc_normalize agrees with Python's
    unicodedata byte-for-byte on composed output."""
    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: None if x is None else unicodedata.normalize("NFC", x)
        )

    return _nfc(col)
