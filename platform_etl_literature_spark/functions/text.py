"""Native text-normalization pipeline — the Spark NLP replacement.

The reference grounds entity labels via a Spark NLP pipeline
(Grounding.scala:45-108): two tokenizer branches producing a symbol
token column ``TT`` and a stopword-cleaned, normalized, stemmed label
column ``LT``, plus a Greek→Latin ``normalise`` (Helpers.scala:94-96)
and key generation (Grounding.scala:367-387).

This rebuild expresses the same capability with Catalyst primitives:

* tokenization → ``split`` on the branch's delimiter class
  (LT branch splits on whitespace + ``- / : , ;``; TT branch on
  whitespace + ``: , ;`` — Grounding.scala:52,58),
* stopword removal → ``filter`` HOF with the exact case-sensitive list
  (Grounding.scala:19-31: google list + "a","i" + capitalized forms),
* normalization → ``lower`` + ``regexp_replace`` of ``[^\\w\\d\\s]``
  (subsumes the explicit ``-``/``/``/``,`` patterns of the two
  Normalizer configs, Grounding.scala:63-68,77-82),
* stemming → Porter stemmer as an **Arrow-batched pandas UDF** over the
  token array (the only Python in the pipeline; Spark NLP's JVM Stemmer
  is Porter-style).

Token-level parity with Spark NLP internals is not bit-guaranteed and
does not need to be (SURVEY.md §7.3): grounding keys only need to be
consistent between the LUT side and the mention side, and both sides
run this same pipeline.

Scale note: the stemmer UDF is applied to the exploded *variant* stream
once per (entity-synonym | mention-label), all map-side; everything
else is whole-stage-codegen.  For a 100 TB corpus the token stream can
optionally be deduplicated before stemming (distinct labelN keys are
~10^6-10^7, far smaller than mentions).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from platform_etl_literature_spark.functions.porter import stem

# Stop word list: google list + "a"/"i", case-sensitive with capitalized
# variants (Grounding.scala:19-31).
GOOGLE_STOP_WORDS = (
    "about above after again against all am an and any are aren't as at be because "
    "been before being below between both but by can't cannot could couldn't did didn't do does doesn't doing don't down "
    "during each few for from further had hadn't has hasn't have haven't having he he'd he'll he's her here here's hers "
    "herself him himself his how how's i'd i'll i'm i've if in into is isn't it it's its itself let's me more most mustn't "
    "my myself no nor not of off on once only or other ought our ours ourselves out over own same shan't she she'd she'll "
    "she's should shouldn't so some such than that that's the their theirs them themselves then there there's these they "
    "they'd they'll they're they've this those through to too under until up very was wasn't we we'd we'll we're we've "
    "were weren't what what's when when's where where's which while who who's whom why why's with won't would wouldn't "
    "you you'd you'll you're you've your yours yourself yourselves"
).split(" ")

ALL_STOP_WORDS = (
    ["a", "i"] + GOOGLE_STOP_WORDS + [w.capitalize() for w in GOOGLE_STOP_WORDS]
)

LABEL_T = "LT"  # stemmed-label key type
TOKEN_T = "TT"  # symbol key type

_LT_SPLIT = r"[\s\-/:,;]+"  # Tokenizer splitChars - / : , ; (Grounding.scala:52)
_TT_SPLIT = r"[\s:,;]+"  # TokenizerSymbol splitChars : , ; (Grounding.scala:58)
_CLEANUP = r"[^\w\d\s]"  # Normalizer cleanup patterns (Grounding.scala:67,81)


def normalise(c: Column) -> Column:
    """Greek→Latin letter mapping (Helpers.scala:94-96)."""
    return F.translate(c, "αβγδεζηικλμνξπτυω", "abgdezhiklmnxptuo")


def normalise_sql(c: str) -> str:
    """:func:`normalise` as a staged SQL fragment (round 10 expression
    staging) — the identical translate call, parsed JVM-side.
    ``c`` is interpolated verbatim: pass a pre-validated SQL
    expression or an already-backtick-quoted identifier (ADVICE
    r10); nothing is escaped here."""
    return f"translate({c}, 'αβγδεζηικλμνξπτυω', 'abgdezhiklmnxptuo')"


# Ship the stemmer by value inside the UDF pickle: executors must not
# need this package on their import path (spark-submit without --py-files,
# driver launched from another cwd, etc).
from platform_etl_literature_spark.functions import porter as _porter_module

for _cp_name in ("pyspark.cloudpickle", "cloudpickle"):
    try:  # pragma: no cover - defensive
        import importlib

        importlib.import_module(_cp_name).register_pickle_by_value(_porter_module)
    except Exception:
        pass


def _make_stem_udf():
    _stem = stem

    def stem_arrays(tokens: pd.Series) -> pd.Series:
        # per-batch memo: vocabularies are tiny relative to the token
        # stream, so the stemmer runs ~once per distinct token (a plain
        # dict, not lru_cache — a wrapper would break by-value pickling)
        cache: dict[str, str] = {}

        def cached(t: str) -> str:
            r = cache.get(t)
            if r is None:
                r = _stem(t)
                cache[t] = r
            return r

        return tokens.map(
            lambda arr: None if arr is None else [cached(t) for t in arr]
        )

    return F.pandas_udf(stem_arrays, ArrayType(StringType()))


# asNondeterministic: the optimizer otherwise SPLITS filters that
# reference the stemmed column (with_keys_column's length(key) > 0)
# and re-evaluates the UDF below the pushed filter — the round-10
# before-plans show every grounding stream paying stem_arrays TWICE
# (e.g. plans/r10/evidence_pipeline_before.txt nodes 102+105, 111+114,
# 120+123, 129+132).  Marking the UDF non-deterministic forbids the
# duplication (guide §4.4); the computed value is unchanged.
_stem_tokens = _make_stem_udf().asNondeterministic()


# ---------------------------------------------------------------------------
# expression staging (round 10): every helper below assembles its whole
# expression as ONE SQL string parsed JVM-side (the layout.py staging
# policy).  A Python-lambda higher-order function costs ~25 ms of py4j
# round-trips PER CALL to build (measured: 50 HOF builds = 1.35 s of the
# grounding chain's 3.4 s driver-side construction), and Column.isin over
# the 340-word stopword list creates one JVM literal per word; an f-string
# rendering of the same expression is one round-trip.  The SQL text
# parses to the identical Catalyst expression the lambda API produced —
# values are unchanged (gated by the full oracle suite).
# ---------------------------------------------------------------------------


def _sql_str(s: str) -> str:
    """Render a Python string as a Spark SQL single-quoted literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


_STOP_IN_SQL = "(" + ",".join(_sql_str(w) for w in ALL_STOP_WORDS) + ")"


def _nonempty_sql(arr: str) -> str:
    return f"filter({arr}, _t -> _t IS NOT NULL AND _t != '')"


def _token_terms_sql(text: str) -> str:
    return _nonempty_sql(
        f"transform(split({text}, {_sql_str(_TT_SPLIT)}),"
        f" _t -> regexp_replace(lower(_t), {_sql_str(_CLEANUP)}, ''))"
    )


def _label_terms_unstemmed_sql(text: str) -> str:
    kept = (
        f"filter(split({text}, {_sql_str(_LT_SPLIT)}),"
        f" _t -> NOT (_t IN {_STOP_IN_SQL}))"
    )
    return _nonempty_sql(
        f"transform({kept},"
        f" _t -> regexp_replace(lower(_t), {_sql_str(_CLEANUP)}, ''))"
    )


def frozen_stem_terms(arr: Column) -> Column:
    """Frozen-map stemmer strategy (VERDICT r9 item 4 — the
    w2v_frozen / PQ-codebook build-once pattern applied to the
    pipeline's single Python stage): stems each token via the
    STEM_FROZEN lookup (functions/stem_frozen.py, built once by
    tools/build_frozen_stems.py from the fixture label vocabulary),
    coalescing unseen tokens to identity.  Pure Catalyst — a map
    literal probed per element inside ``transform`` — so a pipeline
    run with this strategy is fully SQL-replayable: the DuckDB oracle
    carries the same pairs and the same identity fallback, making
    the two engines identical at ANY scale factor by construction
    (out-of-vocabulary tokens pass through unstemmed on BOTH sides).
    Interchangeable with the Porter UDF wherever the vocabulary is
    covered; the live-Porter path remains the production default."""
    from platform_etl_literature_spark.functions.stem_frozen import (
        STEM_FROZEN,
    )

    if not STEM_FROZEN:
        return arr
    m = F.map_from_arrays(
        F.lit([t for t, _ in STEM_FROZEN]),
        F.lit([s for _, s in STEM_FROZEN]),
    )
    return F.transform(arr, lambda t: F.coalesce(m[t], t))


def _nonempty(arr: Column) -> Column:
    return F.filter(arr, lambda t: t.isNotNull() & (t != ""))


def token_terms(text: Column | str) -> Column:
    """TT branch: symbol tokens — split, lowercase, strip punctuation.

    Accepts a column NAME (fast path: one staged SQL expression) or a
    Column (compat path for composed expressions)."""
    if isinstance(text, str):
        return F.expr(_token_terms_sql(f"`{text}`"))
    toks = F.split(text, _TT_SPLIT)
    return _nonempty(
        F.transform(toks, lambda t: F.regexp_replace(F.lower(t), _CLEANUP, ""))
    )


def label_terms_unstemmed(text: Column | str) -> Column:
    """LT branch before stemming: split, case-sensitive stopword
    removal (on raw tokens, as the reference cleans before lowering),
    lowercase, strip punctuation.  Accepts a column NAME (fast staged
    path) or a Column (compat path)."""
    if isinstance(text, str):
        return F.expr(_label_terms_unstemmed_sql(f"`{text}`"))
    toks = F.split(text, _LT_SPLIT)
    kept = F.filter(toks, lambda t: ~t.isin(ALL_STOP_WORDS))
    return _nonempty(
        F.transform(kept, lambda t: F.regexp_replace(F.lower(t), _CLEANUP, ""))
    )


def normalise_sentence(
    df: DataFrame, text_col: str, prefix: str, stemmer=None
) -> DataFrame:
    """Add ``{prefix}_TT`` and ``{prefix}_LT`` token-array columns —
    the capability of ``Grounding.normaliseSentence`` (:144-158) +
    the NLP pipeline, with stemming as the single Python stage.

    ``stemmer`` (Column → Column over the unstemmed LT token array)
    defaults to the Porter pandas UDF; pass
    :func:`frozen_stem_terms` for the SQL-replayable frozen-map
    strategy."""
    st = stemmer if stemmer is not None else _stem_tokens
    return df.select(
        "*",
        token_terms(text_col).alias(f"{prefix}_{TOKEN_T}"),
        st(label_terms_unstemmed(text_col)).alias(f"{prefix}_{LABEL_T}"),
    )


def generate_key(prefix: str, key_type: Column) -> Column:
    """Grounding key from the token columns (Grounding.scala:367-387):
    LT → sorted-distinct concatenation; TT → order-preserving
    concatenation."""
    lt_key = F.expr(
        "array_join(array_sort("
        + _nonempty_sql(f"array_distinct(`{prefix}_{LABEL_T}`)")
        + "), '')"
    )
    tt_key = F.expr(
        "array_join(" + _nonempty_sql(f"`{prefix}_{TOKEN_T}`") + ", '')"
    )
    return F.when(key_type == LABEL_T, lt_key).when(
        key_type == TOKEN_T, tt_key
    )


def with_keys_column(
    df: DataFrame, prefix: str, key_column: str, key_type_col: str = "keyType"
) -> DataFrame:
    """Attach the grounding key and drop empty keys
    (Grounding.generateKeysColumn:367-387)."""
    out = df.withColumn(key_column, generate_key(prefix, F.col(key_type_col)))
    return out.filter(
        F.col(key_column).isNotNull() & (F.length(key_column) > 0)
    )
