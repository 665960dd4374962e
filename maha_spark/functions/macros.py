"""DerivedFunction-parity macro language.

The reference's Druid derived functions (core/.../DerivedFunction.scala:
GET_INTERVAL_DATE:21, DAY_OF_WEEK:49, DATETIME_FORMATTER:64,
DECODE_DIM:81, REGEX:141, plus PostResultFunction.scala
START_OF_THE_WEEK:117 / START_OF_THE_MONTH:149) are query-time dimension
extraction functions. Here each is a textual macro over Spark SQL: cube
authors write ``GET_INTERVAL_DATE({col}, 'M')`` in a derived expression
and ``expand_macros`` rewrites it into the built-in (JVM codegen)
equivalent -- no UDF, no extraction-function runtime.

Macros expand AFTER {placeholder} substitution, on plain SQL text, so any
derived column / filter expression can use them. The JAVASCRIPT /
JAVASCRIPT_WITH_LIST_OF_FIELDS functions (DerivedFunction.scala:113,128)
have no textual equivalent -- their intent (arbitrary per-row logic) maps
to a registered UDF (see functions.register_udf) referenced by name in
the same expressions.
"""

from __future__ import annotations

import re
from typing import Callable

_MACRO_NAME = re.compile(r"\b([A-Z][A-Z0-9_]{2,})\s*\(")


def _split_args(argstr: str) -> list[str]:
    """Split a macro argument list on top-level commas (paren/quote aware)."""
    args, depth, cur, i, n = [], 0, [], 0, len(argstr)
    in_str: str | None = None
    while i < n:
        ch = argstr[i]
        if in_str:
            cur.append(ch)
            if ch == in_str:
                in_str = None
        elif ch in "'\"":
            in_str = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        args.append("".join(cur).strip())
    return args


def _balanced(s: str) -> bool:
    """True when parens in ``s`` are balanced and never go negative —
    guards stripping an outer paren pair that actually spans the text."""
    depth = 0
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0


def _unquote(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
        return s[1:-1]
    return s


_GRAIN = {"D": "day", "DAY": "day", "W": "week", "WEEK": "week",
          "M": "month", "MONTH": "month", "YR": "year", "YEAR": "year"}


def _get_interval_date(args: list[str]) -> str:
    """GET_INTERVAL_DATE(col, 'D'|'W'|'M'|'YR') (DerivedFunction.scala:21;
    Oracle renderer DerivedExpression.scala:698)."""
    col, fmt = args[0], _unquote(args[1]).upper()
    grain = _GRAIN.get(fmt)
    if grain is None:
        raise ValueError(f"GET_INTERVAL_DATE: unknown grain {fmt!r}")
    return f"CAST(date_trunc('{grain}', {col}) AS DATE)"


def _day_of_week(args: list[str]) -> str:
    """DAY_OF_WEEK(col) -> full day name (DerivedFunction.scala:49)."""
    return f"date_format({args[0]}, 'EEEE')"


def _datetime_formatter(args: list[str]) -> str:
    """DATETIME_FORMATTER(col, index, length): substring of the formatted
    'yyyy-MM-dd HH' rendering (DerivedFunction.scala:64)."""
    col, idx, length = args[0], int(_unquote(args[1])), int(_unquote(args[2]))
    return (f"substring(date_format({col}, 'yyyy-MM-dd HH:mm:ss'), "
            f"{idx + 1}, {length})")


def _decode_dim(args: list[str]) -> str:
    """DECODE_DIM(col, v1, r1[, v2, r2 ...][, default])
    (DerivedFunction.scala:81; Oracle DECODE)."""
    col, rest = args[0], args[1:]
    pairs, default = rest, "NULL"
    if len(rest) % 2 == 1:
        pairs, default = rest[:-1], rest[-1]
    branches = " ".join(
        f"WHEN ({col}) = {pairs[i]} THEN {pairs[i + 1]}"
        for i in range(0, len(pairs), 2))
    return f"CASE {branches} ELSE {default} END"


def _regex(args: list[str]) -> str:
    """REGEX(col, 'pattern', index) (DerivedFunction.scala:141)."""
    col, pat = args[0], args[1]
    idx = int(_unquote(args[2])) if len(args) > 2 else 1
    return f"regexp_extract({col}, {pat}, {idx})"


def _start_of_week(args: list[str]) -> str:
    """START_OF_THE_WEEK (PostResultFunction.scala:117)."""
    return f"CAST(date_trunc('week', {args[0]}) AS DATE)"


def _start_of_month(args: list[str]) -> str:
    """START_OF_THE_MONTH (PostResultFunction.scala:149)."""
    return f"CAST(date_trunc('month', {args[0]}) AS DATE)"


def _time_format(args: list[str]) -> str:
    """DRUID_TIME_FORMAT / TIME_FORMAT_WITH_REQUEST_CONTEXT
    (DerivedFunction.scala:296,332): format a time column; the request
    timezone is already applied to the column by the planner."""
    fmt = args[1] if len(args) > 1 else "'yyyy-MM-dd'"
    return f"date_format({args[0]}, {fmt})"


#: ISO-8601 period -> Spark date_trunc unit (the Druid granularities the
#: reference's cubes use; DRUID_TIME_FORMAT_WITH_PERIOD_GRANULARITY)
_PERIODS = {"PT1H": "hour", "PT1M": "minute", "P1D": "day", "P1W": "week",
            "P1M": "month", "P3M": "quarter", "P1Y": "year"}


def _time_format_with_period(args: list[str]) -> str:
    """TIME_FORMAT_WITH_PERIOD_GRANULARITY(col, 'fmt', 'P1D'[, tz])
    (DRUID_TIME_FORMAT_WITH_PERIOD_GRANULARITY, DerivedFunction.scala:311):
    truncate the time column to the ISO period's granularity, then render
    — Druid's period-granularity extraction collapses to date_trunc +
    date_format. A tz argument shifts before truncation (Druid applies
    the zone to bucket boundaries)."""
    col, fmt = args[0], args[1]
    period = _unquote(args[2]).upper()
    unit = _PERIODS.get(period)
    if unit is None:
        raise ValueError(f"TIME_FORMAT_WITH_PERIOD_GRANULARITY: "
                         f"unsupported period {period!r}")
    if len(args) > 3:
        col = f"from_utc_timestamp({col}, {args[3]})"
    return f"date_format(date_trunc('{unit}', {col}), {fmt})"


#: request-scoped textual replacements for COL_W_REPLACEMENTS columns
#: (additionalParameters.AdditionalColumnInfo — QueryGenerator.scala:399
#: overrideRenderedColWithCtx applies them ONLY to COL_W_REPLACEMENTS
#: expressions). The planner sets this around plan construction
#: (driver-side, synchronous), so macro expansion sees the request ctx.
import contextvars as _contextvars

_CTX_REPLACEMENTS: "_contextvars.ContextVar[tuple]" =     _contextvars.ContextVar("maha_col_ctx_replacements", default=())


def set_ctx_replacements(pairs):
    """Install (field, value) replacement pairs for the current plan
    construction; returns a token for ``reset_ctx_replacements``."""
    return _CTX_REPLACEMENTS.set(tuple(pairs))


def reset_ctx_replacements(token) -> None:
    _CTX_REPLACEMENTS.reset(token)


#: backstop charset for request-supplied replacement VALUES (primary
#: validation raises ValidationError in build_request_model): identifier
#: shapes only — no quotes/backticks (string-literal breakout), no
#: parens (function calls), no dashes (comment truncation). The
#: reference's blunt replaceAll would otherwise let a request splice
#: arbitrary Spark SQL (e.g. reflect(...)) into the plan.
_SAFE_REPLACEMENT = re.compile(r"^[A-Za-z0-9_. ]*$")


def _col_w_replacements(args: list[str]) -> str:
    """COL_W_REPLACEMENTS(sql[, hasRollup[, hasNumeric]]): a raw-SQL
    column whose {placeholders} were already substituted upstream. The
    request's AdditionalColumnInfo pairs textually replace their field
    tokens here — the reference applies the same blunt replaceAll, and
    only to COL_W_REPLACEMENTS expressions (QueryGenerator.scala:
    403-411, useCtxt). The trailing reference flags (rollup/numeric
    rendering hints, DerivedExpression.scala Hive:532 Presto:376
    Bigquery:1449) have no Spark analog and are ignored."""
    sql = args[0]
    for fld, value in _CTX_REPLACEMENTS.get():
        if not _SAFE_REPLACEMENT.match(value):
            raise ValueError(
                f"AdditionalColumnInfo value for {fld!r} contains "
                "characters outside the allowed identifier/literal set")
        # word-boundary replace: a short field token must never strip
        # substrings out of authored SQL words (field 'de' would
        # otherwise turn decode() into code())
        # the charset above forbids backslashes and group refs, so the
        # value is safe as a literal re.sub replacement
        sql = re.sub(
            rf"(?<![A-Za-z0-9_]){re.escape(fld)}(?![A-Za-z0-9_])",
            value, sql)
    return sql


def _time_format_with_timezone(args: list[str]) -> str:
    """TIME_FORMAT_WITH_TIMEZONE(col, inputFmt, outputFmt[, tz])
    (DerivedExpression.scala Hive:578, Presto:404): parse ``col`` with
    inputFmt, interpret as UTC, shift to ``tz``, render with outputFmt —
    the Hive from_unixtime/from_utc_timestamp chain collapses to Spark
    builtins."""
    col, infmt, outfmt = args[0], args[1], args[2]
    tz = args[3] if len(args) > 3 else "'UTC'"
    return (f"date_format(from_utc_timestamp(to_timestamp({col}, {infmt}), "
            f"{tz}), {outfmt})")


#: Oracle date-format tokens -> Spark datetime pattern letters, longest
#: first so e.g. HH24 wins over HH
_ORACLE_FMT = [("YYYY", "yyyy"), ("YY", "yy"), ("MM", "MM"), ("DD", "dd"),
               ("HH24", "HH"), ("HH12", "hh"), ("HH", "hh"), ("MI", "mm"),
               ("SS", "ss"), ("MON", "MMM"), ("DY", "EEE")]


def _to_char(args: list[str]) -> str:
    """TO_CHAR(col, 'fmt') (Oracle DerivedExpression.scala:830, Postgres
    :283): date rendering with Oracle format tokens translated to the
    Spark pattern alphabet."""
    fmt = _unquote(args[1])
    out, i = [], 0
    while i < len(fmt):
        for tok, rep in sorted(_ORACLE_FMT, key=lambda t: -len(t[0])):
            if fmt[i:i + len(tok)].upper() == tok:
                out.append(rep)
                i += len(tok)
                break
        else:
            out.append(fmt[i])
            i += 1
    return f"date_format({args[0]}, '{''.join(out)}')"


def _compare_percentage(args: list[str]) -> str:
    """COMPARE_PERCENTAGE(a, b, pct, 'label', next)
    (DerivedExpression.scala Oracle:813, Postgres:266): banded labeling —
    ``a < pct/100 * b`` yields the label, otherwise the next expression
    (itself usually another COMPARE_PERCENTAGE, whose generated CASE
    collapses into one chain exactly like the reference's
    ``replaceAll(" CASE", "")``)."""
    a, b, pct, label = args[0], args[1], int(_unquote(args[2])), args[3]
    nxt = args[4] if len(args) > 4 else "NULL"
    inner = nxt.strip()
    # nested chains arrive either as an already-expanded CASE (wrapped in
    # the expander's parens) or as raw macro text expanded on a later
    # pass; expand NOW so the chains collapse into one CASE like the
    # reference's replaceAll(" CASE", "")
    if _MACRO_NAME.search(inner):
        inner = expand_macros(inner)
    while (inner.startswith("(") and inner.endswith(")")
           and _balanced(inner[1:-1])):
        inner = inner[1:-1].strip()
    if inner.upper().startswith("CASE ") and inner.upper().endswith(" END"):
        # collapse nested CASE chains into one (reference behavior)
        inner = inner[4:-4].strip()
        return (f"CASE WHEN {a} < {pct / 100.0} * {b} THEN {label} "
                f"{inner} END")
    return (f"CASE WHEN {a} < {pct / 100.0} * {b} THEN {label} "
            f"ELSE {inner if inner else nxt} END")


def _weighted_video_shown(args: list[str]) -> str:
    """GET_WEIGHTED_VIDEO_SHOWN(v25, v50, v75, v100)
    (Oracle DerivedExpression.scala:836)."""
    v25, v50, v75, v100 = args[:4]
    return (f"(( 25 * {v25} ) + ( 50 * {v50} ) + ( 75 * {v75}) "
            f"+ (100 * {v100}))")


def _video_shown_sum(args: list[str]) -> str:
    """GET_VIDEO_SHOWN_SUM(v25, v50, v75, v100)
    (Oracle DerivedExpression.scala:842)."""
    v25, v50, v75, v100 = args[:4]
    return f"({v25} + {v50} + {v75} + {v100})"


MACROS: dict[str, Callable[[list[str]], str]] = {
    "GET_INTERVAL_DATE": _get_interval_date,
    "DAY_OF_WEEK": _day_of_week,
    "DATETIME_FORMATTER": _datetime_formatter,
    "DECODE_DIM": _decode_dim,
    "REGEX": _regex,
    "START_OF_THE_WEEK": _start_of_week,
    "START_OF_THE_MONTH": _start_of_month,
    "TIME_FORMAT": _time_format,
    "COL_W_REPLACEMENTS": _col_w_replacements,
    "TIME_FORMAT_WITH_TIMEZONE": _time_format_with_timezone,
    "TO_CHAR": _to_char,
    "COMPARE_PERCENTAGE": _compare_percentage,
    "TIME_FORMAT_WITH_PERIOD_GRANULARITY": _time_format_with_period,
    "GET_WEIGHTED_VIDEO_SHOWN": _weighted_video_shown,
    "GET_VIDEO_SHOWN_SUM": _video_shown_sum,
}


def expand_macros(sql: str, max_depth: int = 8) -> str:
    """Rewrite every MACRO(arg, ...) call into its Spark SQL equivalent.
    Iterates to a fixpoint so macros may nest."""
    for _ in range(max_depth):
        out, changed = _expand_once(sql)
        if not changed:
            return out
        sql = out
    raise ValueError(f"macro expansion did not converge: {sql[:120]}")


def _expand_once(sql: str) -> tuple[str, bool]:
    m = _MACRO_NAME.search(sql)
    while m is not None:
        name = m.group(1)
        fn = MACROS.get(name)
        if fn is None:
            m = _MACRO_NAME.search(sql, m.end())
            continue
        # find the balanced closing paren
        depth, i = 1, m.end()
        in_str: str | None = None
        while i < len(sql) and depth:
            ch = sql[i]
            if in_str:
                if ch == in_str:
                    in_str = None
            elif ch in "'\"":
                in_str = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        if depth:
            raise ValueError(f"unbalanced parens in macro call: {sql[m.start():][:80]}")
        args = _split_args(sql[m.end():i - 1])
        replacement = "(" + fn(args) + ")"
        return sql[:m.start()] + replacement + sql[i:], True
    return sql, False
