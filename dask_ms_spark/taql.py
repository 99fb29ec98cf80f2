"""TAQL ``taql_where`` → Spark SQL translation (migration aid).

The reference's row filter is a TAQL boolean expression evaluated by
casacore before any column I/O (``taql_where=`` in
``xds_from_table``, daskms/dask_ms.py:236-241; daskms/ordering.py:
68-71, 180-183).  Most TAQL predicates users write — column
comparisons, boolean algebra, IN-lists, array element/slice access,
``SUMSQR`` — are expressible in Spark SQL, where Catalyst gives the
same "filter before I/O" property via parquet predicate pushdown
(P2).  This module translates the common subset mechanically so an
existing ``taql_where`` string keeps working:

    ``ANTENNA1 != ANTENNA2 && FIELD_ID IN [0,2]``
        → ``ANTENNA1 != ANTENNA2 AND FIELD_ID IN (0,2)``
    ``SUMSQR(UVW[:2]) < 1e6``
        → ``aggregate(slice(UVW, 1, 2), CAST(0 AS DOUBLE),
                      (__a, __v) -> __a + __v * __v) < 1e6``
    ``!FLAG_ROW``  → ``NOT FLAG_ROW``
    ``UVW[0]``     → ``element_at(UVW, 1)``        (TAQL is 0-based)
    ``UVW[1:3]``   → ``slice(UVW, 2, 2)``          (end-exclusive)

Supported subset (raise otherwise so nothing silently mistranslates):
``&& || !`` and word-form AND/OR/NOT, comparison and arithmetic
operators, parenthesised (derived) expressions, IN ``[...]`` lists of
literals and ``NOT IN``, ``BETWEEN a AND b`` / ``NOT BETWEEN``,
SQL-style ``LIKE`` (passes through — TAQL LIKE follows SQL), TAQL
pattern matching ``~ p/glob/`` (glob → LIKE), ``~ m/regex/``
(→ RLIKE), ``~ f/literal/`` (exact) and the negations ``!~ ...``,
0-based integer element access and ``[a:b]``/``[:b]``/``[a:]``
slices on array columns, the array reductions ``SUMSQR``/
``SUMSQUARE`` (``SUM``/``MIN``/``MAX``/``MEAN`` over array arguments
are left for Spark's own functions when names coincide), and the
date/time helpers ``DATETIME('YYYY/MM/DD[/hh:mm:ss]')`` /
``MJD('...')``: because MS TIME columns carry Modified-Julian-Date
SECONDS (the casacore epoch convention the reference's tables use),
``DATETIME(...)`` folds to the MJD-seconds double constant and
``MJD(...)`` to MJD days — the same comparisons casacore performs
after its unit conversion, now constant-folded at translation time;
``~=`` / ``!~=`` near-(in)equality (casacore NEAR with the Note-199
default 1e-5 relative tolerance → ``abs(a-b) <= 1e-5 *
greatest(abs(a), abs(b))``); interval membership ``X [NOT] IN
[a=:=b]`` with ``=`` (inclusive) / ``<`` (exclusive) bound markers
→ the equivalent comparison conjunction; and nested queries
``X IN [SELECT [DISTINCT] col FROM table [WHERE ...]]`` → Spark
IN-subqueries (Catalyst plans a semi-join; ``::SUBTABLE`` maps to
the bare registered view name, ``ROWID()`` to the ROWID column, and
the inner WHERE recurses through the translator); and the casacore
array-reduction predicates ``ANY``/``ALL``/``NTRUE``/``NFALSE``/
``NELEMENTS`` over array columns (→ ``exists``/``forall``/
``size(filter(...))``/``size`` — the flagging idioms like
``!ALL(FLAG)``); and, when a schema is bound via ``schema=``, the
array aggregates ``SUM/MIN/MAX/MEAN(arraycol)`` → higher-order
reductions (``aggregate``/``array_min``/``array_max``) — without a
schema those names collide with the SQL aggregates and a bare call
raises with guidance (``xds_from_storage_table`` binds the schema
automatically for local parquet/zarr/casa stores); inside those
aggregates the operand may be wrapped in elementwise functions
(``ABS``/``SQRT``/``SQUARE``/``EXP``/``LOG``/``LOG10``/``FLOOR``/
``CEIL``/``COS``/``SIN`` → ``transform`` lambdas) or the complex
views ``AMPLITUDE``/``PHASE``/``ARG``/``REAL``/``IMAG`` over the
engine's interleaved re/im layout — so the casacore flagging idiom
``mean(abs(DATA))`` translates as ``MEAN(AMPLITUDE(DATA))`` (real
arrays: ``MEAN(ABS(SIGMA))``).
Tier 7 (round 10): **unit quantities** — an unquoted number followed
by a unit name (``5deg``, ``1.5GHz``, ``30 arcsec``) folds to a double
literal at translation time, normalised to the engine's column
conventions (angles → RADIANS, matching the mscal derived columns
below and casacore's internal angle unit; time → seconds, the MS TIME
MJD-seconds convention; length → metres, the UVW convention;
frequency → Hz) — casacore instead converts to the other operand's
declared unit, which for MS columns is the same target; and **mscal
derived columns** — ``MSCAL.HA``/``HA1``/``HA2``, ``PA``/``PA1``/
``PA2``, ``AZEL1``/``AZEL2`` (casacore's mscal TAQL extension, the
grammar the reference gets free because casacore evaluates its
taql_where) translate to the spherical-trigonometry SQL of
``functions/mscal.py`` (USNO GMST short form), in RADIANS like the
casacore originals, with the site/direction geometry supplied via the
``mscal=`` argument (``{"lon_deg", "lat_deg", "ra_deg", "dec_deg"[,
"time_col"]}`` — casacore reads these from the ANTENNA/FIELD
subtables; this engine has no implicit table context inside a
predicate string, so they bind explicitly and fold to literals).
``AZEL1`` is the 2-element ``[az, el]`` array (north-through-east
azimuth), so ``MSCAL.AZEL1[1] > 30deg`` is the elevation cut (the
quantity must be UNQUOTED — see NOT covered below).
Under a single supplied site, ``HA1``/``HA2`` (antenna 1/2) coincide
by construction.

``MSCAL.UVW``/``UVW_J2000`` (r11) is the Thompson-Moran-Swenson
baseline rotation ``[u, v, w]`` — casacore derives the equatorial
baseline from the ANTENNA subtable, so the three per-row baseline
component column names bind explicitly via ``mscal={..., "bx_col",
"by_col", "bz_col"}``; units follow the baseline columns (casacore
UVW is meters).

NOT covered (translate by hand): bare date/time literals
(``2016/01/01``, ``10:30:00`` — write ``DATETIME('2016/01/01')``),
quoted quantity strings (``'5deg'`` stays a string literal — write
the unquoted casacore form ``5deg``) and mscal derived columns other
than HA*/PA*/AZEL*/UVW* (LAST, ITRF, ...).  Multi-table nested
selects (``X IN [SELECT a.C FROM ::TAB1 a, ::TAB2 b WHERE ...]``)
are covered as of r12 — each FROM item is a registered view, the
comma join plans as a Catalyst equi-join under the WHERE equality.
"""

from __future__ import annotations

import datetime as _dt
import re

__all__ = ["taql_where_to_sql"]

_TOKEN = re.compile(r"""
    \s*(
        [pmf]/[^/]*/       |   # TAQL pattern literal p// m// f//
        '[^']*'            |   # string literal
        "[^"]*"            |   # string literal
        \d+\.\d*(?:[eE][+-]?\d+)? |
        \.\d+(?:[eE][+-]?\d+)?    |
        \d+(?:[eE][+-]?\d+)?      |
        [A-Za-z_][A-Za-z_0-9]*    |
        &&|\|\||==|!=|>=|<=|~=|!~|<|>|=|
        [()\[\],:+\-*/%!~.]
    )""", re.VERBOSE)

# bare TAQL date literals would tokenise as integer DIVISION and
# silently mistranslate (2016/01/01 == 2016); refuse them up front
_BARE_DATE = re.compile(r"\b\d{4}[/-]\d{1,2}[/-]\d{1,2}\b(?![\d'])")


def _tokenize(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            raise ValueError(
                f"taql_where_to_sql: cannot tokenise {s[pos:pos+20]!r} "
                "(unsupported TAQL syntax — translate this predicate "
                "by hand; see module docstring for the subset)")
        out.append(m.group(1))
        pos = m.end()
    return out


def _match_bracket(toks: list[str], i: int, open_b: str,
                   close_b: str) -> int:
    """Index of the bracket matching ``toks[i]``."""
    depth = 0
    for j in range(i, len(toks)):
        if toks[j] == open_b:
            depth += 1
        elif toks[j] == close_b:
            depth -= 1
            if depth == 0:
                return j
    raise ValueError(f"unbalanced {open_b!r} in taql_where expression")


_SUM_SQR = ("aggregate({x}, CAST(0 AS DOUBLE), "
            "(__a, __v) -> __a + __v * __v)")

# casacore array-reduction predicates (tier 5) — the flagging-workflow
# idioms (`!ALL(FLAG)`, `NTRUE(FLAG) < NELEMENTS(FLAG)/2`).  Mapped to
# Spark's higher-order array functions; SUM/MIN/MAX/MEAN are
# deliberately NOT mapped (their names collide with SQL aggregates —
# an ambiguity this translator refuses rather than guesses).
_ARRAY_REDUCTIONS = {
    "ANY": "exists({x}, __v -> __v)",
    "ALL": "forall({x}, __v -> __v)",
    "NTRUE": "size(filter({x}, __v -> __v))",
    "NFALSE": "size(filter({x}, __v -> NOT __v))",
    "NELEMENTS": "size({x})",
}

# casacore array aggregates SUM/MIN/MAX/MEAN (Note 199) — their names
# collide with SQL aggregates, so they are translated ONLY when the
# operand's root column is known (via the ``schema=`` argument) to be
# an ArrayType; otherwise the name is left for Spark's own aggregate
# and a bare ambiguous call raises with guidance.  SUM/MEAN cast
# elements to double (numeric arrays; boolean counting is NTRUE).
_ARRAY_AGGS = {
    "SUM": ("aggregate({x}, CAST(0 AS DOUBLE), "
            "(__a, __v) -> __a + CAST(__v AS DOUBLE))"),
    "MIN": "array_min({x})",
    "MAX": "array_max({x})",
    "MEAN": ("(aggregate({x}, CAST(0 AS DOUBLE), "
             "(__a, __v) -> __a + CAST(__v AS DOUBLE)) "
             "/ CAST(size({x}) AS DOUBLE))"),
}

# Tier 7: unit quantities (casacore Note 199 — `5deg`, `1.5GHz`).
# Factors normalise to the engine's column conventions: angles to
# RADIANS (the casacore internal angle unit and what the mscal
# derived columns below emit), time to SECONDS (MS TIME is MJD
# seconds), length to METRES (UVW), frequency to Hz.  Case-sensitive,
# like casacore units.  The fold happens driver-side so Spark and any
# SQL oracle see the identical double literal (engine-exact
# discipline, SCALE.md).
import math as _math

_UNIT_FACTORS = {
    "rad": 1.0, "deg": _math.pi / 180.0,
    "arcmin": _math.pi / 10800.0, "arcsec": _math.pi / 648000.0,
    "s": 1.0, "ms": 1e-3, "min": 60.0, "h": 3600.0, "d": 86400.0,
    "m": 1.0, "km": 1e3, "cm": 1e-2, "mm": 1e-3,
    "Hz": 1.0, "kHz": 1e3, "MHz": 1e6, "GHz": 1e9,
}

_NUMBER = re.compile(
    r"^(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?$")

# mscal derived columns (tier 7): name -> builder(ctx) emitting the
# functions/mscal.py formulas as SQL, angles in RADIANS (casacore
# convention).  Site/direction constants fold to double literals
# driver-side; only the per-row hour-angle trigonometry runs
# engine-side.
_MSCAL_NAMES = ("HA", "HA1", "HA2", "PA", "PA1", "PA2",
                "AZEL1", "AZEL2", "UVW", "UVW_J2000")


def _mscal_sql(name: str, ctx: dict) -> str:
    need = ("lon_deg", "lat_deg", "ra_deg", "dec_deg")
    missing = [k for k in need if k not in ctx]
    if missing:
        raise ValueError(
            f"taql_where_to_sql: MSCAL.{name} needs geometry keys "
            f"{missing} in the mscal= argument (casacore reads them "
            "from the ANTENNA/FIELD subtables; a predicate string "
            "has no table context, so they bind explicitly)")
    time_col = ctx.get("time_col", "TIME")
    lon = float(ctx["lon_deg"])
    lat = _math.radians(float(ctx["lat_deg"]))
    dec = _math.radians(float(ctx["dec_deg"]))
    ra = float(ctx["ra_deg"])

    # functions/mscal.py gmst_hours/hour_angle_deg, inlined:
    # D = MJD(UT) - 51544.5 days;  GMST_h = wrap(a + b * D, 24);
    # HA_deg = wrap(GMST_h * 15 + lon - ra, 360) -> (-180, 180]
    d = f"(CAST({time_col} AS DOUBLE) / 86400.0 - 51544.5)"
    gm = (f"(18.697374558 + 24.06570982441908 * {d})")
    gmst = f"((({gm} % 24.0) + 24.0) % 24.0)"
    lst_m_ra = f"({gmst} * 15.0 + {lon!r} - {ra!r})"
    w = f"((({lst_m_ra} % 360.0) + 360.0) % 360.0)"
    ha_deg = (f"(CASE WHEN {w} > 180.0 THEN {w} - 360.0 "
              f"ELSE {w} END)")
    ha = f"radians({ha_deg})"
    if name.startswith("HA"):
        return ha
    sin_lat, cos_lat = repr(_math.sin(lat)), repr(_math.cos(lat))
    tan_lat = repr(_math.tan(lat))
    sin_dec, cos_dec = repr(_math.sin(dec)), repr(_math.cos(dec))
    if name.startswith("UVW"):
        # r11 (r10 verdict item 6): the Thompson-Moran-Swenson
        # baseline rotation (operators/calibration.py
        # uvw_from_baseline, the same SQL q_uvw_compute oracles) —
        # [u, v, w] in the baseline columns' units (casacore UVW is
        # meters).  casacore derives the equatorial baseline from the
        # ANTENNA subtable; a predicate string has no table context,
        # so the three per-row baseline component COLUMN NAMES bind
        # explicitly alongside the scalar geometry.
        bl_need = ("bx_col", "by_col", "bz_col")
        bl_missing = [k for k in bl_need if k not in ctx]
        if bl_missing:
            raise ValueError(
                f"taql_where_to_sql: MSCAL.{name} needs the "
                f"baseline component column names {bl_missing} in "
                "the mscal= argument (casacore reads the equatorial "
                "baseline from the ANTENNA subtable positions)")
        bx, by, bz = (f"CAST({ctx[k]} AS DOUBLE)" for k in bl_need)
        # sin/cos literals can be negative: always parenthesise so a
        # leading unary minus cannot fuse into an SQL `--` comment
        u = f"(sin({ha}) * {bx} + cos({ha}) * {by})"
        v = (f"((-({sin_dec})) * cos({ha}) * {bx} + ({sin_dec}) "
             f"* sin({ha}) * {by} + ({cos_dec}) * {bz})")
        w_ = (f"(({cos_dec}) * cos({ha}) * {bx} - ({cos_dec}) "
              f"* sin({ha}) * {by} + ({sin_dec}) * {bz})")
        return f"array({u}, {v}, {w_})"
    if name.startswith("PA"):
        return (f"atan2(sin({ha}), {tan_lat} * {cos_dec} "
                f"- {sin_dec} * cos({ha}))")
    # AZEL: [azimuth (north through east, [0, 2pi)), elevation]
    el = (f"asin({sin_lat} * {sin_dec} + {cos_lat} * {cos_dec} "
          f"* cos({ha}))")
    az0 = (f"atan2(-{cos_dec} * sin({ha}), "
           f"{sin_dec} * {cos_lat} - {cos_dec} * cos({ha}) "
           f"* {sin_lat})")
    two_pi = repr(2.0 * _math.pi)
    az = f"((({az0} % {two_pi}) + {two_pi}) % {two_pi})"
    return f"array({az}, {el})"


# casacore epoch: MJD 0 = 1858-11-17 00:00 UTC
_MJD_EPOCH = _dt.datetime(1858, 11, 17)

_DT_FORM = re.compile(
    r"^(\d{4})[/-](\d{1,2})[/-](\d{1,2})"
    r"(?:[/T ](\d{1,2}):(\d{1,2})(?::(\d{1,2}(?:\.\d+)?))?)?$")


def _taql_datetime_seconds(lit: str) -> float:
    """Parse a TAQL/ISO date(-time) string literal to MJD seconds."""
    txt = lit.strip().strip("'\"")
    m = _DT_FORM.match(txt)
    if not m:
        raise ValueError(
            f"taql_where_to_sql: cannot parse date/time {txt!r} — "
            "expected 'YYYY/MM/DD[/hh:mm[:ss[.f]]]' (or ISO '-'/'T' "
            "separators)")
    base = _dt.datetime(int(m.group(1)), int(m.group(2)),
                        int(m.group(3)), int(m.group(4) or 0),
                        int(m.group(5) or 0))
    return ((base - _MJD_EPOCH).total_seconds()
            + float(m.group(6) or 0.0))


def _glob_to_like(pat: str) -> str:
    """TAQL p// glob -> SQL LIKE pattern: * -> %, ? -> _, with SQL
    wildcard characters in the glob escaped."""
    out = []
    for ch in pat:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def _emit_pattern_match(base: str, pat_tok: str, negate: bool) -> str:
    """``base ~ p/glob/`` / ``m/regex/`` / ``f/literal/`` -> Spark SQL
    (TAQL pattern operators, casacore Note 199; the reference gets
    them free from casacore).  Negation is spelled INFIX (``NOT
    LIKE`` / ``NOT RLIKE`` / ``!=``) so the emitted text composes
    correctly whatever tokens precede the operator (e.g. a
    parenthesised or function-call left operand)."""
    kind, body = pat_tok[0], pat_tok[2:-1]
    esc = body.replace("'", "''")
    if kind == "p":
        op = "NOT LIKE" if negate else "LIKE"
        return f"{base} {op} '{_glob_to_like(esc)}'"
    if kind == "m":
        op = "NOT RLIKE" if negate else "RLIKE"
        return f"{base} {op} '{esc}'"
    op = "!=" if negate else "="      # f: full literal match
    return f"{base} {op} '{esc}'"


_LHS_STOP = {"AND", "OR", "NOT", "==", "!=", ">=", "<=", "<", ">",
             "=", ","}


def _pop_lhs(out: list[str]) -> str:
    """Pop the full left operand of a comparison off the emitted
    stack: everything back to the previous depth-0 boolean /
    comparison operator, comma, or unmatched '(' — symmetric with the
    '~=' handler's RHS scan.  TAQL comparison binds looser than
    arithmetic, so ``A + B ~= C`` must compare ``A + B``, not ``B``
    (popping one token silently mistranslated it)."""
    lhs: list[str] = []
    depth = 0
    while out:
        frag = out[-1]
        if frag == ")":
            depth += 1
        elif frag == "(":
            if depth == 0:
                break
            depth -= 1
        elif depth == 0 and (frag.upper() in _LHS_STOP):
            break
        lhs.append(out.pop())
    if not lhs:
        raise ValueError(
            "taql_where_to_sql: comparison with no left operand")
    return " ".join(reversed(lhs))


# elementwise real functions liftable INTO an array-reduction operand
# (casacore applies scalar functions over arrays element-by-element,
# TAQL Note 199 — MEAN(ABS(SIGMA)) and friends): name -> SQL over the
# element variable __e
_ELEMENTWISE = {
    "ABS": "abs(__e)", "SQRT": "sqrt(__e)",
    "SQUARE": "(__e * __e)", "SQR": "(__e * __e)",
    "EXP": "exp(__e)", "LOG": "ln(__e)", "LOG10": "log10(__e)",
    "FLOOR": "floor(__e)", "CEIL": "ceil(__e)",
    "COS": "cos(__e)", "SIN": "sin(__e)",
}
# complex views over the engine's interleaved re/im float layout
# (functions/complexf.py): one output element per re/im PAIR.  The
# casacore originals read the complex dtype directly; here DATA-style
# columns store [re0, im0, re1, im1, ...], so AMPLITUDE(DATA) is the
# pairwise magnitude — MEAN(AMPLITUDE(DATA)) reproduces the reference
# flagging idiom mean(abs(DATA)).
_COMPLEXWISE = {
    "AMPLITUDE": "sqrt(__re * __re + __im * __im)",
    "PHASE": "atan2(__im, __re)",
    "ARG": "atan2(__im, __re)",
    "REAL": "__re",
    "IMAG": "__im",
}


def _strip_outer_parens(body: list[str]) -> list[str]:
    b = list(body)
    while len(b) >= 2 and b[0] == "(" \
            and _match_bracket(b, 0, "(", ")") == len(b) - 1:
        b = b[1:-1]
    return b


def _array_valued_operand(body: list[str], array_cols) -> bool:
    """True iff the token run translates to an ARRAY value: a bare
    array column, optionally parenthesised, followed by any number of
    SLICE suffixes (``[a:b]`` keeps array rank), possibly wrapped in
    elementwise/complex-view functions (``ABS``, ``AMPLITUDE``, ...).
    Element access (``[i]`` — scalar), arithmetic, extra identifiers,
    or other function calls make the operand non-array (the caller
    refuses loudly rather than emitting an aggregate over a
    scalar)."""
    b = _strip_outer_parens(body)
    if len(b) >= 3 and b[1] == "(" \
            and _match_bracket(b, 1, "(", ")") == len(b) - 1 \
            and b[0].upper() in _ELEMENTWISE | _COMPLEXWISE:
        return _array_valued_operand(b[2:-1], array_cols)
    if not b or b[0] not in array_cols:
        return False
    k, arrayish = 1, True
    while k < len(b):
        if b[k] != "[":
            return False
        j = _match_bracket(b, k, "[", "]")
        arrayish = ":" in b[k + 1:j]
        k = j + 1
    return arrayish


def _emit_array_operand(body: list[str], array_cols,
                        mscal: dict | None = None) -> str:
    """SQL for an array-valued operand ``_array_valued_operand``
    accepted: elementwise functions become ``transform`` lambdas,
    complex views become pairwise ``transform`` over the interleaved
    layout, the base case is the bare/sliced column via ``_emit``
    (``mscal`` geometry threads through so unit quantities and
    MSCAL references nest inside array operands)."""
    b = _strip_outer_parens(body)
    if len(b) >= 3 and b[1] == "(" \
            and _match_bracket(b, 1, "(", ")") == len(b) - 1:
        fn = b[0].upper()
        if fn in _ELEMENTWISE:
            x = _emit_array_operand(b[2:-1], array_cols, mscal)
            return f"transform({x}, __e -> {_ELEMENTWISE[fn]})"
        if fn in _COMPLEXWISE:
            x = _emit_array_operand(b[2:-1], array_cols, mscal)
            pair = (_COMPLEXWISE[fn]
                    .replace("__re", f"element_at({x}, __k * 2 + 1)")
                    .replace("__im", f"element_at({x}, __k * 2 + 2)"))
            return (f"transform(sequence(0, CAST(size({x}) / 2 AS INT)"
                    f" - 1), __k -> {pair})")
    return _emit(b, array_cols, mscal)


def _collapse_rowid(toks: list[str]) -> list[str]:
    """``ROWID ( )`` -> ``ROWID`` (the column the readers attach),
    qualified or not — casacore's rowid function becomes a plain
    column reference wherever it appears in a nested select."""
    out: list[str] = []
    k = 0
    while k < len(toks):
        if (toks[k].upper() == "ROWID" and k + 2 < len(toks)
                and toks[k + 1] == "(" and toks[k + 2] == ")"):
            out.append("ROWID")
            k += 3
        else:
            out.append(toks[k])
            k += 1
    return out


def _emit_subquery(body: list[str], array_cols=None,
                   mscal=None) -> str:
    """Translate the bracketed TAQL nested query ``SELECT [DISTINCT]
    col[, col...] FROM table[, table...] [WHERE pred]`` to a Spark
    SQL subquery.

    The recurring reference idiom is the single-table row-set probe
    (daskms/tests: taql_where='ANTENNA1 IN [SELECT ROWID() FROM
    ::ANTENNA WHERE ...]'); r12 adds the multi-table comma join of
    TAQL Note 199 (``FROM ::DATA_DESCRIPTION d, ::SPECTRAL_WINDOW s
    WHERE d.SPECTRAL_WINDOW_ID = s.ROWID && ...``) — each FROM item
    is ``[::]NAME [alias]``, emitted as the comma join Spark plans as
    an inner join under the WHERE equality (Catalyst turns the
    cross+filter into an equi-join).  ``::NAME`` (the reference's
    subtable suffix, fsspec_store.py) becomes the bare registered
    view name; ``ROWID()`` becomes the ROWID column, qualified or
    not.  The WHERE clause recurses through the full translator with
    the SAME bound schema — the binding is by column NAME, shared
    across every relation the expression mentions — so every
    supported tier nests, array aggregates included."""
    up = [t.upper() for t in body]
    if "FROM" not in up:
        raise ValueError(
            "taql_where_to_sql: nested SELECT needs a FROM clause")
    f = up.index("FROM")
    w = up.index("WHERE") if "WHERE" in up else len(body)
    if w < f:
        raise ValueError(
            "taql_where_to_sql: malformed nested SELECT (WHERE "
            "before FROM)")
    sel = body[1:f]
    if sel and sel[0].upper() == "DISTINCT":
        sel = sel[1:]
        distinct = "DISTINCT "
    else:
        distinct = ""
    tab = body[f + 1:w]
    # FROM list: one or more ``[::]NAME [alias]`` items separated by
    # commas (multi-table nested select, TAQL Note 199)
    ident = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    items: list[str] = []
    k = 0
    while k < len(tab):
        while k < len(tab) and tab[k] == ":":   # ::SUBTABLE -> SUBTABLE
            k += 1
        if k >= len(tab) or not ident.match(tab[k]):
            raise ValueError(
                "taql_where_to_sql: nested SELECT FROM items must be "
                "registered table/view names ([::]NAME [alias], "
                f"comma-separated), got {' '.join(tab)!r} — register "
                "the relation as a temp view first")
        item = tab[k]
        k += 1
        if k < len(tab) and tab[k] != "," and ident.match(tab[k]):
            item += f" {tab[k]}"                # alias
            k += 1
        items.append(item)
        if k < len(tab):
            if tab[k] != ",":
                raise ValueError(
                    "taql_where_to_sql: nested SELECT FROM items "
                    "must be comma-separated, got "
                    f"{' '.join(tab)!r}")
            k += 1
            if k >= len(tab):
                raise ValueError(
                    "taql_where_to_sql: nested SELECT FROM list ends "
                    "with a comma")
    # names in scope for `alias.COL` qualification: every FROM item's
    # table name and alias.  Qualified refs fuse to ONE token so the
    # top-level translator's dot handling (MSCAL-only) never sees
    # them and Spark receives standard qualified identifiers.
    scope = {part for item in items for part in item.split()}

    def fuse(toks: list[str]) -> list[str]:
        out2: list[str] = []
        k2 = 0
        while k2 < len(toks):
            if (k2 + 2 < len(toks)
                    and toks[k2] in scope and toks[k2 + 1] == "."
                    and ident.match(toks[k2 + 2])):
                out2.append(f"{toks[k2]}.{toks[k2 + 2]}")
                k2 += 3
            else:
                out2.append(toks[k2])
                k2 += 1
        return out2

    cols = fuse(_collapse_rowid(sel))
    if not cols:
        raise ValueError(
            "taql_where_to_sql: nested SELECT with no columns")
    sql = f"SELECT {distinct}{' '.join(cols)} FROM {', '.join(items)}"
    if w < len(body):
        pred = _emit(fuse(_collapse_rowid(body[w + 1:])),
                     array_cols, mscal)
        if not pred.strip():
            raise ValueError(
                "taql_where_to_sql: nested SELECT with empty WHERE")
        sql += f" WHERE {pred}"
    return sql


def _emit(toks: list[str],
          array_cols: set[str] | None = None,
          mscal: dict | None = None) -> str:
    out: list[str] = []
    i = 0
    n = len(toks)
    while i < n:
        t = toks[i]
        up = t.upper()
        if t == "&&":
            out.append("AND")
        elif t == "||":
            out.append("OR")
        elif t == "!":
            out.append("NOT")
        elif t == "~=" or (t == "!~" and i + 1 < n
                           and toks[i + 1] == "="):
            # casacore near-equality (Note 199): a ~= b is
            # NEAR(a, b, 1e-5), i.e. |a-b| <= 1e-5 * max(|a|, |b|);
            # !~= is its negation.  The right operand extends through
            # any arithmetic up to the next boolean/comparison
            # operator at depth 0.
            if not out:
                raise ValueError(
                    "taql_where_to_sql: '~=' with no left operand")
            negate = t == "!~"
            j = i + (2 if negate else 1)
            rhs_toks, depth = [], 0
            while j < n:
                tk = toks[j]
                if tk in ("(", "["):
                    depth += 1
                elif tk in (")", "]"):
                    if depth == 0:
                        break
                    depth -= 1
                elif depth == 0 and (tk in ("&&", "||", ",")
                                     or tk.upper() in ("AND", "OR")
                                     or tk in ("==", "!=", ">=",
                                               "<=", "<", ">", "=")):
                    break
                rhs_toks.append(tk)
                j += 1
            if not rhs_toks:
                raise ValueError(
                    "taql_where_to_sql: '~=' with no right operand")
            lhs = _pop_lhs(out)
            rhs = _emit(rhs_toks, array_cols, mscal)
            near = (f"abs(({lhs}) - ({rhs})) <= 1.0E-5 * "
                    f"greatest(abs({lhs}), abs({rhs}))")
            out.append(f"NOT ({near})" if negate else near)
            i = j - 1
        elif t in ("~", "!~"):
            if not out:
                raise ValueError(
                    "taql_where_to_sql: pattern operator with no "
                    "left operand")
            if i + 1 >= n or not re.match(r"^[pmf]/", toks[i + 1]):
                raise ValueError(
                    "taql_where_to_sql: '~' must be followed by a "
                    "p//, m// or f// pattern literal")
            out.append(_emit_pattern_match(_pop_lhs(out), toks[i + 1],
                                           t == "!~"))
            i += 1
        elif up in ("DATETIME", "MJD") and i + 1 < n \
                and toks[i + 1] == "(":
            j = _match_bracket(toks, i + 1, "(", ")")
            body = toks[i + 2:j]
            if len(body) != 1 or not body[0][:1] in ("'", '"'):
                raise ValueError(
                    f"taql_where_to_sql: {up}() takes one string "
                    "literal, e.g. DATETIME('2016/01/01/12:00:00')")
            secs = _taql_datetime_seconds(body[0])
            out.append(repr(secs if up == "DATETIME"
                            else secs / 86400.0))
            i = j
        elif up in ("SUMSQR", "SUMSQUARE") and i + 1 < n \
                and toks[i + 1] == "(":
            j = _match_bracket(toks, i + 1, "(", ")")
            inner = _emit(toks[i + 2:j], array_cols, mscal)
            out.append(_SUM_SQR.format(x=inner))
            i = j
        elif up in _ARRAY_AGGS and i + 1 < n and toks[i + 1] == "(":
            # SUM/MIN/MAX/MEAN: array reduction IFF the operand is an
            # array-VALUED expression under the bound schema (a bare
            # array column, optionally parenthesised/sliced).  A
            # mixed or derived operand (SUM(UVW[0]*W), MEAN(ABS(UVW)))
            # refuses loudly — classifying on the first identifier
            # alone made translation operand-order-dependent and
            # pushed the error into Spark analysis (review r9).
            j = _match_bracket(toks, i + 1, "(", ")")
            body = toks[i + 2:j]
            idents = [b for k, b in enumerate(body)
                      if re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", b)
                      and b.upper() not in ("AND", "OR", "NOT")
                      and not (k + 1 < len(body)
                               and body[k + 1] == "(")]
            if array_cols is not None \
                    and not any(b in array_cols for b in idents):
                # schema bound and NO array column involved: SQL
                # aggregate names pass through untouched (e.g. a user
                # mixing the predicate into a HAVING-style context)
                out.append(t)
            elif array_cols is not None:
                if not _array_valued_operand(body, array_cols):
                    raise ValueError(
                        f"taql_where_to_sql: {up}({' '.join(body)}) "
                        "mixes an array column with scalar columns, "
                        "element access or unsupported function "
                        "calls — the operand must be a bare "
                        "(optionally sliced) array column, wrapped "
                        "in elementwise functions "
                        f"({'/'.join(sorted(_ELEMENTWISE))}) or "
                        "complex views "
                        f"({'/'.join(sorted(_COMPLEXWISE))}); "
                        "compute anything else as a column "
                        "expression first")
                inner = _emit_array_operand(body, array_cols, mscal)
                out.append(_ARRAY_AGGS[up].format(x=inner))
                i = j
            else:
                raise ValueError(
                    f"taql_where_to_sql: {up}() is ambiguous without "
                    "a schema — over an ARRAY column it is the "
                    "casacore array reduction, otherwise the SQL "
                    "aggregate.  Pass schema= (the DataFrame's "
                    ".schema or a set of array-column names) to "
                    "translate it, or use SUMSQR/NTRUE/NELEMENTS "
                    "which are unambiguous")
        elif up in _ARRAY_REDUCTIONS and i + 1 < n \
                and toks[i + 1] == "(":
            j = _match_bracket(toks, i + 1, "(", ")")
            inner = _emit(toks[i + 2:j], array_cols, mscal)
            if not inner.strip():
                raise ValueError(
                    f"taql_where_to_sql: {up}() needs an array "
                    "argument")
            out.append(_ARRAY_REDUCTIONS[up].format(x=inner))
            i = j
        elif up == "IN" and i + 1 < n and toks[i + 1] == "[":
            j = _match_bracket(toks, i + 1, "[", "]")
            body = toks[i + 2:j]
            if body and body[0].upper() == "SELECT":
                # TAQL nested query (tier 4): X IN [SELECT col FROM
                # tab WHERE ...] -> Spark IN (SELECT ...) — Catalyst
                # plans a broadcast/shuffled LeftSemi join, exactly
                # the reference's casacore rowid-set semantics.  The
                # inner WHERE recurses through this translator;
                # ``::SUBTABLE`` names map to the bare view name and
                # ``ROWID()`` to the ROWID column the readers attach.
                out.append(f"IN ({_emit_subquery(body, array_cols, mscal)})")
                i = j
                i += 1
                continue
            if ":" in body:
                # TAQL interval: X IN [a=:=b] (closed) / <:< (open) /
                # mixed — the bound marker before/after ':' picks
                # inclusive (=) or exclusive (<).  casacore Note 199.
                k = body.index(":")
                if (k >= 1 and k + 1 < len(body)
                        and body[k - 1] in ("=", "<")
                        and body[k + 1] in ("=", "<")
                        and out):
                    lo = _emit(body[:k - 1], array_cols, mscal)
                    hi = _emit(body[k + 2:], array_cols, mscal)
                    lo_op = ">=" if body[k - 1] == "=" else ">"
                    hi_op = "<=" if body[k + 1] == "=" else "<"
                    neg = ""
                    if out[-1].upper() == "NOT" and len(out) >= 2:
                        out.pop()             # X NOT IN [a=:=b]
                        neg = "NOT "
                    base = out.pop()
                    out.append(f"{neg}({base} {lo_op} {lo} AND "
                               f"{base} {hi_op} {hi})")
                    i = j
                    i += 1
                    continue
                raise ValueError(
                    "taql_where_to_sql: range-form IN sets "
                    "([a:b]) are not supported — enumerate the "
                    "values, use an interval bound ([a=:=b]) or "
                    "comparison predicates")
            inner = _emit(body, array_cols, mscal)
            out.append(f"IN ({inner})")
            i = j
        elif _NUMBER.match(t) and i + 1 < n \
                and toks[i + 1] in _UNIT_FACTORS:
            # tier 7 unit quantity: NUMBER UNIT folds to one double
            # literal in the engine's convention (see module
            # docstring); driver-side fold so every engine sees the
            # identical literal
            out.append(repr(float(t) * _UNIT_FACTORS[toks[i + 1]]))
            i += 1
        elif up == "MSCAL" and i + 1 < n and toks[i + 1] == ".":
            if i + 2 >= n:
                raise ValueError(
                    "taql_where_to_sql: MSCAL. with no derived-column "
                    "name")
            dname = toks[i + 2].upper()
            if dname not in _MSCAL_NAMES:
                raise ValueError(
                    f"taql_where_to_sql: MSCAL.{toks[i + 2]} is not "
                    "in the translated subset "
                    f"({'/'.join(_MSCAL_NAMES)}) — compute other "
                    "mscal quantities as column expressions with "
                    "functions/mscal.py")
            if mscal is None:
                raise ValueError(
                    f"taql_where_to_sql: MSCAL.{dname} needs the "
                    "mscal= argument with the site/direction "
                    "geometry {'lon_deg','lat_deg','ra_deg',"
                    "'dec_deg'[,'time_col']} — casacore reads these "
                    "from the ANTENNA/FIELD subtables; a predicate "
                    "string has no table context")
            out.append(f"({_mscal_sql(dname, mscal)})")
            i += 2
        elif t == ".":
            raise ValueError(
                "taql_where_to_sql: '.'-qualified names are only "
                "supported for the MSCAL derived columns "
                f"({'/'.join(_MSCAL_NAMES)})")
        elif t == "[" and out and (re.match(r"^[A-Za-z_]", out[-1])
                                   or out[-1].endswith(")")):
            # array element / slice on the preceding operand
            j = _match_bracket(toks, i, "[", "]")
            body = toks[i + 1:j]
            base = out.pop()
            if body.count(":") > 1:
                raise ValueError(
                    "taql_where_to_sql: strided slices ([a:b:c]) "
                    "are not supported — materialise the stride "
                    "with element_at/filter by hand")
            if ":" in body:
                k = body.index(":")
                lo = _emit(body[:k], array_cols, mscal) if k > 0 else "0"
                hi = (_emit(body[k + 1:], array_cols, mscal)
                      if k + 1 < len(body) else None)
                if hi is None:
                    out.append(f"slice({base}, ({lo}) + 1, "
                               f"size({base}) - ({lo}))")
                else:
                    out.append(f"slice({base}, ({lo}) + 1, "
                               f"({hi}) - ({lo}))")
            elif (len(body) == 2 and body[0] == "-"
                    and body[1].isdigit()):
                # TAQL from-end index: [-1] = last — Spark's negative
                # element_at counts from the end the same way, no +1
                out.append(f"element_at({base}, -{body[1]})")
            else:
                idx = _emit(body, array_cols, mscal)
                out.append(f"element_at({base}, ({idx}) + 1)")
            i = j
        else:
            out.append(t)
        i += 1
    return " ".join(out)


def taql_where_to_sql(expr: str, schema=None,
                      mscal: dict | None = None) -> str:
    """Translate a TAQL boolean expression (the supported subset — see
    module docstring) to an equivalent Spark SQL predicate string.
    Raises ``ValueError`` on syntax outside the subset rather than
    guessing.

    ``schema`` binds column types so the casacore array aggregates
    ``SUM/MIN/MAX/MEAN(arraycol)`` (Note 199, the flagging idioms
    like ``MEAN(SIGMA) < 2``) translate to higher-order reductions
    instead of colliding with the SQL aggregates of the same name.
    Accepts a ``StructType`` (a DataFrame's ``.schema``), an iterable
    of array-column NAMES, or None (bare SUM/MIN/MAX/MEAN then
    raises with guidance).

    ``mscal`` binds the site/direction geometry for the tier-7
    derived columns (``MSCAL.HA1 > 0.1rad`` and friends): a dict
    with ``lon_deg``/``lat_deg``/``ra_deg``/``dec_deg`` in degrees
    plus an optional ``time_col`` (default ``TIME``, MJD seconds).
    Without it an MSCAL reference raises with guidance."""
    if not expr or not expr.strip():
        return expr
    unquoted = re.sub(r"'[^']*'|\"[^\"]*\"", "", expr)
    if _BARE_DATE.search(unquoted):
        raise ValueError(
            "taql_where_to_sql: bare date literal — it would parse "
            "as integer division; write DATETIME('YYYY/MM/DD') "
            "(folds to MJD seconds) or MJD('...') (days)")
    array_cols = None
    if schema is not None:
        try:                      # StructType: pick the array fields
            from pyspark.sql.types import ArrayType

            array_cols = {f.name for f in schema.fields
                          if isinstance(f.dataType, ArrayType)}
        except AttributeError:    # iterable of array-column names
            array_cols = set(schema)
    out = _emit(_tokenize(expr), array_cols, mscal)
    bare = re.sub(r"'[^']*'|\"[^\"]*\"", "", out)
    if "[" in bare or "]" in bare:
        raise ValueError(
            "taql_where_to_sql: '[' outside an IN-list or array "
            f"index position in {expr!r} — unsupported TAQL syntax")
    return out
