"""Predicate → per-column bounds: the data-skipping analysis that lets
:meth:`ManifestTable.delete_where` rewrite ONLY files that may contain
a matching row, from an arbitrary SQL predicate string.

Delta and Iceberg do the same derivation on their expression trees
("data skipping"); here it is a ~100-line recursive-descent parse of
the SQL predicate grammar the manifest stats can act on —
comparisons, BETWEEN, IN, AND/OR, parentheses — into

    {column: [(lo, hi), ...]}   # predicate  ⇒  column ∈ ∪ ranges

Soundness is one-directional by construction: the result OVERAPPROXIMATES
the matching set (strict < widens to <=, NOT/IS NULL/unparseable
subtrees contribute no constraint), so a file outside every range for
any constrained column provably holds no matching row — and nothing
else is ever claimed.  NULL-valued rows cannot satisfy a predicate
through a constrained column (a SQL comparison with NULL is never
TRUE, and a disjunct that dodges the comparison would have erased the
constraint), so min/max stats that ignore nulls stay sound.

The actual delete still applies the EXACT predicate to the rewritten
files; this analysis only decides which files the rewrite may skip.
"""

from __future__ import annotations

import re

# one range with None = unbounded side; a column maps to a UNION of them
Range = tuple[object, object]

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^']|'')*')
      | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<op><=|>=|<>|!=|==|=|<|>)
      | (?P<punct>[(),])
      | (?P<word>[A-Za-z_][A-Za-z_0-9.]*|`[^`]+`)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "IN", "BETWEEN", "IS", "NULL", "TRUE", "FALSE"}


def _tokenize(s: str) -> list[tuple[str, object]] | None:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if m is None:
            return None if s[pos:].strip() else out
        pos = m.end()
        if m.lastgroup == "str":
            out.append(("lit", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "num":
            t = m.group("num")
            out.append(("lit", float(t) if ("." in t or "e" in t.lower()) else int(t)))
        elif m.lastgroup == "op":
            out.append(("op", m.group("op")))
        elif m.lastgroup == "punct":
            out.append(("punct", m.group("punct")))
        else:
            w = m.group("word")
            up = w.upper()
            if up in _KEYWORDS:
                out.append(("kw", up))
            else:
                out.append(("col", w.strip("`")))
    return out


class _Parser:
    """Recursive descent over the tokens; every rule returns a
    constraint dict ({} = TOP, i.e. nothing learned — always sound)."""

    def __init__(self, toks: list[tuple[str, object]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> dict[str, list[Range]]:
        c = self.or_expr()
        if self.i != len(self.toks):
            raise _Unsupported  # trailing tokens: refuse to half-parse
        return c

    def or_expr(self):
        c = self.and_expr()
        while self.peek() == ("kw", "OR"):
            self.take()
            c = _or(c, self.and_expr())
        return c

    def and_expr(self):
        c = self.unary()
        while self.peek() == ("kw", "AND"):
            self.take()
            c = _and(c, self.unary())
        return c

    def unary(self):
        if self.peek() == ("kw", "NOT"):
            self.take()
            self.unary()  # consume; negation learns nothing (sound TOP)
            return {}
        return self.primary()

    def primary(self):
        kind, val = self.peek()
        if (kind, val) == ("punct", "("):
            self.take()
            c = self.or_expr()
            if self.take() != ("punct", ")"):
                raise _Unsupported
            return c
        if kind == "kw" and val in ("TRUE", "FALSE", "NULL"):
            self.take()
            return {}
        if kind == "col":
            return self.predicate()
        if kind == "lit":  # literal-first comparison: 5 < col
            _, lit = self.take()
            okind, op = self.take()
            ckind, col = self.take()
            if okind != "op" or ckind != "col":
                raise _Unsupported
            return _cmp(col, _flip(op), lit)
        raise _Unsupported

    def predicate(self):
        _, col = self.take()
        kind, val = self.peek()
        if kind == "op":
            self.take()
            lkind, lit = self.take()
            if lkind != "lit":
                raise _Unsupported  # col-vs-col etc.: nothing learnable
            return _cmp(col, val, lit)
        if (kind, val) == ("kw", "BETWEEN"):
            self.take()
            k1, lo = self.take()
            if self.take() != ("kw", "AND"):
                raise _Unsupported
            k2, hi = self.take()
            if k1 != "lit" or k2 != "lit":
                raise _Unsupported
            return {col: [(lo, hi)]}
        if (kind, val) == ("kw", "IN"):
            self.take()
            if self.take() != ("punct", "("):
                raise _Unsupported
            ranges = []
            while True:
                k, lit = self.take()
                if k != "lit":
                    raise _Unsupported
                ranges.append((lit, lit))
                nk = self.take()
                if nk == ("punct", ")"):
                    break
                if nk != ("punct", ","):
                    raise _Unsupported
            return {col: ranges}
        if (kind, val) == ("kw", "IS"):
            # IS [NOT] NULL: stats ignore nulls — nothing learnable
            self.take()
            if self.peek() == ("kw", "NOT"):
                self.take()
            if self.take() != ("kw", "NULL"):
                raise _Unsupported
            return {}
        raise _Unsupported


class _Unsupported(Exception):
    pass


def _flip(op: str) -> str:
    return {"<": ">", ">": "<", "<=": ">=", ">=": "<="}.get(op, op)


def _cmp(col: str, op: str, lit) -> dict[str, list[Range]]:
    if op in ("=", "=="):
        return {col: [(lit, lit)]}
    if op in ("<", "<="):  # strict < widens to <= : still a superset
        return {col: [(None, lit)]}
    if op in (">", ">="):
        return {col: [(lit, None)]}
    return {}  # != / <>: excludes one point — useless for range skipping


def _and(a: dict, b: dict) -> dict:
    """Both hold: union of constrained columns, ranges intersected."""
    out = dict(a)
    for col, ranges in b.items():
        if col in out:
            out[col] = _intersect(out[col], ranges)
        else:
            out[col] = ranges
    return out


def _or(a: dict, b: dict) -> dict:
    """Either holds: only columns constrained on BOTH sides survive
    (a disjunct without the column admits any value), ranges unioned."""
    return {
        col: a[col] + b[col] for col in a.keys() & b.keys()
    }


def _intersect(xs: list[Range], ys: list[Range]) -> list[Range]:
    out = []
    for xlo, xhi in xs:
        for ylo, yhi in ys:
            if _shape_ambiguous(xlo, ylo):
                lo = None  # which is larger depends on column type: unbound
            else:
                lo = xlo if ylo is None else (ylo if xlo is None else _maxv(xlo, ylo))
            if _shape_ambiguous(xhi, yhi):
                hi = None
            else:
                hi = xhi if yhi is None else (yhi if xhi is None else _minv(xhi, yhi))
            if lo is None or hi is None or _le(lo, hi):
                out.append((lo, hi))
    return out


def _maxv(a, b):
    try:
        return a if a >= b else b
    except TypeError:
        return a  # incomparable types: keep either (stays a superset)


def _minv(a, b):
    try:
        return a if a <= b else b
    except TypeError:
        return a


def _le(a, b) -> bool:
    if _shape_ambiguous(a, b):
        return True  # order depends on column type: keep the range
    try:
        return a <= b
    except TypeError:
        return True  # incomparable: keep the range (conservative)


def predicate_bounds(cond: str) -> dict[str, list[Range]]:
    """Per-column allowed-range unions implied by SQL predicate ``cond``;
    {} when nothing can be derived (every file must then be rewritten —
    never wrong, just unpruned)."""
    toks = _tokenize(cond)
    if not toks:
        return {}
    try:
        return _Parser(toks).parse()
    except (_Unsupported, IndexError):
        return {}


def ranges_overlap_stats(
    ranges: list[Range], fmin, fmax, temporal: bool = False
) -> bool:
    """Could a value inside the file's recorded [fmin, fmax] fall in any
    allowed range?  Type-incomparable encodings answer True — stats may
    only skip work, never lose a matching row.

    ``temporal=True`` declares the column timestamp/date-typed per the
    table schema: string literals and ISO stats then compare as
    INSTANTS via :func:`temporal_canon`, so the idiomatic space-form
    SQL literal ``'2024-06-15 12:00:00'`` orders correctly against the
    ``datetime.isoformat()`` ``'T'``-form the stats store (raw
    lexicographic comparison puts ``' ' < 'T'`` and would declare a
    file disjoint that holds matching rows).  Without the flag, two
    timestamp-shaped strings whose textual shapes DIFFER are treated
    as incomparable (file kept): for a plain string column SQL itself
    compares raw bytes, and neither ordering is provably right."""
    for lo, hi in ranges:
        below = lo is not None and _lt(fmax, lo, temporal)
        above = hi is not None and _lt(hi, fmin, temporal)
        if not (below or above):
            return True
    return False


def _lt(a, b, temporal: bool = False) -> bool:
    if isinstance(a, str) and isinstance(b, str):
        ca, cb = temporal_canon(a), temporal_canon(b)
        if ca is not None and cb is not None:
            if temporal or _shape(a) == _shape(b):
                # same textual shape: canon order == raw order, and it
                # is also instant order — right for every column type
                return ca < cb
            return False  # string column, mixed shapes: not provable
    try:
        return a < b
    except TypeError:
        return False  # incomparable: not provably disjoint -> overlap


# 'YYYY-MM-DD', optionally '[T ]HH:MM[:SS[.fffff]]' — the shapes SQL
# timestamp literals and datetime.isoformat() stats both fall in
_TS_SHAPE = re.compile(
    r"^(\d{4}-\d{2}-\d{2})(?:[T ](\d{2}:\d{2}(?::\d{2}(?:\.\d+)?)?))?$"
)


def temporal_canon(v) -> str | None:
    """Canonical ISO-8601 text for a timestamp/date-shaped string —
    ``'YYYY-MM-DDTHH:MM:SS[.f]'`` with the space separator rewritten to
    ``'T'``, seconds padded in, and trailing-zero fractions stripped —
    or None when ``v`` is not shaped like one.  Equal instants map to
    equal strings and lexicographic order on canon forms equals instant
    order, which is what lets delete_where's pruning compare a
    space-form SQL literal against isoformat() stats soundly."""
    if not isinstance(v, str):
        return None
    m = _TS_SHAPE.match(v)
    if m is None:
        return None
    date, time = m.group(1), m.group(2) or "00:00:00"
    if len(time) == 5:
        time += ":00"
    if "." in time:
        time = time.rstrip("0").rstrip(".")
    return f"{date}T{time}"


def _shape(s: str) -> str:
    """Digit-masked pattern ('####-##-## ##:##:##'): equal shapes mean
    the canon rewrite is positionwise and order-preserving, so canon
    comparison is safe even for plain string columns."""
    return re.sub(r"\d", "#", s)


def _shape_ambiguous(a, b) -> bool:
    """True when ``a``/``b`` are both timestamp-shaped strings whose
    textual shapes differ: their relative order then depends on the
    column's type (instant order vs raw bytes), so range algebra must
    not pick between them."""
    if isinstance(a, str) and isinstance(b, str):
        return (
            temporal_canon(a) is not None
            and temporal_canon(b) is not None
            and _shape(a) != _shape(b)
        )
    return False
