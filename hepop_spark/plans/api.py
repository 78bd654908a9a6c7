"""HEPop query-API semantics on top of spark.sql.

The reference parses SQL with regexes (query.js:65-142), prunes files by
metadata, and hands a rewritten query to DuckDB. Catalyst replaces all of
that; what remains to reproduce is exactly the reference's *non-ANSI* API
semantics:

 1. table resolution — `FROM hep_(\\d+)` is a HEP type table, any other
    identifier is a Line-Protocol measurement (query.js:71-84); both are
    just registered views here;
 2. default time window — a query with no `time` predicate is implicitly
    limited to the last 10 minutes (query.js:9 `defaultTimeRange`,
    :110-117);
 3. `time` alias — the documented query surface calls the timestamp column
    `time` (README.md:138-147); we expose `time` as a real view column so
    no text rewriting is needed for predicates;
 4. `count()` normalization — DuckDB accepts zero-arg `count()`
    (loopback_test.sh:46); ANSI/Spark require `count(*)`;
 5. ORDER BY / LIMIT / OFFSET pass through (OFFSET is documented at
    README.md:135 but silently dropped by the reference, query.js:129-132 —
    we implement it correctly).

The *only* text manipulation here is (2) and (4); both are conservative
regex transforms of well-understood shapes, not SQL parsing.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TIME_RANGE = timedelta(minutes=10)  # query.js:9 (600s in ns)

# Driver-side materialization ceiling for the JSON query path. The
# reference streams DuckDB result vectors straight into the HTTP response
# (hepop.js:1042-1049); `collect()` instead pins the WHOLE result in the
# serve process, so an unbounded `SELECT * FROM hep_1` over a large store
# OOMs it (r05 verdict item 5). 100k rows ~ tens of MB of JSON — far past
# any interactive use; callers that truly want more opt out with
# max_rows=None.
DEFAULT_MAX_ROWS = 100_000

_COUNT_RE = re.compile(r"\bcount\(\s*\)", re.IGNORECASE)
_TIME_PRED_RE = re.compile(r"\btime\s*(>=|<=|>|<|=)", re.IGNORECASE)
_FROM_RE = re.compile(r"\bFROM\s+([A-Za-z_][A-Za-z0-9_]*)", re.IGNORECASE)
_CTE_HEAD_RE = re.compile(r"^\s*WITH\s+([A-Za-z_]\w*)\s+AS\s*\(",
                          re.IGNORECASE)
_WHERE_RE = re.compile(r"\bWHERE\b", re.IGNORECASE)
_TAIL_RE = re.compile(r"\b(GROUP\s+BY|ORDER\s+BY|LIMIT|HAVING|WINDOW)\b", re.IGNORECASE)


def _is_stale_listing_error(e: Exception) -> bool:
    """True when the failure smells like files/dirs vanishing between
    plan-time listing and execution — the signature of reading across
    another process's compaction swap. Patterns are FILE-level signatures
    only: the former generic 'does not exist' / 'No such file or
    directory' substrings misclassified missing-table AnalysisExceptions
    as compaction races and retried them 4x before surfacing the real
    error (r07 ADVICE item 3)."""
    msg = str(e)
    return any(
        s in msg
        for s in (
            "FileNotFoundException",
            "PATH_NOT_FOUND",
            "FILE_NOT_FOUND",
            "REFRESH TABLE",
        )
    )


# --- aggregate -> maintained-rollup routing (r07 verdict item 3) -----------
# A maintained projection store (storage/rollup.py) that carries a `source`
# routing contract in its _meta.json can answer a user's MATCHING aggregate
# over the raw table from the pre-aggregated grid — the "continuous
# aggregation" promise without the user knowing the rollup's name. The
# matcher is deliberately conservative (whitespace-normalized expression
# equality over a simple SELECT..FROM t GROUP BY shape, no WHERE/HAVING/
# JOIN/subqueries); anything it cannot prove routes to the raw scan, so a
# miss costs nothing but the raw aggregate the user asked for.

_SIMPLE_AGG_RE = re.compile(
    r"^\s*SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<tbl>[A-Za-z_]\w*)\s+"
    r"(?:WHERE\s+(?P<where>.+?)\s+)?"
    r"GROUP\s+BY\s+(?P<rest>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# the routable star shape (r09c): fact JOIN dim on one equality, grouped —
# aliases are REQUIRED on both tables so column ownership is unambiguous
_JOIN_AGG_RE = re.compile(
    r"^\s*SELECT\s+(?P<sel>.+?)\s+FROM\s+"
    r"(?P<t1>[A-Za-z_]\w*)\s+(?:AS\s+)?"
    r"(?P<a1>(?!JOIN\b|WHERE\b|GROUP\b|AS\b|LEFT\b|INNER\b)"
    r"[A-Za-z_]\w*)\s+"
    r"(?P<jtype>LEFT\s+(?:OUTER\s+)?|INNER\s+)?"
    r"JOIN\s+(?P<t2>[A-Za-z_]\w*)\s+(?:AS\s+)?"
    r"(?P<a2>(?!ON\b|AS\b)[A-Za-z_]\w*)\s+"
    r"ON\s+(?P<ja>[A-Za-z_]\w*)\s*\.\s*(?P<jac>[A-Za-z_]\w*)\s*=\s*"
    r"(?P<jb>[A-Za-z_]\w*)\s*\.\s*(?P<jbc>[A-Za-z_]\w*)\s+"
    r"(?:WHERE\s+(?P<where>.+?)\s+)?"
    r"GROUP\s+BY\s+(?P<rest>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_TAIL_SPLIT_RE = re.compile(r"\b(HAVING|ORDER\s+BY|LIMIT)\b", re.IGNORECASE)
_HAVING_RE = re.compile(
    r"^HAVING\s+(?P<body>.+?)\s*(?=\bORDER\s+BY\b|\bLIMIT\b|$)",
    re.IGNORECASE | re.DOTALL,
)
_FORBIDDEN_RE = re.compile(
    # BETWEEN left this list in r09: _PRED_RE parses it as a routable
    # range conjunct; anywhere else it can appear (a select item, a
    # group key) the key/agg-map lookup misses and routing falls back.
    # HAVING left it too (r09): the STRUCTURAL clause is extracted and
    # strictly parsed (AND-ed `expr op literal` comparisons) before the
    # forbidden scan runs on the remainder — anything richer inside it
    # fails that parse and falls back to raw.
    r"\b(JOIN|UNION|INTERSECT|EXCEPT|OVER|DISTINCT"
    r"|OR|NOT|LIKE|EXISTS|CASE)\b",
    re.IGNORECASE,
)
# the ONE routable DISTINCT shape: count(distinct <bare column>). It is
# masked before the forbidden scan, so any OTHER distinct (SELECT
# DISTINCT, sum(distinct ...), count(distinct expr(...))) still rejects.
_COUNT_DISTINCT_RE = re.compile(
    r"count\s*\(\s*distinct\s+[A-Za-z_]\w*\s*\)", re.IGNORECASE
)
# one conjunct of a routable WHERE: <expr> = <literal> or <expr> IN (<lits>)
_LIT = r"'[^']*'|-?\d+(?:\.\d+)?"
# routable WHERE conjuncts: any pure row-filter comparison against
# literals — equality, IN, ranges (r09), BETWEEN (r09). On a grid KEY
# each merely SELECTS pre-aggregated rows, so routed results stay exact.
_PRED_RE = re.compile(
    r"^(?P<e>.+?)\s*(?:(?P<op>>=|<=|<>|!=|>|<|=)\s*(?P<lit>" + _LIT + r")"
    r"|BETWEEN\s+(?P<lo>" + _LIT + r")\s+AND\s+(?P<hi>" + _LIT + r")"
    r"|IN\s*\(\s*(?P<ins>(" + _LIT + r")"
    r"(\s*,\s*(" + _LIT + r"))*)\s*\))\s*$",
    re.IGNORECASE | re.DOTALL,
)

# an AND that COMPLETES `x BETWEEN lo` is part of the predicate, not a
# conjunct boundary
_BETWEEN_HEAD_RE = re.compile(
    r"\bBETWEEN\s+(" + _LIT + r")\s*$", re.IGNORECASE | re.DOTALL
)


def _split_conjuncts(where: str) -> list[str] | None:
    """AND-ed conjuncts at paren depth 0, or None if anything else.
    BETWEEN-aware: the AND inside `x BETWEEN lo AND hi` never splits."""
    out, depth, cur = [], 0, []
    tokens = re.split(r"(\bAND\b)", where, flags=re.IGNORECASE)
    for t in tokens:
        if (t.upper() == "AND" and depth == 0
                and not _BETWEEN_HEAD_RE.search("".join(cur))):
            out.append("".join(cur).strip())
            cur = []
        else:
            depth += t.count("(") - t.count(")")
            cur.append(t)
    out.append("".join(cur).strip())
    return [c for c in out if c] or None


def _strip_parens(s: str) -> str:
    """Remove balanced OUTER parentheses: `((a OR b))` -> `a OR b`.
    Only strips when the opening paren matches the final char."""
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i != len(s) - 1:
                    return s  # the opener closes early: not an outer pair
        s = s[1:-1].strip()
    return s


def _split_disjuncts(s: str) -> list[str]:
    """OR-ed disjuncts at paren depth 0."""
    out, depth, cur = [], 0, []
    for t in re.split(r"(\bOR\b)", s, flags=re.IGNORECASE):
        if t.upper() == "OR" and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            depth += t.count("(") - t.count(")")
            cur.append(t)
    out.append("".join(cur).strip())
    return [c for c in out if c]


def _or_in_canonical(conjunct: str) -> tuple[str, list[str]] | None:
    """(expr, [literals]) when `conjunct` is an OR of equality/IN tests
    that ALL target the same expression — `k = 'a' OR k = 'b' OR
    k IN ('c','d')` is semantically `k IN ('a','b','c','d')` (r09
    verdict item 6: the most common dashboard shape that used to fall
    back). Anything else — mixed columns, ranges, nested AND — returns
    None and the caller keeps its conservative fallback."""
    parts = _split_disjuncts(_strip_parens(conjunct))
    if len(parts) < 2:
        return None
    expr, lits = None, []
    for p in parts:
        pm = _PRED_RE.match(_strip_parens(p))
        if not pm or re.search(r"\b(OR|AND|NOT)\b", pm.group("e"),
                               re.IGNORECASE):
            return None  # nested boolean structure: not a flat OR
        if pm.group("op") == "=" and pm.group("lit") is not None:
            got = [pm.group("lit")]
        elif pm.group("ins") is not None:
            got = _split_top_level(pm.group("ins"))
        else:
            return None  # ranges/BETWEEN do not merge into an IN
        e = _norm_expr(pm.group("e"))
        if expr is None:
            expr, raw_expr = e, pm.group("e").strip()
        elif e != expr:
            return None
        lits.extend(got)
    return raw_expr, lits


def _parse_where_conjuncts(where: str) -> list[tuple[str, str]] | None:
    """The routable WHERE grammar: AND-ed conjuncts, each either a
    `expr op literal` / BETWEEN / IN comparison (r09), a PARENTHESIZED
    AND-group of the same (recursively unwrapped, r10), or an
    OR-of-equalities on a single expression (canonicalized to IN, r10).
    Returns [(expr, op_sql)] or None — anything richer falls back to the
    raw scan, so a miss costs nothing."""
    # SQL precedence: OR binds LOOSEST. A depth-0 OR means the whole
    # body is one disjunction — it is a conjunct list ONLY if it
    # canonicalizes as a single-expression OR-of-equalities (-> IN).
    # Splitting ANDs first here mis-grouped `a = 1 OR b = 2 AND c = 3`
    # as (a OR b) AND c (r10 ADVICE, high): wrong rows, silently.
    if len(_split_disjuncts(where)) > 1:
        got = _or_in_canonical(where)
        if got is None:
            return None  # caller may still prove it as a WhereTree
        expr, lits = got
        return [(expr, f"IN ({', '.join(lits)})")]
    conjuncts = _split_conjuncts(where)
    if not conjuncts:
        return None
    preds: list[tuple[str, str]] = []
    for c in conjuncts:
        # OR-of-equalities first: _PRED_RE's non-greedy expr would
        # otherwise backtrack across the ORs and swallow them into a
        # garbage expression
        got = _or_in_canonical(c)
        if got is not None:
            expr, lits = got
            preds.append((expr, f"IN ({', '.join(lits)})"))
            continue
        stripped = _strip_parens(c)
        if stripped != c.strip():
            # a parenthesized group may hold further top-level ANDs
            inner = _parse_where_conjuncts(stripped)
            if inner is None:
                return None
            preds.extend(inner)
            continue
        pm = _PRED_RE.match(c)
        if pm and re.search(r"\b(OR|AND|NOT)\b", pm.group("e"),
                            re.IGNORECASE):
            return None  # un-canonicalizable boolean structure
        if pm:
            if pm.group("lit") is not None:
                preds.append((pm.group("e").strip(),
                              f"{pm.group('op')} {pm.group('lit')}"))
            elif pm.group("lo") is not None:
                preds.append((pm.group("e").strip(),
                              f"BETWEEN {pm.group('lo')} "
                              f"AND {pm.group('hi')}"))
            else:
                preds.append((pm.group("e").strip(),
                              f"IN ({pm.group('ins')})"))
            continue
        got = _or_in_canonical(c)
        if got is None:
            return None
        expr, lits = got
        preds.append((expr, f"IN ({', '.join(lits)})"))
    return preds


class WhereTree:
    """A PROVEN boolean tree of literal comparisons, produced when the
    WHERE is analyzable but not a flat conjunct list (mixed-key OR — the
    dashboard shape `k IN (...) OR k2 = ...`). Routing may rewrite it
    onto grid columns: a predicate that reads ONLY key columns is
    constant within each grid cell, so filtering cells equals filtering
    raw rows for ANY boolean combination, not just conjuncts. Nodes:
    ('and'|'or', [children]) and ('leaf', expr, op_sql)."""

    __slots__ = ("tree",)

    def __init__(self, tree):
        self.tree = tree


class GroupingSpec(list):
    """GROUP BY ROLLUP / CUBE / GROUPING SETS (r12). The list CONTENT is
    the unique underlying key expressions, so the router's key-coverage
    proof (`gset <= set(key_map)`) runs unchanged; `kind`, `args` and
    `sets` keep the construct verbatim so the rewrite can rebuild it
    over grid columns. Routing such a query onto the grid is exact
    because every produced group — full keys or any collapsed subset —
    re-aggregates the monoid partials the grid stores (sums re-sum,
    extrema re-extremize, avg finalizes from sum+count), and the NULL
    fill for collapsed keys comes from the SAME grouping construct on
    both sides. The one grid trick that does NOT survive collapse is
    exact count(distinct key) — grid rows repeat the counted key across
    collapsed groups — so the router refuses it under any GroupingSpec."""

    def __init__(self, exprs, kind, args, sets):
        super().__init__(exprs)
        self.kind = kind      # 'ROLLUP' | 'CUBE' | 'GROUPING SETS'
        self.args = args      # ROLLUP/CUBE argument list, order + dups kept
        self.sets = sets      # GROUPING SETS: tuple of expr-tuples

    def mapped(self, col_of) -> str:
        """The construct with every expression replaced via col_of."""
        if self.kind == "GROUPING SETS":
            body = ", ".join(
                "(" + ", ".join(col_of(e) for e in s) + ")" for s in self.sets
            )
            return f"GROUPING SETS ({body})"
        return self.kind + "(" + ", ".join(col_of(e) for e in self.args) + ")"


_GROUPING_HEAD_RE = re.compile(
    r"(ROLLUP|CUBE|GROUPING\s+SETS)\s*\(", re.IGNORECASE)


def _parse_grouping_construct(gb: str) -> GroupingSpec | None:
    """`ROLLUP(a, b)` / `CUBE(a, b)` / `GROUPING SETS ((a, b), b, ())`
    covering the ENTIRE group-by text, parens balanced to its end.
    GROUPING SETS elements may be parenthesized lists (incl. the empty
    grand-total set) or bare expressions. Anything else — a mix like
    `a, ROLLUP(b)`, a nested construct inside a set — returns None and
    the plain comma-list parse applies, whose key lookup then rejects
    the construct's parens: a conservative raw-scan fallback."""
    s = gb.strip()
    m = _GROUPING_HEAD_RE.match(s)
    if m is None:
        return None
    close = _scan_balanced(s, m.end())
    if close is None or s[close + 1:].strip():
        return None
    kind = re.sub(r"\s+", " ", m.group(1).upper())
    inner = s[m.end(): close]
    if kind in ("ROLLUP", "CUBE"):
        args = _split_top_level(inner)
        if not args or any(not a or "(" in a for a in args):
            return None
        uniq = list(dict.fromkeys(args))
        return GroupingSpec(uniq, kind, args, None)
    sets: list[tuple[str, ...]] = []
    for el in _split_top_level(inner):
        el = el.strip()
        if el.startswith("("):
            end = _scan_balanced(el, 1)
            if end is None or el[end + 1:].strip():
                return None
            members = [x for x in _split_top_level(el[1:end]) if x]
            if any("(" in x for x in members):
                return None
            sets.append(tuple(members))
        elif el and "(" not in el:
            sets.append((el,))
        else:
            return None
    if not sets:
        return None
    uniq = list(dict.fromkeys(e for s_ in sets for e in s_))
    return GroupingSpec(uniq, kind, None, tuple(sets))


def _where_tree(s: str):
    """Parse a WHERE body into WhereTree nodes, or None when any piece
    is not a literal comparison (subqueries, NOT, LIKE, functions-of-
    multiple-columns all fall back). OR splits BEFORE AND — SQL gives
    OR the loosest binding, so `a = 1 OR b = 2 AND c = 3` is
    a OR (b AND c), not (a OR b) AND c (r10 ADVICE, high)."""
    disj = _split_disjuncts(s)
    if len(disj) > 1:
        kids = [_where_tree(d) for d in disj]
        return None if any(k is None for k in kids) else ("or", kids)
    conj = _split_conjuncts(disj[0] if disj else s)
    if conj is None:
        return None
    if len(conj) > 1:
        kids = [_where_tree(c) for c in conj]
        return None if any(k is None for k in kids) else ("and", kids)
    c = conj[0]
    stripped = _strip_parens(c)
    if stripped != c.strip():
        return _where_tree(stripped)
    nm = re.match(r"^\s*NOT\b(?P<rest>.+)$", c, re.IGNORECASE | re.DOTALL)
    if nm:
        # NOT binds tighter than AND/OR (both already split above), so
        # it negates exactly the remaining single term. Negation of a
        # key-only predicate is still key-only — routing stays exact.
        # The sidecar planner has its own parse: it serves ONLY the
        # provable zone-complement shapes (NOT BETWEEN / NOT = / !=,
        # r12) and treats every other NOT fragment as before — no
        # restriction under AND, poison under OR.
        kid = _where_tree(nm.group("rest"))
        return None if kid is None else ("not", [kid])
    pm = _PRED_RE.match(c)
    if not pm or re.search(r"\b(OR|AND|NOT)\b", pm.group("e"),
                           re.IGNORECASE):
        return None
    if pm.group("lit") is not None:
        op_sql = f"{pm.group('op')} {pm.group('lit')}"
    elif pm.group("lo") is not None:
        op_sql = f"BETWEEN {pm.group('lo')} AND {pm.group('hi')}"
    else:
        op_sql = f"IN ({pm.group('ins')})"
    return ("leaf", pm.group("e").strip(), op_sql)


def _tree_rewrite_sql(t, key_map: dict) -> str | None:
    """Reassemble a WhereTree as SQL over GRID columns — every leaf
    expression must be a grid key (anything else returns None and the
    raw scan answers)."""
    if t[0] == "leaf":
        n = _norm_expr(t[1])
        if n not in key_map:
            return None
        return f"{key_map[n]} {t[2]}"
    parts = [_tree_rewrite_sql(k, key_map) for k in t[1]]
    if any(p is None for p in parts):
        return None
    if t[0] == "not":
        return f"(NOT {parts[0]})"
    return "(" + (" AND " if t[0] == "and" else " OR ").join(parts) + ")"


def _split_top_level(s: str) -> list[str]:
    """Split on commas outside parentheses."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


def _norm_expr(e: str) -> str:
    return re.sub(r"\s+", "", e.lower())


_AS_RE = re.compile(r"^(?P<expr>.+?)\s+AS\s+(?P<alias>[A-Za-z_]\w*)\s*$",
                    re.IGNORECASE | re.DOTALL)
_TAIL_SHAPE_RE = re.compile(
    r"^(?:ORDER\s+BY\s+(?P<ob>.+?))?\s*(?:LIMIT\s+\d+)?$",
    re.IGNORECASE | re.DOTALL,
)


def _tail_routable(tail: str, aliases: set[str]) -> bool:
    """An ORDER BY/LIMIT tail survives the rewrite verbatim only when every
    sort item is one of the rewritten select ALIASES (raw-table expressions
    would dangle against the rollup view)."""
    m = _TAIL_SHAPE_RE.match(tail)
    if not m:
        return False
    ob = m.group("ob")
    if not ob:
        return True
    for item in _split_top_level(ob):
        item = re.sub(r"\s+(ASC|DESC)\s*$", "", item.strip(), flags=re.IGNORECASE)
        if item.lower() not in aliases:
            return False
    return True


def _skip_literal(q: str, i: int) -> int:
    """q[i] is an opening `'`: index just PAST the literal's close,
    honoring Spark's lexer — `\\x` backslash escapes AND `''` doubling
    both continue the literal (the executing engine is spark.sql, so
    matching its rules is what keeps every scanner here in sync with
    what actually runs; the old single-toggle scan desynced on a literal
    ending in a lone backslash, r11 ADVICE). Unterminated → len(q)."""
    i += 1
    n = len(q)
    while i < n:
        ch = q[i]
        if ch == "\\":
            i += 2
            continue
        if ch == "'":
            if i + 1 < n and q[i + 1] == "'":
                i += 2  # doubled quote: escaped, literal continues
                continue
            return i + 1
        i += 1
    return n


def _skip_comment(q: str, i: int) -> int | None:
    """Index past a comment STARTING at i (`-- ...\\n` or `/* ... */`),
    or None when i is not a comment start. An apostrophe inside a
    comment must never open a literal — that desyncs every scanner
    downstream of it (conservatively: routing falls back, /explain
    rejects; this keeps both exact)."""
    if q.startswith("--", i):
        nl = q.find("\n", i)
        return len(q) if nl < 0 else nl + 1
    if q.startswith("/*", i):
        end = q.find("*/", i + 2)
        return len(q) if end < 0 else end + 2
    return None


def _scan_balanced(q: str, i: int) -> int | None:
    """q[i] is just past an opening `(` at depth 1: index OF the
    matching `)`, literal- and comment-aware. None if unbalanced."""
    depth = 1
    n = len(q)
    while i < n:
        ch = q[i]
        if ch == "'":
            i = _skip_literal(q, i)
            continue
        if ch in "-/":
            skipped = _skip_comment(q, i)
            if skipped is not None:
                i = skipped
                continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return None


# matched with .match(q, pos): no ^ anchor (it would never match at
# pos > 0 — match() already anchors at pos)
_CTE_NEXT_RE = re.compile(r"\s*,\s*([A-Za-z_]\w*)\s+AS\s*\(",
                          re.IGNORECASE)


def split_cte_chain(q: str) -> tuple[list[tuple[str, str]], str] | None:
    """([(name, body), ...], outer) for `WITH n1 AS (b1), n2 AS (b2),
    ... outer` — the full comma-separated definition list with
    balanced-paren, literal-aware bodies. None when the statement is not
    a WITH or a body never closes."""
    m = _CTE_HEAD_RE.match(q)
    if not m:
        return None
    defs: list[tuple[str, str]] = []
    name, i = m.group(1), m.end()
    while True:
        close = _scan_balanced(q, i)
        if close is None:
            return None
        defs.append((name, q[i:close].strip()))
        nm = _CTE_NEXT_RE.match(q, close + 1)
        if nm is None:
            return defs, q[close + 1:].strip()
        name, i = nm.group(1), nm.end()


def split_single_cte(q: str) -> tuple[str, str, str] | None:
    """(name, body, outer) for `WITH name AS ( body ) outer` — a SINGLE
    CTE definition with a balanced-paren body (quote-aware scan, so a
    `')'` inside a string literal never closes the body). Anything else
    (no WITH, unbalanced, a second comma-separated CTE) returns None."""
    got = split_cte_chain(q)
    if got is None or len(got[0]) != 1:
        return None
    (name, body), outer = got[0][0], got[1]
    if outer.startswith(","):
        return None  # `, 2 AS (...)`-style def the chain parser refused
    return name, body, outer


_FROM_CLAUSE_RE = re.compile(r"\bFROM\b", re.IGNORECASE)
_CLAUSE_END_RE = re.compile(
    r"\b(WHERE|GROUP\s+BY|ORDER\s+BY|HAVING|LIMIT|WINDOW|UNION"
    r"|INTERSECT|EXCEPT)\b", re.IGNORECASE)


def _from_clause_has_comma(sel: str) -> bool:
    """True when a FROM clause of `sel` carries a depth-0 comma — the
    comma-style join `FROM a, b` that the JOIN-keyword check misses
    (r11 ADVICE: such an outer routed, then died on the undiscovered
    second table instead of falling back). Literal- and paren-aware;
    unparseable text answers True (conservative: caller falls back)."""
    fm = _FROM_CLAUSE_RE.search(sel)
    if not fm:
        return False
    i, n = fm.end(), len(sel)
    while i < n:
        ch = sel[i]
        if ch == "'":
            i = _skip_literal(sel, i)
            continue
        if ch in "-/":
            skipped = _skip_comment(sel, i)
            if skipped is not None:
                i = skipped
                continue
        if ch == "(":
            close = _scan_balanced(sel, i + 1)
            if close is None:
                return True
            i = close + 1
            continue
        if ch == ",":
            return True
        em = _CLAUSE_END_RE.match(sel, i)
        if em and (i == 0 or not sel[i - 1].isalnum()):
            return False
        i += 1
    return False


_DERIVED_FROM_RE = re.compile(r"\b(?:FROM|JOIN)\s*\(", re.IGNORECASE)
# a clause keyword right after `FROM (...)` means the derived table has
# no alias — both engines reject that, so routing must not invent one
_NOT_AN_ALIAS = {
    "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "WINDOW", "UNION",
    "INTERSECT", "EXCEPT", "JOIN", "LEFT", "RIGHT", "FULL", "INNER",
    "CROSS", "ON", "AS",
}
_SETOP_RE = re.compile(r"(UNION|INTERSECT|EXCEPT)\b(\s+ALL\b)?",
                       re.IGNORECASE)


def _split_union_all(q: str) -> list[str] | None:
    """Split `q` on depth-0 UNION ALL boundaries (literal-, comment- and
    paren-aware). None when any depth-0 set operator is NOT a UNION ALL
    — a bare UNION (dedup), INTERSECT or EXCEPT (tighter binding) makes
    the whole statement unroutable — or when no set operator exists."""
    cuts: list[tuple[int, int]] = []
    i, n = 0, len(q)
    while i < n:
        ch = q[i]
        if ch == "'":
            i = _skip_literal(q, i)
            continue
        if ch in "-/":
            skipped = _skip_comment(q, i)
            if skipped is not None:
                i = skipped
                continue
        if ch == "(":
            close = _scan_balanced(q, i + 1)
            if close is None:
                return None
            i = close + 1
            continue
        m = _SETOP_RE.match(q, i)
        if m and (i == 0 or not (q[i - 1].isalnum() or q[i - 1] == "_")):
            if m.group(1).upper() != "UNION" or not m.group(2):
                return None
            cuts.append((i, m.end()))
            i = m.end()
            continue
        i += 1
    if not cuts:
        return None
    parts, prev = [], 0
    for start, end in cuts:
        parts.append(q[prev:start].strip())
        prev = end
    parts.append(q[prev:].strip())
    return parts


_WORD_RE = re.compile(r"[A-Za-z_]\w*")


def _first_code_token(q: str, i: int = 0) -> str:
    """First keyword-ish token at or after i, skipping whitespace,
    comments and opening parens (a parenthesized SELECT is a SELECT).
    Empty string when none."""
    n = len(q)
    while i < n:
        ch = q[i]
        if ch.isspace() or ch == "(":
            i += 1
            continue
        if ch in "-/":
            skipped = _skip_comment(q, i)
            if skipped is not None:
                i = skipped
                continue
        m = _WORD_RE.match(q, i)
        return m.group(0).upper() if m else ""
    return ""


def statement_is_select_only(sql: str) -> tuple[bool, str]:
    """(ok, offending_token) — anchored SELECT-only classification for
    /explain (r11 ADVICE). The old guard stripped literals with a
    backslash-only regex (desynced on `''`-doubled dialects) and then
    rejected DML keywords ANYWHERE — false-400s on a column literally
    named `update`. This walks the statement the way Spark's lexer does
    (literals honor backslash escapes AND '' doubling, comments skip)
    and checks only STATEMENT positions: the head token, and — for WITH
    — the first token after the CTE definition list closes (the exact
    spot Spark's grammar allows a smuggled INSERT/CREATE). A depth-0
    out-of-literal `;` followed by more code rejects too: spark.sql()
    is single-statement, so anything after one is at best a parse error
    and at worst a future surprise."""
    # statement-smuggling guard: code after a top-level semicolon
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            i = _skip_literal(sql, i)
            continue
        if ch in "-/":
            skipped = _skip_comment(sql, i)
            if skipped is not None:
                i = skipped
                continue
        if ch == ";" and _first_code_token(sql, i + 1):
            return False, ";"
        i += 1
    head = _first_code_token(sql)
    if head in ("SELECT", "VALUES", "TABLE"):
        return True, ""
    if head != "WITH":
        return False, head or "empty"
    got = split_cte_chain(sql)
    if got is None:
        return False, "WITH"  # unparseable definition list: conservative
    tail_head = _first_code_token(got[1])
    if tail_head in ("SELECT", "VALUES", "TABLE"):
        return True, ""
    return False, tail_head or "empty"


def parse_simple_aggregate(sql: str):
    """Parse `SELECT items FROM table [WHERE conjuncts] GROUP BY keys
    [HAVING conjuncts] [ORDER BY ...] [LIMIT n]` into
    (table, [(expr, alias_or_None)], [group_exprs], tail,
    [(pred_expr, op_sql) ...], [(having_expr, op_sql) ...]). The WHERE is
    accepted only as AND-ed `expr = literal` / `expr IN (literals)` /
    range / BETWEEN conjuncts, the HAVING only as AND-ed
    `expr op literal` comparisons — anything richer returns None
    (raw scan)."""
    m = _SIMPLE_AGG_RE.match(sql)
    if not m:
        return None
    preds: list[tuple[str, str]] | WhereTree = []
    scan_text = sql
    if m.group("where"):
        got = _parse_where_conjuncts(m.group("where"))
        if got is not None:
            preds = got
            canon = " AND ".join(f"{e} {op}" for e, op in preds) or "1 = 1"
        else:
            # not a flat conjunct list: accept any PROVEN boolean tree
            # of literal comparisons (mixed-key OR, r10) — the router
            # then requires every leaf to be a grid key
            tree = _where_tree(m.group("where"))
            if tree is None:
                return None
            preds = WhereTree(tree)
            canon = "1 = 1"
        # the WHERE body is now PROVEN routable — excuse it from the
        # forbidden scan by substituting a canonical form (the same
        # excusal discipline HAVING uses below); select items, group
        # keys and the tail are still scanned in full
        scan_text = sql.replace(m.group("where"), canon, 1)
    rest = m.group("rest")
    tm = _TAIL_SPLIT_RE.search(rest)
    gb, tail = (rest[: tm.start()], rest[tm.start():]) if tm else (rest, "")
    tail = tail.strip()
    havings: list[tuple[str, str]] | WhereTree = []
    if tail[:6].upper() == "HAVING":
        hm = _HAVING_RE.match(tail)
        if not hm:
            return None
        conjuncts = _split_conjuncts(hm.group("body")) or []
        # a depth-0 OR means the body is a DISJUNCTION (OR binds
        # loosest) — never a flat conjunct list; go straight to the
        # proven-tree path below
        ok_flat = bool(conjuncts) and \
            len(_split_disjuncts(hm.group("body"))) == 1
        flat: list[tuple[str, str]] = []
        for c in conjuncts:
            pm = re.match(
                r"^(?P<e>.+?)\s*(?P<op>>=|<=|<>|!=|>|<|=)\s*(?P<lit>"
                + _LIT + r")\s*$", c, re.DOTALL)
            if not pm or re.search(r"\b(OR|AND|NOT)\b", pm.group("e"),
                                   re.IGNORECASE):
                ok_flat = False
                break
            flat.append((pm.group("e").strip(),
                         f"{pm.group('op')} {pm.group('lit')}"))
        if ok_flat:
            havings = flat
            # keep the BODY visible to the forbidden scan (CASE/... inside
            # a having conjunct must reject) — only the structural keyword
            # is excused; a whitespace-normalization miss leaves sql
            # unchanged, which is strictly MORE conservative
            scan_text = scan_text.replace(hm.group(0), hm.group("body"), 1)
        else:
            # r10: not a flat conjunct list — accept any PROVEN boolean
            # tree of literal comparisons (HAVING a > x OR b > y). HAVING
            # filters re-aggregated GROUPS, so any boolean structure of
            # mapped comparisons is exact; the router requires every leaf
            # to map through the same key/agg/avg rewrite. The proven
            # tree is excused from the forbidden scan entirely (leaves
            # are bare comparisons by construction).
            t = _where_tree(hm.group("body"))
            if t is None:
                return None
            havings = WhereTree(t)
            scan_text = scan_text.replace(hm.group(0), "1 = 1", 1)
        tail = tail[hm.end():].strip()
    if _FORBIDDEN_RE.search(_COUNT_DISTINCT_RE.sub("cnt()", scan_text)):
        return None
    items = []
    for it in _split_top_level(m.group("sel")):
        am = _AS_RE.match(it)
        if am:
            items.append((am.group("expr").strip(), am.group("alias")))
        else:
            items.append((it, it if re.fullmatch(r"[A-Za-z_]\w*", it) else None))
    gspec = _parse_grouping_construct(gb)
    return (m.group("tbl"), items,
            gspec if gspec is not None else [g for g in _split_top_level(gb)],
            tail, preds, havings)


def resolve_table(sql: str) -> tuple[str, int | None]:
    """First FROM target (the reference extracts only the first —
    query.js:71-84, a documented mis-planning for multi-table SQL; we
    return it for routing but execute the full SQL faithfully).
    Returns (table_name, hep_type or None)."""
    m = _FROM_RE.search(sql)
    if not m:
        raise ValueError("no FROM clause found")
    name = m.group(1)
    hep = re.fullmatch(r"hep_(\d+)", name)
    return name, (int(hep.group(1)) if hep else None)


def normalize_count(sql: str) -> str:
    """`count()` -> `count(*)` (reference surface via DuckDB; B6)."""
    return _COUNT_RE.sub("count(*)", sql)


def has_time_predicate(sql: str) -> bool:
    return _TIME_PRED_RE.search(sql) is not None


def inject_default_window(sql: str, now: datetime | None = None,
                          time_col: str = "time") -> str:
    """If no `time` predicate exists, constrain to the last 10 minutes
    (query.js:110-117). Injected as an AND-wrapped predicate right after
    WHERE, or a new WHERE before GROUP/ORDER/LIMIT."""
    if has_time_predicate(sql):
        return sql
    now = now or datetime.now(timezone.utc)
    start = now - DEFAULT_TIME_RANGE
    fmt = "%Y-%m-%d %H:%M:%S.%f"
    pred = (
        f"{time_col} >= TIMESTAMP '{start.strftime(fmt)}' "
        f"AND {time_col} <= TIMESTAMP '{now.strftime(fmt)}'"
    )
    wm = _WHERE_RE.search(sql)
    if wm:
        # WHERE <rest>  ->  WHERE (pred) AND (<rest>)
        head, tail = sql[: wm.end()], sql[wm.end():]
        tm = _TAIL_RE.search(tail)
        cond = tail[: tm.start()] if tm else tail
        rest = tail[tm.start():] if tm else ""
        return f"{head} {pred} AND ({cond.strip()}) {rest}".rstrip()
    tm = _TAIL_RE.search(sql)
    if tm:
        return f"{sql[:tm.start()]} WHERE {pred} {sql[tm.start():]}"
    return f"{sql.rstrip().rstrip(';')} WHERE {pred}"


class HepopQueryAPI:
    """The `/query` endpoint semantics (hepop.js:1018-1059) over spark.sql.

    Tables must be registered views (catalog.register_views /
    register_hep_view — the HEP views already expose `time` and the
    src_ip/dst_ip/src_port/dst_port virtual fields)."""

    def __init__(self, spark: SparkSession, default_window: bool = True,
                 data_dir: str | None = None,
                 max_rows: int | None = DEFAULT_MAX_ROWS):
        self.spark = spark
        self.default_window = default_window
        # JSON-path row ceiling (None = opt out, reference-faithful
        # unbounded materialization); query_json RETURNS the truncation
        # flag per call — the last_* attributes below are debug-only
        # breadcrumbs and must never be read for correctness: the HTTP
        # layer is a ThreadingHTTPServer, so concurrent queries would race
        # on instance state (r06 verdict item 1).
        self.max_rows = max_rows
        self.last_truncated = False
        # serve-mode storage root: when set, tables are discovered FRESH on
        # every query from {data_dir}/*/dbs/{table} — the reference's
        # per-query metadata re-read (query.js:36-38) and multi-writer
        # federation (query.js:24-33) in one step (catalog.discover_table);
        # the fingerprint cache skips footer re-reads while file state is
        # unchanged (same freshness, cheaper hot loop)
        self.data_dir = data_dir
        self._view_fingerprints: dict[str, str] = {}
        self.last_routed_rollup: str | None = None  # debug breadcrumb
        self.last_bloom_pruned: dict | None = None  # debug breadcrumb

    def sql(self, query: str, now: datetime | None = None) -> DataFrame:
        q = normalize_count(query)
        routed = self._try_rollup_route(q) if self.data_dir else None
        if routed is None and self.data_dir:
            routed = self._try_join_route(q)
        if routed is None and self.data_dir:
            routed = self._try_cte_route(q)
        if routed is None and self.data_dir:
            routed = self._try_derived_route(q)
        if routed is None and self.data_dir:
            routed = self._try_union_route(q)
        if routed is not None:
            self.last_sql = routed
            return self.spark.sql(routed)
        self.last_table, self.last_hep_type = resolve_table(q)
        if self.data_dir is not None:
            from ..catalog import discover_table

            discover_table(
                self.spark, self.data_dir, self.last_table, self.last_hep_type,
                cache=self._view_fingerprints,
            )
            # multi-table SQL (joins, self-joins via aliases): discover
            # EVERY FROM/JOIN target best-effort, not just the first —
            # the reference plans only the first (query.js:71-84) but
            # executes the full SQL through DuckDB, which sees all its
            # tables; our serve equivalent of "DuckDB sees it" is a
            # registered view per discovered dir (fingerprint-cached, so
            # the steady-state cost is a stat per table per query)
            for name in {m.group(1) for m in re.finditer(
                    r"\b(?:FROM|JOIN)\s+([A-Za-z_]\w*)", q,
                    re.IGNORECASE)} - {self.last_table}:
                hep = re.fullmatch(r"hep_(\d+)", name)
                try:
                    discover_table(
                        self.spark, self.data_dir, name,
                        int(hep.group(1)) if hep else None,
                        cache=self._view_fingerprints,
                    )
                except Exception:
                    pass  # not a serve table; a registered view may resolve
        if self.default_window and self._view_has_time(self.last_table):
            q = inject_default_window(q, now=now)
        self.last_sql = q
        if self.data_dir is not None:
            pruned = self._try_bloom_sql(q)
            if pruned is not None:
                return pruned
        return self.spark.sql(q)

    def _try_bloom_sql(self, q: str) -> DataFrame | None:
        """Answer `q` from a sidecar-pruned file set when its WHERE
        carries conjuncts a per-file index can serve
        (storage/bloom_index.py): equality/IN against a Bloom-bitmapped
        column, range/BETWEEN/equality against a min-max ZONE column.
        All applicable probes INTERSECT (every conjunct must hold, so a
        file any probe excludes cannot hold a matching row); the
        predicate itself still runs; dirs without a sidecar keep their
        full file list — this path can only ever REMOVE scan work.
        Anything un-analyzable returns None and the raw view answers.
        The pruned view is per-query (unique name, dropped after
        analysis): concurrent HTTP threads never share one."""
        import glob as _glob
        import os
        import uuid as _uuid

        self.last_bloom_pruned = None
        table = self.last_table
        # conservative shape gates: one FROM, no qualified column refs
        # (the rewritten view name would dangle), no subqueries
        if len(_FROM_RE.findall(q)) != 1 or re.search(
                rf"\b{re.escape(table)}\s*\.", q):
            return None
        wm = _WHERE_RE.search(q)
        if not wm:
            return None
        tail_m = _TAIL_RE.search(q, wm.end())
        where_body = q[wm.end(): tail_m.start() if tail_m else len(q)]
        try:
            dtypes = dict(self.spark.table(table).dtypes)
        except Exception:
            return None

        def _lit_value(lit: str, col: str, *, for_zone: bool):
            lit = lit.strip()
            if lit.startswith("'"):
                # `map.key` sidecar columns are string-valued by the
                # map<string,string> gate above
                if "." in col or dtypes.get(col) == "string":
                    return lit[1:-1]
                return None
            integral = ("bigint", "int", "smallint", "tinyint")
            if re.fullmatch(r"-?\d+", lit):
                # bloom bitmaps hash CAST(col AS STRING): only exact
                # integral matches reproduce; zone compares numerically,
                # so numeric columns of any type are fine
                if for_zone:
                    return (int(lit) if dtypes.get(col) in integral
                            + ("double", "float") else None)
                return int(lit) if dtypes.get(col) in integral else None
            if for_zone and re.fullmatch(r"-?\d+\.\d+", lit):
                return (float(lit) if dtypes.get(col) in ("double", "float")
                        else None)
            return None

        dir_glob = os.path.join(self.data_dir, "*", "dbs", table)

        def _has(sub: str, col: str) -> bool:
            # either sidecar layout: the r10 sharded `{col}.d/` store or
            # a legacy r09 monolithic `{col}.json`
            return bool(
                _glob.glob(os.path.join(dir_glob, sub, f"{col}.d"))
                or _glob.glob(os.path.join(dir_glob, sub, f"{col}.json")))

        from ..storage.bloom_index import bloom_candidates, zone_candidates
        from ..storage.trigram_index import like_runs, trigram_candidates

        _COL_GRAMMAR = (
            r"(?P<col>[A-Za-z_]\w*(?:\[\s*'[A-Za-z0-9_.-]+'\s*\])?"
            r"|get_json_object\s*\(\s*[A-Za-z_]\w*\s*,\s*"
            r"'\$\.[A-Za-z0-9_.-]+'\s*\))"
        )

        def _resolve_col(raw: str) -> str | None:
            """Sidecar column spec for a conjunct's LHS: a bare name, or
            `base.key` for map access / JSON extraction (string-valued by
            the dtype gates). None = shape a sidecar cannot serve."""
            km = re.fullmatch(
                r"([A-Za-z_]\w*)\[\s*'([A-Za-z0-9_.-]+)'\s*\]", raw)
            jm = re.fullmatch(
                r"get_json_object\s*\(\s*([A-Za-z_]\w*)\s*,\s*"
                r"'\$\.([A-Za-z0-9_.-]+)'\s*\)", raw, re.IGNORECASE)
            if km:
                base, key = km.group(1), km.group(2)
                if not str(dtypes.get(base, "")).startswith(
                        "map<string,string"):
                    return None
                return f"{base}.{key}"
            if jm:
                base, key = jm.group(1), jm.group(2)
                if dtypes.get(base) != "string":
                    return None
                return f"{base}.{key}"
            return raw

        def _leaf(c: str):
            """Analyze ONE comparison: [(probe_tag, candidate_fn)] — an
            empty list means this fragment cannot restrict files (no
            sidecar / un-analyzable literal), which is fine under AND
            (others restrict) and poisons an OR (see _node)."""
            out = []
            cm = re.fullmatch(
                r"\s*contains\s*\(\s*" + _COL_GRAMMAR +
                r"\s*,\s*'(?P<lit>[^']*)'\s*\)\s*",
                c, re.IGNORECASE | re.DOTALL)
            if cm:
                # contains(col, 'needle') — the function spelling of
                # LIKE '%needle%' (no wildcards, so the literal IS the
                # single run)
                col = _resolve_col(cm.group("col"))
                if col is None or (
                        "." not in col and dtypes.get(col) != "string"):
                    return out
                lit = cm.group("lit")
                if len(lit) >= 3 and _has("_trigram", col):
                    out.append((("trigram", col),
                                lambda d, within=None, col=col, lit=lit:
                                trigram_candidates(d, col, [lit],
                                                   within=within)[0]))
                return out
            lm = re.fullmatch(
                r"\s*" + _COL_GRAMMAR + r"\s+LIKE\s+'(?P<pat>[^']*)'\s*",
                c, re.IGNORECASE | re.DOTALL)
            if lm:
                # substring search: LIKE '%needle%' prunes by the trigram
                # sidecar — a matching row contains every literal run of
                # the pattern, hence every trigram of each run
                col = _resolve_col(lm.group("col"))
                if col is None:
                    return out
                if "." not in col and dtypes.get(col) != "string":
                    return out
                pat = lm.group("pat")
                runs = like_runs(pat)
                if runs and _has("_trigram", col):
                    out.append((("trigram", col),
                                lambda d, within=None, col=col, runs=runs:
                                trigram_candidates(d, col, runs,
                                                   within=within)[0]))
                # a literal PREFIX additionally prunes by the string ZONE:
                # every match lies in [prefix, prefix+￿...] and file
                # min/max compare lexicographically in parquet stats and
                # Python alike (escape syntax already refused above)
                if runs is not None:
                    prefix = re.split(r"[%_]", pat, maxsplit=1)[0]
                    if prefix and ord(prefix[-1]) < 0x10FFFF \
                            and _has("_zone", col):
                        # closed superset [prefix, prefix[:-1]+succ]:
                        # every prefix-match sorts inside it (UTF-8 byte
                        # order == code-point order, so Spark's file
                        # min/max and this Python compare agree)
                        hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
                        out.append((("zone", col),
                                    lambda d, within=None, col=col,
                                    lo=prefix, hi=hi:
                                    zone_candidates(d, col, lo, hi,
                                                    within=within)[0]))
                return out
            m = re.fullmatch(
                r"\s*" + _COL_GRAMMAR +
                r"\s*(?:(?P<op>>=|<=|>|<|=)\s*"
                r"(?P<lit>" + _LIT + r")"
                r"|BETWEEN\s+(?P<lo>" + _LIT + r")\s+AND\s+(?P<hi>"
                + _LIT + r")"
                r"|IN\s*\(\s*(?P<ins>(" + _LIT + r")(\s*,\s*(" + _LIT
                + r"))*)\s*\))\s*",
                c, re.IGNORECASE | re.DOTALL)
            if not m:
                return out
            col = _resolve_col(m.group("col"))
            if col is None:
                return out
            op = m.group("op")
            if op == "=" or m.group("ins") is not None:
                lits = ([m.group("lit")] if op == "="
                        else _split_top_level(m.group("ins")))
                vals = [_lit_value(v, col, for_zone=False) for v in lits]
                if all(v is not None for v in vals) and _has("_bloom", col):
                    out.append((("bloom", col),
                                lambda d, within=None, col=col, vals=vals:
                                bloom_candidates(d, col, vals,
                                                 within=within)[0]))
                    return out
            lo = hi = None
            if op in (">", ">="):
                lo = _lit_value(m.group("lit"), col, for_zone=True)
                ok_range = lo is not None
            elif op in ("<", "<="):
                hi = _lit_value(m.group("lit"), col, for_zone=True)
                ok_range = hi is not None
            elif op == "=":
                lo = hi = _lit_value(m.group("lit"), col, for_zone=True)
                ok_range = lo is not None
            elif m.group("lo") is not None:
                lo = _lit_value(m.group("lo"), col, for_zone=True)
                hi = _lit_value(m.group("hi"), col, for_zone=True)
                ok_range = lo is not None and hi is not None
            else:
                ok_range = False
            # strict bounds keep zone semantics: pruning by the CLOSED
            # interval is a superset of the open one — never wrong
            if ok_range and _has("_zone", col):
                out.append((("zone", col),
                            lambda d, within=None, col=col, lo=lo, hi=hi:
                            zone_candidates(d, col, lo, hi,
                                            within=within)[0]))
            return out

        def _not_leaf(c: str):
            """Negated comparison servable by the ZONE sidecar's
            COMPLEMENT (r11 verdict item 2): `NOT (col BETWEEN lo AND
            hi)`, `NOT col = lit`, `col != lit`, `col <> lit` skip files
            whose zone proves every row inside the negated set.
            Bloom/trigram never serve negation — may-contain proves
            nothing about a complement — and every OTHER NOT shape
            returns [] exactly as before: skipped under AND, poison
            under OR (no false negatives)."""
            body = c.strip()
            lo_s = hi_s = m = None
            nm = re.match(r"^\s*NOT\b(?P<rest>.+)$", body,
                          re.IGNORECASE | re.DOTALL)
            if nm:
                inner = _strip_parens(nm.group("rest"))
                m = re.fullmatch(
                    r"\s*" + _COL_GRAMMAR + r"\s*=\s*(?P<lit>" + _LIT
                    + r")\s*", inner, re.IGNORECASE | re.DOTALL)
                if m:
                    lo_s = hi_s = m.group("lit")
                else:
                    m = re.fullmatch(
                        r"\s*" + _COL_GRAMMAR + r"\s+BETWEEN\s+(?P<lo>"
                        + _LIT + r")\s+AND\s+(?P<hi>" + _LIT + r")\s*",
                        inner, re.IGNORECASE | re.DOTALL)
                    if m:
                        lo_s, hi_s = m.group("lo"), m.group("hi")
            else:
                m = re.fullmatch(
                    r"\s*" + _COL_GRAMMAR + r"\s*(?:!=|<>)\s*(?P<lit>"
                    + _LIT + r")\s*", body, re.IGNORECASE | re.DOTALL)
                if m:
                    lo_s = hi_s = m.group("lit")
            if m is None or lo_s is None:
                return []
            col = _resolve_col(m.group("col"))
            if col is None:
                return []
            lo = _lit_value(lo_s, col, for_zone=True)
            hi = _lit_value(hi_s, col, for_zone=True)
            if lo is None or hi is None or not _has("_zone", col):
                return []
            from ..storage.bloom_index import zone_complement_candidates

            return [(("zone_not", col),
                     lambda d, within=None, col=col, lo=lo, hi=hi:
                     zone_complement_candidates(d, col, lo, hi,
                                                within=within)[0])]

        def _chain(tagged):
            """AND-compose [(tag, fn)]: each probe receives the previous
            survivors (`within`), so later probes open only segments for
            partitions still in play."""
            if not tagged:
                return None
            def f(d, within=None, tagged=tuple(tagged)):
                cur = within
                for _tag, k in tagged:
                    cur = sorted(k(d, within=cur))
                return cur
            return [t for t, _k in tagged], f

        def _node(text: str):
            """Candidate-restriction for a WHERE fragment as a boolean
            tree (r10): AND chains children (un-restrictive pieces are
            simply skipped — the residual predicate still runs); OR
            unions children's candidates and is usable ONLY when every
            branch restricts (a file matching an un-analyzable branch
            must be scanned). OR splits BEFORE AND — OR binds loosest
            in SQL, so `a = 1 OR b = 2 AND c = 3` is a OR (b AND c);
            the old AND-first order intersected the c-probe into the
            union and FALSE-NEGATIVELY pruned files whose rows satisfy
            only the a-branch (r10 ADVICE, high).
            Returns ([probe_tags], fn) or None."""
            disj = _split_disjuncts(text)
            if len(disj) > 1:
                kids = [_node(p) for p in disj]
                if any(k is None for k in kids):
                    return None
                tags = [t for ts, _f in kids for t in ts]
                def f_or(d, within=None, kids=tuple(kids)):
                    base = within
                    got: set = set()
                    for _ts, k in kids:
                        got |= set(k(d, within=base))
                    return sorted(got)
                return tags, f_or
            body = disj[0] if disj else text
            parts = _split_conjuncts(body) or []
            if len(parts) > 1:
                kids = [k for k in (_node(p) for p in parts) if k]
                if not kids:
                    return None
                tags = [t for ts, _f in kids for t in ts]
                def f_and(d, within=None, kids=tuple(kids)):
                    cur = within
                    for _ts, k in kids:
                        cur = sorted(k(d, within=cur))
                    return cur
                return tags, f_and
            stripped = _strip_parens(body)
            if stripped != body.strip():
                return _node(stripped)
            negated = _not_leaf(body)
            if negated:
                return _chain(negated)
            return _chain(_leaf(body))

        root = _node(where_body)
        if root is None:
            return None
        probes, root_fn = root

        ff_cache: dict[str, list[str]] = {}

        def file_filter(d: str) -> list[str]:
            if d not in ff_cache:
                ff_cache[d] = sorted(root_fn(d, within=None))
            return ff_cache[d]

        from ..catalog import discover_table

        view = f"{table}__pruned_{_uuid.uuid4().hex[:8]}"
        try:
            if not discover_table(self.spark, self.data_dir, table,
                                  self.last_hep_type,
                                  file_filter=file_filter,
                                  view_name=view):
                return None
            q2 = _FROM_RE.sub(f"FROM {view}", q, count=1)
            df = self.spark.sql(q2)  # analyzed eagerly: view resolved here
            self.last_sql = q2  # debug breadcrumb (/explain shows it)
            from ..storage.bloom_index import _live_files

            dirs = sorted(_glob.glob(dir_glob))
            n_live = sum(len(_live_files(d)) for d in dirs)
            # file_filter results are memoized from the view build — the
            # breadcrumb never re-probes
            n_read = sum(len(file_filter(d)) for d in dirs)
            self.last_bloom_pruned = {
                "probes": probes,
                "col": probes[0][1],
                "files_live": n_live,
                "files_read": n_read,
            }
            return df
        except Exception:
            return None  # raw view answers; pruning is best-effort
        finally:
            try:
                self.spark.catalog.dropTempView(view)
            except Exception:
                pass

    def _try_cte_route(self, q: str) -> str | None:
        """Route the routable body of a CTE wrapper onto a maintained
        grid (r10 verdict item 6; chains and outer joins r12): BI tools
        emit `WITH agg AS (SELECT k, count(*) FROM t GROUP BY k)
        SELECT ... FROM agg ...`, and the bare-SELECT router never sees
        the inner aggregate. Body substitution is semantics-preserving —
        the routed body computes the SAME rows — so everything around it
        runs verbatim over the rewritten CTE. Three proven shapes, each
        obligation falling back to the raw scan when unmet:

        - single CTE, outer a SELECT over ONLY the CTE (r11);
        - single CTE, outer a SELECT that JOINs the CTE to dimension
          tables (r12): the joined raw tables are DISCOVERED here (the
          routed fast path skips the main sql() discovery loop) and
          must resolve; substitution leaves the join text verbatim, so
          any join type/multiplicity is exact;
        - a LINEAR chain `WITH a AS (<routable>), b AS (... FROM a)
          ... outer` (r12): the FIRST body routes; every later body and
          the outer must be a SELECT over exactly the PREVIOUS name —
          single FROM, referenced once, no JOIN, no comma-join — so no
          undiscovered raw table can hide downstream;
        - PARALLEL CTEs joined in the outer (r12c): `WITH a AS
          (<routable>), b AS (<routable>) SELECT ... FROM a JOIN b ...`
          — EVERY body routes independently (none references another
          CTE), the outer FROMs one CTE and JOINs each remaining CTE
          exactly once (plus discovered dims); all substitutions are
          the same semantics-preserving argument applied per body.

        Shared obligations: no nested WITH anywhere; no depth-0 comma
        in any consumer's FROM clause (the comma-style join the JOIN-
        keyword check missed, r11 ADVICE); each CTE name referenced
        exactly once by its consumer.

        Scale: the outer/chain is cheap post-processing of O(|grid|)
        routed rows — without the unwrap the most common generated-SQL
        wrappers pay the full raw scan."""
        got = split_cte_chain(q)
        if got is None:
            return None
        defs, outer = got
        if not defs or not re.match(r"^\s*SELECT\b", outer, re.IGNORECASE):
            return None
        if any(re.search(r"\bWITH\b", b, re.IGNORECASE) for _n, b in defs) \
                or re.search(r"\bWITH\b", outer, re.IGNORECASE):
            return None
        names = [n for n, _b in defs]
        if len({n.lower() for n in names}) != len(names):
            return None  # duplicate CTE names: shadowing, unproven
        if len(defs) >= 2:
            parallel = self._try_parallel_cte(defs, outer)
            if parallel is not None:
                return parallel
        # every consumer (later bodies + outer) over exactly the
        # previous CTE name — except the outer of a SINGLE-cte wrapper,
        # which may also JOIN discovered dims (checked below)
        consumers = [b for _n, b in defs[1:]] + [outer]
        for idx, cons in enumerate(consumers):
            prev = names[idx]
            is_outer = idx == len(consumers) - 1
            if _from_clause_has_comma(cons):
                return None
            from_targets = _FROM_RE.findall(cons)
            has_join = re.search(r"\bJOIN\b", cons, re.IGNORECASE)
            if is_outer and has_join:
                # OUTER + JOIN (single CTE or a chain tail): the
                # CTE/chain-tail anchors the FROM exactly once
                # (qualified column refs `agg.x` are fine — they resolve
                # against the substituted CTE); every JOIN target is a
                # dim that must discover/resolve HERE, because the
                # routed fast path skips the main sql() discovery loop.
                # Mid-chain bodies stay JOIN-free (the else branch).
                if len(from_targets) != 1 \
                        or from_targets[0].lower() != prev.lower():
                    return None
                dims = {m.group(1) for m in re.finditer(
                    r"\bJOIN\s+([A-Za-z_]\w*)", cons, re.IGNORECASE)}
                if not dims or prev.lower() in {d.lower() for d in dims}:
                    return None
                from ..catalog import discover_table

                for dim in sorted(dims):
                    hep = re.fullmatch(r"hep_(\d+)", dim)
                    try:
                        found = discover_table(
                            self.spark, self.data_dir, dim,
                            int(hep.group(1)) if hep else None,
                            cache=self._view_fingerprints)
                        if not found and not self.spark.catalog.tableExists(
                                dim):
                            return None
                    except Exception:
                        return None
            else:
                if has_join:
                    return None
                if len(from_targets) != 1 \
                        or from_targets[0].lower() != prev.lower():
                    return None
                if len(re.findall(rf"\b{re.escape(prev)}\b", cons,
                                  re.IGNORECASE)) != 1:
                    return None
            # no OTHER CTE name may leak into this consumer (linear
            # chain: each name is consumed exactly by its successor)
            for other in names[:idx] + names[idx + 1:]:
                if re.search(rf"\b{re.escape(other)}\b", cons,
                             re.IGNORECASE):
                    return None
        routed_body = self._try_rollup_route(defs[0][1])
        if routed_body is None:
            return None
        rest = "".join(
            f", {n} AS ({b}) " for n, b in defs[1:]
        )
        return (f"WITH {defs[0][0]} AS ({routed_body})"
                f"{rest.rstrip() or ''} {outer}")

    def _try_parallel_cte(self, defs, outer: str) -> str | None:
        """The parallel-CTE JOIN shape (r12c): every CTE body is an
        INDEPENDENT routable aggregate (no body references another CTE
        name), and the outer joins them — `FROM <cte1> JOIN <cte2> ON
        ...` with optional further JOINs to the remaining CTEs and to
        discovered dimension tables. The segment-comparison report BI
        tools generate (two filtered aggregates joined on their group
        key). Substituting each routed body is the per-body
        semantics-preserving argument; the outer join text runs
        verbatim, so any join type/multiplicity is exact. Obligations
        beyond the caller's shared ones: outer is a JOIN-bearing SELECT
        whose single FROM target is one CTE; every OTHER CTE appears
        exactly once, as a JOIN target; non-CTE JOIN targets must
        discover/resolve (the routed fast path skips sql() discovery);
        EVERY body must route — one raw branch would leave an
        undiscovered table behind the rewrite.

        Scale: each branch is an O(|grid|) scan; the join runs over
        grid-sized sides (broadcast-eligible) instead of joining two
        full corpus aggregations."""
        names = [n for n, _b in defs]
        lowered = {n.lower() for n in names}
        for _n, b in defs:
            if any(re.search(rf"\b{re.escape(nm)}\b", b, re.IGNORECASE)
                   for nm in names):
                return None  # a body references a CTE: chain, not parallel
        if _from_clause_has_comma(outer):
            return None
        if not re.search(r"\bJOIN\b", outer, re.IGNORECASE):
            return None
        from_targets = _FROM_RE.findall(outer)
        if len(from_targets) != 1 or from_targets[0].lower() not in lowered:
            return None
        join_targets = [m.group(1) for m in re.finditer(
            r"\bJOIN\s+([A-Za-z_]\w*)", outer, re.IGNORECASE)]
        # each CTE consumed exactly once: the FROM anchor plus one JOIN
        # per remaining name; a CTE joined twice (self-join) or absent
        # is unproven
        consumed = [from_targets[0].lower()] + [t.lower()
                                                for t in join_targets
                                                if t.lower() in lowered]
        if sorted(consumed) != sorted(lowered):
            return None
        from ..catalog import discover_table

        for dim in sorted({t for t in join_targets
                           if t.lower() not in lowered}):
            hep = re.fullmatch(r"hep_(\d+)", dim)
            try:
                found = discover_table(
                    self.spark, self.data_dir, dim,
                    int(hep.group(1)) if hep else None,
                    cache=self._view_fingerprints)
                if not found and not self.spark.catalog.tableExists(dim):
                    return None
            except Exception:
                return None
        routed_bodies = []
        for _n, b in defs:
            r = self._try_rollup_route(b)
            if r is None:
                return None
            routed_bodies.append(r)
        heads = ", ".join(
            f"{n} AS ({r})" for (n, _b), r in zip(defs, routed_bodies))
        return f"WITH {heads} {outer}"

    def _try_derived_route(self, q: str) -> str | None:
        """Route `SELECT ... FROM ( <routable aggregate> ) [AS] t ...`
        (r12): the derived-table spelling of the CTE wrapper that BI
        tools emit interchangeably with WITH. The subquery is lifted
        into the equivalent single-CTE form under its alias and the
        whole statement delegates to _try_cte_route, which owns every
        consumer obligation (single FROM target, no comma-join, JOIN
        dims discovered, no nested WITH) — so the two spellings can
        never drift. r12c: EVERY `FROM (...) t` / `JOIN (...) u`
        subquery is lifted — two joined derived aggregates become the
        parallel-CTE shape under the same proof. Each subquery must
        carry an alias (both engines require one; a clause keyword
        after the close-paren means none) and aliases must be distinct.
        Lifting is semantics-preserving: a named CTE body computes the
        SAME rows the inline subquery did."""
        if re.search(r"\bWITH\b", q, re.IGNORECASE):
            return None
        defs: list[tuple[str, str]] = []
        out, pos = [], 0
        while True:
            m = _DERIVED_FROM_RE.search(q, pos)
            if m is None:
                out.append(q[pos:])
                break
            close = _scan_balanced(q, m.end())
            if close is None:
                return None
            body = q[m.end(): close].strip()
            am = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)", q[close + 1:],
                          re.IGNORECASE)
            if am is None or am.group(1).upper() in _NOT_AN_ALIAS:
                return None
            alias = am.group(1)
            defs.append((alias, body))
            kw = m.group(0)[:-1].rstrip()  # FROM or JOIN, spacing kept
            out.append(q[pos: m.start()] + f"{kw} {alias} ")
            pos = close + 1 + am.end()
        if not defs:
            return None
        if len({a.lower() for a, _b in defs}) != len(defs):
            return None  # duplicate aliases: shadowing, unproven
        outer = "".join(out).strip()
        heads = ", ".join(f"{a} AS ({b})" for a, b in defs)
        return self._try_cte_route(f"WITH {heads} {outer}")

    def _try_union_route(self, q: str) -> str | None:
        """Route every branch of a depth-0 `UNION ALL` chain onto
        maintained grids (r12). Branch substitution is exact for the
        same reason CTE substitution is — each routed branch computes
        the SAME rows, and UNION ALL is a bag union of branch results —
        so the rejoined text (including any trailing ORDER BY/LIMIT,
        which stays attached to the last branch's text exactly where
        the original parse put it) runs verbatim. ALL branches must
        route: a raw branch would need the main sql() discovery loop
        this fast path skips. Conservative scope: only UNION ALL — a
        bare UNION's dedup or INTERSECT/EXCEPT's tighter binding would
        need a precedence proof no routed query yet earns."""
        branches = _split_union_all(q)
        if branches is None or len(branches) < 2:
            return None
        routed = []
        for b in branches:
            if not re.match(r"^\s*SELECT\b", b, re.IGNORECASE):
                return None
            r = self._try_rollup_route(b)
            if r is None:
                return None
            routed.append(r)
        return " UNION ALL ".join(routed)

    def _try_rollup_route(self, q: str) -> str | None:
        """Rewrite a matching aggregate over a RAW table onto a maintained
        rollup grid (r07 verdict item 3). Returns the rewritten SQL (FROM
        the rollup view, which is registered as a side effect) or None —
        in which case the caller scans raw, so routing can only ever
        REMOVE work. Matching is proof-based: the store's `source`
        contract must cover the query's table, every GROUP BY expression,
        every WHERE conjunct (AND-ed equality/IN/range/BETWEEN against
        literals, on GRID KEY expressions only — filtering a key SELECTS
        grid rows, so results stay exact; a filter on a raw measure
        column can never route), and every
        select item (keys verbatim; aggregates by normalized expression
        equality, aliased). A GROUP BY over a SUBSET of the grid's keys
        re-aggregates the grid (sum-monoid by the store contract), the
        Timescale continuous-aggregate shape."""
        import glob as _glob
        import os

        from ..storage.rollup import projection_meta

        # clear the debug breadcrumb up front: early un-routable returns
        # (unparseable shape, time-faced table) must not leave the
        # PREVIOUS query's routed store name dangling
        self.last_routed_rollup = None
        parsed = parse_simple_aggregate(q)
        if parsed is None:
            return None
        table, items, group_exprs, tail, preds, havings = parsed
        if self.default_window:
            # the grid has no time dimension: routing a query whose raw
            # form would receive the implicit last-10-minutes window
            # (time-bearing table, no time predicate — and the simple-agg
            # shape never has one) would silently widen it to all-time.
            # Only tables WITHOUT a time face (document/vector corpora)
            # route while the default window is on.
            from ..catalog import discover_table

            hep = re.fullmatch(r"hep_(\d+)", table)
            try:
                found = discover_table(
                    self.spark, self.data_dir, table,
                    int(hep.group(1)) if hep else None,
                    cache=self._view_fingerprints,
                )
                if found and "time" in self.spark.table(table).columns:
                    return None
            except Exception:
                return None
        gset = {_norm_expr(g) for g in group_exprs}
        for store in sorted(
            _glob.glob(os.path.join(self.data_dir, "*", "rollups", "*"))
        ):
            meta = projection_meta(store)
            if not meta or "source" not in meta:
                continue
            src = meta["source"]
            if src.get("table", "").lower() != table.lower():
                continue
            key_map = {_norm_expr(e): c for c, e in src.get("keys", {}).items()}
            # value columns by their monoid re-merge function: SUM for the
            # sum-class (count/sum), MIN/MAX for the r09 extremum classes —
            # any of them re-aggregates exactly over a key-subset grouping
            agg_map = {
                _norm_expr(e): (c, fn)
                for field, fn in (("sums", "SUM"), ("mins", "MIN"),
                                  ("maxs", "MAX"))
                for c, e in src.get(field, {}).items()
            }
            if not gset <= set(key_map):
                continue
            # every WHERE comparison must hit a grid KEY (a filter on a
            # raw measure column cannot be answered by the aggregated
            # grid). A predicate reading only key columns is constant
            # within each grid cell, so ANY boolean combination — flat
            # conjuncts or an OR-bearing tree — selects cells exactly.
            where_parts, ok = [], True
            if isinstance(preds, WhereTree):
                rewritten = _tree_rewrite_sql(preds.tree, key_map)
                if rewritten is None:
                    ok = False
                else:
                    where_parts = [rewritten]
            else:
                for pexpr, op_sql in preds:
                    n = _norm_expr(pexpr)
                    if n in key_map:
                        where_parts.append(f"{key_map[n]} {op_sql}")
                    else:
                        ok = False
                        break
            if not ok:
                continue
            # a grouping construct NEVER takes the exact-grid shortcut:
            # even when its sets cover every grid key, the collapsed
            # subsets re-aggregate, so the construct must run over the
            # grid with re-merged partials
            is_gspec = isinstance(group_exprs, GroupingSpec)
            exact = (not is_gspec) and gset == set(key_map) \
                and not where_parts
            # HAVING conjuncts (r09): each maps through the same
            # key/agg/avg rewrite as select items. When the rewrite has
            # no GROUP BY (exact grid match) a HAVING would be invalid
            # SQL — but there each grid ROW is one group, so the mapped
            # conditions are exactly row filters and join the WHERE.
            def _map_having(hexpr: str, op_sql: str) -> str | None:
                """One HAVING comparison mapped onto the grid: aggregate
                by normalized expression equality (re-merged unless the
                grid matches exactly), grouped keys verbatim, avg
                finalized from sum+strict-count. None = not
                grid-answerable (falls back to raw)."""
                n = _norm_expr(hexpr)
                if n in agg_map:
                    col, fn = agg_map[n]
                    return f"{col if exact else f'{fn}({col})'} {op_sql}"
                if n in key_map and n in gset:
                    return f"{key_map[n]} {op_sql}"
                if re.fullmatch(r"avg\([^()]+\)", n):
                    inner = n[4:-1]
                    num = agg_map.get(f"sum({inner})")
                    den = agg_map.get(f"count({inner})")
                    if not (num and den and num[1] == den[1] == "SUM"):
                        return None
                    nsql = num[0] if exact else f"SUM({num[0]})"
                    dsql = den[0] if exact else f"SUM({den[0]})"
                    return f"({nsql} / {dsql}) {op_sql}"
                return None

            def _having_tree_sql(t) -> str | None:
                # HAVING filters re-aggregated GROUPS: any boolean tree
                # of mapped comparisons is exact (r10)
                if t[0] == "leaf":
                    return _map_having(t[1], t[2])
                parts = [_having_tree_sql(k) for k in t[1]]
                if any(p is None for p in parts):
                    return None
                if t[0] == "not":
                    return f"(NOT {parts[0]})"
                return "(" + (" AND " if t[0] == "and" else " OR ").join(
                    parts) + ")"

            having_parts: list[str] = []
            if isinstance(havings, WhereTree):
                mapped = _having_tree_sql(havings.tree)
                if mapped is None:
                    ok = False
                else:
                    having_parts = [mapped]
            else:
                for hexpr, op_sql in havings:
                    part = _map_having(hexpr, op_sql)
                    if part is None:
                        ok = False
                        break
                    having_parts.append(part)
            if not ok:
                continue
            sel, aliases = [], set()
            for expr, alias in items:
                n = _norm_expr(expr)
                if n in key_map and n in gset:
                    out = alias or expr
                    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", out):
                        # unaliased EXPRESSION key (e.g. `upper(region)`):
                        # `grid_col AS upper(region)` is unparseable, and a
                        # backtick-quoted alias would not reproduce Spark's
                        # auto-generated column name — fall back to the raw
                        # scan, which answered this query before the rollup
                        # existed (r08 ADVICE, medium)
                        ok = False
                        break
                    sel.append(f"{key_map[n]} AS {out}")
                    aliases.add(out.lower())
                elif n in agg_map and alias is not None:
                    col, fn = agg_map[n]
                    agg = col if exact else f"{fn}({col})"
                    sel.append(f"{agg} AS {alias}")
                    aliases.add(alias.lower())
                elif alias is not None and re.fullmatch(r"avg\([^()]+\)", n):
                    # avg is not a monoid but it IS derivable: when the
                    # grid carries BOTH sum(X) and count(X) (the strict
                    # null-correct denominator — count(*) is accepted
                    # only as itself, never for count(X)), avg(X)
                    # rewrites to the finalized division of re-merged
                    # partials (the Timescale finalized-aggregate shape).
                    # Integer-exact sums make the quotient a single IEEE
                    # division, reproducible across engines.
                    inner = n[4:-1]
                    num = agg_map.get(f"sum({inner})")
                    den = agg_map.get(f"count({inner})")
                    if not (num and den and num[1] == den[1] == "SUM"):
                        ok = False
                        break
                    nsql = num[0] if exact else f"SUM({num[0]})"
                    dsql = den[0] if exact else f"SUM({den[0]})"
                    sel.append(f"({nsql} / {dsql}) AS {alias}")
                    aliases.add(alias.lower())
                elif alias is not None and (cd := re.fullmatch(
                        r"count\s*\(\s*distinct\s+([A-Za-z_]\w*)\s*\)",
                        expr, re.IGNORECASE)):
                    # EXACT count(distinct X) through the grid: each grid
                    # row is one distinct key combination, so counting
                    # non-null X-key rows per group IS the distinct count
                    # — PROVIDED X is a grid key outside the GROUP BY and
                    # the grid has no dimensions beyond (GROUP BY ∪ {X})
                    # (an extra dimension would repeat (group, X) pairs).
                    # COUNT(col), not COUNT(*): count(distinct) ignores
                    # nulls and so does the null-key grid row this way.
                    inner = _norm_expr(cd.group(1))
                    if (is_gspec or inner not in key_map or inner in gset
                            or set(key_map) != gset | {inner}):
                        # under a grouping construct the per-group grid
                        # rows REPEAT the counted key across collapsed
                        # subsets — COUNT(key) would overcount, so the
                        # distinct trick refuses and the raw scan answers
                        ok = False
                        break
                    sel.append(f"COUNT({key_map[inner]}) AS {alias}")
                    aliases.add(alias.lower())
                else:
                    ok = False
                    break
            if not ok or not sel:
                continue
            if tail and not _tail_routable(tail, aliases):
                continue
            name = os.path.basename(store)
            from ..catalog import discover_table

            if not discover_table(self.spark, self.data_dir, name,
                                  cache=self._view_fingerprints):
                continue
            having_clause = ""
            if having_parts:
                if exact:
                    where_parts = where_parts + having_parts
                else:
                    having_clause = " HAVING " + " AND ".join(having_parts)
            where_clause = (
                " WHERE " + " AND ".join(where_parts) if where_parts else ""
            )
            if exact:
                group_clause = ""
            elif is_gspec:
                group_clause = " GROUP BY " + group_exprs.mapped(
                    lambda e: key_map[_norm_expr(e)]
                )
            else:
                group_clause = " GROUP BY " + ", ".join(
                    key_map[_norm_expr(g)] for g in group_exprs
                )
            self.last_routed_rollup = name
            self.last_table, self.last_hep_type = name, None
            return (f"SELECT {', '.join(sel)} FROM {name}"
                    f"{where_clause}{group_clause}{having_clause} "
                    f"{tail}").rstrip()
        self.last_routed_rollup = None
        return None

    def _try_join_route(self, q: str) -> str | None:
        """Rewrite a star-join aggregate — `fact JOIN dim ON fact.k =
        dim.dk ... GROUP BY dim.attr` — onto a maintained rollup grid
        keyed by the join key: the classic aggregate-BEFORE-join
        materialized-view rewrite. Exact for the monoid aggregates
        (sum/count/min/max, avg finalized from sum+strict-count): every
        raw fact row maps to the same dim matches as its grid cell, so
        re-merging grid partials through the join and grouping by the
        dim attribute equals aggregating raw joined rows — duplicate dim
        join keys multiply both sides identically, and the inner join
        drops unmatched keys on both sides alike. Anything un-analyzable
        returns None and the raw scan answers.

        Scale: THE reason to maintain the grid — the aggregate runs over
        O(|grid|) rows, then a broadcast join to the small dim, instead
        of shuffling 100 TB of fact rows into the join."""
        import glob as _glob
        import os

        from ..storage.rollup import projection_meta

        m = _JOIN_AGG_RE.match(q)
        if m is None:
            return None
        t1, a1 = m.group("t1"), m.group("a1")
        t2, a2 = m.group("t2"), m.group("a2")
        on = {m.group("ja"): m.group("jac"), m.group("jb"): m.group("jbc")}
        if set(on) != {a1, a2} or a1 == a2:
            return None
        # WHERE parses through the shared routable grammar (r10: OR-of-
        # equalities -> IN, paren AND groups unwrap); the PROVEN preds'
        # canonical form replaces the raw WHERE in the forbidden scan,
        # the same excusal discipline the simple-aggregate path uses
        preds: list[tuple[str, str]] = []
        if m.group("where"):
            got = _parse_where_conjuncts(m.group("where"))
            if got is None:
                return None
            preds = got
        # the structural JOIN..ON is excused from the forbidden scan; the
        # select list, canonical WHERE and GROUP BY/tail are scanned
        scan_text = " ".join(filter(None, (
            m.group("sel"),
            " AND ".join(f"{e} {op}" for e, op in preds),
            m.group("rest"))))
        if _FORBIDDEN_RE.search(scan_text):
            return None
        rest = m.group("rest")
        tm = _TAIL_SPLIT_RE.search(rest)
        gb, tail = (rest[: tm.start()], rest[tm.start():]) if tm else (
            rest, "")
        tail = tail.strip()
        if tail[:6].upper() == "HAVING":
            return None
        items = []
        for it in _split_top_level(m.group("sel")):
            am = _AS_RE.match(it)
            if am:
                items.append((am.group("expr").strip(), am.group("alias")))
            else:
                items.append((it, None))
        group_exprs = [g for g in _split_top_level(gb)]

        from ..catalog import discover_table

        # serve-mode join queries need BOTH tables registered whichever
        # path answers (the caller discovers only the first FROM target)
        for t in (t1, t2):
            try:
                discover_table(self.spark, self.data_dir, t,
                               cache=self._view_fingerprints)
            except Exception:
                pass

        jtype = ("LEFT JOIN"
                 if (m.group("jtype") or "").upper().startswith("LEFT")
                 else "JOIN")  # INNER JOIN == JOIN
        for raw_tbl, raw_alias, dim_tbl, dim_alias in (
                (t1, a1, t2, a2), (t2, a2, t1, a1)):
            if jtype != "JOIN" and raw_alias != a1:
                # fact LEFT JOIN dim is exact (unmatched FACT rows ride
                # their grid cells); dim LEFT JOIN fact preserves
                # unmatched DIM rows, which the grid cannot reproduce
                # for count(*) — only the fact-on-the-left orientation
                # routes
                continue
            jk_raw, jk_dim = on[raw_alias], on[dim_alias]
            if self.default_window:
                # same gate as _try_rollup_route: the grid has no time
                # dimension, so a time-faced table under the implicit
                # window must not route — EITHER side (the unqualified
                # injected `time` predicate binds to whichever table
                # exposes it on the raw path)
                try:
                    if ("time" in self.spark.table(raw_tbl).columns
                            or "time" in self.spark.table(dim_tbl).columns):
                        continue
                except Exception:
                    continue

            def _strip_raw(e: str) -> str | None:
                """Normalize a raw-side expression: drop the fact alias
                qualifier; any surviving dim-alias reference means the
                expression mixes sides — not grid-answerable."""
                s = re.sub(rf"\b{re.escape(raw_alias)}\s*\.\s*", "", e)
                if re.search(rf"\b{re.escape(dim_alias)}\s*\.", s):
                    return None
                return _norm_expr(s)

            dim_col = re.compile(
                rf"^{re.escape(dim_alias)}\s*\.\s*([A-Za-z_]\w*)$")
            for store in sorted(_glob.glob(
                    os.path.join(self.data_dir, "*", "rollups", "*"))):
                meta = projection_meta(store)
                if not meta or "source" not in meta:
                    continue
                src = meta["source"]
                if src.get("table", "").lower() != raw_tbl.lower():
                    continue
                key_map = {_norm_expr(e): c
                           for c, e in src.get("keys", {}).items()}
                agg_map = {
                    _norm_expr(e): (c, fn)
                    for field, fn in (("sums", "SUM"), ("mins", "MIN"),
                                      ("maxs", "MAX"))
                    for c, e in src.get(field, {}).items()
                }
                if _norm_expr(jk_raw) not in key_map:
                    continue
                gname = os.path.basename(store)
                jcol = key_map[_norm_expr(jk_raw)]
                # group keys: dim-qualified columns pass verbatim; fact
                # columns must be grid keys (rewritten to grid columns)
                gb_parts, gset_dim, gset_raw, ok = [], set(), set(), True
                for g in group_exprs:
                    dm = dim_col.match(g.strip())
                    if dm:
                        gb_parts.append(g.strip())
                        gset_dim.add(_norm_expr(g))
                        continue
                    n = _strip_raw(g)
                    if n is not None and n in key_map:
                        gb_parts.append(f"{gname}.{key_map[n]}")
                        gset_raw.add(n)
                    else:
                        ok = False
                        break
                if not ok:
                    continue
                where_parts = []
                for pexpr, op_sql in preds:
                    if dim_col.match(pexpr):
                        where_parts.append(f"{pexpr} {op_sql}")
                        continue
                    n = _strip_raw(pexpr)
                    if n is not None and n in key_map:
                        where_parts.append(f"{gname}.{key_map[n]} {op_sql}")
                    else:
                        ok = False
                        break
                if not ok:
                    continue
                sel, aliases = [], set()
                for expr, alias in items:
                    dm = dim_col.match(expr)
                    if dm:
                        if _norm_expr(expr) not in gset_dim:
                            ok = False
                            break
                        sel.append(f"{expr} AS {alias}" if alias else expr)
                        aliases.add((alias or dm.group(1)).lower())
                        continue
                    n = _strip_raw(expr)
                    if n is None:
                        ok = False
                        break
                    if n in key_map and n in gset_raw:
                        out = alias or (
                            expr.rsplit(".", 1)[-1].strip()
                            if re.fullmatch(
                                rf"{re.escape(raw_alias)}\s*\.\s*"
                                r"[A-Za-z_]\w*|[A-Za-z_]\w*", expr)
                            else None)
                        if out is None:
                            ok = False
                            break
                        sel.append(f"{gname}.{key_map[n]} AS {out}")
                        aliases.add(out.lower())
                    elif n in agg_map and alias is not None:
                        col, fn = agg_map[n]
                        sel.append(f"{fn}({gname}.{col}) AS {alias}")
                        aliases.add(alias.lower())
                    elif alias is not None and re.fullmatch(
                            r"avg\([^()]+\)", n):
                        inner = n[4:-1]
                        num = agg_map.get(f"sum({inner})")
                        den = agg_map.get(f"count({inner})")
                        if not (num and den
                                and num[1] == den[1] == "SUM"):
                            ok = False
                            break
                        sel.append(f"(SUM({gname}.{num[0]}) / "
                                   f"SUM({gname}.{den[0]})) AS {alias}")
                        aliases.add(alias.lower())
                    else:
                        ok = False
                        break
                if not ok or not sel:
                    continue
                if tail and not _tail_routable(tail, aliases):
                    continue
                if not discover_table(self.spark, self.data_dir, gname,
                                      cache=self._view_fingerprints):
                    continue
                try:
                    self.spark.table(dim_tbl)
                except Exception:
                    continue
                where_clause = (" WHERE " + " AND ".join(where_parts)
                                if where_parts else "")
                self.last_routed_rollup = gname
                self.last_table, self.last_hep_type = gname, None
                return (
                    f"SELECT {', '.join(sel)} FROM {gname} "
                    f"{jtype} {dim_tbl} {dim_alias} "
                    f"ON {gname}.{jcol} = {dim_alias}.{jk_dim}"
                    f"{where_clause} GROUP BY {', '.join(gb_parts)} "
                    f"{tail}"
                ).rstrip()
        self.last_routed_rollup = None
        return None

    def _view_has_time(self, table: str) -> bool:
        """The reference's default window applies to its event tables,
        which ALL expose `time` (query.js:110-117). Views without a time
        column — the maintained rollup projections (catalog._discover_
        rollup) — take the query as written; injecting a time predicate
        there would just error. Unresolvable tables fall through to
        spark.sql for the reference-faithful error."""
        try:
            return "time" in self.spark.table(table).columns
        except Exception:
            return True

    def query_json(self, query: str,
                   now: datetime | None = None) -> tuple[list[dict], bool]:
        """(row dicts, truncated) — the HTTP layer's JSON payload
        (hepop.js:1042-1049; BigInt->string there, exact ints here since
        Python JSON handles 64-bit).

        At most `max_rows` rows are materialized on the driver: the limit
        is pushed INTO the plan (CollectLimit — executors stop producing
        once the quota is met). The truncation flag is part of the RETURN
        VALUE, not instance state: HepopHttpServer handlers run on
        concurrent threads, and a shared flag let one thread's complete
        result mask another's truncated one (200 with silently missing
        rows — r06 verdict item 1)."""
        # Cross-process compaction race: manifest-mode tables (the serve
        # default, storage/manifest.py) don't have one — discover_table
        # pins the plan to a published file-list version and retired
        # bytes persist through the vacuum grace, so no swap can
        # invalidate an in-flight read (r07 verdict item 1, zero-gap soak
        # proven). The bounded retry below remains as the LEGACY-table
        # envelope (plain listing dirs, MANIFEST_MODE=0): a plan that
        # captured a partition's file list before a swap reads deleted
        # files -> FileNotFound -> drop the view fingerprint and retry
        # against a fresh listing. Anything that isn't a vanished-file
        # signature re-raises immediately.
        attempts = 4 if self.data_dir is not None else 1
        for i in range(attempts):
            try:
                return self._run_json(query, now)
            except Exception as e:
                if i == attempts - 1 or not _is_stale_listing_error(e):
                    raise
                table, _ = resolve_table(normalize_count(query))
                self._view_fingerprints.pop(table, None)
        raise AssertionError("unreachable")

    def _run_json(self, query: str,
                  now: datetime | None) -> tuple[list[dict], bool]:
        df = self.sql(query, now=now)
        if self.max_rows is None:
            self.last_truncated = False
            return [r.asDict(recursive=True) for r in df.collect()], False
        rows = df.limit(self.max_rows + 1).collect()
        truncated = len(rows) > self.max_rows
        if truncated:
            rows = rows[: self.max_rows]
        self.last_truncated = truncated  # debug breadcrumb only
        return [r.asDict(recursive=True) for r in rows], truncated
