"""Static lint for the oracle-SQL string literals in
``__spark_entry__.py`` — the ``events_seq_ngrams`` bug class (r6): a
NON-raw Python string inside ``oracle_sql()`` whose backslash escapes
are interpreted by Python silently changes the SQL text DuckDB sees
(``'\\'`` cooked to a single backslash turned an escape-doubling
``replace()`` into a no-op).  Any backslash the SQL needs must travel
through a raw string.

Policy: inside ``oracle_sql()``'s source span, a non-raw string literal
may use ``\\n`` / ``\\t`` / ``\\r`` (whitespace-equivalent on both the
Python and the SQL/RE2 side — a cooked tab inside a regex class matches
exactly what the escape would), but any OTHER live escape
(``\\\\``, ``\\'``, ``\\"``, ``\\b``, ``\\f``, ``\\v``, octal, ``\\x``,
``\\u``…) fails the lint: those are precisely the ones whose cooked
form diverges from what the author sees on screen.  Unrecognized
escapes (``\\d`` and friends) are inert in Python (kept verbatim) and
pass.  Fix by making the literal an r-string, never by double-escaping.
"""

from __future__ import annotations

import ast
import io
import os
import re
import tokenize

SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "__spark_entry__.py")

#: escapes Python interprets AND whose cooked form is semantically
#: equivalent for SQL text / RE2 patterns — allowed in cooked strings
_ALLOWED = set("ntr")
#: first chars of escapes Python interprets into something DIFFERENT
#: from the on-screen text — these must only appear in raw strings
_LIVE = set("\\'\"abfv01234567xuUN")

_PREFIX_RE = re.compile(r"^([A-Za-z]*)('''|\"\"\"|'|\")", re.S)


def _live_disallowed(body: str) -> list[str]:
    """Scan a string-literal body (source text between the quotes) and
    return every live escape that is not in the allowed set."""
    hits, i = [], 0
    while i < len(body) - 1:
        if body[i] != "\\":
            i += 1
            continue
        c = body[i + 1]
        if c in _LIVE and c not in _ALLOWED:
            hits.append("\\" + c)
        # recognized or not, Python consumes at most the pair here;
        # multi-char escapes (\\x41) only extend PAST the pair, and the
        # pair alone already identifies the violation
        i += 2
    return hits


def _oracle_spans() -> list[tuple[int, int]]:
    tree = ast.parse(open(SRC).read())
    spans = [(n.lineno, n.end_lineno) for n in ast.walk(tree)
             if isinstance(n, ast.FunctionDef) and n.name == "oracle_sql"]
    assert spans, "oracle_sql() not found in __spark_entry__.py"
    return spans


def test_oracle_backslashes_only_in_raw_strings():
    src = open(SRC).read()
    spans = _oracle_spans()
    bad: list[str] = []
    # py3.12+ (PEP 701) tokenizes f-strings as FSTRING_START/MIDDLE/END
    # instead of one STRING token — without handling MIDDLE the lint
    # would skip every f-string oracle and pass vacuously there
    fstr_start = getattr(tokenize, "FSTRING_START", -1)
    fstr_middle = getattr(tokenize, "FSTRING_MIDDLE", -1)
    fstr_end = getattr(tokenize, "FSTRING_END", -1)
    in_raw_fstring: list[bool] = []  # stack: f-strings nest (PEP 701)
    for tok in tokenize.generate_tokens(io.StringIO(src).readline):
        in_span = any(a <= tok.start[0] <= b for a, b in spans)
        if tok.type == fstr_start:
            in_raw_fstring.append("r" in tok.string.lower()
                                  .split('"')[0].split("'")[0])
            continue
        if tok.type == fstr_end:
            if in_raw_fstring:
                in_raw_fstring.pop()
            continue
        if tok.type == fstr_middle:
            if not in_span or (in_raw_fstring and in_raw_fstring[-1]):
                continue
            body = tok.string  # literal piece, escapes uncooked
        elif tok.type == tokenize.STRING:
            # py3.11: an f-string is a single STRING token too, so the
            # one branch covers plain, f- and concatenated pieces alike
            if not in_span:
                continue
            m = _PREFIX_RE.match(tok.string)
            prefix, quote = m.group(1).lower(), m.group(2)
            if "r" in prefix:
                continue
            body = tok.string[len(m.group(1)) + len(quote):-len(quote)]
        else:
            continue
        for esc in _live_disallowed(body):
            bad.append(
                f"line {tok.start[0]}: cooked string interprets {esc!r} "
                "— make the literal an r-string")
    assert not bad, (
        "oracle_sql() contains non-raw strings with live backslash "
        "escapes (the events_seq_ngrams bug class):\n" + "\n".join(bad))


def test_lint_catches_the_seq_ngrams_bug_shape():
    """The scanner itself must flag the exact r6 regression text: the
    pre-fix oracle carried ``replace(event_type, '\\', '\\\\')`` in a
    NON-raw string — three live ``\\\\`` escapes."""
    src_body = r"replace(event_type, '\\', '\\\\')"
    assert _live_disallowed(src_body) == ["\\\\"] * 3
    assert _live_disallowed(r"[ \t\n\r]+") == []          # allowed class
    assert _live_disallowed(r"LIKE '%\\d%'") == ["\\\\"]  # live backslash
    assert _live_disallowed(r"\d+") == []                 # inert escape
    assert _live_disallowed(r"x\'y") == ["\\'"]           # quote escape
