"""Config macro templating — engine-side equivalent of the reference's
``${...}`` substitution (``common/MacroParser.java:30-217``: rightmost
macro first, recursive re-evaluation capped at depth 10, backslash
escaping).  This is config-plane only (job parameters, paths, dataset
names) — never a data-plane function.

Implemented from the documented semantics, not ported: a property macro
``${key}`` resolves through the provided mapping; a function macro
``${fn(arg,...)}`` resolves through the provided function table.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

MAX_DEPTH = 10  # MacroParser.java:69-73 recursion cap


class MacroError(ValueError):
    pass


def _is_escaped(s: str, i: int) -> bool:
    """Reference escape rule (``MacroParser.java:162-181``): a token is
    escaped iff it has an ODD number of immediately preceding
    backslashes — so ``\\${`` is a literal ``${`` while ``\\\\${`` is a
    literal backslash followed by a live macro."""
    n = 0
    j = i - 1
    while j >= 0 and s[j] == "\\":
        n += 1
        j -= 1
    return n % 2 == 1


def _find_rightmost(s: str, before: int | None = None) -> tuple[int, int] | None:
    """Locate the rightmost unescaped ``${`` (strictly left of ``before``)
    and its matching ``}``."""
    start = -1
    i = (len(s) if before is None else min(before, len(s))) - 2
    while i >= 0:
        if s[i] == "$" and s[i + 1] == "{" and not _is_escaped(s, i):
            start = i
            break
        i -= 1
    if start < 0:
        return None
    depth = 0
    for j in range(start, len(s)):
        if s[j] == "{":
            depth += 1
        elif s[j] == "}":
            depth -= 1
            if depth == 0:
                return start, j
    raise MacroError(f"unterminated macro starting at {start}: {s[start:]!r}")


def _resolve(body: str, props: Mapping[str, str],
             funcs: Mapping[str, Callable[..., str]]) -> str:
    if "(" in body and body.endswith(")"):
        name, _, rest = body.partition("(")
        args = rest[:-1]
        if name not in funcs:
            raise MacroError(f"unknown macro function '{name}'")
        return str(funcs[name](*[a.strip() for a in args.split(",")] if args else []))
    if body not in props:
        raise MacroError(f"undefined macro property '{body}'")
    return str(props[body])


def _unescape(s: str) -> str:
    """Reference ``replaceEscapedSyntax`` (``MacroParser.java:188-203``):
    halve every backslash run — each ``\\X`` becomes ``X``, ``\\\\``
    becomes ``\\`` — applied ONCE to the fully-expanded string."""
    out: list[str] = []
    pending = False
    for ch in s:
        if ch != "\\" or pending:
            out.append(ch)
            pending = False
        else:
            pending = True
    return "".join(out)


def substitute(template: str, props: Mapping[str, str] | None = None,
               funcs: Mapping[str, Callable[..., str]] | None = None) -> str:
    """Expand every ``${...}`` in ``template``; substituted values are
    re-scanned (nested/recursive macros) up to ``MAX_DEPTH`` rounds.

    Escaping follows the reference exactly: a ``${`` preceded by an ODD
    number of backslashes is literal (``\\${`` escapes, ``\\\\${`` is an
    escaped backslash before a LIVE macro), and the final string has
    every backslash run halved (``replaceEscapedSyntax``)."""
    props = props or {}
    funcs = funcs or {}
    out = template
    for _ in range(MAX_DEPTH):
        if _find_rightmost(out) is None:
            return _unescape(out)
        # one pass: resolve right-to-left, never rescanning substituted
        # output — macros a substitution introduces belong to the next
        # pass, so self-referential macros hit the depth cap instead of
        # looping forever.
        search_before: int | None = None
        while (loc := _find_rightmost(out, search_before)) is not None:
            start, end = loc
            value = _resolve(out[start + 2:end], props, funcs)
            out = out[:start] + value + out[end + 1:]
            search_before = start
    if _find_rightmost(out) is not None:
        raise MacroError(f"macro recursion exceeded depth {MAX_DEPTH}")
    return _unescape(out)
