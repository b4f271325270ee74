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


def _find_rightmost(s: str, before: int | None = None) -> tuple[int, int] | None:
    """Locate the rightmost unescaped ``${`` (strictly left of ``before``)
    and its matching ``}``."""
    start = -1
    i = (len(s) if before is None else min(before, len(s))) - 2
    while i >= 0:
        if s[i] == "$" and s[i + 1] == "{" and (i == 0 or s[i - 1] != "\\"):
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


def substitute(template: str, props: Mapping[str, str] | None = None,
               funcs: Mapping[str, Callable[..., str]] | None = None) -> str:
    """Expand every ``${...}`` in ``template``; substituted values are
    re-scanned (nested/recursive macros) up to ``MAX_DEPTH`` rounds.
    ``\\${`` escapes a literal ``${``."""
    props = props or {}
    funcs = funcs or {}
    out = template
    for _ in range(MAX_DEPTH):
        if _find_rightmost(out) is None:
            return out.replace("\\${", "${")
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
    return out.replace("\\${", "${")
