"""Macro templating — semantics per ``common/MacroParser.java`` (SURVEY.md
§2.8): rightmost-first, recursive to depth 10, backslash escaping."""

from __future__ import annotations

import pytest

from dynamic_partitioner_spark.functions.macros import (
    MacroError,
    substitute,
)


def test_simple_property():
    assert substitute("path/${name}/data", {"name": "t1"}) == "path/t1/data"


def test_multiple_properties():
    assert substitute("${a}-${b}", {"a": "x", "b": "y"}) == "x-y"


def test_nested_macro_inside_value():
    # value of one macro contains another — resolved on the next round
    assert substitute("${outer}", {"outer": "${inner}", "inner": "42"}) == "42"


def test_nested_macro_in_name():
    # ${${sel}} — inner resolved first (rightmost-innermost), outer next
    assert substitute("${${sel}}", {"sel": "key", "key": "v"}) == "v"


def test_function_macro():
    assert substitute("${upper(abc)}", funcs={"upper": lambda s: s.upper()}) == "ABC"


def test_function_macro_multiple_args():
    assert substitute("${concat(a, b)}",
                      funcs={"concat": lambda x, y: x + y}) == "ab"


def test_escaped_macro_left_verbatim():
    assert substitute("cost \\${price}", {"price": "9"}) == "cost ${price}"


def test_undefined_property_raises():
    with pytest.raises(MacroError, match="undefined"):
        substitute("${nope}")


def test_unknown_function_raises():
    with pytest.raises(MacroError, match="unknown macro function"):
        substitute("${nope(1)}")


def test_recursion_depth_capped():
    # a → ${a}: self-referential must hit the depth cap, not hang
    with pytest.raises(MacroError, match="depth"):
        substitute("${a}", {"a": "${a}"})


def test_unterminated_macro_raises():
    with pytest.raises(MacroError, match="unterminated"):
        substitute("${open")


def test_no_macros_passthrough():
    assert substitute("plain string") == "plain string"


def test_double_backslash_escapes_the_backslash_not_the_macro():
    """Reference parity (MacroParser.java:98,162-181): escaped tokens
    have an ODD number of preceding backslashes, so a doubly-escaped
    backslash leaves the macro LIVE; the final pass halves every
    backslash run (replaceEscapedSyntax)."""
    from dynamic_partitioner_spark.functions.macros import substitute

    assert substitute(r"dir\\${name}", {"name": "x"}) == "dir\\x"
    assert substitute(r"dir\\\${name}", {"name": "x"}) == "dir\\${name}"
    assert substitute(r"a\b", {}) == "ab"          # run-halving unescape
    assert substitute(r"a\\b", {}) == "a\\b"
