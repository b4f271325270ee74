"""Hive/Spark partition-directory name escaping.

Spark's partitioned writers name directories with Hive's
``escapePathName`` rule (``org.apache.spark.sql.catalyst.catalog.
ExternalCatalogUtils.escapePathName``, a port of Hive's
``FileUtils.escapePathName``): only a fixed set of ASCII specials and
the control characters are ``%XX``-encoded — space, ``+``, ``,``,
``(``, ``)``, ``!`` and all non-ASCII stay literal.  Percent-encoding
with ``urllib.parse.quote`` produces *different* spellings for such
values, so hand-composed paths (existence checks, emptied-partition
prune deletes, the pure-Python Avro writer) would miss directories the
native writer created.  This module is the single escaping authority
for every partition path the engine composes or parses itself; parity
with the real writer is pinned in ``tests/test_partitioned_write.py``.
"""

from __future__ import annotations

# Exact character set from ExternalCatalogUtils.charToEscape:
# ASCII 01-1F control chars, DEL, and these specials.  '%' itself is in
# the set, which makes the encoding reversible.
_TO_ESCAPE = frozenset(
    [chr(c) for c in range(0x01, 0x20)]
    + ['"', '#', '%', "'", '*', '/', ':', '=', '?', '\\', '\x7f',
       '{', '[', ']', '^'])


def escape_path_name(value: str) -> str:
    """Escape a partition value exactly as Spark's native writer does."""
    return "".join(f"%{ord(c):02X}" if c in _TO_ESCAPE else c
                   for c in value)


def unescape_path_name(name: str) -> str:
    """Inverse of :func:`escape_path_name` (Hive ``unescapePathName``):
    decode ``%XX`` for valid hex pairs, leave anything else literal."""
    out = []
    i, n = 0, len(name)
    while i < n:
        c = name[i]
        if c == "%" and i + 3 <= n:
            hx = name[i + 1:i + 3]
            if all(h in "0123456789abcdefABCDEF" for h in hx):
                out.append(chr(int(hx, 16)))
                i += 3
                continue
        out.append(c)
        i += 1
    return "".join(out)


def hive_partition_path(field_names: list[str],
                        values: tuple[str, ...]) -> str:
    """``f1=v1/f2=v2`` relative path with writer-exact escaping."""
    return "/".join(f"{f}={escape_path_name(str(v))}"
                    for f, v in zip(field_names, values))
