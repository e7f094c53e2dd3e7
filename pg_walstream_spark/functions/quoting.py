"""SQL identifier/literal quoting utilities (reference parity:
/root/reference/src/sql_builder.rs:119-171 — double-quote doubling,
NUL rejection). Used for lake DDL strings and by consumers that build SQL
against downstream engines."""

from __future__ import annotations


def quote_ident(name: str) -> str:
    if "\x00" in name:
        raise ValueError("identifier contains NUL byte")
    return '"' + name.replace('"', '""') + '"'


def quote_literal(value: str) -> str:
    if "\x00" in value:
        raise ValueError("literal contains NUL byte")
    return "'" + value.replace("'", "''") + "'"
