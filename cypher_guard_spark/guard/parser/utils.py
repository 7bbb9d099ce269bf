"""Leaf lexical helpers (rust/cypher_guard/src/parser/utils.rs).

``identifier`` is take_while1(alphanumeric | '_') — it accepts leading
digits (``123name`` is a valid identifier; utils.rs:3-5, quirk in
clauses.rs:1334-1339). "alphanumeric" is Rust's char::is_alphanumeric,
i.e. full Unicode — Python's str.isalnum matches closely enough for the
corpus (both accept e.g. 'é'); '_' added explicitly.
"""

from __future__ import annotations


def identifier(s: str, i: int):
    j = i
    n = len(s)
    while j < n and (s[j] == "_" or s[j].isalnum()):
        j += 1
    if j == i:
        return None
    return (j, s[i:j])


def ws0(s: str, i: int) -> int:
    """multispace0 — always succeeds, returns new index."""
    n = len(s)
    while i < n and s[i] in " \t\r\n":
        i += 1
    return i


def ws1(s: str, i: int):
    """multispace1 — at least one whitespace char."""
    j = ws0(s, i)
    if j == i:
        return None
    return j


def tag(s: str, i: int, t: str):
    if s.startswith(t, i):
        return i + len(t)
    return None


def tag_no_case(s: str, i: int, t: str):
    if s[i : i + len(t)].upper() == t.upper() and len(s) - i >= len(t):
        return i + len(t)
    return None


def digit1(s: str, i: int):
    j = i
    n = len(s)
    while j < n and s[j].isdigit() and s[j].isascii():
        j += 1
    if j == i:
        return None
    return (j, s[i:j])
