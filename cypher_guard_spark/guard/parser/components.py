"""Component parsers (rust/cypher_guard/src/parser/components.rs).

Note the TWO property-value grammars (quirk Q10, SURVEY.md §2.6):
this module's ``property_value`` (used inside pattern maps ``(n {...})``)
accepts ONLY string | number | function-call (components.rs:29-38); the
SET/UNWIND grammar lives in clauses.py.
"""

from __future__ import annotations

from ..ast import LengthRange, Property, PropertyValue, Quantifier, RelationshipDetails, UNDIRECTED
from .utils import digit1, identifier, tag, ws0


def string_literal_components(s: str, i: int):
    """'...' or "..." — no escape handling (components.rs:15-20)."""
    if i >= len(s) or s[i] not in "'\"":
        return None
    quote = s[i]
    j = i + 1
    n = len(s)
    while j < n and s[j] != quote:
        j += 1
    if j >= n:
        return None  # unterminated: char(quote) fails
    return (j + 1, s[i + 1 : j])


def number_literal_components(s: str, i: int):
    """digit1 only — no sign, no float, no exponent (components.rs:23-26)."""
    r = digit1(s, i)
    if r is None:
        return None
    j, text = r
    return (j, int(text))


def property_value(s: str, i: int):
    """components.rs:29-38 — string | number | function_call(args→String)."""
    r = string_literal_components(s, i)
    if r is not None:
        return (r[0], PropertyValue.string(r[1]))
    r = number_literal_components(s, i)
    if r is not None:
        return (r[0], PropertyValue.number(r[1]))
    r = function_call(s, i)
    if r is not None:
        j, (name, args) = r
        return (j, PropertyValue.function_call(name, [PropertyValue.string(a) for a in args]))
    return None


def function_call(s: str, i: int):
    """components.rs:41-58 — args: '*' | identifier | string | number."""
    r = identifier(s, i)
    if r is None:
        return None
    j, name = r
    j2 = tag(s, j, "(")
    if j2 is None:
        return None
    j = j2
    args = []
    # separated_list0: first element optional
    r = _fc_arg(s, j)
    if r is not None:
        j, a = r
        args.append(a)
        while True:
            k = ws0(s, j)
            k2 = tag(s, k, ",")
            if k2 is None:
                break
            k = ws0(s, k2)
            r = _fc_arg(s, k)
            if r is None:
                break
            j, a = r
            args.append(a)
    j2 = tag(s, j, ")")
    if j2 is None:
        return None
    return (j2, (name, args))


def _fc_arg(s: str, i: int):
    # alt order: '*' | identifier | string | number (components.rs:46-54)
    r = tag(s, i, "*")
    if r is not None:
        return (r, "*")
    r = identifier(s, i)
    if r is not None:
        return r
    r = string_literal_components(s, i)
    if r is not None:
        return r
    r = number_literal_components(s, i)
    if r is not None:
        return (r[0], str(r[1]))
    return None


def property_(s: str, i: int):
    """key ':' value (components.rs:61-75)."""
    i = ws0(s, i)
    r = identifier(s, i)
    if r is None:
        return None
    i, key = r
    i = ws0(s, i)
    j = tag(s, i, ":")
    if j is None:
        return None
    i = ws0(s, j)
    r = property_value(s, i)
    if r is None:
        return None
    i, value = r
    return (i, Property(key=key, value=value))


def property_map(s: str, i: int):
    """'{' property,* '}' (components.rs:78-86)."""
    j = tag(s, i, "{")
    if j is None:
        return None
    i = ws0(s, j)
    props = []
    r = property_(s, i)
    if r is not None:
        i, p = r
        props.append(p)
        while True:
            k = ws0(s, i)
            k2 = tag(s, k, ",")
            if k2 is None:
                break
            k = ws0(s, k2)
            r = property_(s, k)
            if r is None:
                break
            i, p = r
            props.append(p)
    i = ws0(s, i)
    j = tag(s, i, "}")
    if j is None:
        return None
    return (j, props)


def _rel_type_word(s: str, i: int):
    j = i
    n = len(s)
    while j < n and (s[j] == "_" or s[j].isalnum()):
        j += 1
    if j == i:
        return None
    return (j, s[i:j])


def relationship_type(s: str, i: int):
    """':' TYPE('|'TYPE)* → single joined string "A|B" (components.rs:89-107)."""
    j = tag(s, i, ":")
    if j is None:
        return None
    r = _rel_type_word(s, j)
    if r is None:
        return None
    i, first = r
    types = [first]
    while True:
        j = tag(s, i, "|")
        if j is None:
            break
        r = _rel_type_word(s, j)
        if r is None:
            return None  # Rust propagates the error after '|'
        i, t = r
        types.append(t)
    return (i, "|".join(types))


def quantifier(s: str, i: int):
    """*, +, *n, *n.., *n..m, optional trailing ? (components.rs:188-251)."""
    quant = None
    j = tag(s, i, "*")
    if j is not None:
        i = j
        r = digit1(s, i)
        if r is not None:
            i, mn = r
            j = tag(s, i, "..")
            if j is not None:
                i = j
                r = digit1(s, i)
                if r is not None:
                    i, mx = r
                    quant = Quantifier(min=int(mn), max=int(mx))
                else:
                    quant = Quantifier(min=int(mn), max=None)
            else:
                quant = Quantifier(min=int(mn), max=int(mn))
        else:
            quant = Quantifier(min=0, max=None)
    else:
        j = tag(s, i, "+")
        if j is not None:
            i = j
            quant = Quantifier(min=1, max=None)
    if quant is not None:
        j = tag(s, i, "?")
        if j is not None:
            return (j, (quant, True))
        return (i, (quant, False))
    return None


def variable_length_relationship(s: str, i: int):
    """rel_type + quantifier (components.rs:110-123)."""
    r = relationship_type(s, i)
    if r is None:
        return None
    i, rel_type = r
    r = quantifier(s, i)
    if r is None:
        return None
    i, (quant, is_optional) = r
    return (i, (rel_type, quant, is_optional))


def length_range(s: str, i: int):
    """'{' digits? ',' digits? '}' — comma required (components.rs:126-139)."""
    j = tag(s, i, "{")
    if j is None:
        return None
    i = j
    r = digit1(s, i)
    mn = None
    if r is not None:
        i, d = r
        mn = int(d)
    j = tag(s, i, ",")
    if j is None:
        return None
    i = j
    r = digit1(s, i)
    mx = None
    if r is not None:
        i, d = r
        mx = int(d)
    j = tag(s, i, "}")
    if j is None:
        return None
    return (j, LengthRange(min=mn, max=mx))
