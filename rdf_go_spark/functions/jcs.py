"""RFC 8785 JSON Canonicalization Scheme (JCS) — used to canonicalize
``rdf:JSON`` literal lexical forms (reference:
rdf/jsoncanonicalizer.go:14-344, public API rdf/jsonld_canonical.go:27-47).

Rules implemented per the RFC:
- object members sorted by UTF-16 code units of the property name
- no insignificant whitespace
- strings serialized with the JSON escape rules (two-char escapes for
  \\b \\t \\n \\f \\r \\" \\\\, \\u00XX for other control chars, raw otherwise)
- numbers in ECMAScript shortest round-trip form (integral values without
  exponent/decimal point when in safe range; otherwise repr-style)
"""

from __future__ import annotations

import json
import math
from typing import Any


class JcsError(ValueError):
    pass


_ESCAPES = {
    "\b": "\\b", "\t": "\\t", "\n": "\\n", "\f": "\\f", "\r": "\\r",
    '"': '\\"', "\\": "\\\\",
}


def _ser_string(s: str) -> str:
    out = ['"']
    for ch in s:
        esc = _ESCAPES.get(ch)
        if esc is not None:
            out.append(esc)
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def _ser_number(v) -> str:
    if isinstance(v, int):
        if abs(v) >= 1 << 53:
            raise JcsError("number outside IEEE-754 safe integer range")
        return str(v)
    if math.isnan(v) or math.isinf(v):
        raise JcsError("NaN/Infinity not allowed in JSON")
    if v == int(v) and abs(v) < 1 << 53:
        # ECMAScript prints integral doubles without a fraction
        return str(int(v))
    # shortest round-trip (Python repr == ECMAScript for the common range);
    # normalize exponent form e+21 style
    r = repr(v)
    if "e" in r or "E" in r:
        mant, exp = r.lower().split("e")
        expn = int(exp)
        if mant.endswith(".0"):
            mant = mant[:-2]
        return f"{mant}e{'+' if expn >= 0 else '-'}{abs(expn)}"
    return r


def _ser(v: Any) -> str:
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        return _ser_string(v)
    if isinstance(v, (int, float)):
        return _ser_number(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_ser(x) for x in v) + "]"
    if isinstance(v, dict):
        items = []
        # RFC 8785: sort by UTF-16 code units
        def key16(k: str):
            return [ord(c) if ord(c) < 0x10000 else None for c in k] and \
                tuple(x for c in k for x in (
                    (ord(c),) if ord(c) < 0x10000 else
                    (0xD800 + ((ord(c) - 0x10000) >> 10),
                     0xDC00 + ((ord(c) - 0x10000) & 0x3FF))))
        for k in sorted(v.keys(), key=lambda k: key16(k) or ()):
            if not isinstance(k, str):
                raise JcsError("non-string object key")
            items.append(_ser_string(k) + ":" + _ser(v[k]))
        return "{" + ",".join(items) + "}"
    raise JcsError(f"unsupported JSON value type {type(v).__name__}")


def canonicalize_json(text: str) -> str:
    """Canonicalize a JSON text per RFC 8785."""
    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        raise JcsError(f"invalid JSON: {e}")
    return _ser(doc)
