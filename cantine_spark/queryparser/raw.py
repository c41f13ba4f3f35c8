"""Raw query grammar — behavior-identical port of tique's nom parser
(tique/src/queryparser/raw.rs:77-162), including all the garbage-handling
corner cases its tests pin down (raw.rs:282-311):

  input  := ( ws* item ws* )*
  item   := '-' (fielded | any) → MustNot
          | '+' (fielded | any) → Must
          | fielded
          | any
  fielded:= name ':' any          (name = 1+ chars, no ':' and no whitespace;
                                   unknown names make the WHOLE item re-parse
                                   as a bare term, ':' included)
  any    := '"' inner '"'         (inner = 1+ non-quote chars) → phrase
          | term                  (term = 1+ non-whitespace chars)

Never fails on any input (quickcheck totality, raw.rs:316-323); unparseable
trailing input is silently dropped, exactly like `.ok()?` at parser.rs:164.
"""

from __future__ import annotations

from dataclasses import dataclass, field

SHOULD = "should"
MUST = "must"
MUST_NOT = "must_not"

_WS = {" ", "\t", "\r", "\n"}


def _is_term_char(c: str) -> bool:
    return c not in _WS


@dataclass
class RawQuery:
    input: str
    is_phrase: bool = False
    field_name: str | None = field(default=None)
    occur: str = SHOULD


class _P:
    """Position-threaded recursive-descent mirror of the nom combinators."""

    def __init__(self, s: str, validator):
        self.s = s
        # validator: True (any field), False (no fields), or a container of
        # valid names (raw.rs FieldNameValidator impls, raw.rs:58-75)
        self.validator = validator

    def _check(self, name: str) -> bool:
        v = self.validator
        if v is True or v is False:
            return bool(v)
        return name in v

    def skip_ws(self, pos: int) -> int:
        s = self.s
        while pos < len(s) and s[pos] in _WS:
            pos += 1
        return pos

    def term(self, pos: int) -> tuple[RawQuery, int] | None:
        s, start = self.s, pos
        while pos < len(s) and _is_term_char(s[pos]):
            pos += 1
        if pos == start:
            return None
        return RawQuery(s[start:pos]), pos

    def phrase(self, pos: int) -> tuple[RawQuery, int] | None:
        s = self.s
        if pos >= len(s) or s[pos] != '"':
            return None
        end = s.find('"', pos + 1)
        if end == -1 or end == pos + 1:  # unterminated or empty inner
            return None
        return RawQuery(s[pos + 1:end], is_phrase=True), end + 1

    def any_field(self, pos: int) -> tuple[RawQuery, int] | None:
        return self.phrase(pos) or self.term(pos)

    def fielded(self, pos: int) -> tuple[RawQuery, int] | None:
        s, start = self.s, pos
        while pos < len(s) and s[pos] != ":" and _is_term_char(s[pos]):
            pos += 1
        if pos == start or pos >= len(s) or s[pos] != ":":
            return None
        name = s[start:pos]
        inner = self.any_field(pos + 1)
        if inner is None or not self._check(name):
            return None
        q, np = inner
        q.field_name = name
        return q, np

    def prefixed(self, pos: int, ch: str, occur: str) -> tuple[RawQuery, int] | None:
        s = self.s
        if pos >= len(s) or s[pos] != ch:
            return None
        r = self.fielded(pos + 1) or self.any_field(pos + 1)
        if r is None:
            return None
        q, np = r
        q.occur = occur
        return q, np

    def item(self, pos: int) -> tuple[RawQuery, int] | None:
        return (self.prefixed(pos, "-", MUST_NOT)
                or self.prefixed(pos, "+", MUST)
                or self.fielded(pos)
                or self.any_field(pos))


def parse_query(input_str: str, validator=False) -> list[RawQuery]:
    """Total: returns [] at worst, never raises."""
    p = _P(input_str, validator)
    out: list[RawQuery] = []
    pos = 0
    while True:
        pos = p.skip_ws(pos)
        r = p.item(pos)
        if r is None:
            return out
        q, pos = r
        out.append(q)
