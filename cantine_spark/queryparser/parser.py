"""Query interpretation — port of tique's QueryParser
(tique/src/queryparser/parser.rs:119-294) emitting our logical plan nodes.

Decision tree per raw item, per target field (parser.rs:266-293):
  analyze(input) → 0 tokens: drop item (stop-word behavior)
                 → 1 token:  Term
                 → phrase:   Phrase
                 → multi:    Boolean(shoulds=terms)     (multiterms query)
Per-field boost wraps the field's query (parser.rs:223-231).
Unfielded items expand over the default fields; >1 resulting query becomes
one Should-Boolean (`parse`) or one DisMax (`parse_dismax`, parser.rs:148-156).
Clause assembly incl. the pure-negative AllQuery completion mirrors
parser.rs:158-208.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from cantine_spark.analysis import tokenize_text
from cantine_spark.plans.nodes import (
    All, Boolean, Boost, DisMax, Phrase, QueryNode, Term,
)
from cantine_spark.queryparser.raw import MUST, MUST_NOT, parse_query


@dataclass
class QueryParser:
    fields: list[str]                      # known fields, in priority order
    boosts: dict[str, float] = field(default_factory=dict)
    default_fields: list[str] | None = None

    def __post_init__(self):
        if self.default_fields is None:
            self.default_fields = list(self.fields)

    # -- FieldNameValidator (raw.rs:250-258): known names only
    def _field_query(self, fld: str, raw) -> QueryNode | None:
        tokens = tokenize_text(raw.input)
        if not tokens:
            return None
        if len(tokens) == 1:
            q: QueryNode = Term(fld, tokens[0])
        elif raw.is_phrase:
            q = Phrase(fld, tuple(tokens))
        else:
            q = Boolean(shoulds=tuple(Term(fld, t) for t in tokens))
        boost = self.boosts.get(fld)
        return Boost(q, boost) if boost is not None else q

    def _queries_from_raw(self, raw) -> list[QueryNode]:
        if raw.field_name is not None and raw.field_name in self.fields:
            targets = [raw.field_name]
        else:
            targets = self.default_fields
        out = []
        for fld in targets:
            q = self._field_query(fld, raw)
            if q is not None:
                out.append(q)
        return out

    def _parse_inner(self, input_str: str, many_handler) -> QueryNode | None:
        parsed = parse_query(input_str, set(self.fields))
        clauses: list[tuple[str, QueryNode]] = []
        num_must_not = 0
        for raw in parsed:
            queries = self._queries_from_raw(raw)
            if not queries:
                continue
            if raw.occur == MUST_NOT:
                for q in queries:
                    num_must_not += 1
                    clauses.append((MUST_NOT, q))
            elif len(queries) == 1:
                clauses.append((raw.occur, queries[0]))
            else:
                clauses.append((raw.occur, many_handler(queries)))

        if not clauses:
            return None
        if len(clauses) == 1:
            occur, q = clauses[0]
            if occur == MUST_NOT:
                return Boolean(musts=(All(),), must_nots=(q,))
            return q
        if len(clauses) == num_must_not:
            clauses.append((MUST, All()))
        return Boolean(
            musts=tuple(q for o, q in clauses if o == MUST),
            shoulds=tuple(q for o, q in clauses if o == "should"),
            must_nots=tuple(q for o, q in clauses if o == MUST_NOT),
        )

    def parse(self, input_str: str) -> QueryNode | None:
        """Multi-field expansion as a Should-Boolean (parser.rs:124-133)."""
        return self._parse_inner(
            input_str, lambda qs: Boolean(shoulds=tuple(qs)))

    def parse_dismax(self, input_str: str, tiebreaker: float = 0.0) -> QueryNode | None:
        """Multi-field expansion as DisMax (parser.rs:148-156; cantine calls
        this with tiebreaker=0.1, cantine/src/main.rs:156)."""
        if not 0.0 <= tiebreaker <= 1.0:
            raise ValueError("tiebreaker must be between 0 and 1.0")
        return self._parse_inner(
            input_str, lambda qs: DisMax(tuple(qs), tiebreaker))
