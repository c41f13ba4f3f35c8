"""Raw grammar port — every pinned behavior from tique/src/queryparser/raw.rs
tests (raw.rs:164-324), plus hypothesis totality (raw.rs:316-323)."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from cantine_spark.queryparser.raw import (
    MUST, MUST_NOT, SHOULD, RawQuery, parse_query,
)


def q(text, **kw):
    return RawQuery(text, **kw)


def test_term_extraction():
    assert parse_query("gula") == [q("gula")]


def test_prohibited_term_extraction():
    assert parse_query("-ads") == [q("ads", occur=MUST_NOT)]


def test_mandatory_term_extraction():
    assert parse_query("+love") == [q("love", occur=MUST)]


def test_phrase_extraction():
    assert parse_query('"gula recipes"') == [q("gula recipes", is_phrase=True)]


def test_prohibited_phrase_extraction():
    assert parse_query('-"ads and tracking"') == [
        q("ads and tracking", is_phrase=True, occur=MUST_NOT)]


def test_mandatory_phrase_extraction():
    assert parse_query('+"great food"') == [
        q("great food", is_phrase=True, occur=MUST)]


def test_parse_query_works():
    assert parse_query(' +peanut -"peanut butter" -sugar roast') == [
        q("peanut", occur=MUST),
        q("peanut butter", is_phrase=True, occur=MUST_NOT),
        q("sugar", occur=MUST_NOT),
        q("roast"),
    ]


def test_check_field_behavior():
    inp = "title:banana ingredient:sugar"
    # no field support: fields end up inside the term (raw.rs:243-253)
    assert parse_query(inp, False) == [q("title:banana"), q("ingredient:sugar")]
    # any field support
    assert parse_query(inp, True) == [
        q("banana", field_name="title"), q("sugar", field_name="ingredient")]
    # strict: unknown stays in term text (raw.rs:267-278)
    assert parse_query(inp, ["ingredient"]) == [
        q("title:banana"), q("sugar", field_name="ingredient")]


def test_garbage_handling():
    # raw.rs:282-295 — the grammar never fails
    assert parse_query('- -field: -"" body:""', True) == [
        q("-"),
        q("field:", occur=MUST_NOT),
        q('""', occur=MUST_NOT),
        q('""', field_name="body"),
    ]


def test_parse_term_with_field():
    assert parse_query(
        'title:potato:queen +instructions:mash -body:"how to fail" '
        'ingredient:"golden peeler"', True) == [
        q("potato:queen", field_name="title"),
        q("mash", field_name="instructions", occur=MUST),
        q("how to fail", field_name="body", is_phrase=True, occur=MUST_NOT),
        q("golden peeler", field_name="ingredient", is_phrase=True),
    ]


@given(st.text(max_size=200))
def test_can_handle_arbitrary_input(s):
    for validator in (False, True, ["a", "b"]):
        result = parse_query(s, validator)
        assert isinstance(result, list)
        for item in result:
            assert item.occur in (SHOULD, MUST, MUST_NOT)
            assert isinstance(item.input, str)
