"""Mustache renderer (utils/templating.py) — behavior pinned to the
mustache spec subset chevron provides (the reference renders plugin
summaries with chevron, gsuite_login.py:43)."""

import pytest

from defenda_data_lake_spark.utils.templating import render


def test_reference_gsuite_template():
    event = {
        "details": {
            "user": "alice@example.com",
            "sourceipaddress": "198.51.100.7",
            "events": [{"name": "login_success"}, {"name": "logout"}],
        }
    }
    out = render(
        "{{details.user}} {{details.events.0.name}}"
        " from IP {{details.sourceipaddress}}",
        event,
    )
    assert out == "alice@example.com login_success from IP 198.51.100.7"


def test_missing_paths_render_empty():
    assert render("[{{a.b.c}}]", {}) == "[]"
    assert render("{{details.user}} x", {"details": {}}) == " x"


def test_list_index_out_of_range_and_negative():
    ctx = {"xs": ["a", "b"]}
    assert render("{{xs.5}}", ctx) == ""
    assert render("{{xs.1}}", ctx) == "b"


def test_html_escaping_and_raw():
    ctx = {"v": "a<b&c"}
    assert render("{{v}}", ctx) == "a&lt;b&amp;c"
    assert render("{{{v}}}", ctx) == "a<b&c"
    assert render("{{& v}}", ctx) == "a<b&c"


def test_sections_iterate_lists():
    ctx = {"items": [{"n": 1}, {"n": 2}], "empty": []}
    assert render("{{#items}}<{{n}}>{{/items}}", ctx) == "<1><2>"
    assert render("{{#empty}}x{{/empty}}", ctx) == ""
    assert render("{{^empty}}none{{/empty}}", ctx) == "none"


def test_section_pushes_context_frame():
    ctx = {"outer": "o", "d": {"inner": "i"}}
    assert render("{{#d}}{{inner}}/{{outer}}{{/d}}", ctx) == "i/o"


def test_implicit_iterator():
    assert render("{{#xs}}[{{.}}]{{/xs}}", {"xs": ["a", "b"]}) == "[a][b]"


def test_comment_and_nested_sections():
    ctx = {"a": {"b": [1, 2]}}
    assert render("{{! note }}{{#a}}{{#b}}{{.}}{{/b}}{{/a}}", ctx) == "12"


def test_unclosed_section_raises():
    with pytest.raises(ValueError):
        render("{{#a}}open", {"a": 1})


def test_numbers_and_booleans_stringify():
    assert render("{{n}}", {"n": 0}) == "0"
    assert render("{{#t}}y{{/t}}", {"t": True}) == "y"
    assert render("{{#f}}y{{/f}}", {"f": False}) == ""
