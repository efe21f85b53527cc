"""JSON-LD HTML script extraction — the full W3C html-manifest suite
(expand / compact / flatten / toRdf over HTML inputs, fragment targeting,
extractAllScripts, comment wrappers, <base href>).

This EXCEEDS the reference: its w3c-report.txt SKIPs every HtmlTest
("HTML Script Extraction" processor feature); here the suite runs for
real via parsers/html_jsonld.py.
"""

from __future__ import annotations

import json
import os

import pytest

from rdf_go_spark.isomorphism import isomorphic
from rdf_go_spark.parsers.html_jsonld import (
    extract_html_jsonld, load_html_document,
)
from rdf_go_spark.parsers.jsonld_compact import compact, flatten
from rdf_go_spark.parsers.jsonld_full import expand, to_rdf
from rdf_go_spark.parsers.ntriples import parse_document
from rdf_go_spark.terms import ParseError

ROOT = "/root/reference/w3c-tests/json-ld-tests"
MANIFEST = f"{ROOT}/html-manifest.jsonld"
URL_PREFIX = "https://w3c.github.io/json-ld-api/tests/"

PASS_FLOOR = 50  # full suite


def _norm(x):
    if isinstance(x, dict):
        return {k: _norm(v) for k, v in x.items()}
    if isinstance(x, list):
        return sorted(json.dumps(_norm(v), sort_keys=True) for v in x)
    return x


@pytest.mark.skipif(not os.path.exists(MANIFEST), reason="manifest unavailable")
def test_w3c_html_manifest_floor():
    man = json.load(open(MANIFEST))
    ok = total = 0
    failures = []
    for e in man["sequence"]:
        types = e.get("@type", [])
        is_neg = "jld:NegativeEvaluationTest" in types
        inp = e["input"]
        frag = None
        if "#" in inp:
            inp, frag = inp.split("#", 1)
        path = os.path.join(ROOT, *inp.split("/"))
        if not os.path.exists(path):
            continue
        o = e.get("option", {})
        total += 1
        doc_url = URL_PREFIX + inp
        base = o.get("base", doc_url)
        all_scripts = o.get("extractAllScripts", False)
        src = open(path).read()
        kind = ("expand" if "jld:ExpandTest" in types else
                "compact" if "jld:CompactTest" in types else
                "flatten" if "jld:FlattenTest" in types else "tordf")
        try:
            doc, eff_base = load_html_document(
                src, base=base, fragment=frag,
                extract_all_scripts=all_scripts,
                missing_ok=(kind == "tordf" and frag is None))
            ctx = None
            if "context" in e:
                ctx = json.load(open(os.path.join(
                    ROOT, *e["context"].split("/"))))
            if kind == "expand":
                got = expand(doc, base=eff_base)
            elif kind == "compact":
                got = compact(doc, ctx, base=eff_base)
            elif kind == "flatten":
                got = flatten(doc, ctx, base=eff_base)
            else:
                got, errs = to_rdf(json.dumps(doc), base=eff_base)
                if errs:
                    raise errs[0]
            if is_neg:
                failures.append((e["@id"], "no-error"))
                continue
            ep = os.path.join(ROOT, *e["expect"].split("/"))
            if kind == "tordf":
                exp, eerrs = parse_document(open(ep).read(), quads=True)
                good = not eerrs and isomorphic(list(set(got)),
                                                list(set(exp)))
            else:
                good = _norm(got) == _norm(json.load(open(ep)))
            if good:
                ok += 1
            else:
                failures.append((e["@id"], "mismatch"))
        except ParseError as ex:
            if is_neg:
                ok += 1
            else:
                failures.append((e["@id"], str(ex)[:60]))
        except Exception as ex:  # noqa: BLE001 — counted
            failures.append((e["@id"], type(ex).__name__))
    assert total >= 50, f"suite not found in full: {total}"
    assert ok >= PASS_FLOOR, \
        f"html suite: {ok}/{total}; failures: {failures[:12]}"


class TestHtmlExtractionUnits:
    def test_char_refs_stay_literal_in_scripts(self):
        html = ('<html><head><script type="application/ld+json">'
                '{"@context":{"@vocab":"http://e/"},"p":"&lt;&amp;&gt;"}'
                '</script></head></html>')
        doc, _ = extract_html_jsonld(html)
        assert doc["p"] == "&lt;&amp;&gt;"

    def test_comment_wrapper_stripped(self):
        html = ('<html><script type="application/ld+json">\n<!--\n'
                '{"a": 1}\n-->\n</script></html>')
        doc, _ = extract_html_jsonld(html)
        assert doc == {"a": 1}

    def test_base_resolution_chain(self):
        html = ('<html><head><base href="sub/x"/>'
                '<script type="application/ld+json">{}</script>'
                '</head></html>')
        _, eff = load_html_document(html, base="http://h/doc/page")
        assert eff == "http://h/doc/sub/x"

    def test_fragment_targets_non_script_errors(self):
        html = '<html><pre id="a">{}</pre></html>'
        with pytest.raises(ParseError) as ei:
            extract_html_jsonld(html, fragment="a")
        assert ei.value.code == "ERR_LOAD"
