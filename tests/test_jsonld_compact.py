"""JSON-LD Compaction + Flattening vs the W3C compact/flatten suites —
manifest-driven (entries may share inputs with different expect files and
options: specVersion, processingMode, compactArrays, base).

Reference analogue: JSONLDProcessor.Compact / Flatten
(rdf/jsonld_api.go:75-76,99-118). Floors: compact 244/244, flatten 55/55
as of round 2 (small buffer so an environment quirk doesn't mask an
unrelated failure)."""

from __future__ import annotations

import json
import os

import pytest

from rdf_go_spark.parsers.jsonld_compact import compact, flatten

ROOT = "/root/reference/w3c-tests/jsonld"
COMPACT_FLOOR = 242
FLATTEN_FLOOR = 54


def _norm(x):
    if isinstance(x, dict):
        return {k: _norm(v) for k, v in x.items()}
    if isinstance(x, list):
        return sorted(json.dumps(_norm(v), sort_keys=True) for v in x)
    return x


def _loader_for(suite):
    prefix = f"https://w3c.github.io/json-ld-api/tests/{suite}/"

    def loader(url):
        rel = url[len(prefix):] if url.startswith(prefix) \
            else url.split("/")[-1]
        return json.load(open(os.path.join(ROOT, suite, rel)))
    return loader


def _run_suite(suite, fn):
    man = json.load(open(f"{ROOT}/{suite}-manifest.jsonld"))
    loader = _loader_for(suite)
    ok = total = 0
    failures = []
    for e in man["sequence"]:
        if "input" not in e:
            continue
        name = e["input"].split("/")[-1]
        o = e.get("option", {})
        if o.get("specVersion") == "json-ld-1.0":
            continue
        is_neg = "jld:NegativeEvaluationTest" in e.get("@type", [])
        f = os.path.join(ROOT, suite, name)
        ep = os.path.join(ROOT, suite, e["expect"].split("/")[-1]) \
            if "expect" in e else None
        if not is_neg and (ep is None or not os.path.exists(ep)):
            continue
        total += 1
        base = o.get("base",
                     f"https://w3c.github.io/json-ld-api/tests/{suite}/"
                     + name)
        ctx = None
        if "context" in e:
            ctx = json.load(open(os.path.join(
                ROOT, suite, e["context"].split("/")[-1])))
        try:
            kw = dict(base=base, loader=loader)
            if "compactArrays" in o:
                kw["compact_arrays"] = o["compactArrays"]
            if "processingMode" in o:
                kw["processing_mode"] = o["processingMode"]
            got = fn(open(f).read(), ctx, **kw)
            if is_neg:
                failures.append((e["@id"], "no-error"))
                continue
            if _norm(got) == _norm(json.load(open(ep))):
                ok += 1
            else:
                failures.append((e["@id"], "mismatch"))
        except Exception:  # noqa: BLE001 — counted (negatives expect it)
            if is_neg:
                ok += 1
            else:
                failures.append((e["@id"], "exception"))
    return ok, total, failures


@pytest.mark.skipif(not os.path.exists(f"{ROOT}/compact-manifest.jsonld"),
                    reason="manifest unavailable")
def test_w3c_compact_manifest_floor():
    ok, total, failures = _run_suite("compact", compact)
    assert ok >= COMPACT_FLOOR, \
        f"compact suite regressed: {ok}/{total}; first: {failures[:10]}"


@pytest.mark.skipif(not os.path.exists(f"{ROOT}/flatten-manifest.jsonld"),
                    reason="manifest unavailable")
def test_w3c_flatten_manifest_floor():
    ok, total, failures = _run_suite("flatten", flatten)
    assert ok >= FLATTEN_FLOOR, \
        f"flatten suite regressed: {ok}/{total}; first: {failures[:10]}"


class TestCompactUnits:
    def test_simple_term_compaction(self):
        doc = ('[{"@id": "http://e/s", '
               '"http://e/p": [{"@value": "x"}]}]')
        out = compact(doc, {"@context": {"p": "http://e/p"}})
        assert out == {"@context": {"p": "http://e/p"},
                       "@id": "http://e/s", "p": "x"}

    def test_flatten_assigns_bnode_ids(self):
        doc = ('{"@context": {"p": "http://e/p"}, '
               '"p": {"p": "nested"}}')
        out = flatten(doc)
        ids = {n["@id"] for n in out}
        assert all(i.startswith("_:b") for i in ids)
        assert len(out) == 2

    def test_compact_flatten_expand_roundtrip(self):
        from rdf_go_spark.parsers.jsonld_full import expand
        ctxv = {"@context": {"@vocab": "http://v/",
                             "knows": {"@type": "@id"}}}
        doc = ('{"@context": {"@vocab": "http://v/", '
               '"knows": {"@type": "@id"}}, '
               '"@id": "http://e/a", "name": "A", '
               '"knows": "http://e/b"}')
        compacted = compact(doc, ctxv)
        assert _norm(expand(json.dumps(compacted))) == _norm(expand(doc))


TORDF_MANIFEST = "/root/reference/w3c-tests/jsonld/toRdf-manifest.jsonld"


@pytest.mark.skipif(not os.path.exists(TORDF_MANIFEST),
                    reason="manifest unavailable")
def test_flatten_preserves_rdf_content_differential():
    """Cross-algorithm differential: for every toRdf fixture,
    to_rdf(flatten(doc)) must be isomorphic to to_rdf(doc) — flattening
    may relabel blank nodes but must not change the graph. 340/340 as of
    round 2."""
    import glob

    from rdf_go_spark.isomorphism import isomorphic
    from rdf_go_spark.parsers.jsonld_full import to_rdf

    tordf = os.path.dirname(TORDF_MANIFEST) + "/toRdf"
    man = json.load(open(TORDF_MANIFEST))
    opts = {e["input"].split("/")[-1]: e.get("option", {})
            for e in man["sequence"]}
    prefix = "https://w3c.github.io/json-ld-api/tests/toRdf/"

    def loader(url):
        rel = url[len(prefix):] if url.startswith(prefix) \
            else url.split("/")[-1]
        return json.load(open(os.path.join(tordf, rel)))

    ok = total = 0
    failures = []
    for f in sorted(glob.glob(f"{tordf}/*-in.jsonld")):
        name = os.path.basename(f)
        o = opts.get(name, {})
        if o.get("specVersion") == "json-ld-1.0":
            continue
        if not os.path.exists(f.replace("-in.jsonld", "-out.nq")):
            continue
        base = o.get("base", prefix + name)
        gen = o.get("produceGeneralizedRdf", False)
        try:
            direct, e1 = to_rdf(open(f).read(), base=base, loader=loader,
                                rdf_direction=o.get("rdfDirection"),
                                generalized=gen)
            if e1:
                continue  # negative/error fixtures are out of scope here
            total += 1
            flat = flatten(open(f).read(), base=base, loader=loader)
            via, e2 = to_rdf(json.dumps(flat),
                             rdf_direction=o.get("rdfDirection"),
                             generalized=gen)
            if not e2 and isomorphic(list(set(direct)), list(set(via))):
                ok += 1
            else:
                failures.append(name)
        except Exception:  # noqa: BLE001 — counted
            failures.append(name)
    assert ok >= total - 2 and total >= 330, \
        f"flatten differential regressed: {ok}/{total}; {failures[:8]}"
